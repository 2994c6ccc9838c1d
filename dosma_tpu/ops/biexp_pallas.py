"""Pallas TPU kernel: fused biexponential Levenberg–Marquardt fit.

Same design as :mod:`dosma_tpu.ops.monoexp_pallas` extended to the
4-parameter model ``y = a1 e^{b1 x} + a2 e^{b2 x}`` (the reference exposes
it as ``dosma.core.fitting.biexponential``, ``fitting.py:1021``): each
voxel tile stays VMEM-resident for the whole LM loop; per iteration the
kernel forms the residual, the four closed-form Jacobian columns, the
damped 4x4 normal equations, and solves them with an unrolled Cholesky —
all per-lane VPU ops. HBM traffic is one read of ``y`` and one write of
the packed result.

Layout: ``y`` (T, N) is consumed as (T, NB, 8, L) — voxels packed
BLOCK-LOCALLY (``n = block*8L + s*L + q``), a contiguous split of the
voxel axis (a reshape, not an HBM relayout), with per-voxel LM state as
fully-packed (8, L) vregs. Both exponentials at the current accepted
parameters are carried between iterations, so each iteration costs two
fresh ``exp`` evaluations (for the proposal) instead of four. The whole
wrapper (layout, padding, NaN policy) is one jitted program — a single
dispatch per fit.

Packed output rows (6): [a1, b1, a2, b2, r2, converged].
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dosma_tpu.ops.monoexp_pallas import pallas_supported  # noqa: F401

__all__ = ["biexp_lm_pallas", "pallas_supported"]

_OUT_ROWS = 6  # [a1, b1, a2, b2, r2, converged]
_BLOCK_N = 8192


def _chol4_solve(A, g):
    """Solve the symmetric positive-definite 4x4 system ``A dp = g`` for a
    batch of per-voxel scalar entries via an unrolled Cholesky.

    ``A``: tuple of the 10 unique entries (row-major lower triangle)
    ``g``: tuple of the 4 right-hand sides. All entries are (8, Q) arrays.
    Pivots are clamped away from zero so rank-deficient voxels (e.g.
    b1 == b2 degeneracy) produce finite steps the accept test then rejects.
    """
    a11, a21, a22, a31, a32, a33, a41, a42, a43, a44 = A
    g1, g2, g3, g4 = g

    tiny = 1e-30
    l11 = jnp.sqrt(jnp.maximum(a11, tiny))
    i11 = 1.0 / l11
    l21 = a21 * i11
    l31 = a31 * i11
    l41 = a41 * i11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, tiny))
    i22 = 1.0 / l22
    l32 = (a32 - l31 * l21) * i22
    l42 = (a42 - l41 * l21) * i22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, tiny))
    i33 = 1.0 / l33
    l43 = (a43 - l41 * l31 - l42 * l32) * i33
    l44 = jnp.sqrt(jnp.maximum(a44 - l41 * l41 - l42 * l42 - l43 * l43, tiny))
    i44 = 1.0 / l44

    # Forward substitution: L z = g.
    z1 = g1 * i11
    z2 = (g2 - l21 * z1) * i22
    z3 = (g3 - l31 * z1 - l32 * z2) * i33
    z4 = (g4 - l41 * z1 - l42 * z2 - l43 * z3) * i44
    # Back substitution: L^T dp = z.
    d4 = z4 * i44
    d3 = (z3 - l43 * d4) * i33
    d2 = (z2 - l32 * d3 - l42 * d4) * i22
    d1 = (z1 - l21 * d2 - l31 * d3 - l41 * d4) * i11
    return d1, d2, d3, d4


def _kernel(x_ref, y_ref, p0_ref, out_ref, *, max_iter: int, ftol: float, xtol: float):
    y = y_ref[:, 0]  # (T, 8, L) — voxels packed block-locally
    x = x_ref[:, 0]  # (T, 1, 1)

    a1 = p0_ref[0, 0]  # (8, L)
    b1 = p0_ref[1, 0]
    a2 = p0_ref[2, 0]
    b2 = p0_ref[3, 0]

    e1_0 = jnp.exp(b1 * x)
    e2_0 = jnp.exp(b2 * x)
    r0 = a1 * e1_0 + a2 * e2_0 - y
    cost0 = jnp.sum(r0 * r0, axis=0)
    bad_init = (~jnp.isfinite(cost0)).astype(jnp.float32)
    cost = jnp.where(bad_init > 0, jnp.inf, cost0)
    lam = jnp.full(cost.shape, 1e-3, jnp.float32)
    converged = jnp.zeros(cost.shape, jnp.float32)

    def cond(carry):
        it = carry[0]
        converged = carry[-1]
        return (it < max_iter) & (jnp.min(converged) < 0.5)

    def body(carry):
        it, a1, b1, a2, b2, e1, e2, cost, lam, converged = carry
        r = a1 * e1 + a2 * e2 - y
        # Jacobian columns: [e1, a1 x e1, e2, a2 x e2].
        j2 = a1 * (x * e1)
        j4 = a2 * (x * e2)

        # 4x4 normal equations (lower triangle) + gradient, per-voxel scalars.
        A = (
            jnp.sum(e1 * e1, axis=0),
            jnp.sum(j2 * e1, axis=0), jnp.sum(j2 * j2, axis=0),
            jnp.sum(e2 * e1, axis=0), jnp.sum(e2 * j2, axis=0), jnp.sum(e2 * e2, axis=0),
            jnp.sum(j4 * e1, axis=0), jnp.sum(j4 * j2, axis=0), jnp.sum(j4 * e2, axis=0),
            jnp.sum(j4 * j4, axis=0),
        )
        g = (
            jnp.sum(e1 * r, axis=0),
            jnp.sum(j2 * r, axis=0),
            jnp.sum(e2 * r, axis=0),
            jnp.sum(j4 * r, axis=0),
        )
        # Marquardt damping on the diagonal (floored like the 2x2 kernel).
        damp = lambda d: d + lam * jnp.maximum(d, 1e-12)  # noqa: E731
        A = (damp(A[0]), A[1], damp(A[2]), A[3], A[4], damp(A[5]), A[6], A[7], A[8], damp(A[9]))

        d1, d2, d3, d4 = _chol4_solve(A, g)

        n_a1, n_b1 = a1 - d1, b1 - d2
        n_a2, n_b2 = a2 - d3, b2 - d4
        n_e1 = jnp.exp(n_b1 * x)
        n_e2 = jnp.exp(n_b2 * x)
        n_r = n_a1 * n_e1 + n_a2 * n_e2 - y
        new_cost = jnp.sum(n_r * n_r, axis=0)
        new_cost = jnp.where(jnp.isfinite(new_cost), new_cost, jnp.inf)

        # Convergence criteria ported from the monoexp VARPRO kernel's f32
        # findings (DEVNOTES "VARPRO/exact-Newton" item 3): near the optimum
        # the ACHIEVED reduction falls below the f32 cost resolution and
        # proposals get noise-rejected, so (a) latch on the PREDICTED
        # reduction dp.g <= ftol*cost (scipy's ftol criterion,
        # rejection-proof), (b) accept equal-cost proposals, and (c) grow
        # lambda x10 on rejection. In the f64/f32 replica this cut the
        # noisy worst-case lane from 22 to 8 iterations at unchanged
        # solution quality (rel-RMSE vs the f64 solution ~1e-4).
        accept = (new_cost <= cost) & jnp.isfinite(new_cost)
        pred = d1 * g[0] + d2 * g[1] + d3 * g[2] + d4 * g[3]
        rel_decrease = pred <= ftol * jnp.maximum(cost, 1e-30)
        ratio = lambda d, p: jnp.abs(d) / jnp.maximum(jnp.abs(p), 1e-12)  # noqa: E731
        step_ratio = jnp.maximum(
            jnp.maximum(ratio(d1, a1), ratio(d2, b1)),
            jnp.maximum(ratio(d3, a2), ratio(d4, b2)),
        )
        small_step = step_ratio <= xtol
        newly = rel_decrease | small_step

        a1 = jnp.where(accept, n_a1, a1)
        b1 = jnp.where(accept, n_b1, b1)
        a2 = jnp.where(accept, n_a2, a2)
        b2 = jnp.where(accept, n_b2, b2)
        e1 = jnp.where(accept, n_e1, e1)
        e2 = jnp.where(accept, n_e2, e2)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12),
                        jnp.minimum(lam * 10.0, 1e10))
        converged = jnp.maximum(converged, newly.astype(jnp.float32))
        return it + 1, a1, b1, a2, b2, e1, e2, cost, lam, converged

    carry = (jnp.asarray(0, jnp.int32), a1, b1, a2, b2, e1_0, e2_0, cost, lam, converged)
    it_final, a1, b1, a2, b2, e1_f, e2_f, cost, lam, converged = jax.lax.while_loop(
        cond, body, carry
    )

    finite = (
        jnp.isfinite(a1) & jnp.isfinite(b1) & jnp.isfinite(a2) & jnp.isfinite(b2)
    ).astype(jnp.float32)
    converged = converged * finite * (1.0 - bad_init)

    r = a1 * e1_f + a2 * e2_f - y
    ss_res = jnp.sum(r * r, axis=0)
    y_mean = jnp.mean(y, axis=0, keepdims=True)
    ss_tot = jnp.sum((y - y_mean) ** 2, axis=0)
    r2 = 1.0 - ss_res / (ss_tot + 1e-8)

    out_ref[:, 0] = jnp.stack([a1, b1, a2, b2, r2, converged], axis=0)


@functools.partial(jax.jit, static_argnames=("max_iter", "ftol", "xtol"))
def _biexp_impl(yT, x_col, p0, max_iter, ftol, xtol):
    T, N = yT.shape
    LB = _BLOCK_N // 8
    NB = N // _BLOCK_N
    grid = (NB,)
    # Block-local voxel packing: a CONTIGUOUS split of the voxel axis (the
    # old global sublane-major reshape was a full HBM relayout each way).
    y4 = yT.reshape(T, NB, 8, LB)
    p4 = p0.reshape(4, NB, 8, LB)
    kernel = functools.partial(_kernel, max_iter=max_iter, ftol=ftol, xtol=xtol)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, NB, 8, LB), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, 1, 1, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_OUT_ROWS, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=90 * max_iter * N,
            bytes_accessed=yT.size * 4 + _OUT_ROWS * N * 4,
            transcendentals=2 * max_iter * N,
        ),
    )(x_col.reshape(T, 1, 1, 1), y4, p4)
    return out.reshape(_OUT_ROWS, N)


@functools.partial(
    jax.jit,
    static_argnames=(
        "transpose_y", "max_iter", "ftol", "xtol", "has_bounds", "nan_scipy"
    ),
)
def _biexp_full(
    y, p0, x, bounds_lo, bounds_hi,
    transpose_y, max_iter, ftol, xtol, has_bounds, nan_scipy,
):
    """The COMPLETE fit — layout, padding, kernel, NaN policy — as one
    jitted program (eager per-op dispatch through remote backends costs
    more than the fit; same design as the monoexp twin)."""
    yT = y.T if transpose_y else y
    if yT.dtype != jnp.float32:
        yT = yT.astype(jnp.float32)
    T, N = yT.shape

    # Padded voxels get y=1 with seed (1, 0, 0, 0): the model already equals
    # the data, the zero gradient yields a zero Cholesky solution, and the
    # lane converges on its first iteration without stalling the tile.
    N_pad = ((N + _BLOCK_N - 1) // _BLOCK_N) * _BLOCK_N
    yT_pad = jnp.pad(yT, ((0, 0), (0, N_pad - N)), constant_values=1.0) if N_pad > N else yT

    pad_seed = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    if p0.ndim == 1:
        p0_mat = jnp.broadcast_to(p0[:, None], (4, N))
    else:
        p0_mat = p0.T
    if N_pad > N:
        p0_mat = jnp.concatenate(
            [p0_mat, jnp.broadcast_to(pad_seed[:, None], (4, N_pad - N))], axis=1
        )

    x_col = x[:, None, None]
    out = _biexp_impl(yT_pad, x_col, p0_mat, max_iter, ftol, xtol)

    popt = out[:4, :N].T
    r2 = out[4, :N]
    converged = out[5, :N] > 0.5

    invalid = jnp.all(yT == 0, axis=0)
    if has_bounds:
        oob = jnp.any((yT < bounds_lo) | (yT > bounds_hi), axis=0)
        invalid = invalid | oob

    bad = invalid | (~converged) if nan_scipy else invalid
    popt = jnp.where(bad[:, None], jnp.nan, popt)
    r2 = jnp.where(bad, 0.0, r2)
    return popt, r2, converged


def biexp_lm_pallas(
    x,
    y,
    p0,
    max_iter: int = 50,
    ftol: float = 1e-5,
    xtol: float = 1e-5,
    y_bounds: Optional[Tuple[float, float]] = None,
    nan_policy: str = "scipy",
    y_layout: str = "nt",
):
    """Fused Pallas biexponential LM fit.

    Same contract as :func:`dosma_tpu.ops.nlls.lm_fit` specialized to
    ``a1 e^{b1 x} + a2 e^{b2 x}``: ``y`` (N, T) → (popt (N, 4), r2 (N,),
    converged (N,)). Pass ``y_layout="tn"`` for (T, N) input.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y)
    lo, hi = (y_bounds if y_bounds is not None else (0.0, 0.0))
    return _biexp_full(
        y, jnp.asarray(p0, jnp.float32), x,
        jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
        transpose_y=(y_layout != "tn"),
        max_iter=int(max_iter), ftol=float(ftol), xtol=float(xtol),
        has_bounds=y_bounds is not None,
        nan_scipy=(nan_policy == "scipy"),
    )
