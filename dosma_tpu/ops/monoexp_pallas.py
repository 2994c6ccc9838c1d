"""Pallas TPU kernel: fused monoexponential Levenberg–Marquardt fit.

The generic engine (:mod:`dosma_tpu.ops.nlls`) re-reads data from HBM every
LM iteration. For the dominant model — ``y = a * exp(b x)``, P=2 — this
kernel keeps each voxel tile resident in VMEM and runs the ENTIRE fit on
it: the log-linear polyfit seed (ref ``fitting.py:701-718``), residuals,
the two closed-form Jacobian columns, the 2x2 damped normal equations
(Cramer solve), acceptance and damping updates are all per-lane VPU ops.
HBM traffic is one read of y and one write of the packed result — the
speed-of-light bound for this fit. With the seed fused there is exactly
ONE program dispatch per fit, which matters doubly on remote/tunneled
backends where every dispatch round-trip costs ~30 ms.

Layout: ``y`` (T, N) is consumed as (T, NB, 8, L) — voxels packed
BLOCK-LOCALLY into 8 sublanes x L lanes, ``n = block*8L + s*L + q``. This
is a contiguous split of the voxel axis (a reshape, not a relayout), and
per-voxel LM state ((8, L) "scalars") still packs every vreg fully. The
packed output is (4, N): rows [a, b, r2, converged].

Semantics match :func:`dosma_tpu.ops.nlls.lm_fit` (same damping policy,
ftol/xtol convergence flags, NaN handling applied by the caller).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["monoexp_lm_pallas", "pallas_supported"]

_OUT_ROWS = 4  # [a, b, r2, converged]
# Voxels per tile. Measured on v5e across {8192, 16384, 32768, 65536,
# 262144}: 8192 is fastest — the per-block early exit means a block only
# runs as long as its WORST lane, so fine-grained blocks waste less work
# on stragglers than big ones; 262144 OOMs the 16 MB scoped VMEM.
_BLOCK_N = 8192


def pallas_supported() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _seed_polyfit(y, x):
    """In-kernel log-linear seed (ref ``fitting.py:701-718``): deg-1 lstsq
    on log(y) with each voxel clamped to a RELATIVE floor (1e-3 of its
    peak) — noisy echoes can dip <= 0, and an absolute clamp produces
    runaway seeds that overflow the f32 LM loop."""
    peak = jnp.max(y, axis=0)
    safe = jnp.maximum(y, jnp.maximum(1e-3 * peak, 1e-10))
    L = jnp.log(safe)
    xm = jnp.mean(x)
    xc = x - xm
    varx = jnp.sum(xc * xc)
    Lm = jnp.mean(L, axis=0)
    b = jnp.sum(xc * (L - Lm), axis=0) / varx
    a = jnp.exp(Lm - b * xm)
    return a, b


def _kernel(x_ref, y_ref, p0_ref, out_ref, *, max_iter: int, ftol: float,
            xtol: float, seed_in_kernel: bool):
    y = y_ref[:, 0]  # (T, 8, L) — voxels packed block-locally
    x = x_ref[:, 0]  # (T, 1, 1)

    if seed_in_kernel:
        a, b = _seed_polyfit(y, x)
    else:
        a = p0_ref[0, 0]  # (8, L)
        b = p0_ref[1, 0]

    e0 = jnp.exp(b * x)
    r0 = a * e0 - y
    cost0 = jnp.sum(r0 * r0, axis=0)
    bad_init = (~jnp.isfinite(cost0)).astype(jnp.float32)
    cost = jnp.where(bad_init > 0, jnp.inf, cost0)
    lam = jnp.full(cost.shape, 1e-3, jnp.float32)
    converged = jnp.zeros(cost.shape, jnp.float32)  # float flag (Mosaic-friendly carry)

    def cond(carry):
        it, a, b, e, cost, lam, converged = carry
        # Early exit once every lane in the tile has converged — with
        # polyfit seeding this cuts the loop to ~3 iterations.
        return (it < max_iter) & (jnp.min(converged) < 0.5)

    def body(carry):
        it, a, b, e, cost, lam, converged = carry
        # `e` = exp(b*x) at the CURRENT accepted params (carried to halve
        # the transcendental count: one fresh exp per iteration).
        r = a * e - y
        # Jacobian columns: d/da = e, d/db = a * x * e.
        jb = a * (x * e)
        # 2x2 normal equations, per-voxel scalars (8, L) — fully packed vregs.
        jaa = jnp.sum(e * e, axis=0)
        jab = jnp.sum(e * jb, axis=0)
        jbb = jnp.sum(jb * jb, axis=0)
        ra = jnp.sum(e * r, axis=0)
        rb = jnp.sum(jb * r, axis=0)

        # Marquardt damping on the diagonal.
        A00 = jaa + lam * jnp.maximum(jaa, 1e-12)
        A11 = jbb + lam * jnp.maximum(jbb, 1e-12)
        det = A00 * A11 - jab * jab
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        da = (A11 * ra - jab * rb) * inv_det
        db = (A00 * rb - jab * ra) * inv_det

        new_a = a - da
        new_b = b - db
        new_e = jnp.exp(new_b * x)
        new_r = new_a * new_e - y
        new_cost = jnp.sum(new_r * new_r, axis=0)
        new_cost = jnp.where(jnp.isfinite(new_cost), new_cost, jnp.inf)

        accept = new_cost < cost
        rel_decrease = (cost - new_cost) <= ftol * jnp.maximum(cost, 1e-30)
        step_ratio = jnp.maximum(
            jnp.abs(da) / jnp.maximum(jnp.abs(a), 1e-12),
            jnp.abs(db) / jnp.maximum(jnp.abs(b), 1e-12),
        )
        small_step = step_ratio <= xtol
        # A tiny PROPOSED step in the low-damping (≈Gauss-Newton) regime
        # means we are at the optimum even if the step is rejected — without
        # this, pinned voxels wait ~10 iterations for the lam blow-up exit.
        gn_small = small_step & (lam <= 1e-2)
        at_floor = (~accept) & (lam >= 1e2)
        newly = (accept & (rel_decrease | small_step)) | gn_small | at_floor

        a = jnp.where(accept, new_a, a)
        b = jnp.where(accept, new_b, b)
        e = jnp.where(accept, new_e, e)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12),
                        jnp.minimum(lam * 3.0, 1e10))
        converged = jnp.maximum(converged, newly.astype(jnp.float32))
        return it + 1, a, b, e, cost, lam, converged

    it_final, a, b, e_f, cost, lam, converged = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), a, b, e0, cost, lam, converged)
    )

    finite = (jnp.isfinite(a) & jnp.isfinite(b)).astype(jnp.float32)
    converged = converged * finite * (1.0 - bad_init)

    # r² goodness of fit.
    r = a * e_f - y
    ss_res = jnp.sum(r * r, axis=0)
    y_mean = jnp.mean(y, axis=0, keepdims=True)
    ss_tot = jnp.sum((y - y_mean) ** 2, axis=0)
    r2 = 1.0 - ss_res / (ss_tot + 1e-8)

    out_ref[:, 0] = jnp.stack([a, b, r2, converged], axis=0)


@functools.partial(
    jax.jit, static_argnames=("max_iter", "ftol", "xtol", "seed_in_kernel")
)
def _monoexp_impl(yT, x_col, p0, max_iter, ftol, xtol, seed_in_kernel=False):
    T, N = yT.shape
    LB = _BLOCK_N // 8
    NB = N // _BLOCK_N
    grid = (NB,)
    # Block-local voxel packing is a CONTIGUOUS split of the voxel axis —
    # a reshape, not a relayout (the old sublane-major global packing cost
    # a full extra HBM round trip each way).
    y4 = yT.reshape(T, NB, 8, LB)
    kernel = functools.partial(
        _kernel, max_iter=max_iter, ftol=ftol, xtol=xtol,
        seed_in_kernel=seed_in_kernel,
    )
    in_specs = [
        pl.BlockSpec((T, 1, 1, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if seed_in_kernel:
        p4 = jnp.zeros((2, 1, 8, LB), jnp.float32)
        in_specs[2] = pl.BlockSpec(
            (2, 1, 8, LB), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        p4 = p0.reshape(2, NB, 8, LB)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, NB, 8, LB), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_OUT_ROWS, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * max_iter * N,
            bytes_accessed=yT.size * 4 + _OUT_ROWS * N * 4,
            transcendentals=2 * max_iter * N,
        ),
    )(x_col.reshape(T, 1, 1, 1), y4, p4)
    return out.reshape(_OUT_ROWS, N)


@functools.partial(
    jax.jit,
    static_argnames=(
        "transpose_y", "seed_in_kernel", "max_iter", "ftol", "xtol",
        "has_bounds", "nan_scipy",
    ),
)
def _monoexp_full(
    y, p0, x, bounds_lo, bounds_hi,
    transpose_y, seed_in_kernel, max_iter, ftol, xtol, has_bounds, nan_scipy,
):
    """The COMPLETE fit — layout, padding, kernel, NaN policy — as one
    jitted program: a single dispatch (eager per-op dispatch overhead
    through remote backends would otherwise dominate the fit itself)."""
    yT = y.T if transpose_y else y  # (T, N)
    if yT.dtype != jnp.float32:
        yT = yT.astype(jnp.float32)
    T, N = yT.shape

    # Pad the voxel axis to the lane block. Padded voxels get y=1: the
    # in-kernel seed (or the explicit pad seed a=1, b=0) already equals the
    # data, the first step is zero, and the lane converges on iteration 1
    # without stalling its tile's early exit.
    N_pad = ((N + _BLOCK_N - 1) // _BLOCK_N) * _BLOCK_N
    yT_pad = jnp.pad(yT, ((0, 0), (0, N_pad - N)), constant_values=1.0) if N_pad > N else yT

    if seed_in_kernel:
        p0_mat = jnp.zeros((2, N_pad), jnp.float32)
    else:
        pad_seed = jnp.asarray([1.0, 0.0], jnp.float32)
        if p0.ndim == 1:
            p0_mat = jnp.broadcast_to(p0[:, None], (2, N))
        else:
            p0_mat = p0.T
        if N_pad > N:
            p0_mat = jnp.concatenate(
                [p0_mat, jnp.broadcast_to(pad_seed[:, None], (2, N_pad - N))], axis=1
            )

    out = _monoexp_impl(
        yT_pad, x, p0_mat, max_iter, ftol, xtol, seed_in_kernel=seed_in_kernel
    )

    a = out[0, :N]
    b = out[1, :N]
    r2 = out[2, :N]
    converged = out[3, :N] > 0.5
    popt = jnp.stack([a, b], axis=-1)

    invalid = jnp.all(yT == 0, axis=0)
    if has_bounds:
        oob = jnp.any((yT < bounds_lo) | (yT > bounds_hi), axis=0)
        invalid = invalid | oob

    bad = invalid | (~converged) if nan_scipy else invalid
    popt = jnp.where(bad[:, None], jnp.nan, popt)
    r2 = jnp.where(bad, 0.0, r2)
    return popt, r2, converged


def monoexp_lm_pallas(
    x,
    y,
    p0=None,
    max_iter: int = 50,
    ftol: float = 1e-5,
    xtol: float = 1e-5,
    y_bounds: Optional[Tuple[float, float]] = None,
    nan_policy: str = "scipy",
    y_layout: str = "nt",
):
    """Fused Pallas monoexponential LM fit.

    Same contract as :func:`dosma_tpu.ops.nlls.lm_fit` specialized to the
    monoexponential model: ``y`` (N, T) → (popt (N, 2), r2 (N,), converged).
    Pass ``y_layout="tn"`` when ``y`` is already (T, N) — the kernel
    consumes that layout natively (no transpose at all). ``p0=None`` seeds
    IN-KERNEL with the log-linear polyfit of ``MonoExponentialFit``'s
    ``tc0="polyfit"`` path — zero extra HBM traffic and a single program
    dispatch for seed+fit.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y)
    seed_in_kernel = p0 is None
    p0_arr = (
        jnp.zeros(2, jnp.float32) if seed_in_kernel else jnp.asarray(p0, jnp.float32)
    )
    lo, hi = (y_bounds if y_bounds is not None else (0.0, 0.0))
    return _monoexp_full(
        y, p0_arr, x,
        jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
        transpose_y=(y_layout != "tn"),
        seed_in_kernel=seed_in_kernel,
        max_iter=int(max_iter), ftol=float(ftol), xtol=float(xtol),
        has_bounds=y_bounds is not None,
        nan_scipy=(nan_policy == "scipy"),
    )
