"""Pallas TPU kernel: fused monoexponential Levenberg–Marquardt fit.

The generic engine (:mod:`dosma_tpu.ops.nlls`) re-reads data from HBM every
LM iteration. For the dominant model — ``y = a * exp(b x)``, P=2 — this
kernel keeps each voxel tile resident in VMEM and runs the ENTIRE fit on
it: the log-linear polyfit seed (ref ``fitting.py:701-718``), then a
VARPRO (variable-projection) Levenberg–Marquardt loop — the linear
amplitude is eliminated in closed form and the damped-Newton iteration
runs on the decay rate ALONE; every step is a per-lane VPU op.
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
# Voxels per tile. Re-measured for the VARPRO/exact-Newton loop across
# {1024, 2048, 4096, 8192, 16384, 32768}: 8192 remains fastest — the
# per-block early exit means a block only runs as long as its WORST lane,
# so fine-grained blocks waste less straggler work than big ones, while
# sub-4096 blocks pay more in grid/dispatch overhead than they recover;
# 262144 OOMs the 16 MB scoped VMEM.
_BLOCK_N = 8192


def pallas_supported() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _detect_uniform_x(x) -> bool:
    """True when ``x`` is a CONCRETE, uniformly spaced 1-D grid (>= 3 pts).

    Tracers (kernel called inside an outer jit/shard_map without an explicit
    ``uniform_x``) return False — the generic exp path is always correct.
    """
    import numpy as np

    try:
        xv = np.asarray(x, np.float64)
    except Exception:
        return False
    if xv.ndim != 1 or xv.size < 3:
        return False
    d = np.diff(xv)
    return bool(np.all(np.isfinite(d)) and np.allclose(d, d[0], rtol=1e-5, atol=1e-12))


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
            xtol: float, seed_in_kernel: bool, uniform_x: bool):
    """VARPRO Levenberg–Marquardt: the amplitude ``a`` is LINEAR in the
    model, so it is eliminated in closed form (``a(b) = <y,e>/<e,e>``) and
    the loop iterates on the rate ``b`` ALONE.

    Why this beats the 2-parameter LM loop it replaced: the r2 iteration
    sweep showed fit time is pure iteration count (~1.25 ms/iter, tiny
    intercept), and the worst ~0.1% of lanes — spread ~8 per 8192-voxel
    block, so EVERY block pays — forced ~18-20 iterations, almost all
    spent in the Marquardt lambda dance caused by the strong a-b
    correlation of the joint problem. Projecting out ``a`` removes that
    correlation: the 1-D reduced problem phi(b) = Y2 - t1^2/s1 converges
    in a handful of damped-Newton steps even on the straggler lanes, and
    each iteration is cheaper (scalar damping instead of a 2x2 Cramer
    solve). Both parameterizations share the same least-squares minima,
    so scipy parity is unchanged.

    The loop is damped Newton with the EXACT second derivative of the
    reduced cost — not Gauss-Newton. GN's Hessian drops the residual
    curvature term, so on large-residual (noisy) lanes it converges only
    LINEARLY; the r3 sweep showed ~3% of lanes still needed ~20 GN
    iterations, same as the joint problem. In 1-D the true phi'' costs
    just two extra reductions and restores quadratic convergence on
    every lane.

    VARPRO identities used (all per-voxel (8, L) reductions over T, with
    u = sum y e, u' = sum x y e, u'' = sum x^2 y e, s1 = sum e^2,
    s2 = sum x e^2, s3 = sum x^2 e^2; v = s1, v' = 2 s2, v'' = 4 s3):
      a       = u/s1                      (optimal amplitude)
      phi(b)  = sum (a e - y)^2           (reduced cost, from residuals —
                                           NOT Y2 - u^2/s1, whose f32
                                           cancellation floors resolution)
      phi'    = 2 a (a s2 - u')
      phi''   = 4 a^2 s3 + (8 a s2 (u' - a s2) - 2 u'^2 - 2 u u'') / s1
    """
    y = y_ref[:, 0]  # (T, 8, L) — voxels packed block-locally
    x = x_ref[:, 0]  # (T, 1, 1)
    T = y.shape[0]

    if seed_in_kernel:
        _, b = _seed_polyfit(y, x)
    else:
        # p0's rate seeds the loop; the amplitude seed is redundant under
        # VARPRO (a is closed-form at every iterate) and ignored.
        b = p0_ref[1, 0]

    x0 = x[0]
    dx = x[1] - x[0] if T > 1 else x[0]

    def exp_cols(bb):
        """exp(bb * x_t) for all echoes.

        Uniformly spaced echoes (the MRI norm) factorize as
        ``e_t = exp(b x0) * q^t`` with ``q = exp(b dx)`` — TWO
        transcendentals per evaluation instead of T, and the carried exp
        cache shrinks from T vregs to two (8, L) "scalars" (e0, q). f32
        drift from the repeated multiply is ~3 ulp at T=4 — far below the
        1e-5 convergence tolerances.
        """
        if uniform_x and T > 2:
            eT0 = jnp.exp(bb * x0)
            q = jnp.exp(bb * dx)
            cols = [eT0]
            for _ in range(T - 1):
                cols.append(cols[-1] * q)
            return jnp.stack(cols, axis=0), eT0, q
        e = jnp.exp(bb * x)
        return e, e[0], (e[1] / jnp.maximum(e[0], 1e-38) if T > 1 else e[0])

    def rebuild(eT0, q):
        if uniform_x and T > 2:
            cols = [eT0]
            for _ in range(T - 1):
                cols.append(cols[-1] * q)
            return jnp.stack(cols, axis=0)
        return None  # non-uniform path recomputes exp directly

    # Loop invariants (live in VMEM/vregs, not carried).
    xy = x * y
    xx = x * x
    xxy = xx * y

    def reduced_cost(e):
        """phi(b) = min_a sum (a e - y)^2, evaluated from the ACTUAL
        residuals at the closed-form a — NOT the algebraic shortcut
        ``Y2 - t1^2/s1``, whose f32 cancellation floors cost resolution
        at ~eps*Y2 (~3e-8 here) and latched ~2% of lanes visibly short
        of the optimum."""
        s1 = jnp.maximum(jnp.sum(e * e, axis=0), 1e-30)
        t1 = jnp.sum(y * e, axis=0)
        a = t1 / s1
        r = a * e - y
        c = jnp.sum(r * r, axis=0)
        return jnp.where(jnp.isfinite(c), c, jnp.inf), s1, t1

    e_init, e0c, qc = exp_cols(b)
    cost0, _, t1_0 = reduced_cost(e_init)
    bad_init = (~(jnp.isfinite(cost0) & jnp.isfinite(t1_0))).astype(jnp.float32)

    # Loop state: b, the 2-reg exp cache (e0, q), and ONE merged
    # lam/converged array — |state| is the Marquardt lambda, a NEGATIVE
    # sign latches per-lane convergence. Nonfinite-seed lanes latch at
    # init (their b never changes — proposals are NaN and never accepted —
    # and the final converged flag masks them off either way), so they
    # cannot stall the tile's early exit.
    state = jnp.where(bad_init > 0, -1e-3, 1e-3).astype(jnp.float32)

    def cond(carry):
        it = carry[0]
        state = carry[4]
        # Early exit once every lane in the tile has latched (sign < 0) —
        # with polyfit seeding this cuts the loop to ~3 iterations.
        return (it < max_iter) & (jnp.max(state) > 0)

    def body(carry):
        it, b, e0c, qc, state = carry
        lam = jnp.abs(state)
        e = rebuild(e0c, qc)
        if e is None:
            e, _, _ = exp_cols(b)
        e2 = e * e
        s1 = jnp.maximum(jnp.sum(e2, axis=0), 1e-30)
        s2 = jnp.sum(x * e2, axis=0)
        s3 = jnp.sum(xx * e2, axis=0)
        u = jnp.sum(y * e, axis=0)
        u1 = jnp.sum(xy * e, axis=0)
        u2 = jnp.sum(xxy * e, axis=0)
        inv_s1 = 1.0 / s1
        a = u * inv_s1
        r = a * e - y
        cost = jnp.sum(r * r, axis=0)
        cost = jnp.where(jnp.isfinite(cost), cost, jnp.inf)

        g = a * (a * s2 - u1)  # phi'/2
        phi2 = 4.0 * a * a * s3 + (
            8.0 * a * s2 * (u1 - a * s2) - 2.0 * (u1 * u1 + u * u2)
        ) * inv_s1
        # |phi''| keeps a descent DIRECTION even in locally concave
        # regions (step * phi' < 0 either way); a wrong magnitude there is
        # caught by the acceptance test and the growing lambda.
        D = jnp.maximum(0.5 * jnp.abs(phi2), 1e-30)  # phi'' scale for g = phi'/2
        raw = g / D  # UNDAMPED Newton step — the lam-independent
        # optimality measure: |raw| small means phi' ~ 0 at this b no
        # matter where the lambda dance currently sits. (An earlier
        # lam-gated variant stranded ~2% of lanes: three early rejections
        # push lam past any small gate, after which an at-optimum lane had
        # to climb lam to the 1e2 floor latch — ~11 wasted iterations,
        # paid by every tile those lanes landed in.)
        db = raw / (1.0 + lam)

        new_b = b - db
        new_e, new_e0, new_q = exp_cols(new_b)
        new_cost, _, _ = reduced_cost(new_e)

        # Accept EQUAL cost too: at the optimum the proposal reproduces b
        # exactly and strict `<` would reject forever (the finite guard
        # keeps inf-cost lanes from "accepting" inf proposals).
        accept = (new_cost <= cost) & jnp.isfinite(new_cost)
        rel_decrease = (cost - new_cost) <= ftol * jnp.maximum(cost, 1e-30)
        small_step = jnp.abs(raw) <= xtol * jnp.maximum(jnp.abs(b), 1e-12)
        # scipy's ftol semantics, rejection-proof: when the PREDICTED
        # reduction D*raw^2 falls below ftol*cost, no meaningful progress
        # is possible — latch even if the proposal was (noise-)rejected.
        # Without this, lanes sitting at the f32 cost floor (achievable
        # improvement below cost's own rounding, ~eps*cost) see their
        # proposals coin-flip-rejected while |raw| hovers just above
        # xtol, and grind the lambda ladder for ~10 iterations; that was
        # 2% of lanes — ~8 per 8192-voxel tile, so EVERY tile paid ~20
        # iterations instead of ~4.
        pred_small = (D * raw * raw) <= ftol * jnp.maximum(cost, 1e-30)
        at_floor = (~accept) & (lam >= 1e2)
        # small_step and pred_small latch unconditionally (rejection-proof);
        # only the achieved-reduction ftol test requires an accepted step.
        newly = (accept & rel_decrease) | small_step | pred_small | at_floor

        b = jnp.where(accept, new_b, b)
        e0c = jnp.where(accept, new_e0, e0c)
        qc = jnp.where(accept, new_q, qc)
        # Rejection growth x10 (vs the classic x3): a bad polyfit seed on a
        # fast-decay lane needs lam ~ 2 before its first step is accepted;
        # x3 burns 7 rejections getting there, x10 three. Accepted steps
        # still cut lam x0.33, so the post-overshoot penalty is ~1 step.
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12),
                            jnp.minimum(lam * 10.0, 1e10))
        latched = newly | (state < 0)
        state = jnp.where(latched, -new_lam, new_lam)
        return it + 1, b, e0c, qc, state

    it_final, b, e0c, qc, state = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), b, e0c, qc, state)
    )
    converged = (state < 0).astype(jnp.float32)

    # Recover the closed-form amplitude at the final rate, then r².
    e_f = rebuild(e0c, qc)
    if e_f is None:
        e_f, _, _ = exp_cols(b)
    s1 = jnp.maximum(jnp.sum(e_f * e_f, axis=0), 1e-30)
    a = jnp.sum(y * e_f, axis=0) / s1

    finite = (jnp.isfinite(a) & jnp.isfinite(b)).astype(jnp.float32)
    converged = converged * finite * (1.0 - bad_init)

    r = a * e_f - y
    ss_res = jnp.sum(r * r, axis=0)
    y_mean = jnp.mean(y, axis=0, keepdims=True)
    ss_tot = jnp.sum((y - y_mean) ** 2, axis=0)
    r2 = 1.0 - ss_res / (ss_tot + 1e-8)

    out_ref[:, 0] = jnp.stack([a, b, r2, converged], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter", "ftol", "xtol", "seed_in_kernel", "block_n", "uniform_x"
    ),
)
def _monoexp_impl(yT, x_col, p0, max_iter, ftol, xtol, seed_in_kernel=False,
                  block_n=_BLOCK_N, uniform_x=False):
    T, N = yT.shape
    LB = block_n // 8
    NB = N // block_n
    grid = (NB,)
    # Block-local voxel packing is a CONTIGUOUS split of the voxel axis —
    # a reshape, not a relayout (the old sublane-major global packing cost
    # a full extra HBM round trip each way).
    y4 = yT.reshape(T, NB, 8, LB)
    kernel = functools.partial(
        _kernel, max_iter=max_iter, ftol=ftol, xtol=xtol,
        seed_in_kernel=seed_in_kernel, uniform_x=uniform_x,
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
        "has_bounds", "nan_scipy", "block_n", "uniform_x",
    ),
)
def _monoexp_full(
    y, p0, x, bounds_lo, bounds_hi,
    transpose_y, seed_in_kernel, max_iter, ftol, xtol, has_bounds, nan_scipy,
    block_n=_BLOCK_N, uniform_x=False,
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
    N_pad = ((N + block_n - 1) // block_n) * block_n
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
        yT_pad, x, p0_mat, max_iter, ftol, xtol, seed_in_kernel=seed_in_kernel,
        block_n=block_n, uniform_x=uniform_x,
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
    block_n: int = _BLOCK_N,
    uniform_x=None,
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
    if uniform_x is None:
        uniform_x = _detect_uniform_x(x)
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
        block_n=int(block_n),
        uniform_x=bool(uniform_x),
    )
