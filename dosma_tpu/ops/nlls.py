"""Batched nonlinear least squares: vectorized Levenberg–Marquardt on TPU.

This is the flagship compute kernel of dosma_tpu. The reference fits each
voxel with a separate ``scipy.optimize.curve_fit`` call in a Python loop
(``/root/reference/dosma/core/fitting.py:853-868`` — ~10^6-10^7 scipy calls
for a full volume, parallelized with multiprocessing). Here the entire voxel
batch is ONE fused XLA computation.

TPU-native layout: the voxel axis N is always the LAST (lane) dimension —
parameters are a tuple of P flat ``(N,)`` vectors, data is ``(T, N)``, and
the P×P normal equations are unrolled into scalar-per-voxel vectors solved
with an unrolled Cholesky. This keeps every tensor padding-free on the
(8,128) VPU tiles (an ``(N, P, P)`` layout pads 64× and OOMs at full volume
size). Jacobian columns come from P forward-mode JVP passes with one-hot
tangents — closed-form for any traceable model, no per-voxel vmap.

Per-voxel trust-region damping, acceptance, and convergence are boolean
masks inside ``lax.while_loop``; divergent iteration counts never touch
host control flow. NaN semantics match the reference: all-zero sequences,
out-of-bounds inputs, or non-converged voxels → NaN params, r² = 0
(ref ``fitting.py:1065-1072``).

Sharding: arrays sharded over the voxel axis with a ``NamedSharding``
compile to data-parallel SPMD untouched — everything here is elementwise
in N or a reduction over the tiny T axis.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["lm_fit", "batched_polyfit", "r_squared"]


def _chol_solve_unrolled(A, b, P: int):
    """Solve P×P SPD systems stored as per-voxel flat vectors.

    ``A``: dict (i,j)->(N,) for j<=i (lower triangle incl. diag);
    ``b``: list of P (N,) vectors. Unrolled Cholesky + two substitutions;
    every op is an (N,)-elementwise VPU op.
    """
    L = {}
    for i in range(P):
        for j in range(i + 1):
            s = A[(i, j)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[(i, j)] = s / L[(j, j)]
    # Forward substitution: L z = b
    z = []
    for i in range(P):
        s = b[i]
        for k in range(i):
            s = s - L[(i, k)] * z[k]
        z.append(s / L[(i, i)])
    # Back substitution: L^T delta = z
    delta = [None] * P
    for i in reversed(range(P)):
        s = z[i]
        for k in range(i + 1, P):
            s = s - L[(k, i)] * delta[k]
        delta[i] = s / L[(i, i)]
    return delta


@functools.partial(jax.jit, static_argnames=("model_fn", "max_iter", "nparams"))
def _lm_fit_impl(
    model_fn: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    p0: Tuple[jnp.ndarray, ...],
    nparams: int,
    max_iter: int,
    ftol: float,
    xtol: float,
):
    """Core LM loop. ``y``: (T, N); ``p0``: tuple of P (N,) vectors.

    ``model_fn(x_col, params)`` maps ((T, 1), tuple of (N,)) → (T, N).
    """
    P = nparams
    dtype = y.dtype
    x_col = x[:, None]

    def predict(params):
        return model_fn(x_col, params)

    def cost_of(params):
        r = predict(params) - y
        return jnp.sum(r * r, axis=0), r

    cost0, _ = cost_of(p0)
    bad_init = ~jnp.isfinite(cost0)
    N = y.shape[1]

    init_state = dict(
        params=tuple(p0),
        cost=jnp.where(bad_init, jnp.inf, cost0),
        lam=jnp.full((N,), 1e-3, dtype),
        converged=jnp.zeros((N,), bool),
        it=jnp.array(0, jnp.int32),
    )

    def cond(state):
        return (state["it"] < max_iter) & ~jnp.all(state["converged"])

    def body(state):
        params, cost, lam, converged = (
            state["params"], state["cost"], state["lam"], state["converged"],
        )
        r = predict(params) - y  # (T, N)

        # Jacobian columns via P forward-mode passes with one-hot tangents.
        cols = []
        for i in range(P):
            tangents = tuple(
                jnp.ones_like(params[j]) if j == i else jnp.zeros_like(params[j])
                for j in range(P)
            )
            _, Ji = jax.jvp(predict, (params,), (tangents,))
            cols.append(Ji)  # (T, N)

        # Normal equations, flat per-voxel (no (N,P,P) tensors → no padding).
        JtJ = {}
        for i in range(P):
            for j in range(i + 1):
                JtJ[(i, j)] = jnp.sum(cols[i] * cols[j], axis=0)
        Jtr = [jnp.sum(cols[i] * r, axis=0) for i in range(P)]

        # Marquardt damping on the diagonal (scale-invariant).
        A = dict(JtJ)
        for i in range(P):
            A[(i, i)] = JtJ[(i, i)] + lam * jnp.maximum(JtJ[(i, i)], 1e-12)

        delta = _chol_solve_unrolled(A, Jtr, P)
        new_params = tuple(params[i] - delta[i] for i in range(P))
        new_cost, _ = cost_of(new_params)
        new_cost = jnp.where(jnp.isfinite(new_cost), new_cost, jnp.inf)

        accept = new_cost < cost

        # scipy-parity convergence, recorded as a flag only — voxels are never
        # frozen (the SIMD batch keeps polishing them for free):
        #  - ftol: accepted step with relative cost decrease below ftol
        #  - xtol: accepted step with relative parameter step below xtol
        # Rejected steps never count (under heavy damping, deltas shrink for
        # damping reasons, not optimality) — except when pinned at the f32
        # cost floor (lam blown up), which is indistinguishable from optimal.
        rel_decrease = (cost - new_cost) <= ftol * jnp.maximum(cost, 1e-30)
        step_ratio = jnp.zeros_like(cost)
        for i in range(P):
            step_ratio = jnp.maximum(
                step_ratio, jnp.abs(delta[i]) / jnp.maximum(jnp.abs(params[i]), 1e-12)
            )
        small_step = step_ratio <= xtol
        # Tiny proposed step under low damping = pinned at the optimum,
        # whether or not the step is accepted.
        gn_small = small_step & (lam <= 1e-2)
        at_floor = ~accept & (lam >= 1e2)
        newly_converged = accept & (rel_decrease | small_step) | gn_small | at_floor

        params = tuple(jnp.where(accept, new_params[i], params[i]) for i in range(P))
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12), jnp.minimum(lam * 3.0, 1e10))
        converged = converged | newly_converged

        return dict(params=params, cost=cost, lam=lam, converged=converged, it=state["it"] + 1)

    state = jax.lax.while_loop(cond, body, init_state)

    params = state["params"]
    finite = jnp.ones((N,), bool)
    for i in range(P):
        finite = finite & jnp.isfinite(params[i])
    converged = state["converged"] & finite & ~bad_init

    # r² goodness of fit.
    r = predict(params) - y
    ss_res = jnp.sum(r * r, axis=0)
    ss_tot = jnp.sum((y - jnp.mean(y, axis=0, keepdims=True)) ** 2, axis=0)
    r2 = 1.0 - ss_res / (ss_tot + 1e-8)

    popt = jnp.stack(params, axis=-1)  # (N, P) — host-bound output, padding ok
    return popt, r2, converged


def lm_fit(
    model_fn: Callable,
    x,
    y,
    p0,
    max_iter: int = 50,
    ftol: float = 1e-5,
    xtol: float = 1e-5,
    y_bounds: Optional[Tuple[float, float]] = None,
    nan_policy: str = "scipy",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched Levenberg–Marquardt fit.

    Args:
        model_fn: ``f(x_col, params)`` with ``x_col`` (T, 1) and ``params`` a
            tuple of P (N,) vectors → (T, N). Must be jax-traceable and obey
            numpy broadcasting (any scipy-style scalar model qualifies after
            the standard wrapping in :mod:`dosma_tpu.core.fitting`).
        x: (T,) independent variable.
        y: (N, T) dependent data (one row per voxel).
        p0: (N, P) or (P,) initial guesses.
        max_iter: maximum LM iterations (analog of scipy ``maxfev``).
        ftol: relative cost-decrease convergence tolerance (scipy parity).
        xtol: relative step-size convergence tolerance.
        y_bounds: optional (lo, hi); sequences with any observation outside
            the range are not fit (NaN params, r²=0) — ref ``fitting.py:1065``.
        nan_policy: "scipy" → non-converged voxels get NaN params and r²=0
            (matches per-voxel scipy RuntimeError handling); "keep" → return
            best-effort params for all voxels.

    Returns:
        (popt (N, P), r2 (N,), converged (N,)) as jax arrays.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if y.dtype not in (jnp.float32, jnp.float64):
        y = y.astype(jnp.float32)
    x = x.astype(y.dtype)
    N, T = y.shape

    p0 = jnp.asarray(p0, dtype=y.dtype)
    if p0.ndim == 1:
        P = p0.shape[0]
        p0_t = tuple(jnp.full((N,), p0[i], y.dtype) for i in range(P))
    else:
        P = p0.shape[1]
        p0_t = tuple(p0[:, i] for i in range(P))

    yT = y.T  # (T, N): voxel axis last
    popt, r2, converged = _lm_fit_impl(
        model_fn, x, yT, p0_t, P, int(max_iter), float(ftol), float(xtol)
    )

    # Invalid-input handling (scipy-parity semantics).
    all_zero = jnp.all(y == 0, axis=-1)
    invalid = all_zero
    if y_bounds is not None:
        oob = jnp.any((y < y_bounds[0]) | (y > y_bounds[1]), axis=-1)
        invalid = invalid | oob

    if nan_policy == "scipy":
        bad = invalid | ~converged
    else:
        bad = invalid
    popt = jnp.where(bad[:, None], jnp.nan, popt)
    r2 = jnp.where(bad, 0.0, r2)
    return popt, r2, converged


def r_squared(yhat: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-8, axis: int = 0) -> jnp.ndarray:
    """Vectorized r² (ref ``fitting.py:926-944``)."""
    residuals = yhat - y
    ss_res = jnp.sum(residuals**2, axis=axis)
    ss_tot = jnp.sum((y - jnp.mean(y, axis=axis, keepdims=True)) ** 2, axis=axis)
    return 1 - (ss_res / (ss_tot + eps))


@functools.partial(jax.jit, static_argnames=("deg",))
def batched_polyfit(x, y, deg: int):
    """Vandermonde least-squares polyfit of all sequences at once.

    x: (T,), y: (T, N). Returns (popts (deg+1, N) highest power first,
    r2 (N,)). The single joint solve mirrors ``np.polyfit`` semantics
    (ref ``fitting.py:975-984``); r² is a matmul (ref ``:926-944``).

    deg==1 (the relaxometry-seeding hot path) uses the closed-form linear
    regression — one fused pass over the data instead of an SVD solve.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.promote_types(y.dtype, jnp.float32)
    x = x.astype(dtype)
    y = y.astype(dtype)

    if deg == 1:
        T = x.shape[0]
        x_mean = jnp.mean(x)
        xc = x - x_mean  # (T,)
        sxx = jnp.sum(xc * xc)
        y_mean = jnp.mean(y, axis=0)  # (N,)
        # xc sums to zero, so xc @ (y - y_mean) == xc @ y. Full-f32
        # precision: TPU matmuls default to bf16 inputs, which costs ~1e-3
        # relative slope error — visible in np.polyfit parity.
        slope = jnp.matmul(xc, y, precision=jax.lax.Precision.HIGHEST) / sxx
        intercept = y_mean - slope * x_mean
        popts = jnp.stack([slope, intercept], axis=0)
        yhat = x[:, None] * slope[None, :] + intercept[None, :]
        return popts, r_squared(yhat, y, axis=0)

    V = jnp.stack([x**i for i in range(deg, -1, -1)], axis=-1)  # (T, deg+1)
    popts, *_ = jnp.linalg.lstsq(V, y, rcond=None)  # (deg+1, N)
    yhat = jnp.matmul(V, popts, precision=jax.lax.Precision.HIGHEST)
    r2 = r_squared(yhat, y, axis=0)
    return popts, r2
