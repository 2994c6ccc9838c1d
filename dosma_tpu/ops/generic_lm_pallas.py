"""Pallas TPU kernel: VMEM-resident Levenberg–Marquardt for ANY traceable
small-P model.

The generic engine (:mod:`dosma_tpu.ops.nlls.lm_fit`) re-reads ``y`` from
HBM every LM iteration — ~`T*N*4` bytes x ~15 iterations for a full
volume. The fused monoexp/biexp kernels fixed that for the two library
models; this kernel closes the gap for EVERY jax-traceable model with
P <= 4 parameters (VERDICT r4 item 6): each voxel tile stays resident in
VMEM for the whole fit, HBM traffic is one read of ``y`` and one write of
the packed result.

How it generalizes: the model function is traced INSIDE the kernel body —
Jacobian columns come from P forward-mode ``jax.jvp`` passes with one-hot
tangents (transforms compose with Pallas because they run at trace time,
before Mosaic lowering), the P x P normal equations live as per-lane
``(8, L)`` "scalars" (no (N, P, P) padding), and the damped system solves
with the same unrolled Cholesky the HBM engine uses
(:func:`dosma_tpu.ops.nlls._chol_solve_unrolled`).

Iteration policy, convergence flags, and NaN semantics are bit-compatible
with :func:`dosma_tpu.ops.nlls.lm_fit` (same damping ladder, same
ftol/xtol latches), so the curve_fit facade can route by backend without
changing results beyond f32 noise.

Models whose ops do not lower to Mosaic (gathers, host callbacks, ...)
raise at compile time; :func:`dosma_tpu.core.fitting.curve_fit` catches
that and falls back to the HBM engine.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dosma_tpu.ops.monoexp_pallas import pallas_supported
from dosma_tpu.ops.nlls import _chol_solve_unrolled

__all__ = ["generic_lm_pallas", "pallas_supported"]

# Voxels per tile. Smaller than monoexp's 8192: the generic loop carries
# P parameter planes + P Jacobian columns of (T, 8, L) each, so the VMEM
# footprint per lane is ~P+1 times the monoexp kernel's.
_BLOCK_N = 8192
MAX_P = 4


def _kernel(x_ref, y_ref, p0_ref, out_ref, *, model_fn, nparams: int,
            max_iter: int, ftol: float, xtol: float):
    P = nparams
    y = y_ref[:, 0]  # (T, 8, L)
    x = x_ref[:, 0]  # (T, 1, 1)

    params = tuple(p0_ref[i, 0] for i in range(P))  # P x (8, L)

    def predict(ps):
        return model_fn(x, ps)

    def cost_of(ps):
        r = predict(ps) - y
        c = jnp.sum(r * r, axis=0)
        return jnp.where(jnp.isfinite(c), c, jnp.inf)

    cost0 = cost_of(params)
    bad_init = ~jnp.isfinite(cost0)

    # Merged lam/converged state: |state| = Marquardt lambda, sign latches
    # convergence (the monoexp kernel's trick — one (8, L) register fewer
    # in the carry, and the tile early-exits on jnp.max(state) <= 0).
    state0 = jnp.where(bad_init, -1e-3, 1e-3).astype(jnp.float32)
    cost_init = jnp.where(bad_init, jnp.inf, cost0)

    def cond(carry):
        it, _, _, state = carry
        return (it < max_iter) & (jnp.max(state) > 0)

    def body(carry):
        it, params, cost, state = carry
        lam = jnp.abs(state)

        r = predict(params) - y  # (T, 8, L)

        # Jacobian columns: P forward-mode passes, one-hot tangents.
        cols = []
        for i in range(P):
            tangents = tuple(
                jnp.ones_like(params[j]) if j == i else jnp.zeros_like(params[j])
                for j in range(P)
            )
            _, Ji = jax.jvp(predict, (params,), (tangents,))
            cols.append(Ji)

        JtJ = {}
        for i in range(P):
            for j in range(i + 1):
                JtJ[(i, j)] = jnp.sum(cols[i] * cols[j], axis=0)
        Jtr = [jnp.sum(cols[i] * r, axis=0) for i in range(P)]

        A = dict(JtJ)
        for i in range(P):
            A[(i, i)] = JtJ[(i, i)] + lam * jnp.maximum(JtJ[(i, i)], 1e-12)

        delta = _chol_solve_unrolled(A, Jtr, P)
        new_params = tuple(params[i] - delta[i] for i in range(P))
        new_cost = cost_of(new_params)

        accept = new_cost < cost
        rel_decrease = (cost - new_cost) <= ftol * jnp.maximum(cost, 1e-30)
        step_ratio = jnp.zeros_like(cost)
        for i in range(P):
            step_ratio = jnp.maximum(
                step_ratio, jnp.abs(delta[i]) / jnp.maximum(jnp.abs(params[i]), 1e-12)
            )
        small_step = step_ratio <= xtol
        gn_small = small_step & (lam <= 1e-2)
        at_floor = ~accept & (lam >= 1e2)
        newly = accept & (rel_decrease | small_step) | gn_small | at_floor

        params = tuple(jnp.where(accept, new_params[i], params[i]) for i in range(P))
        cost = jnp.where(accept, new_cost, cost)
        new_lam = jnp.where(
            accept, jnp.maximum(lam * 0.33, 1e-12), jnp.minimum(lam * 3.0, 1e10)
        )
        latched = newly | (state < 0)
        state = jnp.where(latched, -new_lam, new_lam)
        return it + 1, params, cost, state

    _, params, _, state = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), params, cost_init, state0)
    )
    converged = (state < 0).astype(jnp.float32)

    finite = jnp.ones_like(converged)
    for i in range(P):
        finite = finite * jnp.isfinite(params[i]).astype(jnp.float32)
    converged = converged * finite * (1.0 - bad_init.astype(jnp.float32))

    r = predict(params) - y
    ss_res = jnp.sum(r * r, axis=0)
    y_mean = jnp.mean(y, axis=0, keepdims=True)
    ss_tot = jnp.sum((y - y_mean) ** 2, axis=0)
    r2 = 1.0 - ss_res / (ss_tot + 1e-8)

    out_ref[:, 0] = jnp.stack(list(params) + [r2, converged], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("model_fn", "nparams", "max_iter", "ftol", "xtol", "block_n"),
)
def _generic_impl(yT, x_col, p0, model_fn, nparams, max_iter, ftol, xtol,
                  block_n=_BLOCK_N):
    T, N = yT.shape
    P = nparams
    LB = block_n // 8
    NB = N // block_n
    y4 = yT.reshape(T, NB, 8, LB)
    p4 = p0.reshape(P, NB, 8, LB)
    kernel = functools.partial(
        _kernel, model_fn=model_fn, nparams=P,
        max_iter=max_iter, ftol=ftol, xtol=xtol,
    )
    out_rows = P + 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, NB, 8, LB), jnp.float32),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((T, 1, 1, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, 1, 8, LB), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=(20 + 10 * P * P) * max_iter * N,
            bytes_accessed=yT.size * 4 + out_rows * N * 4,
            transcendentals=2 * P * max_iter * N,
        ),
    )(x_col.reshape(T, 1, 1, 1), y4, p4)
    return out.reshape(out_rows, N)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_fn", "nparams", "transpose_y", "max_iter", "ftol", "xtol",
        "has_bounds", "nan_scipy", "block_n",
    ),
)
def _generic_full(
    y, p0, x, bounds_lo, bounds_hi, pad_seed,
    model_fn, nparams, transpose_y, max_iter, ftol, xtol, has_bounds,
    nan_scipy, block_n=_BLOCK_N,
):
    """Layout + padding + kernel + NaN policy as ONE jitted program
    (single dispatch — the monoexp harness's policy)."""
    P = nparams
    yT = y.T if transpose_y else y  # (T, N)
    if yT.dtype != jnp.float32:
        yT = yT.astype(jnp.float32)
    T, N = yT.shape

    N_pad = ((N + block_n - 1) // block_n) * block_n
    if N_pad > N:
        # Pad lanes carry the model AT the pad seed so their first
        # residual is zero and they latch on iteration 1 without stalling
        # the tile's early exit.
        pad_y = jnp.broadcast_to(
            model_fn(x[:, None], tuple(pad_seed[i, None] for i in range(P))),
            (T, N_pad - N),
        )
        yT_pad = jnp.concatenate([yT, pad_y.astype(jnp.float32)], axis=1)
        p0_mat = jnp.concatenate(
            [p0, jnp.broadcast_to(pad_seed[:, None], (P, N_pad - N))], axis=1
        )
    else:
        yT_pad, p0_mat = yT, p0

    out = _generic_impl(
        yT_pad, x, p0_mat, model_fn, P, max_iter, ftol, xtol, block_n=block_n
    )

    popt = out[:P, :N].T  # (N, P)
    r2 = out[P, :N]
    converged = out[P + 1, :N] > 0.5

    invalid = jnp.all(yT == 0, axis=0)
    if has_bounds:
        oob = jnp.any((yT < bounds_lo) | (yT > bounds_hi), axis=0)
        invalid = invalid | oob

    bad = invalid | (~converged) if nan_scipy else invalid
    popt = jnp.where(bad[:, None], jnp.nan, popt)
    r2 = jnp.where(bad, 0.0, r2)
    return popt, r2, converged


def generic_lm_pallas(
    model_fn: Callable,
    x,
    y,
    p0,
    max_iter: int = 50,
    ftol: float = 1e-5,
    xtol: float = 1e-5,
    y_bounds: Optional[Tuple[float, float]] = None,
    nan_policy: str = "scipy",
    y_layout: str = "nt",
    block_n: int = _BLOCK_N,
):
    """VMEM-resident LM fit of an arbitrary traceable model (P <= 4).

    Same contract as :func:`dosma_tpu.ops.nlls.lm_fit`: ``model_fn(x_col,
    params)`` maps ``((T, 1), tuple of P arrays)`` to ``(T, ...)`` under
    numpy broadcasting; ``y`` is (N, T) (or (T, N) with
    ``y_layout="tn"``); returns ``(popt (N, P), r2 (N,), converged (N,))``.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y)
    p0 = jnp.asarray(p0, jnp.float32)
    if p0.ndim == 1:
        P = int(p0.shape[0])
        N = y.shape[1] if y_layout == "tn" else y.shape[0]
        pad_seed = p0
        p0_mat = jnp.broadcast_to(p0[:, None], (P, N))
    else:
        P = int(p0.shape[1])
        pad_seed = p0[0]
        p0_mat = p0.T
    if P > MAX_P:
        raise ValueError(f"generic_lm_pallas supports P <= {MAX_P}, got {P}")
    lo, hi = (y_bounds if y_bounds is not None else (0.0, 0.0))
    return _generic_full(
        y, p0_mat, x,
        jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32), pad_seed,
        model_fn=model_fn, nparams=P,
        transpose_y=(y_layout != "tn"),
        max_iter=int(max_iter), ftol=float(ftol), xtol=float(xtol),
        has_bounds=y_bounds is not None,
        nan_scipy=(nan_policy == "scipy"),
        block_n=int(block_n),
    )
