"""Fully device-resident monoexponential relaxometry pipeline.

``MonoExponentialFit`` semantics (ref ``fitting.py:607-749``) as ONE device
program: log-linear polyfit seeding, the fused Pallas LM kernel, the
rate→time-constant transform, out-of-bounds/r²-threshold NaN masking,
``nan_to_num`` and rounding — with exactly one host→device transfer of the
echo data and one device→host transfer of (tc_map, r²). The facade path
otherwise round-trips hundreds of MB per stage.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["monoexp_fit_full"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_polyfit_seed", "max_iter", "decimals", "has_mask", "uniform_x"
    ),
)
def _monoexp_pipeline(
    x, yT, mask_flat, tc0_b, lb, ub, r2_threshold, nan_fill,
    use_polyfit_seed: bool, max_iter: int, decimals: Optional[int], has_mask: bool,
    uniform_x: bool = False,
):
    from dosma_tpu.ops.monoexp_pallas import monoexp_lm_pallas

    T, N = yT.shape

    if use_polyfit_seed:
        # ref ``fitting.py:701-718``: deg-1 polyfit on log(y), computed
        # INSIDE the Pallas kernel from the VMEM-resident y tile (p0=None)
        # — zero extra HBM traffic for the seed. The kernel clamps each
        # voxel to a RELATIVE floor (1e-3 of its peak): noisy echoes can
        # dip <= 0, and an absolute clamp of log(1e-10) = -23 produces
        # runaway seeds that overflow the f32 LM loop into NaN.
        p0 = None
    else:
        p0 = jnp.stack(
            [jnp.ones((N,), yT.dtype), jnp.full((N,), tc0_b, yT.dtype)], axis=-1
        )

    popt, r2, _conv = monoexp_lm_pallas(
        x, yT, p0, max_iter=max_iter, y_layout="tn", uniform_x=uniform_x
    )

    # rate → time constant (out_ufunc 1/|b|), bounds, r² threshold, nan fill.
    tc = 1.0 / jnp.abs(popt[:, 1])
    tc = jnp.where((tc < lb) | (tc > ub), jnp.nan, tc)
    tc = jnp.where(r2 < r2_threshold, jnp.nan, tc)
    if has_mask:
        tc = jnp.where(mask_flat > 0, tc, jnp.nan)
        r2 = jnp.where(mask_flat > 0, r2, nan_fill)
    tc = jnp.nan_to_num(tc, nan=nan_fill)
    if decimals is not None:
        tc = jnp.around(tc, decimals)
    return tc, r2


def monoexp_fit_full(
    x,
    yT,
    bounds: Tuple[float, float],
    tc0,
    r2_threshold: float,
    decimal_precision: Optional[int],
    mask_flat=None,
    nan_fill: float = 0.0,
    max_iter: int = 100,
):
    """Run the complete monoexp relaxometry fit on device.

    Args:
        x: (T,) echo/spin-lock times.
        yT: (T, N) echo data (host or device array).
        bounds: (lb, ub) time-constant bounds → NaN outside.
        tc0: initial tc guess or ``"polyfit"``.
        r2_threshold: minimum r² (below → NaN).
        decimal_precision: rounding decimals (None = no rounding).
        mask_flat: optional (N,) mask; voxels outside get ``nan_fill``.
        nan_fill: value replacing NaNs (reference default 0.0).

    Returns:
        (tc_map (N,), r2 (N,)) jax arrays.
    """
    from dosma_tpu.ops.monoexp_pallas import _detect_uniform_x

    uniform_x = _detect_uniform_x(x)  # x is concrete here (pre-jit)
    yT = jnp.asarray(yT)
    if yT.dtype != jnp.float32:
        yT = yT.astype(jnp.float32)
    x = jnp.asarray(x, jnp.float32)

    use_polyfit = isinstance(tc0, str) and tc0 == "polyfit"
    tc0_b = jnp.asarray(0.0 if use_polyfit else -1.0 / float(tc0), jnp.float32)

    has_mask = mask_flat is not None
    mask_arg = (
        jnp.asarray(mask_flat, jnp.float32) if has_mask else jnp.zeros((1,), jnp.float32)
    )
    lb, ub = bounds
    return _monoexp_pipeline(
        x, yT, mask_arg, tc0_b,
        jnp.asarray(lb, jnp.float32), jnp.asarray(ub, jnp.float32),
        jnp.asarray(-jnp.inf if r2_threshold is None else r2_threshold, jnp.float32),
        jnp.asarray(nan_fill, jnp.float32),
        use_polyfit, int(max_iter),
        None if decimal_precision is None else int(decimal_precision),
        has_mask,
        uniform_x,
    )
