"""Analytic quantitative-MRI kernels (jit-compiled).

The qDESS analytic T2 computation (Sveinsson et al., MRM 2017) is pure array
math in the reference (``/root/reference/dosma/scan_sequences/mri/qdess.py:199-244``)
— here it is one fused XLA kernel: ratio, log, bounds masking, fat/fluid
suppression all fuse into a single pass over HBM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["qdess_t2_map", "rss_combine", "rms_combine"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "suppress_fat", "suppress_fluid", "use_nan_bounds", "use_nan_to_num", "decimals",
    ),
)
def _qdess_t2_impl(
    echo_1,
    echo_2,
    k_term,
    c1_term,
    tr_minus_te,
    beta,
    nan_lower,
    nan_upper,
    nan_fill,
    suppress_fat: bool,
    suppress_fluid: bool,
    use_nan_bounds: bool,
    use_nan_to_num: bool,
    decimals: Optional[int],
):
    ratio = jnp.nan_to_num(echo_2 / echo_1)
    t2map = -2000.0 * tr_minus_te / (jnp.log(jnp.abs(ratio) / k_term) + c1_term)
    t2map = jnp.nan_to_num(t2map)

    if use_nan_bounds:
        t2map = jnp.where((t2map < nan_lower) | (t2map > nan_upper), jnp.nan, t2map)
    if use_nan_to_num:
        t2map = jnp.nan_to_num(t2map, nan=nan_fill)
    if decimals is not None:
        t2map = jnp.around(t2map, decimals)

    if suppress_fat:
        t2map = t2map * (echo_1 > 0.15 * jnp.max(echo_1))
    if suppress_fluid:
        vol_null_fluid = echo_1 - beta * echo_2
        t2map = t2map * (vol_null_fluid > 0.1 * jnp.max(vol_null_fluid))
    return t2map


def qdess_t2_map(
    echo_1,
    echo_2,
    tr: float,
    te: float,
    tg: float,
    alpha: float,
    gl_area: float,
    t1: float,
    diffusivity: float = 1.25e-9,
    beta: float = 1.2,
    nan_bounds: Optional[Tuple[float, float]] = (0, 100),
    nan_to_num: Optional[float] = 0.0,
    decimals: Optional[int] = 1,
    suppress_fat: bool = False,
    suppress_fluid: bool = False,
):
    """Analytic qDESS T2 map (ms).

    Args mirror the reference physics (``qdess.py:188-244``): ``tr``/``te``/
    ``t1`` in ms, ``tg`` in microseconds, ``alpha`` in degrees, ``gl_area``
    spoiler area. Returns a jax array shaped like ``echo_1``.
    """
    TR = float(tr) * 1e-3
    TE = float(te) * 1e-3
    Tg = float(tg) * 1e-6
    T1 = float(t1) * 1e-3
    alpha_rad = math.radians(float(alpha))

    Gl = gl_area / (Tg * 1e6) * 100
    gamma = 4258 * 2 * math.pi  # rad / (G * s)
    dkL = gamma * Gl * Tg

    decay = math.exp(-TR / T1 - TR * (dkL**2) * diffusivity)
    k = (math.sin(alpha_rad / 2) ** 2) * (1 + decay) / (1 - math.cos(alpha_rad) * decay)
    c1 = (TR - Tg / 3) * (dkL**2) * diffusivity

    echo_1 = jnp.asarray(echo_1)
    echo_2 = jnp.asarray(echo_2)
    dtype = jnp.promote_types(echo_1.dtype, jnp.float32)
    echo_1 = echo_1.astype(dtype)
    echo_2 = echo_2.astype(dtype)

    use_nan_bounds = nan_bounds is not None
    lower, upper = nan_bounds if use_nan_bounds else (0.0, 0.0)
    use_nan_to_num = nan_to_num is not None
    nan_fill = float(nan_to_num) if use_nan_to_num and not isinstance(nan_to_num, bool) else 0.0

    return _qdess_t2_impl(
        echo_1,
        echo_2,
        jnp.asarray(k, dtype),
        jnp.asarray(c1, dtype),
        jnp.asarray(TR - TE, dtype),
        jnp.asarray(beta, dtype),
        jnp.asarray(lower, dtype),
        jnp.asarray(upper, dtype),
        jnp.asarray(nan_fill, dtype),
        bool(suppress_fat),
        bool(suppress_fluid),
        use_nan_bounds,
        use_nan_to_num,
        None if decimals is None else int(decimals),
    )


@jax.jit
def rss_combine(echo_1, echo_2):
    """Root-sum-of-squares of two echoes (ref ``qdess.py:254-295``)."""
    e1 = jnp.asarray(echo_1, jnp.float32)
    e2 = jnp.asarray(echo_2, jnp.float32)
    return jnp.sqrt(e1 * e1 + e2 * e2)


@jax.jit
def rms_combine(echo_1, echo_2):
    """Root-mean-square of two echoes."""
    e1 = jnp.asarray(echo_1, jnp.float32)
    e2 = jnp.asarray(echo_2, jnp.float32)
    return jnp.sqrt((e1 * e1 + e2 * e2) / 2)
