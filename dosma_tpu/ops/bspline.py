"""Cubic B-spline free-form deformation (FFD) on TPU.

The deformable transform model of the elastix replacement: a coarse control
grid of 3-D displacements, interpolated with cubic B-spline basis functions
(the classic Rueckert FFD). Evaluation at K sample points is a fully
vectorized gather + weighted sum over the 4x4x4 control neighborhood —
jit/grad-friendly, so the same code serves optimization and resampling.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["bspline_displacement", "make_control_grid", "bending_energy"]


def _cubic_bspline_weights(t: jnp.ndarray):
    """Uniform cubic B-spline basis B0..B3 evaluated at fractional offset t∈[0,1)."""
    t2 = t * t
    t3 = t2 * t
    b0 = (1 - t) ** 3 / 6.0
    b1 = (3 * t3 - 6 * t2 + 4) / 6.0
    b2 = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0
    b3 = t3 / 6.0
    return b0, b1, b2, b3


def make_control_grid(fixed_shape, fixed_affine, grid_spacing_mm: float):
    """Control-grid geometry covering the fixed image domain (+1 margin).

    Returns ``(grid_shape, spacing_vox)``: the control-point counts per
    axis and the control spacing in fixed-image INDEX units (the grid is
    axis-aligned in the fixed index space, so evaluation never needs a
    world-space origin).
    """
    fixed_affine = np.asarray(fixed_affine)
    voxel_spacing = np.sqrt((fixed_affine[:3, :3] ** 2).sum(0))
    spacing_vox = np.maximum(grid_spacing_mm / np.maximum(voxel_spacing, 1e-6), 2.0)
    shape = np.floor(np.asarray(fixed_shape[:3]) / spacing_vox).astype(int) + 4
    shape = np.maximum(shape, 4)
    return tuple(int(s) for s in shape), spacing_vox


def bspline_displacement(
    ctrl: jnp.ndarray, idx_pts: jnp.ndarray, spacing_vox: jnp.ndarray
) -> jnp.ndarray:
    """Displacement (3, K) at fixed-image index coords ``idx_pts`` (3, K).

    ``ctrl``: (3, gx, gy, gz) control displacements (world/mm units).
    The grid is anchored so control point (1,1,1) sits at index (0,0,0)
    (one-cell margin for the cubic support).
    """
    g = jnp.asarray(ctrl)
    _, gx, gy, gz = g.shape

    u = idx_pts / spacing_vox[:, None] + 1.0  # continuous control coords
    i0 = jnp.floor(u).astype(jnp.int32) - 1
    t = u - jnp.floor(u)

    wx = _cubic_bspline_weights(t[0])
    wy = _cubic_bspline_weights(t[1])
    wz = _cubic_bspline_weights(t[2])

    out = jnp.zeros((3, idx_pts.shape[1]), g.dtype)
    for a in range(4):
        ia = jnp.clip(i0[0] + a, 0, gx - 1)
        for b_i in range(4):
            ib = jnp.clip(i0[1] + b_i, 0, gy - 1)
            wab = wx[a] * wy[b_i]
            for c in range(4):
                ic = jnp.clip(i0[2] + c, 0, gz - 1)
                w = wab * wz[c]
                out = out + w[None, :] * g[:, ia, ib, ic]
    return out


def bending_energy(ctrl: jnp.ndarray) -> jnp.ndarray:
    """Discrete bending-energy regularizer (second differences of the grid)."""
    e = 0.0
    for axis in (1, 2, 3):
        d2 = jnp.diff(ctrl, n=2, axis=axis)
        e = e + jnp.mean(d2 * d2)
    return e
