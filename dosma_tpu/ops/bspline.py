"""Cubic B-spline free-form deformation (FFD) on TPU.

The deformable transform model of the elastix replacement: a coarse control
grid of 3-D displacements, interpolated with cubic B-spline basis functions
(the classic Rueckert FFD). Evaluation at K sample points is a fully
vectorized gather + weighted sum over the 4x4x4 control neighborhood —
jit/grad-friendly, so the same code serves optimization and resampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bspline_displacement",
    "make_control_grid",
    "bending_energy",
    "subdivide_control_grid",
]


def _cubic_bspline_weights(t: jnp.ndarray):
    """Uniform cubic B-spline basis B0..B3 evaluated at fractional offset t∈[0,1)."""
    t2 = t * t
    t3 = t2 * t
    b0 = (1 - t) ** 3 / 6.0
    b1 = (3 * t3 - 6 * t2 + 4) / 6.0
    b2 = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0
    b3 = t3 / 6.0
    return b0, b1, b2, b3


def make_control_grid(fixed_shape, fixed_affine, grid_spacing_mm: float,
                      grid_spacing_vox=None):
    """Control-grid geometry covering the fixed image domain (+1 margin).

    Returns ``(grid_shape, spacing_vox)``: the control-point counts per
    axis and the control spacing in fixed-image INDEX units (the grid is
    axis-aligned in the fixed index space, so evaluation never needs a
    world-space origin). ``grid_spacing_vox`` (scalar or per-axis, in
    voxel units — elastix's FinalGridSpacingInVoxels) overrides the
    physical-unit spacing when given.
    """
    fixed_affine = np.asarray(fixed_affine)
    if grid_spacing_vox is not None:
        spacing_vox = np.maximum(
            np.broadcast_to(np.asarray(grid_spacing_vox, float), (3,)).copy(), 2.0
        )
    else:
        voxel_spacing = np.sqrt((fixed_affine[:3, :3] ** 2).sum(0))
        spacing_vox = np.maximum(grid_spacing_mm / np.maximum(voxel_spacing, 1e-6), 2.0)
    shape = np.floor(np.asarray(fixed_shape[:3]) / spacing_vox).astype(int) + 4
    shape = np.maximum(shape, 4)
    return tuple(int(s) for s in shape), spacing_vox


_DENSE_MAX_POINTS = 65536  # evaluate dense (MXU) up to this K; slab above


def _basis_profile(u: jnp.ndarray, g: int) -> jnp.ndarray:
    """Dense cubic B-spline basis profile (K, g) for continuous control
    coords ``u`` (K,): row k holds the 4 non-zero basis weights scattered
    onto their control indices by one-hot comparison (clipped to the
    border, replicating edge control points exactly like the gather
    formulation this replaced).
    """
    i0 = jnp.floor(u).astype(jnp.int32) - 1
    w = _cubic_bspline_weights(u - jnp.floor(u))
    iota = jnp.arange(g, dtype=jnp.int32)
    W = jnp.zeros((u.shape[0], g), u.dtype)
    for a in range(4):
        ia = jnp.clip(i0 + a, 0, g - 1)
        W = W + (iota[None, :] == ia[:, None]) * w[a][:, None]
    return W


def bspline_displacement(
    ctrl: jnp.ndarray, idx_pts: jnp.ndarray, spacing_vox: jnp.ndarray
) -> jnp.ndarray:
    """Displacement (3, K) at fixed-image index coords ``idx_pts`` (3, K).

    ``ctrl``: (3, gx, gy, gz) control displacements (world/mm units).
    The grid is anchored so control point (1,1,1) sits at index (0,0,0)
    (one-cell margin for the cubic support).

    Evaluated as THREE dense per-axis basis contractions (einsum over the
    full — tiny — control grid) rather than 64 neighborhood gathers: on
    TPU the dense form runs on the MXU/VPU and, critically, its VJP with
    respect to ``ctrl`` is the TRANSPOSED contraction (a dense matmul)
    instead of 64 scatter-adds per optimization step — scatter is the
    slowest XLA primitive on TPU and dominated the FFD stage's wall time.
    Large K (full-grid warps) runs in fixed-size slabs to bound the
    (K, gx·gy) intermediates.
    """
    g = jnp.asarray(ctrl)
    K = idx_pts.shape[1]
    if K > _DENSE_MAX_POINTS:
        chunk = _DENSE_MAX_POINTS
        nc = -(-K // chunk)
        pad = nc * chunk - K
        p = jnp.pad(idx_pts, ((0, 0), (0, pad)))
        slabs = p.reshape(3, nc, chunk).transpose(1, 0, 2)
        out = jax.lax.map(lambda s: _bspline_disp_dense(g, s, spacing_vox), slabs)
        return out.transpose(1, 0, 2).reshape(3, -1)[:, :K]
    return _bspline_disp_dense(g, idx_pts, spacing_vox)


def _bspline_disp_dense(g, idx_pts, spacing_vox):
    u = idx_pts / spacing_vox[:, None] + 1.0  # continuous control coords
    _, gx, gy, gz = g.shape
    Wx = _basis_profile(u[0], gx)  # (K, gx)
    Wy = _basis_profile(u[1], gy)
    Wz = _basis_profile(u[2], gz)
    # f32-faithful contractions (repo convention for registration matmuls,
    # see ops/registration.py _mm): the default bf16 multiplies cost ~3
    # decimal digits on O(1) control displacements AND degrade the VJP
    # driving the ctrl gradients.
    hi = jax.lax.Precision.HIGHEST
    A = jnp.einsum("kz,cxyz->ckxy", Wz, g, precision=hi)
    B = jnp.einsum("ky,ckxy->ckx", Wy, A, precision=hi)
    return jnp.einsum("kx,ckx->ck", Wx, B, precision=hi)


def _subdivide_axis(c: jnp.ndarray, n_new: int) -> jnp.ndarray:
    """Halve the control spacing along the LAST axis by exact cubic
    B-spline knot insertion (Lane–Riesenfeld midpoint rules).

    With the grid anchored so control index 1 sits at image index 0, old
    control ``i`` lives at image ``(i-1)*s`` and new control ``j`` at
    ``(j-1)*s/2`` — so new ODD indices coincide with old knots (vertex
    rule ``(c[i-1] + 6 c[i] + c[i+1]) / 8``) and new EVEN indices are old
    midpoints (edge rule ``(c[i] + c[i+1]) / 2``). Edge replication
    matches the clipped border of :func:`_basis_profile`.
    """
    pad = [(0, 0)] * (c.ndim - 1) + [(1, 1)]
    cp = jnp.pad(c, pad, mode="edge")
    v = (cp[..., :-2] + 6.0 * cp[..., 1:-1] + cp[..., 2:]) / 8.0  # vertex_i
    e = (cp[..., 1:-1] + cp[..., 2:]) / 2.0  # edge_i = mid(c_i, c_{i+1})
    n = c.shape[-1]
    # Interleave [e_0, v_1, e_1, v_2, ..., v_{n-1}, e_{n-1}] (length 2n-1);
    # index j: even -> e_{j/2}, odd -> v_{(j+1)/2}.
    pairs = jnp.stack([e[..., : n - 1], v[..., 1:]], axis=-1)
    out = jnp.concatenate(
        [pairs.reshape(*c.shape[:-1], 2 * (n - 1)), e[..., -1:]], axis=-1
    )
    if n_new > out.shape[-1]:  # only when the coarse grid was all margin
        extra = n_new - out.shape[-1]
        out = jnp.concatenate([out] + [out[..., -1:]] * extra, axis=-1)
    return out[..., :n_new]


def subdivide_control_grid(ctrl: jnp.ndarray, new_shape) -> jnp.ndarray:
    """Refine ``ctrl`` (3, gx, gy, gz) to half the control spacing per axis.

    The returned grid of shape ``(3, *new_shape)`` represents (up to border
    clipping effects) the SAME displacement field at half the spacing — the
    coarse→fine initialization step of multi-grid FFD registration
    (Rueckert's subdivision schedule; role of elastix's
    ``GridSpacingSchedule``).
    """
    out = ctrl
    for ax, n_new in zip((1, 2, 3), new_shape):
        out = jnp.moveaxis(_subdivide_axis(jnp.moveaxis(out, ax, -1), int(n_new)), -1, ax)
    return out


def bending_energy(ctrl: jnp.ndarray) -> jnp.ndarray:
    """Discrete bending-energy regularizer (second differences of the grid)."""
    e = 0.0
    for axis in (1, 2, 3):
        d2 = jnp.diff(ctrl, n=2, axis=axis)
        e = e + jnp.mean(d2 * d2)
    return e
