"""Gather-free full-grid warps: the B-spline resample as MXU contractions.

The registration final resample (elastix ``FinalBSplineInterpolationOrder``,
``/root/reference/dosma/resources/elastix/params/parameters-affine.txt:14-16``)
and ``transformix``-style :func:`apply_warp` both evaluate an affinely
transformed OUTPUT GRID against a moving volume. The generic point sampler
(:func:`dosma_tpu.ops.interp.cubic_sample_coeffs`) does that with 16 row
gathers per point — and XLA's TPU gather runs at a small fraction of HBM
bandwidth (measured ~90 ms for 1.77M cubic points at 192x192x48, ~12x off
the memory bound), because the TPU has no hardware gather.

For a GRID of points the gathers are unnecessary. An affine map sends an
8x8x(all-k) output tile to a bounded oblique box of the input, so this
kernel:

1. tiles the output grid ``(8, 8, O2)`` per Pallas program,
2. DMAs the tile's input bounding block ``(24, 24, S2)`` HBM->VMEM
   (dynamic start, static size — the only "gather" is one strided DMA),
3. evaluates the separable spline tensor-product against DENSE per-axis
   weight profiles over the block: ``out(p) = sum_{i,j,k} blk[i,j,k] *
   Wx(i,p) * Wy(j,p) * Wz(k,p)`` where ``W*`` are the banded B-spline
   kernel matrices (B1 hat / B3 cubic). The k-contraction is a plain
   matmul on the MXU; i and j reduce on the VPU. No gather anywhere;
   the bandedness is handled by the kernel's compact support, not by
   indexing.

Correctness does not depend on the transform: a traced margin gate checks
that the 24-wide block covers the tile's coordinate span (true for the
near-identity corrections registration produces, up to ~12 degree
rotations and ~2x scale; ~axis permutations and NaN matrices fail the
check) and `lax.cond`s to the gather-based sampler otherwise — so this is
a fast path, never a semantic change. Weight formulation: the B-spline
reconstruction ``f(x) = sum_m c[m] B(x - m)`` is evaluated with ``m``
running over the block rows directly, so there is no floor/frac logic —
points far outside the volume see all-zero weights and correctly produce
the DefaultPixelValue 0.

Semantics parity (tested against the samplers bit-for-bit-ish, ~1e-4):

- order 3: coefficients from :func:`cubic_coeffs` (mirror-padded by 2),
  coords clipped to ``[0, D-1]`` with the same 1e-3 boundary tolerance
  and outside->0 mask as :func:`cubic_sample_coeffs`.
- order 1: volume zero-padded by 2; NO clip and NO mask — the dense B1
  profile over zero padding reproduces ``map_coordinates(mode="constant")``
  partial boundary sums exactly like :func:`_trilinear_sample`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_grid_batched", "grid_warp_viable", "grid_warp_margin_ok"]

_T0 = 8  # output tile extent, axis 0
_T1 = 8  # output tile extent, axis 1
_BI = 24  # input block extent, axis 0
_BJ = 24  # input block extent, axis 1
_LANES = 128
_PC = 512  # points per in-kernel chunk
_MAX_BATCH = 8  # volumes per kernel launch (block DMA stays < ~1 MB)
_PAD = 2  # spatial padding applied to the prepared source volumes


def _b3(t):
    """Cubic B-spline kernel B3(t), support |t| < 2 (matches interp._cubic_kernel)."""
    at = jnp.abs(t)
    near = (4.0 - 6.0 * at**2 + 3.0 * at**3) / 6.0
    far = (2.0 - at) ** 3 / 6.0
    return jnp.where(at < 1.0, near, jnp.where(at < 2.0, far, 0.0))


def _b1(t):
    """Linear hat kernel B1(t), support |t| < 1."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def grid_warp_viable(src_shape, out_shape, order: int) -> bool:
    """Static check: can the Pallas grid-warp kernel handle these shapes?

    ``src_shape`` is the UNPADDED moving-volume shape. The input blocks
    must fit inside the padded source and the k axis rides whole rows, so
    tiny volumes and exotic orders use the gather path.
    """
    if order not in (1, 3):
        return False
    if len(src_shape) != 3 or len(out_shape) != 3:
        return False
    s0, s1, s2 = (int(d) + 2 * _PAD for d in src_shape)
    if s0 < _BI or s1 < _BJ:
        return False
    if s2 > 512:  # block k-rows stay comfortably within VMEM
        return False
    return all(int(d) >= 1 for d in out_shape)


def grid_warp_margin_ok(B, out_shape, order: int):
    """Traced gate: True when every 8x8x(all-k) output tile's input
    coordinate span fits the static 24-wide blocks (with the spline
    support and a one-voxel safety row). NaN spans compare False."""
    B = jnp.asarray(B, jnp.float32)
    o2p = -(-int(out_shape[2]) // 8) * 8
    ext = jnp.asarray([_T0 - 1, _T1 - 1, o2p - 1], jnp.float32)
    span = jnp.abs(B[:2, :3]) @ ext  # spans of input axes 0 and 1
    budget = jnp.asarray(
        [_BI - (6 if order == 3 else 5), _BJ - (6 if order == 3 else 5)],
        jnp.float32,
    )
    return jnp.all(span <= budget)


def _kernel(order, nb, dims, o2p, B_ref, maps_ref, src_ref, out_ref, blk, acc, sem):
    """One (ti, tj) output tile: block DMA + dense tensor-product."""
    d0, d1, d2 = dims  # unpadded source dims
    s2 = d2 + 2 * _PAD
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    oi0 = (ti * _T0).astype(jnp.float32)
    oj0 = (tj * _T1).astype(jnp.float32)

    b = [[B_ref[r, c] for c in range(4)] for r in range(3)]

    # Lower input-coordinate bound per axis from the tile corners (coords
    # are affine in (oi, oj, ok), so the extreme sits at a corner).
    def lo_bound(r, dr):
        lo = b[r][3] + jnp.minimum(b[r][0] * oi0, b[r][0] * (oi0 + _T0 - 1))
        lo = lo + jnp.minimum(b[r][1] * oj0, b[r][1] * (oj0 + _T1 - 1))
        lo = lo + jnp.minimum(0.0, b[r][2] * (o2p - 1))
        if order == 3:
            # coords are clipped to [0, D-1] before sampling
            return jnp.clip(lo, 0.0, dr - 1.0)
        # order 1: unclipped; only the block origin needs bounding.
        # [-2, D - 0.01] keeps the first tap >= 0 and the last padded tap
        # within the zero-padded source for every contributing point.
        return jnp.clip(lo, -2.0, dr - 0.01)

    lo0 = lo_bound(0, jnp.float32(d0))
    lo1 = lo_bound(1, jnp.float32(d1))
    off = 1 if order == 3 else 2  # first padded tap index - floor(lo)
    si = jnp.clip(jnp.floor(lo0).astype(jnp.int32) + off, 0, d0 + 2 * _PAD - _BI)
    sj = jnp.clip(jnp.floor(lo1).astype(jnp.int32) + off, 0, d1 + 2 * _PAD - _BJ)

    dma = pltpu.make_async_copy(
        src_ref.at[:, pl.ds(si, _BI), pl.ds(sj, _BJ), :], blk, sem
    )
    dma.start()
    dma.wait()

    p_total = _T0 * _T1 * o2p
    nchunks = p_total // _PC
    rows_pc = _PC // _LANES
    sif = si.astype(jnp.float32)
    sjf = sj.astype(jnp.float32)
    kern = _b3 if order == 3 else _b1

    blkm = [blk[v].reshape(_BI * _BJ, s2) for v in range(nb)]

    for c in range(nchunks):
        # Local (oi, oj, ok) decompositions of the flat point ids come in
        # precomputed (Mosaic need not lower div/mod by non-power-of-2).
        sl = pl.ds(c * rows_pc, rows_pc)
        oi = maps_ref[0, sl, :].astype(jnp.float32) + oi0
        oj = maps_ref[1, sl, :].astype(jnp.float32) + oj0
        ok = maps_ref[2, sl, :].astype(jnp.float32)

        cx = b[0][0] * oi + b[0][1] * oj + b[0][2] * ok + b[0][3]
        cy = b[1][0] * oi + b[1][1] * oj + b[1][2] * ok + b[1][3]
        cz = b[2][0] * oi + b[2][1] * oj + b[2][2] * ok + b[2][3]

        if order == 3:
            tol = 1e-3
            inside = (
                (cx >= -tol) & (cx <= d0 - 1 + tol)
                & (cy >= -tol) & (cy <= d1 - 1 + tol)
                & (cz >= -tol) & (cz <= d2 - 1 + tol)
            )
            cx = jnp.clip(cx, 0.0, d0 - 1.0)
            cy = jnp.clip(cy, 0.0, d1 - 1.0)
            cz = jnp.clip(cz, 0.0, d2 - 1.0)

        cxf = cx.reshape(1, _PC)
        cyf = cy.reshape(1, _PC)
        czf = cz.reshape(1, _PC)

        # Dense banded weight profiles: W*(m_local, p) = B(c_p - m_global)
        # with m_global = start + m_local - PAD (the coefficient index the
        # padded source row maps back to).
        ii = jax.lax.broadcasted_iota(jnp.float32, (_BI, _PC), 0)
        wx = kern(cxf - (sif + ii - _PAD))
        jj = jax.lax.broadcasted_iota(jnp.float32, (_BJ, _PC), 0)
        wy = kern(cyf - (sjf + jj - _PAD))
        kk = jax.lax.broadcasted_iota(jnp.float32, (s2, _PC), 0)
        wz = kern(czf - (kk - _PAD))

        for v in range(nb):
            t1 = jax.lax.dot_general(
                blkm[v], wz, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BI*BJ, PC)
            t2 = jnp.sum(t1.reshape(_BI, _BJ, _PC) * wx[:, None, :], axis=0)
            res = jnp.sum(t2 * wy, axis=0, keepdims=True)  # (1, PC)
            if order == 3:
                res = jnp.where(inside.reshape(1, _PC), res, 0.0)
            acc[v, c * rows_pc:(c + 1) * rows_pc, :] = res.reshape(
                rows_pc, _LANES
            )

    out_ref[...] = acc[...].reshape(nb, _T0, _T1, o2p)


@functools.partial(jax.jit, static_argnames=("out_shape", "order"))
def _warp_grid_pallas(srcs, B, out_shape, order):
    """``srcs``: PREPARED padded sources (NB, S0, S1, S2); returns
    (NB, O0p, O1p, O2p) on the padded output grid."""
    nb, s0, s1, s2 = srcs.shape
    dims = (s0 - 2 * _PAD, s1 - 2 * _PAD, s2 - 2 * _PAD)
    o0, o1, o2 = out_shape
    o0p = -(-o0 // _T0) * _T0
    o1p = -(-o1 // _T1) * _T1
    o2p = -(-o2 // 8) * 8

    grid = (o0p // _T0, o1p // _T1)

    # Tile-local (oi, oj, ok) for each flat point id, laid out exactly as
    # the kernel's chunk rows; computed here so the kernel needs no
    # integer div/mod by non-power-of-2 constants.
    p_total = _T0 * _T1 * o2p
    pid = jnp.arange(p_total, dtype=jnp.int32)
    maps = jnp.stack(
        [pid // (_T1 * o2p), (pid // o2p) % _T1, pid % o2p]
    ).reshape(3, p_total // _LANES, _LANES)

    kernel = functools.partial(_kernel, order, nb, dims, o2p)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                maps.shape, lambda ti, tj: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nb, _T0, _T1, o2p), lambda ti, tj: (0, ti, tj, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, o0p, o1p, o2p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb, _BI, _BJ, s2), jnp.float32),
            pltpu.VMEM((nb, p_total // _LANES, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(jnp.asarray(B, jnp.float32), maps, srcs)


def _prepare(vols, order):
    """Padded kernel operands from raw volumes (NB, D0, D1, D2)."""
    from dosma_tpu.ops.interp import cubic_coeffs

    if order == 3:
        return jax.vmap(cubic_coeffs)(vols.astype(jnp.float32))
    return jnp.pad(
        vols.astype(jnp.float32),
        ((0, 0),) + ((_PAD, _PAD),) * 3,
    )


def _xla_fallback(vols, B, out_shape, order):
    """The gather-based samplers over the same batch (gate's else-branch)."""
    from dosma_tpu.ops import registration as regops

    d0, d1, d2 = out_shape
    i, j, k = jnp.meshgrid(
        jnp.arange(d0, dtype=jnp.float32),
        jnp.arange(d1, dtype=jnp.float32),
        jnp.arange(d2, dtype=jnp.float32),
        indexing="ij",
    )
    idx = jnp.stack(
        [i.ravel(), j.ravel(), k.ravel(), jnp.ones(d0 * d1 * d2, jnp.float32)]
    )
    m_idx = (jnp.asarray(B, jnp.float32) @ idx)[:3]
    out = [
        regops._sample_order(vols[v], m_idx, order).reshape(out_shape)
        for v in range(vols.shape[0])
    ]
    return jnp.stack(out)


def warp_grid_batched(vols, B, out_shape, order: int):
    """Warp a BATCH of same-grid volumes onto ``out_shape`` under the
    index-space affine ``B`` (3x4 or 4x4 rows of the fixed->moving map).

    Dispatches to the gather-free Pallas kernel when the transform's
    per-tile span fits the static blocks (checked on device, so this is
    jit/trace safe), and to the gather samplers otherwise. Shapes must
    pass :func:`grid_warp_viable`; callers keep their existing path when
    it does not.
    """
    vols = jnp.asarray(vols, jnp.float32)
    B = jnp.asarray(B, jnp.float32)[:3]
    out_shape = tuple(int(s) for s in out_shape)

    if vols.shape[0] > _MAX_BATCH:
        parts = [
            warp_grid_batched(vols[s : s + _MAX_BATCH], B, out_shape, order)
            for s in range(0, vols.shape[0], _MAX_BATCH)
        ]
        return jnp.concatenate(parts)

    srcs = _prepare(vols, order)
    o0, o1, o2 = out_shape

    def fast(operands):
        srcs_, vols_, B_ = operands
        padded = _warp_grid_pallas(srcs_, B_, out_shape, order)
        return padded[:, :o0, :o1, :o2]

    def slow(operands):
        srcs_, vols_, B_ = operands
        return _xla_fallback(vols_, B_, out_shape, order)

    return jax.lax.cond(
        grid_warp_margin_ok(B, out_shape, order), fast, slow, (srcs, vols, B)
    )
