"""XLA-native image registration: the TPU replacement for elastix.

The reference shells out to the elastix C++ binary via nipype subprocesses
(``/root/reference/dosma/core/registration.py:374-449``), exchanging data
through temp NIfTI files. Here registration is an in-process, jit-compiled
optimization:

- transform models: translation / rigid (Euler) / affine, parameterized in
  world (RAS) space about the fixed-image center,
- multi-resolution Gaussian SMOOTHING pyramid (elastix's
  FixedSmoothingImagePyramid; ``parameters-affine.txt:7-60``) — constant
  shapes across levels, so one stage = ONE compiled XLA program with the
  level loop as a ``lax.scan``,
- metrics: Mattes-style mutual information via differentiable soft
  (linear-kernel) joint histograms, plus MSE and NCC,
- stochastic sampling: a fresh random subset of fixed voxels per iteration
  (elastix ``RandomCoordinate`` sampler), with optional mask weighting,
- Adam optimizer inside ``lax.scan`` — the full per-level optimization is
  ONE compiled XLA program; no host round-trips per iteration.

Transforms compose linearly in world space, so sequential-stage chains
(rigid → affine) resample the moving image exactly once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RegistrationParams",
    "register_pair",
    "register_pair_bspline",
    "register_chain",
    "register_chain_batch",
    "warp_volume",
    "warp_volume_batch",
    "warp_volume_chain",
    "compose_transforms",
]


@dataclass(frozen=True)
class RegistrationParams:
    """Configuration for one registration stage (analog of one elastix
    parameter file)."""

    transform: str = "rigid"  # translation | rigid | affine | bspline
    metric: str = "mi"  # mi | mse | ncc
    resolutions: int = 3
    iterations: int = 300
    num_bins: int = 32
    num_samples: int = 2048
    learning_rate: float = 0.01
    seed: int = 0
    # MI Parzen window on the moving side: "cubic" = Mattes' third-order
    # B-spline window (elastix AdvancedMattesMutualInformation,
    # ``parameters-affine.txt:23``), "linear" = first-order hat window.
    mi_kernel: str = "cubic"
    # Image interpolation order for METRIC sampling (elastix
    # BSplineInterpolationOrder; 1 in every shipped file) and for the
    # FINAL resample (FinalBSplineInterpolationOrder; 3 in every shipped
    # file). Supported: 0 (final only), 1, 3.
    interp_order: int = 1
    final_interp_order: int = 3
    # B-spline (FFD) stage options. ``grid_spacing_vox`` (voxel units,
    # scalar or per-axis — elastix FinalGridSpacingInVoxels) overrides
    # ``grid_spacing_mm`` when set.
    grid_spacing_mm: float = 32.0
    grid_spacing_vox: Optional[Tuple[float, ...]] = None
    bending_weight: float = 1e-2
    # Optional explicit per-level shrink factors, coarsest→finest (elastix
    # ImagePyramidSchedule). None = the default 2^(L-1-l) schedule; the
    # length overrides ``resolutions``.
    pyramid_schedule: Optional[Tuple[float, ...]] = None
    # Optional per-level budgets, coarsest→finest (elastix's per-resolution
    # MaximumNumberOfIterations / NumberOfSpatialSamples vectors). Shorter
    # schedules repeat their last value; None = the flat iterations /
    # num_samples budget at every level. Consumed by the B-spline
    # multi-grid chain (each stage is its own scan, so budgets may differ);
    # matrix stages run one uniform lax.scan over levels and collapse a
    # schedule to its max (warned at parse time).
    iteration_schedule: Optional[Tuple[int, ...]] = None
    sample_schedule: Optional[Tuple[int, ...]] = None

    def level_budget(self, n: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        """Per-level (iterations, samples), coarsest→finest, length ``n``."""

        def _expand(sched, flat):
            if not sched:
                return (int(flat),) * n
            s = tuple(int(v) for v in sched)
            if len(s) >= n:
                # When the schedule is longer than the level count (e.g. a
                # pyramid schedule shortened the stage plan), keep the
                # coarsest n-1 entries plus the FINEST entry — the final
                # level's budget is the one tuned for full resolution.
                return s[: n - 1] + (s[-1],)
            return s + (s[-1],) * (n - len(s))

        return (
            _expand(self.iteration_schedule, self.iterations),
            _expand(self.sample_schedule, self.num_samples),
        )

    @property
    def nparams(self) -> int:
        return {"translation": 3, "rigid": 6, "affine": 12}[self.transform]


# ----------------------------------------------------------------------
# Transform parameterization (world space, centered).
# ----------------------------------------------------------------------
def _mm(a, b):
    """Full-f32 matmul for world-coordinate math.

    TPU matmuls default to bf16 inputs; with ~100 mm world coordinates the
    ~8-bit mantissa quantizes positions by ~0.4 mm, which measurably skews
    registration (2.6-voxel translation error observed at 192^3 before this
    pin). These are 4xN products — HIGHEST precision costs nothing.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _params_to_matrix(theta: jnp.ndarray, center: jnp.ndarray, transform: str) -> jnp.ndarray:
    """4x4 world->world matrix. Rotation/scaling about ``center``.

    Parameter scaling: rotations in radians, translations in mm (world
    units), affine deviations from identity.
    """
    if transform == "translation":
        M = jnp.eye(4)
        M = M.at[:3, 3].set(theta[:3])
        return M

    if transform == "rigid":
        rx, ry, rz = theta[0], theta[1], theta[2]
        t = theta[3:6]
        cx, sx = jnp.cos(rx), jnp.sin(rx)
        cy, sy = jnp.cos(ry), jnp.sin(ry)
        cz, sz = jnp.cos(rz), jnp.sin(rz)
        Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = _mm(Rz, _mm(Ry, Rx))
    else:  # affine: 9 matrix deviations + 3 translations
        R = jnp.eye(3) + theta[:9].reshape(3, 3)
        t = theta[9:12]

    M = jnp.eye(4)
    M = M.at[:3, :3].set(R)
    # x' = R (x - c) + c + t
    M = M.at[:3, 3].set(center - _mm(R, center) + t)
    return M


def _params_to_matrix_np(theta, center, transform: str) -> np.ndarray:
    """Host (numpy) twin of :func:`_params_to_matrix`.

    Converting a handful of scalars to a 4x4 matrix is host work; doing it
    eagerly in jnp dispatches ~10 single-op XLA programs per call, which on
    tunneled backends costs seconds of compile latency per fresh process.
    """
    theta = np.asarray(theta, np.float64)
    center = np.asarray(center, np.float64)
    if transform == "translation":
        M = np.eye(4)
        M[:3, 3] = theta[:3]
        return M
    if transform == "rigid":
        rx, ry, rz = theta[:3]
        t = theta[3:6]
        cx, sx = np.cos(rx), np.sin(rx)
        cy, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = Rz @ Ry @ Rx
    else:
        R = np.eye(3) + theta[:9].reshape(3, 3)
        t = theta[9:12]
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = center - R @ center + t
    return M


# ----------------------------------------------------------------------
# Resampling
# ----------------------------------------------------------------------
_ROW_SAMPLE_MINOR_MAX = 128  # widest minor axis the row sampler will fetch
_ROW_SAMPLE_CHUNK = 1 << 21  # points per lax.map slab when N*d2 gets large
_ROW_SAMPLE_MAX_ELEMS = 256 * 1024 * 1024  # N*d2 ceiling before chunking


def _trilinear_sample(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``vol`` (D0,D1,D2) at fractional index coords (3, N), order-1,
    zero outside the volume.

    Boundary semantics match map_coordinates(mode="constant", cval=0)
    exactly: out-of-volume CORNERS contribute 0, so boundary-ring samples
    keep their smooth partial sums (hard-zeroing the ring measurably
    biases affine-stage gradients).

    Dispatches to the ROW-GATHER sampler (4 whole k-rows per point +
    in-register hat-weight k-interpolation) whenever the minor axis is
    narrow enough, falling back to 8 linearized scalar corner gathers
    otherwise. Measured on v5e at 1.77M points: 13.4 Mpts/s (scalar) →
    53.8 Mpts/s (rows) on a 192×192×48 volume — gathers on a ≲8 MB
    operand run from VMEM, and fetching rows amortizes the per-gather
    cost the scalar path pays 8×. Above VMEM residency the row path
    still wins ~1.4× (20.7 vs 14.2 Mpts/s at 384²×48).
    """
    if vol.shape[2] <= _ROW_SAMPLE_MINOR_MAX and vol.shape[2] >= 2:
        n = coords.shape[1]
        if n * vol.shape[2] <= _ROW_SAMPLE_MAX_ELEMS:
            return _trilinear_sample_rows(vol, coords)
        # Large point sets: bound the (N, d2) row intermediates by mapping
        # over fixed-size slabs (keeps peak HBM flat; ~2x slab overhead is
        # still well ahead of the scalar path at these sizes).
        chunk = _ROW_SAMPLE_CHUNK
        nc = -(-n // chunk)
        cpad = jnp.pad(coords, ((0, 0), (0, nc * chunk - n)))
        slabs = cpad.reshape(3, nc, chunk).transpose(1, 0, 2)
        out = jax.lax.map(lambda c: _trilinear_sample_rows(vol, c), slabs)
        return out.reshape(-1)[:n]
    return _trilinear_sample_scalar(vol, coords)


def _trilinear_sample_rows(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Row-gather trilinear sampling: for each point, gather the full
    k-rows of the 4 (i,j) corner columns from ``vol`` viewed as a
    (d0*d1, d2) matrix, then reduce each row against a hat-function
    weight profile ``max(0, 1-|iota-k|)`` — the k-interpolation becomes a
    dense VPU reduction with NO inner gather, and the hat weights
    reproduce the out-of-volume-corner-contributes-0 semantics exactly
    (a corner outside [0, d2-1] gets weight 0 by construction).
    """
    d0, d1, d2 = vol.shape
    rows = vol.reshape(d0 * d1, d2)
    fi = jnp.floor(coords).astype(jnp.int32)
    w = coords - jnp.floor(coords)
    w0, w1 = w[0], w[1]
    kc = coords[2]
    iota = jnp.arange(d2, dtype=vol.dtype)
    kw = jnp.maximum(0.0, 1.0 - jnp.abs(iota[None, :] - kc[:, None]))  # (N, d2)
    out = jnp.zeros(coords.shape[1], vol.dtype)
    for a in (0, 1):
        wa = w0 if a else 1.0 - w0
        i_a = fi[0] + a
        v_a = (i_a >= 0) & (i_a < d0)
        for b in (0, 1):
            wb = w1 if b else 1.0 - w1
            i_b = fi[1] + b
            valid = v_a & (i_b >= 0) & (i_b < d1)
            ridx = jnp.clip(i_a * d1 + i_b, 0, d0 * d1 - 1)
            r = jnp.take(rows, ridx, axis=0)  # (N, d2)
            contrib = jnp.sum(r * kw, axis=1)
            out = out + jnp.where(valid, wa * wb * contrib, 0.0)
    return out


def _trilinear_sample_scalar(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """8 corner gathers with LINEARIZED 1-D indices (``jnp.take`` on the
    flattened volume) instead of ``jax.scipy.ndimage.map_coordinates``:
    XLA lowers the 1-D gather ~1.5× faster on TPU than the equivalent
    multi-dim gather (measured 0.15 s vs 0.23 s for 1.77M points at
    192×192×48). Fallback for volumes whose minor axis is too wide for
    the row sampler.
    """
    d0, d1, d2 = vol.shape
    fi = jnp.floor(coords).astype(jnp.int32)  # unclipped corner base
    w = coords - jnp.floor(coords)
    flat = vol.reshape(-1)
    s0, s1 = d1 * d2, d2
    dims = (d0, d1, d2)
    w0, w1, w2 = w[0], w[1], w[2]
    out = jnp.zeros(coords.shape[1], vol.dtype)
    for a in (0, 1):
        wa = w0 if a else 1.0 - w0
        i_a = fi[0] + a
        v_a = (i_a >= 0) & (i_a < dims[0])
        for b in (0, 1):
            wb = w1 if b else 1.0 - w1
            i_b = fi[1] + b
            v_ab = v_a & (i_b >= 0) & (i_b < dims[1])
            for c in (0, 1):
                wc = w2 if c else 1.0 - w2
                i_c = fi[2] + c
                valid = v_ab & (i_c >= 0) & (i_c < dims[2])
                idx = (i_a * d1 + i_b) * d2 + i_c
                idx = jnp.clip(idx, 0, d0 * d1 * d2 - 1)
                out = out + jnp.where(valid, (wa * wb * wc) * jnp.take(flat, idx), 0.0)
    return out


def _world_matrix_to_index_map(M, fixed_affine, moving_affine):
    """Index-space map: moving_idx = B @ fixed_idx_homog; B = A_m^-1 M A_f."""
    return _mm(jnp.linalg.inv(moving_affine), _mm(M, fixed_affine))


def warp_volume(moving_arr, M, fixed_affine, moving_affine, fixed_shape,
                order: int = 1) -> jnp.ndarray:
    """Resample ``moving_arr`` onto the fixed grid under world transform M.

    ``order``: 0 (nearest), 1 (trilinear), or 3 (cubic B-spline — elastix
    FinalBSplineInterpolationOrder 3 semantics).
    """
    return _warp_volume_impl(
        jnp.asarray(moving_arr, jnp.float32),
        jnp.asarray(M, jnp.float32),
        jnp.asarray(fixed_affine, jnp.float32),
        jnp.asarray(moving_affine, jnp.float32),
        tuple(int(s) for s in fixed_shape),
        int(order),
    )


@functools.partial(jax.jit, static_argnames=("fixed_shape", "order"))
def _warp_volume_impl(moving_arr, M, fixed_affine, moving_affine, fixed_shape, order):
    B = _world_matrix_to_index_map(M, fixed_affine, moving_affine)
    return _warp_arr(moving_arr, B, fixed_shape, order)


def warp_volume_batch(moving_stack, M, fixed_affine, moving_affine, fixed_shape,
                      order: int = 1) -> jnp.ndarray:
    """:func:`warp_volume` over a stack of same-grid volumes in one
    program (the transformix-reuse path of :func:`apply_warp`)."""
    return _warp_volume_batch_impl(
        jnp.asarray(moving_stack, jnp.float32),
        jnp.asarray(M, jnp.float32),
        jnp.asarray(fixed_affine, jnp.float32),
        jnp.asarray(moving_affine, jnp.float32),
        tuple(int(s) for s in fixed_shape),
        int(order),
    )


@functools.partial(jax.jit, static_argnames=("fixed_shape", "order"))
def _warp_volume_batch_impl(moving_stack, M, fixed_affine, moving_affine,
                            fixed_shape, order):
    B = _world_matrix_to_index_map(M, fixed_affine, moving_affine)
    return _warp_arr_batch(moving_stack, B, fixed_shape, order)


# ----------------------------------------------------------------------
# Metrics
# ----------------------------------------------------------------------
def _soft_mi(fixed_vals, moving_vals, weights, num_bins: int,
             f_lo, f_hi, m_lo, m_hi, kernel: str = "cubic") -> jnp.ndarray:
    """Negative mutual information with Parzen-window soft histograms.

    Differentiable w.r.t. ``moving_vals`` (gradients flow through the
    fractional bin weights) — the Parzen-window trick of Mattes MI.

    The joint histogram is ONE matmul of dense kernel weight matrices
    (sample x bin) — the splat runs on the MXU instead of TPU scatter
    (which serializes and dominated the per-iteration cost).

    ``kernel="cubic"`` is the Mattes formulation (elastix
    AdvancedMattesMutualInformation): a third-order B-spline Parzen
    window on the moving intensity, whose 2-continuous derivative keeps
    MI gradients well-behaved near convergence on noisy multi-modal
    pairs. Two deliberate deviations from ITK's exact discretization,
    both measured head-to-head on the recovery suite:

    - The histogram grid is 2x DENSER than ``num_bins`` (bin pitch
      halved). The cubic window spans 4 bins where the hat spans 2, so
      at equal pitch its Parzen bandwidth doubles — the extra smoothing
      flattens and BIASES the MI optimum (measured: affine shear/scale
      recovery 0.60 vox cubic vs 0.35 linear at 32 bins; at the halved
      pitch, holding bandwidth constant, cubic reaches 0.23 vox and
      every other MI case improves or holds: rigid 0.02 -> 0.01, gamma
      multi-modal 0.05 -> 0.02, noisy affine 0.68 -> 0.59).
    - The FIXED side keeps the first-order hat window on the same grid
      (ITK uses a box window, which quantizes the fixed marginal), and
      the moving-bin axis is EXTENDED by the window's 2-bin support at
      each end instead of edge-clipping + renormalizing (renormalizing
      warps edge-bin gradients; ITK instead shrinks the intensity span
      by 2 padding bins, losing resolution).

    ``kernel="linear"`` is the first-order hat window on both sides
    (2-bin splat) at the plain ``num_bins`` pitch.
    """
    eps = 1e-10
    if kernel == "cubic":
        from dosma_tpu.ops.interp import _cubic_kernel

        nb = 2 * num_bins  # halved pitch: equal bandwidth to the hat at num_bins
        fb = jnp.clip(
            (fixed_vals - f_lo) / (f_hi - f_lo + eps) * (nb - 1), 0, nb - 1
        )
        mb = jnp.clip(
            (moving_vals - m_lo) / (m_hi - m_lo + eps) * (nb - 1), 0, nb - 1
        )
        bins = jnp.arange(nb, dtype=fixed_vals.dtype)
        F = jnp.maximum(0.0, 1.0 - jnp.abs(fb[:, None] - bins[None, :]))  # (S, 2B)
        mbins = jnp.arange(-2, nb + 2, dtype=fixed_vals.dtype)
        Mh = _cubic_kernel(mb[:, None] - mbins[None, :])  # (S, 2B+4)
    else:
        bins = jnp.arange(num_bins, dtype=fixed_vals.dtype)
        fb = jnp.clip(
            (fixed_vals - f_lo) / (f_hi - f_lo + eps) * (num_bins - 1), 0, num_bins - 1
        )
        mb = jnp.clip(
            (moving_vals - m_lo) / (m_hi - m_lo + eps) * (num_bins - 1), 0, num_bins - 1
        )
        F = jnp.maximum(0.0, 1.0 - jnp.abs(fb[:, None] - bins[None, :]))  # (S, B)
        Mh = jnp.maximum(0.0, 1.0 - jnp.abs(mb[:, None] - bins[None, :]))  # (S, B)

    joint = _mm((F * weights[:, None]).T, Mh)  # (B, B)
    joint = joint / (jnp.sum(joint) + eps)
    pf = jnp.sum(joint, axis=1, keepdims=True)
    pm = jnp.sum(joint, axis=0, keepdims=True)
    mi_val = jnp.sum(joint * (jnp.log(joint + eps) - jnp.log(pf + eps) - jnp.log(pm + eps)))
    return -mi_val


def _mse(fixed_vals, moving_vals, weights):
    w = weights / (jnp.sum(weights) + 1e-10)
    return jnp.sum(w * (fixed_vals - moving_vals) ** 2)


def _ncc(fixed_vals, moving_vals, weights):
    """Negative normalized cross-correlation (elastix's
    AdvancedNormalizedCorrelation). NOT squared: -(c^2) has zero gradient
    at c=0 (stalling badly-initialized stages) and rewards contrast
    inversion (c=-1) as much as a correct alignment."""
    w = weights / (jnp.sum(weights) + 1e-10)
    fm = jnp.sum(w * fixed_vals)
    mm = jnp.sum(w * moving_vals)
    fc = fixed_vals - fm
    mc = moving_vals - mm
    num = jnp.sum(w * fc * mc)
    den = jnp.sqrt(jnp.sum(w * fc**2) * jnp.sum(w * mc**2)) + 1e-10
    return -(num / den)


# ----------------------------------------------------------------------
# Whole-pyramid optimization (ONE compiled program per stage)
# ----------------------------------------------------------------------
_SMOOTH_RADIUS = 8  # minimum taps = 2R+1; widened for deep pyramids (see below)


def _gauss_smooth3(arr: jnp.ndarray, sigma, radius: int = _SMOOTH_RADIUS) -> jnp.ndarray:
    """Separable 3D Gaussian blur with a TRACED sigma (static kernel width).

    ``sigma`` in voxels; near-zero sigma degenerates to a delta kernel, so
    the finest pyramid level is (numerically) the unsmoothed volume. Edge
    padding matches the decimating pyramid's edge-pool behavior. ``radius``
    must be static and >= ~3*max(sigma) for faithful tails.
    """
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    w = w / jnp.sum(w)

    def conv_axis(a, axis):
        pads = [(0, 0)] * 3
        pads[axis] = (radius, radius)
        ap = jnp.pad(a, pads, mode="edge")
        out = jnp.zeros_like(a)
        n = a.shape[axis]
        for k in range(2 * radius + 1):
            out = out + w[k] * jax.lax.dynamic_slice_in_dim(ap, k, n, axis)
        return out

    for ax in range(3):
        arr = conv_axis(arr, ax)
    return arr


def _smooth_radius_for_levels(n_levels: int) -> int:
    """Kernel radius covering ~3 sigma of the coarsest level of the
    factor/2 sigma schedule (sigma_max = 2^(L-1)/2)."""
    sigma_max = 2 ** (n_levels - 1) / 2.0
    return max(_SMOOTH_RADIUS, int(np.ceil(3.0 * sigma_max)))


def _smooth_radius_for_sigmas(sigmas) -> int:
    """Kernel radius covering ~3 sigma of an EXPLICIT sigma schedule."""
    return max(_SMOOTH_RADIUS, int(np.ceil(3.0 * float(np.max(np.asarray(sigmas))))))


def _stage_sigmas(cfg: "RegistrationParams") -> np.ndarray:
    """Per-level smoothing sigmas for a stage config: the elastix
    ImagePyramidSchedule if given (sigma = factor/2), else the default
    2^(L-1-l) schedule."""
    if cfg.pyramid_schedule:
        return np.array(
            [f / 2.0 if f > 1 else 0.0 for f in cfg.pyramid_schedule], np.float32
        )
    return _pyramid_sigmas(cfg.resolutions)


def _pyramid_core(
    fixed_arr, fixed_affine, fixed_mask,
    moving_arr, moving_affine,
    theta0, param_scale, center, sigmas,
    transform: str, metric: str,
    iterations: int, num_samples: int, num_bins: int,
    learning_rate, seed,
    moving_mask=None,
    radius: Optional[int] = None,
    mi_kernel: str = "cubic",
    interp_order: int = 1,
):
    """Traceable multi-resolution optimization core (one parameter stage).

    Instead of the classic decimating pyramid (one program per level shape,
    which costs a compile + device program load per level per fresh
    process), every level works on the FULL grid smoothed by a per-level
    Gaussian (elastix's FixedSmoothingImagePyramid): shapes are static
    across levels, so the level loop is a ``lax.scan`` carrying theta, and
    the whole stage — smoothing, sampling, Adam — is a single XLA program.
    Compute is equivalent: the metric samples ``num_samples`` random points
    per iteration regardless of grid size.
    """
    import optax

    fshape = fixed_arr.shape
    B_fix = fixed_affine  # index -> world
    inv_moving = jnp.linalg.inv(moving_affine)

    if radius is None:
        radius = _smooth_radius_for_levels(int(sigmas.shape[0]))

    if interp_order == 3:
        from dosma_tpu.ops.interp import cubic_coeffs, cubic_sample_coeffs

    def level_step(theta, level):
        sigma, level_idx = level
        f_s = _gauss_smooth3(fixed_arr, sigma, radius)
        m_s = _gauss_smooth3(moving_arr, sigma, radius)
        # Metric-sampling interpolator (elastix BSplineInterpolationOrder):
        # order 3 prefilters + mirror-pads the smoothed moving image ONCE
        # per level; the Adam loop then samples coefficients.
        m_cp = cubic_coeffs(m_s) if interp_order == 3 else None
        mask_s = (
            _gauss_smooth3(fixed_mask, sigma, radius) if fixed_mask is not None else None
        )
        mmask_s = (
            _gauss_smooth3(moving_mask, sigma, radius) if moving_mask is not None else None
        )
        f_lo, f_hi = jnp.min(f_s), jnp.max(f_s)
        m_lo, m_hi = jnp.min(m_s), jnp.max(m_s)

        # The fixed-image side of the metric does not depend on theta:
        # sample EVERY iteration's random coordinates up front (fresh
        # RandomCoordinate-style draws per iteration, one key per level),
        # gather fixed values/mask weights/world coordinates in one batched
        # pass, and let the Adam scan consume per-iteration rows. TPU
        # gathers run at a flat points/sec rate, so this halves the
        # gather work inside the sequential loop.
        key = jax.random.fold_in(jax.random.PRNGKey(seed), level_idx)
        u = jax.random.uniform(key, (iterations, 3, num_samples))
        idx_all = u * (jnp.array(fshape, jnp.float32)[None, :, None] - 1)
        # Sort each iteration's samples by fixed linear index (DEVNOTES r4
        # "sorted/segmented sample gather" lever): the metric is
        # permutation-invariant over samples, and the moving-side gather —
        # the loop's dominant cost — then walks quasi-monotone addresses
        # (the moving index map is an affine image of the fixed order), so
        # row fetches hit warm tiles instead of striding the volume
        # randomly. One argsort per level, zero per-iteration cost.
        lin = (idx_all[:, 0] * fshape[1] + idx_all[:, 1]) * fshape[2] + idx_all[:, 2]
        order = jnp.argsort(lin, axis=1)
        idx_all = jnp.take_along_axis(idx_all, order[:, None, :], axis=2)
        flat = idx_all.transpose(1, 0, 2).reshape(3, iterations * num_samples)
        fixed_vals_all = _trilinear_sample(f_s, flat).reshape(iterations, num_samples)
        w0_all = (
            _trilinear_sample(mask_s, flat).reshape(iterations, num_samples)
            if mask_s is not None
            else jnp.ones((iterations, num_samples))
        )
        flat_h = jnp.concatenate(
            [flat, jnp.ones((1, iterations * num_samples))], axis=0
        )
        world_all = _mm(B_fix, flat_h).reshape(4, iterations, num_samples).transpose(1, 0, 2)

        def loss_fn(theta_n, fixed_vals, w0, world):
            th = theta_n * param_scale
            M = _params_to_matrix(th, center, transform)
            m_idx = _mm(inv_moving, _mm(M, world))[:3]
            if interp_order == 3:
                moving_vals = cubic_sample_coeffs(m_cp, m_idx)
            else:
                moving_vals = _trilinear_sample(m_s, m_idx)
            # Downweight samples that map outside the moving volume.
            inside = jnp.all(
                (m_idx >= 0) & (m_idx <= jnp.array(m_s.shape, jnp.float32)[:, None] - 1),
                axis=0,
            )
            weights = w0 * (0.01 + 0.99 * inside)
            if mmask_s is not None:
                # Moving-side mask: downweight samples landing outside it.
                weights = weights * _trilinear_sample(mmask_s, m_idx)

            if metric == "mi":
                return _soft_mi(
                    fixed_vals, moving_vals, weights, num_bins, f_lo, f_hi, m_lo, m_hi,
                    kernel=mi_kernel,
                )
            elif metric == "ncc":
                return _ncc(fixed_vals, moving_vals, weights)
            return _mse(fixed_vals, moving_vals, weights)

        # Cosine decay to 10% of the peak LR: the stochastic metric makes
        # fixed-LR Adam jitter around the optimum at the sample-noise
        # scale; annealing converges to a tighter optimum in the same
        # iteration budget (elastix's ASGD decays its step size similarly).
        opt = optax.adam(
            # max(1, ..): iterations=0 is a legal no-op stage (the scan body
            # never runs, so the schedule is never evaluated, but optax
            # rejects decay_steps=0 at construction).
            optax.cosine_decay_schedule(learning_rate, max(1, iterations), alpha=0.1)
        )

        # Polyak tail averaging (same policy as the FFD chain): the
        # stochastic per-iteration metric makes annealed iterates bounce
        # around the optimum at the final-step scale; averaging the last
        # quarter cancels that zero-mean jitter (it does NOT cancel
        # estimator bias — the cubic window's bias was fixed by the
        # halved histogram pitch in ``_soft_mi``, not here).
        tail_start = max(0, iterations - max(1, iterations // 4))

        def step(carry, xs):
            theta_n, opt_state, acc = carry
            fixed_vals, w0, world, it = xs
            loss, grads = jax.value_and_grad(loss_fn)(theta_n, fixed_vals, w0, world)
            updates, opt_state = opt.update(grads, opt_state)
            theta_n = optax.apply_updates(theta_n, updates)
            acc = acc + jnp.where(it >= tail_start, 1.0, 0.0) * theta_n
            return (theta_n, opt_state, acc), loss

        theta_n0 = theta / param_scale
        (theta_fin, _, acc), losses = jax.lax.scan(
            step,
            (theta_n0, opt.init(theta_n0), jnp.zeros_like(theta_n0)),
            (fixed_vals_all, w0_all, world_all,
             jnp.arange(iterations, dtype=jnp.int32)),
        )
        # iterations == 0 is a legal no-op stage: the scan leaves theta at
        # its seed and the tail average has no samples — use the carry.
        n_tail = iterations - tail_start
        theta_n = acc / float(n_tail) if n_tail > 0 else theta_fin
        return theta_n * param_scale, losses

    n_levels = sigmas.shape[0]
    theta, losses = jax.lax.scan(
        level_step, theta0, (sigmas, jnp.arange(n_levels, dtype=jnp.int32))
    )
    return theta, losses


_optimize_pyramid = functools.partial(
    jax.jit,
    static_argnames=(
        "transform", "metric", "iterations", "num_samples", "num_bins", "radius",
        "mi_kernel", "interp_order",
    ),
)(_pyramid_core)


def _seed_theta_traced(transform: str, M, center):
    """Traced twin of :func:`_seed_theta_from_matrix` (same seeding policy,
    but on-device so stage chains fuse into one program)."""
    lin = M[:3, :3]
    t_world = M[:3, 3] + _mm(lin, center) - center
    if transform == "translation":
        return M[:3, 3]
    if transform == "rigid":
        # Translation-only seed (Euler extraction from a possibly
        # non-orthogonal prior is ill-defined).
        return jnp.concatenate([jnp.zeros(3), t_world])
    return jnp.concatenate([(lin - jnp.eye(3)).reshape(-1), t_world])


def _sample_order(moving_arr, m_idx, order: int):
    """Dispatch a (3, N) coordinate sample at the given spline order.

    Order 3 prefilters ``moving_arr`` (recursive B-spline coefficient
    transform) and samples the 4x4x4 neighborhood; order 0 is nearest
    (mask/label semantics); order 1 is the trilinear row/scalar sampler.
    """
    if order == 3:
        from dosma_tpu.ops.interp import cubic_coeffs, cubic_sample_coeffs

        return cubic_sample_coeffs(cubic_coeffs(moving_arr), m_idx)
    if order == 0:
        from dosma_tpu.ops.interp import nearest_sample

        return nearest_sample(moving_arr, m_idx)
    return _trilinear_sample(moving_arr, m_idx)


def _warp_arr(moving_arr, B, fixed_shape, order: int = 1):
    """Full-grid resample under a precomputed index-space map ``B``."""
    batched = _warp_arr_batch(moving_arr[None], B, fixed_shape, order)
    return batched[0]


def _warp_arr_batch(moving_stack, B, fixed_shape, order: int = 1):
    """Full-grid resample of a BATCH of same-grid volumes under ``B``.

    Grid warps route through the gather-free Pallas tile kernel
    (:mod:`dosma_tpu.ops.warp_pallas`) on TPU backends — the transform-
    span gate inside falls back to the samplers for maps the static
    blocks can't cover — and through the gather samplers elsewhere.
    """
    from dosma_tpu.ops.warp_pallas import grid_warp_viable, warp_grid_batched

    if (
        order in (1, 3)
        and _grid_warp_backend_ok()
        and grid_warp_viable(moving_stack.shape[1:], fixed_shape, order)
    ):
        return warp_grid_batched(moving_stack, B, fixed_shape, order)

    d0, d1, d2 = fixed_shape
    i, j, k = jnp.meshgrid(
        jnp.arange(d0, dtype=jnp.float32),
        jnp.arange(d1, dtype=jnp.float32),
        jnp.arange(d2, dtype=jnp.float32),
        indexing="ij",
    )
    idx = jnp.stack([i.ravel(), j.ravel(), k.ravel(), jnp.ones(d0 * d1 * d2, jnp.float32)])
    m_idx = _mm(B, idx)[:3]
    return jnp.stack(
        [
            _sample_order(moving_stack[v], m_idx, order).reshape(fixed_shape)
            for v in range(moving_stack.shape[0])
        ]
    )


def _grid_warp_backend_ok() -> bool:
    """Compiled Pallas TPU kernels need a TPU backend (the unit tests
    drive the kernel directly under ``force_tpu_interpret_mode``)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.partial(
    jax.jit, static_argnames=("stage_statics", "n_extras", "final_order")
)
def _optimize_chain_impl(
    fixed_arr, fixed_affine, fixed_mask,
    moving_arr, moving_affine, moving_mask,
    extras, init_matrix, center, scales, sigmas, seeds,
    stage_statics, n_extras: int, final_order: int = 1,
):
    """A full sequential-stage chain (e.g. rigid → affine) as ONE jitted
    program, plus the final warps.

    Unlike the reference's elastix chaining (each stage re-registers the
    previous stage's RESAMPLED output,
    ``/root/reference/dosma/core/registration.py:437-446``), each stage here
    re-registers the ORIGINAL moving image warm-started from the previous
    stage's world transform: mathematically the same fixed→moving map, but
    with no intermediate interpolation loss, no intermediate full-grid
    resample, and no host round-trips between stages.

    ``stage_statics``: tuple of ``(transform, metric, iterations,
    num_samples, num_bins, lr, use_fmask, use_mmask, radius, mi_kernel,
    interp_order)``. ``final_order`` is the spline order of the final
    resample (elastix FinalBSplineInterpolationOrder of the LAST stage).
    Returns ``(Ms_cumulative, warped, warped_extras, losses_per_stage)``.
    """
    M = init_matrix
    Ms = []
    losses_all = []
    for i, st in enumerate(stage_statics):
        (transform, metric, iterations, num_samples, num_bins, lr,
         use_fm, use_mm, radius, mi_kernel, interp_order) = st
        theta0 = _seed_theta_traced(transform, M, center)
        theta, losses = _pyramid_core(
            fixed_arr, fixed_affine, fixed_mask if use_fm else None,
            moving_arr, moving_affine,
            theta0, scales[i], center, sigmas[i],
            transform, metric, iterations, num_samples, num_bins,
            lr, seeds[i],
            moving_mask=moving_mask if use_mm else None,
            radius=radius,
            mi_kernel=mi_kernel,
            interp_order=interp_order,
        )
        M = _params_to_matrix(theta, center, transform)
        Ms.append(M)
        losses_all.append(losses)

    B = _world_matrix_to_index_map(M, fixed_affine, moving_affine)
    fixed_shape = fixed_arr.shape
    if n_extras:
        # One batched launch warps the moving volume and every extra —
        # the Pallas grid-warp kernel shares each tile's weight profiles
        # across the whole stack.
        stack = jnp.concatenate([moving_arr[None], extras])
        warped_all = _warp_arr_batch(stack, B, fixed_shape, final_order)
        warped, warped_extras = warped_all[0], warped_all[1:]
    else:
        warped = _warp_arr(moving_arr, B, fixed_shape, final_order)
        warped_extras = None
    return tuple(Ms), warped, warped_extras, tuple(losses_all)


def _chain_statics(stage_cfgs, use_fmask, use_mmask):
    return tuple(
        (
            cfg.transform, cfg.metric, int(cfg.iterations), int(cfg.num_samples),
            int(cfg.num_bins), float(cfg.learning_rate),
            bool(use_fmask[i]), bool(use_mmask[i]),
            _smooth_radius_for_sigmas(_stage_sigmas(cfg)),
            str(cfg.mi_kernel), int(cfg.interp_order),
        )
        for i, cfg in enumerate(stage_cfgs)
    )


def _chain_host_args(stage_cfgs, fixed_shape, fixed_affine):
    spacing = np.sqrt((np.asarray(fixed_affine)[:3, :3] ** 2).sum(0))
    center_idx = (np.asarray(fixed_shape) - 1) / 2.0
    center = (np.asarray(fixed_affine) @ np.array([*center_idx, 1.0]))[:3].astype(np.float32)
    scales = tuple(
        jnp.asarray(_param_scale(cfg.transform, fixed_shape, spacing)) for cfg in stage_cfgs
    )
    sigmas = tuple(jnp.asarray(_stage_sigmas(cfg)) for cfg in stage_cfgs)
    return center, scales, sigmas


def register_chain(
    fixed_arr,
    fixed_affine: np.ndarray,
    moving_arr,
    moving_affine: np.ndarray,
    stage_cfgs: Sequence["RegistrationParams"],
    fixed_mask=None,
    moving_mask=None,
    use_mask: Optional[Sequence[bool]] = None,
    extras=None,
    init_matrix: Optional[np.ndarray] = None,
):
    """Device-resident sequential-stage registration + final warps.

    All matrix stages of the chain, the final warp of ``moving_arr``, and
    the warps of every volume in ``extras`` (stacked on the moving grid,
    the transform-reuse pattern of ref ``registration.py:497-508``) run as
    ONE compiled XLA program. Inputs may be numpy or jax arrays; device
    arrays are consumed without a host round-trip.

    Returns ``(Ms, warped, warped_extras, info)`` where ``Ms[i]`` is the
    CUMULATIVE fixed-world→moving-world matrix after stage ``i`` (host
    numpy), ``warped``/``warped_extras`` are device arrays on the fixed
    grid.
    """
    stage_cfgs = list(stage_cfgs)
    if any(cfg.transform == "bspline" for cfg in stage_cfgs):
        raise ValueError("register_chain supports matrix stages only (no bspline)")
    if use_mask is None:
        use_mask = [fixed_mask is not None or moving_mask is not None] * len(stage_cfgs)

    fixed_dev = jnp.asarray(fixed_arr, jnp.float32)
    moving_dev = jnp.asarray(moving_arr, jnp.float32)
    fmask_dev = jnp.asarray(fixed_mask, jnp.float32) if fixed_mask is not None else None
    mmask_dev = jnp.asarray(moving_mask, jnp.float32) if moving_mask is not None else None
    extras_dev = (
        jnp.stack([jnp.asarray(e, jnp.float32) for e in extras])
        if extras is not None and len(extras) else None
    )
    n_extras = 0 if extras_dev is None else int(extras_dev.shape[0])

    use_fmask = [bool(u) and fmask_dev is not None for u in use_mask]
    use_mmask = [bool(u) and mmask_dev is not None for u in use_mask]
    statics = _chain_statics(stage_cfgs, use_fmask, use_mmask)
    center, scales, sigmas = _chain_host_args(stage_cfgs, fixed_dev.shape, fixed_affine)
    seeds = tuple(jnp.asarray(cfg.seed, jnp.int32) for cfg in stage_cfgs)

    init = jnp.asarray(
        np.eye(4, dtype=np.float32) if init_matrix is None else np.asarray(init_matrix, np.float32)
    )

    Ms, warped, warped_extras, losses = _optimize_chain_impl(
        fixed_dev, jnp.asarray(fixed_affine, jnp.float32),
        fmask_dev if any(use_fmask) else None,
        moving_dev, jnp.asarray(moving_affine, jnp.float32),
        mmask_dev if any(use_mmask) else None,
        extras_dev, init, jnp.asarray(center), scales, sigmas, seeds,
        statics, n_extras, int(stage_cfgs[-1].final_interp_order),
    )
    Ms_host = [np.asarray(M, np.float64) for M in Ms]
    info = {"losses": [np.asarray(l) for l in losses]}
    # Per-stage stall diagnostics; `stalled` reflects the FINAL stage.
    info["stages"] = [_stall_diagnostics(np.asarray(l)) for l in info["losses"]]
    info.update(info["stages"][-1])
    return Ms_host, warped, warped_extras, info


def register_chain_batch(
    fixed_arr,
    fixed_affine: np.ndarray,
    moving_arrs,
    moving_affine: np.ndarray,
    stage_cfgs: Sequence["RegistrationParams"],
    fixed_mask=None,
    use_mask: Optional[Sequence[bool]] = None,
):
    """Batched :func:`register_chain`: register a STACK of moving images
    (shared grid) through the full stage chain in one vmapped program —
    the intra-registration case (SURVEY §2.10 "batch registrations as a
    vmapped/jitted optimization").

    Returns ``(Ms (M, S, 4, 4) cumulative per stage, warped (M, ...) device
    array, info)``.
    """
    stage_cfgs = list(stage_cfgs)
    if any(cfg.transform == "bspline" for cfg in stage_cfgs):
        raise ValueError("register_chain_batch supports matrix stages only")
    if use_mask is None:
        use_mask = [fixed_mask is not None] * len(stage_cfgs)

    fixed_dev = jnp.asarray(fixed_arr, jnp.float32)
    moving_dev = jnp.asarray(moving_arrs, jnp.float32)
    fmask_dev = jnp.asarray(fixed_mask, jnp.float32) if fixed_mask is not None else None
    n_img = int(moving_dev.shape[0])

    use_fmask = [bool(u) and fmask_dev is not None for u in use_mask]
    statics = _chain_statics(stage_cfgs, use_fmask, [False] * len(stage_cfgs))
    center, scales, sigmas = _chain_host_args(stage_cfgs, fixed_dev.shape, fixed_affine)

    f_aff = jnp.asarray(fixed_affine, jnp.float32)
    m_aff = jnp.asarray(moving_affine, jnp.float32)
    center_dev = jnp.asarray(center)
    init = jnp.eye(4, dtype=jnp.float32)

    def _one(m_arr, seed_offset):
        seeds = tuple(
            jnp.asarray(cfg.seed, jnp.int32) + seed_offset for cfg in stage_cfgs
        )
        Ms, warped, _extras, losses = _optimize_chain_impl(
            fixed_dev, f_aff, fmask_dev if any(use_fmask) else None,
            m_arr, m_aff, None,
            None, init, center_dev, scales, sigmas, seeds,
            statics, 0, int(stage_cfgs[-1].final_interp_order),
        )
        return jnp.stack(Ms), warped, losses

    Ms, warped, losses = jax.vmap(_one)(moving_dev, jnp.arange(n_img, dtype=jnp.int32))
    info = {"losses": [np.asarray(l) for l in losses]}
    return np.asarray(Ms, np.float64), warped, info


def _seed_theta_from_matrix(
    params: RegistrationParams, init_matrix, center
) -> np.ndarray:
    """Initial parameters from a prior world->world matrix.

    Our parametrization is ``x' = R (x - c) + c + t``, so ``t = M[:3,3] -
    c + R c``. Translation stages take t with R=I; affine stages also seed
    the linear part (``theta[:9] = (M_lin - I).ravel()``). Rigid stages
    seed translation only (Euler extraction from a possibly-non-orthogonal
    prior is ill-defined) — close enough to warm-start the capture range.
    """
    theta0 = np.zeros(params.nparams, np.float32)
    if init_matrix is None:
        return theta0
    M = np.asarray(init_matrix, np.float64)
    center = np.asarray(center, np.float64)
    if params.transform == "translation":
        theta0[:3] = M[:3, 3]
    elif params.transform == "rigid":
        theta0[3:6] = M[:3, 3] + M[:3, :3] @ center - center
    else:  # affine
        theta0[:9] = (M[:3, :3] - np.eye(3)).ravel()
        theta0[9:12] = M[:3, 3] + M[:3, :3] @ center - center
    return theta0


def _param_scale(transform: str, fixed_shape, spacing) -> np.ndarray:
    """Natural parameter scales: ~0.1 rad rotations, ~1/10 FOV translations."""
    fov = float(np.mean(np.asarray(fixed_shape) * np.asarray(spacing)))
    t_scale = max(fov / 10.0, 1.0)
    if transform == "translation":
        return np.full(3, t_scale, np.float32)
    if transform == "rigid":
        return np.concatenate([np.full(3, 0.1), np.full(3, t_scale)]).astype(np.float32)
    return np.concatenate([np.full(9, 0.1), np.full(3, t_scale)]).astype(np.float32)


def register_pair(
    fixed_arr: np.ndarray,
    fixed_affine: np.ndarray,
    moving_arr: np.ndarray,
    moving_affine: np.ndarray,
    params: RegistrationParams,
    fixed_mask: Optional[np.ndarray] = None,
    init_matrix: Optional[np.ndarray] = None,
    moving_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Multi-resolution registration of one moving image to the fixed image.

    Returns ``(M, theta, info)`` where ``M`` is the 4x4 world->world
    transform (fixed-world point → moving-world point), ``theta`` the raw
    parameter vector of the final level, and ``info`` diagnostic losses.
    """
    # The whole multi-resolution stage is ONE jitted program (smoothing
    # pyramid, level scan, Adam): full volumes go host->device exactly once
    # and a fresh process pays a single compile / executable load instead
    # of one per pyramid level.
    fixed_dev = jnp.asarray(fixed_arr, jnp.float32)
    moving_dev = jnp.asarray(moving_arr, jnp.float32)
    mask_dev = jnp.asarray(fixed_mask, jnp.float32) if fixed_mask is not None else None
    mmask_dev = jnp.asarray(moving_mask, jnp.float32) if moving_mask is not None else None

    # World-space center of the fixed image (rotation center).
    center_idx = (np.asarray(fixed_dev.shape) - 1) / 2.0
    center = (np.asarray(fixed_affine) @ np.array([*center_idx, 1.0]))[:3].astype(np.float32)

    spacing = np.sqrt((np.asarray(fixed_affine)[:3, :3] ** 2).sum(0))

    theta0 = _seed_theta_from_matrix(params, init_matrix, center)

    theta_host, losses = _run_pyramid_stage(
        fixed_dev, fixed_affine, mask_dev, moving_dev, moving_affine,
        theta0, center, spacing, params, moving_mask=mmask_dev,
    )
    M = _params_to_matrix_np(theta_host, center, params.transform)
    info = {"losses": [np.asarray(l) for l in losses]}
    info.update(_stall_diagnostics(info["losses"]))
    return M, theta_host, info


def _stall_diagnostics(losses_per_level) -> dict:
    """Optimizer-stall diagnostics from the per-level loss traces.

    ``stalled=True`` means the FINEST level's loss did not measurably
    improve over its first iterations — the registration likely failed to
    engage (featureless image, no overlap, metric plateau) and the result
    should be treated with suspicion. Note a pair that STARTS at the
    optimum (perfect initialization) also shows no decrease; combine with
    the loss value when interpreting. The thresholds are deliberately
    loose: stochastic-metric noise makes per-iteration losses jitter, so we
    compare medians of the first and last deciles.
    """
    finest = np.asarray(losses_per_level[-1], np.float64).ravel()
    if finest.size < 10:
        return {"stalled": False, "loss_decrease": 0.0}
    k = max(1, finest.size // 10)
    start = float(np.median(finest[:k]))
    end = float(np.median(finest[-k:]))
    decrease = start - end
    scale = max(abs(start), 1e-12)
    return {
        "stalled": bool(decrease < 1e-4 * scale),
        "loss_decrease": decrease,
    }


def _pyramid_sigmas(resolutions: int) -> np.ndarray:
    """Per-level smoothing sigmas (voxels): factor/2 for factor 2^(L-1-l),
    0 at the finest level — the smoothing-pyramid equivalent of the classic
    decimate-by-2 schedule."""
    factors = [2 ** (resolutions - 1 - lvl) for lvl in range(resolutions)]
    return np.array([f / 2.0 if f > 1 else 0.0 for f in factors], np.float32)


def _run_pyramid_stage(
    fixed_dev, fixed_affine, mask_dev, moving_dev, moving_affine,
    theta0, center, spacing, params: RegistrationParams,
    moving_mask=None,
):
    """Drive :func:`_optimize_pyramid` for one parameter stage."""
    scale = _param_scale(params.transform, fixed_dev.shape, spacing)
    sigmas = _stage_sigmas(params)
    theta, losses = _optimize_pyramid(
        fixed_dev, jnp.asarray(fixed_affine, jnp.float32), mask_dev,
        moving_dev, jnp.asarray(moving_affine, jnp.float32),
        jnp.asarray(theta0, jnp.float32), jnp.asarray(scale),
        jnp.asarray(center), jnp.asarray(sigmas),
        params.transform, params.metric,
        params.iterations, params.num_samples, params.num_bins,
        params.learning_rate, params.seed,
        moving_mask=moving_mask,
        radius=_smooth_radius_for_sigmas(sigmas),
        mi_kernel=params.mi_kernel,
        interp_order=int(params.interp_order),
    )
    return np.asarray(theta), np.asarray(losses)


def warp_volume_chain(moving_arr, stages, fixed_affine, moving_affine, fixed_shape,
                      order: int = 1):
    """Resample through a mixed transform chain (matrices + B-spline FFDs).

    ``stages``: sequence of ``("matrix", M)`` or ``("bspline", ctrl, spacing_vox)``
    in estimation order (stage 1 first). The fixed-world point passes through
    the stages innermost-last: ``y = T1(T2(...Tn(x)))`` — matching the
    sequential-registration composition, with ONE final interpolation at
    spline ``order`` (0 nearest / 1 trilinear / 3 cubic B-spline).
    """
    fixed_shape = tuple(int(s) for s in fixed_shape)

    stages = list(stages)
    if all(kind == "matrix" for kind, *_ in stages):
        # Matrix-only chain: compose on host and run the single jitted warp
        # (one compiled program instead of an eager op stream).
        M = compose_transforms([payload[0] for _kind, *payload in stages])
        return warp_volume(moving_arr, M, fixed_affine, moving_affine, fixed_shape,
                           order=order)

    # Mixed chain: one jitted program (the eager op-by-op version streamed
    # dozens of single-op XLA dispatches over the full grid per stage).
    kinds = tuple(kind for kind, *_ in stages)
    if any(k not in ("matrix", "bspline") for k in kinds):
        bad = [k for k in kinds if k not in ("matrix", "bspline")]
        raise ValueError(f"Unknown stage kind {bad[0]}")
    payloads = tuple(
        tuple(jnp.asarray(x, jnp.float32) for x in payload) for _kind, *payload in stages
    )
    return _warp_chain_impl(
        jnp.asarray(moving_arr, jnp.float32),
        jnp.asarray(fixed_affine, jnp.float32),
        jnp.asarray(moving_affine, jnp.float32),
        payloads,
        kinds,
        fixed_shape,
        int(order),
    )


@functools.partial(jax.jit, static_argnames=("kinds", "fixed_shape", "order"))
def _warp_chain_impl(moving_arr, fixed_affine, moving_affine, payloads, kinds,
                     fixed_shape, order=1):
    from dosma_tpu.ops.bspline import bspline_displacement

    inv_fixed = jnp.linalg.inv(fixed_affine)
    inv_moving = jnp.linalg.inv(moving_affine)

    d0, d1, d2 = fixed_shape
    i, j, k = jnp.meshgrid(
        jnp.arange(d0, dtype=jnp.float32),
        jnp.arange(d1, dtype=jnp.float32),
        jnp.arange(d2, dtype=jnp.float32),
        indexing="ij",
    )
    n = d0 * d1 * d2
    idx = jnp.stack([i.ravel(), j.ravel(), k.ravel(), jnp.ones(n, jnp.float32)])
    world = _mm(fixed_affine, idx)

    for kind, payload in reversed(list(zip(kinds, payloads))):
        if kind == "matrix":
            world = _mm(payload[0], world)
        else:  # bspline
            ctrl, spacing_vox = payload
            fidx = _mm(inv_fixed, world)[:3]
            disp = bspline_displacement(ctrl, fidx, spacing_vox)
            world = world.at[:3].add(disp)

    m_idx = _mm(inv_moving, world)
    out = _sample_order(moving_arr, m_idx[:3], order)
    return out.reshape(fixed_shape)


@functools.partial(
    jax.jit,
    static_argnames=("stage_statics", "metric", "num_bins", "mi_kernel", "interp_order"),
)
def _optimize_bspline_chain(
    fixed_arr, fixed_affine, fixed_mask,
    moving_arr, moving_affine, moving_mask,
    ctrl0, spacings, bending_weight, seed,
    stage_statics, metric: str, num_bins: int,
    mi_kernel: str = "cubic", interp_order: int = 1,
):
    """The FULL multi-grid FFD chain as ONE jitted program.

    Multi-grid (Rueckert) schedule: optimize a coarse control grid on a
    heavily smoothed image pair, then subdivide the grid (exact cubic
    knot insertion, :func:`~dosma_tpu.ops.bspline.subdivide_control_grid`)
    and continue at half the control spacing on a less-smoothed pair —
    the deformable analog of elastix's GridSpacingSchedule +
    FixedSmoothingImagePyramid. Every stage works on the FULL-resolution
    grid under a per-stage Gaussian (constant shapes, no decimation), so
    the whole chain — smoothing, sampling, Adam, subdivision — runs
    device-resident with ZERO host round-trips (the previous per-level
    driver pulled each downsampled volume AND the control grid back to
    host between levels; through a tunneled backend those D2H transfers
    dominated the stage wall).

    ``stage_statics``: per-stage ``(grid_shape, sigma, radius, iterations,
    num_samples, lr)``. ``spacings``: (n_stages, 3) control spacing in
    fixed-index units. Returns ``(ctrl_final, losses_per_stage)``.
    """
    import optax

    from dosma_tpu.ops.bspline import (
        bending_energy,
        bspline_displacement,
        subdivide_control_grid,
    )

    fshape = fixed_arr.shape
    B_fix = fixed_affine
    inv_moving = jnp.linalg.inv(moving_affine)
    f_lo, f_hi = jnp.min(fixed_arr), jnp.max(fixed_arr)
    m_lo, m_hi = jnp.min(moving_arr), jnp.max(moving_arr)

    ctrl = ctrl0
    losses_all = []
    n_stages = len(stage_statics)
    for g, (grid_shape, sigma, radius, iterations, num_samples, lr) in enumerate(
        stage_statics
    ):
        if iterations <= 0:
            # Zero-iteration stages (elastix allows 0 in per-level
            # MaximumNumberOfIterations vectors) pass the control grid
            # through unchanged rather than dividing by zero in the
            # Polyak tail average below.
            losses_all.append(jnp.zeros((0,), jnp.float32))
            if g + 1 < n_stages:
                ctrl = subdivide_control_grid(ctrl, stage_statics[g + 1][0])
            continue
        spacing_vox = spacings[g]
        if sigma > 0:
            f_s = _gauss_smooth3(fixed_arr, sigma, radius)
            m_s = _gauss_smooth3(moving_arr, sigma, radius)
            mask_s = _gauss_smooth3(fixed_mask, sigma, radius) if fixed_mask is not None else None
            mmask_s = _gauss_smooth3(moving_mask, sigma, radius) if moving_mask is not None else None
        else:
            f_s, m_s, mask_s, mmask_s = fixed_arr, moving_arr, fixed_mask, moving_mask
        if interp_order == 3:
            from dosma_tpu.ops.interp import cubic_coeffs, cubic_sample_coeffs

            m_cp = cubic_coeffs(m_s)
        else:
            m_cp = None

        # Fixed-side quantities don't depend on ctrl: draw EVERY iteration's
        # sample coordinates up front and gather values/weights/world coords
        # in one batched pass (same trick as the matrix-stage _pyramid_core).
        key = jax.random.fold_in(jax.random.PRNGKey(seed), g)
        u = jax.random.uniform(key, (iterations, 3, num_samples))
        idx_all = u * (jnp.array(fshape, jnp.float32)[None, :, None] - 1)
        flat = idx_all.transpose(1, 0, 2).reshape(3, iterations * num_samples)
        fixed_vals_all = _trilinear_sample(f_s, flat).reshape(iterations, num_samples)
        w0_all = (
            _trilinear_sample(mask_s, flat).reshape(iterations, num_samples)
            if mask_s is not None
            else jnp.ones((iterations, num_samples))
        )
        flat_h = jnp.concatenate([flat, jnp.ones((1, iterations * num_samples))], axis=0)
        world_all = _mm(B_fix, flat_h).reshape(4, iterations, num_samples).transpose(1, 0, 2)

        def loss_fn(ctrl_g, fixed_vals, w0, world, idx, spacing_vox=spacing_vox,
                    m_s=m_s, m_cp=m_cp, mmask_s=mmask_s,
                    f_lo=f_lo, f_hi=f_hi, m_lo=m_lo, m_hi=m_hi):
            disp = bspline_displacement(ctrl_g, idx, spacing_vox)
            world = world.at[:3].add(disp)
            m_idx = _mm(inv_moving, world)[:3]
            if interp_order == 3:
                moving_vals = cubic_sample_coeffs(m_cp, m_idx)
            else:
                moving_vals = _trilinear_sample(m_s, m_idx)
            inside = jnp.all(
                (m_idx >= 0) & (m_idx <= jnp.array(m_s.shape, jnp.float32)[:, None] - 1),
                axis=0,
            )
            weights = w0 * (0.01 + 0.99 * inside)
            if mmask_s is not None:
                weights = weights * _trilinear_sample(mmask_s, m_idx)

            if metric == "mi":
                data_loss = _soft_mi(
                    fixed_vals, moving_vals, weights, num_bins, f_lo, f_hi, m_lo, m_hi,
                    kernel=mi_kernel,
                )
            elif metric == "ncc":
                data_loss = _ncc(fixed_vals, moving_vals, weights)
            else:
                data_loss = _mse(fixed_vals, moving_vals, weights)
            return data_loss + bending_weight * bending_energy(ctrl_g)

        opt = optax.adam(
            optax.cosine_decay_schedule(lr, max(1, iterations), alpha=0.1)
        )

        # Polyak tail averaging: the stochastic per-iteration metric makes
        # the annealed iterates bounce around the optimum at the final-step
        # scale (~0.1 voxel measured at bench scale); averaging the last
        # quarter of the iterates cancels that zero-mean noise without
        # shrinking the steps (and without the slow crawl a deeper anneal
        # would cost). Matches ASGD theory (Polyak–Juditsky).
        tail_start = max(0, iterations - max(1, iterations // 4))

        def step(carry, xs, loss_fn=loss_fn, opt=opt, tail_start=tail_start):
            ctrl_g, opt_state, acc = carry
            fixed_vals, w0, world, idx, it = xs
            loss, grads = jax.value_and_grad(loss_fn)(ctrl_g, fixed_vals, w0, world, idx)
            updates, opt_state = opt.update(grads, opt_state)
            ctrl_g = optax.apply_updates(ctrl_g, updates)
            acc = acc + jnp.where(it >= tail_start, 1.0, 0.0) * ctrl_g
            return (ctrl_g, opt_state, acc), loss

        # Only the Polyak tail average propagates — the last iterate is
        # deliberately discarded. (iterations=0 is a legal no-op stage:
        # no tail samples, keep the carried control grid.)
        (ctrl_fin, _, acc), losses = jax.lax.scan(
            step, (ctrl, opt.init(ctrl), jnp.zeros_like(ctrl)),
            (fixed_vals_all, w0_all, world_all, idx_all,
             jnp.arange(iterations, dtype=jnp.int32)),
        )
        n_tail = iterations - tail_start
        ctrl = acc / float(n_tail) if n_tail > 0 else ctrl_fin
        losses_all.append(losses)

        if g + 1 < n_stages:
            ctrl = subdivide_control_grid(ctrl, stage_statics[g + 1][0])

    return ctrl, tuple(losses_all)


def _bspline_stage_plan(fixed_shape, fixed_affine, params: "RegistrationParams"):
    """Coarse→fine multi-grid plan: per-stage control grid shape + spacing
    (index units), smoothing sigma, and learning rate.

    Stage ``g`` of ``n`` uses control spacing ``final * 2^(n-1-g)`` and the
    matrix-stage pyramid sigma for that level; grids refine by exact
    subdivision between stages (spacings halve, so grid shapes follow
    ``floor(D / s) + 4``, matching :func:`make_control_grid` at the final
    stage).
    """
    from dosma_tpu.ops.bspline import make_control_grid

    sched = _stage_sigmas(params)
    n = len(sched)
    _, spacing_final = make_control_grid(
        fixed_shape, fixed_affine, params.grid_spacing_mm, params.grid_spacing_vox
    )
    sigmas = sched
    shapes, spacings, stage_sigmas, lrs = [], [], [], []
    for g in range(n):
        # Same grid-shape convention as the final stage by construction:
        # make_control_grid owns the floor(D/s)+4 / min-4 margin formula.
        shape, s = make_control_grid(
            fixed_shape, fixed_affine, None,
            grid_spacing_vox=spacing_final * (2 ** (n - 1 - g)),
        )
        shapes.append(shape)
        spacings.append(s.astype(np.float32))
        stage_sigmas.append(float(sigmas[g]))
        # Displacements are in mm: scale the step size by the stage's
        # control spacing so coarse grids take proportionally larger steps.
        lrs.append(params.learning_rate * float(np.mean(s)))
    return shapes, spacings, stage_sigmas, lrs


def register_pair_bspline(
    fixed_arr: np.ndarray,
    fixed_affine: np.ndarray,
    moving_arr: np.ndarray,
    moving_affine: np.ndarray,
    params: RegistrationParams,
    fixed_mask: Optional[np.ndarray] = None,
    moving_mask: Optional[np.ndarray] = None,
):
    """Multi-grid, multi-resolution B-spline FFD registration.

    The whole coarse→fine chain (per-stage smoothing pyramid, Adam
    optimization, control-grid subdivision) runs as ONE compiled XLA
    program (ref: elastix's BSplineTransform stage,
    ``/root/reference/dosma/core/registration.py:374-449``).

    Returns ``(ctrl (3, gx, gy, gz), spacing_vox (3,), info)`` — the control
    displacements in world mm over the full-resolution fixed index grid at
    the FINAL (``params.grid_spacing_mm``) control spacing.
    """
    fixed_dev = jnp.asarray(fixed_arr, jnp.float32)
    moving_dev = jnp.asarray(moving_arr, jnp.float32)

    shapes, spacings, sigmas, lrs = _bspline_stage_plan(
        fixed_dev.shape, fixed_affine, params
    )
    stage_iters, stage_samples = params.level_budget(len(shapes))
    stage_statics = tuple(
        (
            shapes[g],
            sigmas[g],
            # Exact per-stage kernel radius (sigma is static per stage in
            # the chain, unlike the matrix pyramid's shared traced
            # schedule): a fine stage (sigma ~0.5) must not pay the
            # coarsest stage's tap count for its 3 separable full-volume
            # convolutions, and needs no _SMOOTH_RADIUS floor.
            max(1, int(np.ceil(3.0 * float(sigmas[g])))),
            stage_iters[g],
            stage_samples[g],
            float(lrs[g]),
        )
        for g in range(len(shapes))
    )

    ctrl0 = jnp.zeros((3, *shapes[0]), jnp.float32)
    ctrl, losses = _optimize_bspline_chain(
        fixed_dev, jnp.asarray(fixed_affine, jnp.float32),
        jnp.asarray(fixed_mask, jnp.float32) if fixed_mask is not None else None,
        moving_dev, jnp.asarray(moving_affine, jnp.float32),
        jnp.asarray(moving_mask, jnp.float32) if moving_mask is not None else None,
        ctrl0, jnp.asarray(np.stack(spacings)), jnp.asarray(params.bending_weight, jnp.float32),
        jnp.asarray(params.seed, jnp.int32),
        stage_statics, params.metric, int(params.num_bins),
        mi_kernel=params.mi_kernel, interp_order=int(params.interp_order),
    )
    info = {"losses": [np.asarray(l) for l in losses]}
    info.update(_stall_diagnostics(info["losses"]))
    return np.asarray(ctrl), np.asarray(spacings[-1]), info


def register_pair_batch(
    fixed_arr: np.ndarray,
    fixed_affine: np.ndarray,
    moving_arrs: np.ndarray,
    moving_affine: np.ndarray,
    params: RegistrationParams,
    fixed_mask: Optional[np.ndarray] = None,
):
    """Register a BATCH of moving images to one fixed image in a single
    vmapped optimization (SURVEY §2.10: "batch registrations as a
    vmapped/jitted optimization").

    ``moving_arrs``: (M, d0, d1, d2), all sharing ``moving_affine`` — the
    intra-registration case (e.g. CubeQuant spin locks). Returns
    ``(Ms (M, 4, 4), thetas (M, P), info)``.
    """
    # One vmapped whole-pyramid program: the moving stack goes host->device
    # once and every image optimizes all levels in a single XLA program.
    fixed_dev = jnp.asarray(fixed_arr, jnp.float32)
    moving_dev = jnp.asarray(moving_arrs, jnp.float32)
    mask_dev = jnp.asarray(fixed_mask, jnp.float32) if fixed_mask is not None else None
    M_count = moving_dev.shape[0]

    center_idx = (np.asarray(fixed_dev.shape) - 1) / 2.0
    center = (np.asarray(fixed_affine) @ np.array([*center_idx, 1.0]))[:3].astype(np.float32)
    spacing = np.sqrt((np.asarray(fixed_affine)[:3, :3] ** 2).sum(0))

    scale = jnp.asarray(_param_scale(params.transform, fixed_dev.shape, spacing))
    sigmas_host = _stage_sigmas(params)
    sigmas = jnp.asarray(sigmas_host)
    radius = _smooth_radius_for_sigmas(sigmas_host)
    f_aff = jnp.asarray(fixed_affine, jnp.float32)
    m_aff = jnp.asarray(moving_affine, jnp.float32)
    center_dev = jnp.asarray(center)
    thetas0 = jnp.zeros((M_count, params.nparams), jnp.float32)

    def _one(m_arr, theta0, seed_offset):
        return _optimize_pyramid(
            fixed_dev, f_aff, mask_dev, m_arr, m_aff,
            theta0, scale, center_dev, sigmas,
            params.transform, params.metric,
            params.iterations, params.num_samples, params.num_bins,
            params.learning_rate, params.seed + seed_offset,
            radius=radius,
            mi_kernel=params.mi_kernel,
            interp_order=int(params.interp_order),
        )

    thetas, losses = jax.vmap(_one)(moving_dev, thetas0, jnp.arange(M_count))
    thetas = np.asarray(thetas)
    info = {"losses": [np.asarray(l) for l in losses.swapaxes(0, 1)]}

    Ms = np.stack(
        [_params_to_matrix_np(thetas[i], center, params.transform) for i in range(M_count)]
    )
    return Ms, thetas, info


def compose_transforms(matrices: Sequence[np.ndarray]) -> np.ndarray:
    """Compose sequential stage transforms into one world map.

    Stage i+1 is estimated on the warped output of stage i, which lives on
    the fixed grid: ``W2(i) = W1(A_f^-1 M2 A_f i) = Moving(A_m^-1 (M1 M2) A_f i)``
    — so the total fixed-world → moving-world map is ``M1 @ M2 @ ... @ Mn``,
    and the chain resamples the moving image exactly once.
    """
    out = np.eye(4)
    for M in matrices:
        out = out @ np.asarray(M)
    return out
