"""Elastix-grade registration recovery tests (VERDICT r1 item 2).

Every case runs on an ANISOTROPIC grid (0.5 x 0.6 x 2.0 mm) with a
non-trivial origin, and asserts sub-half-voxel recovery of a known ground
truth — rotation >= 10 deg, affine shear/scale, a known B-spline warp, and
a multi-modal (gamma-remapped) rigid problem for the MI metric.

Conventions under test: ``register_pair`` returns the fixed-world ->
moving-world map, so recovering a synthetic warp ``M_true`` means
``M_est ~= inv(M_true)``; the FFD stage estimates the INVERSE displacement
field (``d_est ~= -d_true`` for small warps).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dosma_tpu.ops.bspline import bspline_displacement, make_control_grid
from dosma_tpu.ops.registration import (
    RegistrationParams,
    register_pair,
    register_pair_bspline,
    warp_volume,
    warp_volume_chain,
)

SHAPE = (48, 48, 24)
SPACING = np.array([0.5, 0.6, 2.0])  # anisotropic, MR-like (thick slices)


def _affine():
    aff = np.diag([*SPACING, 1.0])
    aff[:3, 3] = [-12.0, 8.0, -20.0]
    return aff


def _smooth_blobs(shape=SHAPE, seed=1, n=40):
    """Smooth random blob phantom: structure at several scales, no symmetry."""
    rs = np.random.RandomState(seed)
    img = np.zeros(shape, np.float32)
    grid = np.mgrid[0 : shape[0], 0 : shape[1], 0 : shape[2]].astype(np.float32)
    for _ in range(n):
        c = rs.rand(3) * (np.array(shape) - 1)
        s = 2 + rs.rand(3) * 4
        img += rs.rand() * np.exp(
            -(((grid[0] - c[0]) / s[0]) ** 2 + ((grid[1] - c[1]) / s[1]) ** 2 + ((grid[2] - c[2]) / s[2]) ** 2)
        )
    return img


def _center_world(affine, shape=SHAPE):
    cidx = (np.array(shape) - 1) / 2.0
    return (affine @ np.r_[cidx, 1.0])[:3]


def _corner_error_vox(M_est, M_true, affine):
    """Max displacement discrepancy over the volume corners, in (min-spacing)
    voxels — the elastix-style target-registration-error surrogate."""
    corners = np.array(
        [[i, j, k, 1.0] for i in (0, SHAPE[0] - 1) for j in (0, SHAPE[1] - 1) for k in (0, SHAPE[2] - 1)]
    )
    w = affine @ corners.T
    err_mm = np.linalg.norm((M_est @ w - np.linalg.inv(M_true) @ w)[:3], axis=0).max()
    return err_mm / SPACING.min()


@pytest.fixture(scope="module")
def phantom():
    return _smooth_blobs()


class TestRigidRecovery:
    @pytest.mark.parametrize("metric", ["mse", "mi"])
    def test_rotation_12deg(self, phantom, metric):
        A = _affine()
        cw = _center_world(A)
        ang = np.deg2rad(12.0)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        M_true = np.eye(4)
        M_true[:3, :3] = R
        M_true[:3, 3] = cw - R @ cw + np.array([1.5, -2.0, 3.0])
        moving = np.asarray(warp_volume(phantom, M_true, A, A, SHAPE))

        params = RegistrationParams(
            transform="rigid", metric=metric, resolutions=3, iterations=300, num_samples=2048
        )
        M, _, _ = register_pair(phantom, A, moving, A, params)
        err = _corner_error_vox(M, M_true, A)
        assert err < 0.5, f"rotation recovery error {err:.2f} voxels"


class TestAffineRecovery:
    @pytest.mark.parametrize("metric", ["mse", "mi"])
    def test_shear_scale(self, phantom, metric):
        A = _affine()
        cw = _center_world(A)
        # 6% scale, 8%/5%/2% shear, plus translation.
        L = np.array([[1.06, 0.08, 0.0], [0.0, 0.95, 0.05], [0.02, 0.0, 1.03]])
        M_true = np.eye(4)
        M_true[:3, :3] = L
        M_true[:3, 3] = cw - L @ cw + np.array([1.0, -1.5, 2.0])
        moving = np.asarray(warp_volume(phantom, M_true, A, A, SHAPE))

        params = RegistrationParams(
            transform="affine", metric=metric, resolutions=3, iterations=400, num_samples=2048
        )
        M, _, _ = register_pair(phantom, A, moving, A, params)
        err = _corner_error_vox(M, M_true, A)
        assert err < 0.5, f"affine recovery error {err:.2f} voxels"


class TestMultiModalMI:
    def test_gamma_remapped_moving(self, phantom):
        """MI must align images whose intensities are NOT linearly related."""
        A = _affine()
        cw = _center_world(A)
        ang = np.deg2rad(10.0)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        M_true = np.eye(4)
        M_true[:3, :3] = R
        M_true[:3, 3] = cw - R @ cw + np.array([1.0, 1.0, -2.0])
        moving = np.asarray(warp_volume(phantom, M_true, A, A, SHAPE))
        # Nonlinear intensity remap: gamma 2.2 plus affine rescale.
        mn, mx = moving.min(), moving.max()
        remapped = ((moving - mn) / (mx - mn + 1e-9)) ** 2.2 * 50 + 5

        params = RegistrationParams(
            transform="rigid", metric="mi", resolutions=3, iterations=400, num_samples=2048
        )
        M, _, _ = register_pair(phantom, A, remapped, A, params)
        err = _corner_error_vox(M, M_true, A)
        assert err < 0.5, f"multi-modal MI recovery error {err:.2f} voxels"

    def test_mse_fails_where_mi_succeeds(self, phantom):
        """Sanity check that the multi-modal case actually NEEDS MI: the MSE
        metric must do substantially worse on the remapped pair."""
        A = _affine()
        cw = _center_world(A)
        ang = np.deg2rad(10.0)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        M_true = np.eye(4)
        M_true[:3, :3] = R
        M_true[:3, 3] = cw - R @ cw
        moving = np.asarray(warp_volume(phantom, M_true, A, A, SHAPE))
        mn, mx = moving.min(), moving.max()
        # Inverted-contrast remap: bright <-> dark.
        remapped = (1 - (moving - mn) / (mx - mn + 1e-9)) * 30

        mi = RegistrationParams(transform="rigid", metric="mi", resolutions=3, iterations=300)
        mse = RegistrationParams(transform="rigid", metric="mse", resolutions=3, iterations=300)
        M_mi, _, _ = register_pair(phantom, A, remapped, A, mi)
        M_mse, _, _ = register_pair(phantom, A, remapped, A, mse)
        err_mi = _corner_error_vox(M_mi, M_true, A)
        err_mse = _corner_error_vox(M_mse, M_true, A)
        assert err_mi < 0.5
        assert err_mse > 2 * err_mi, f"mse={err_mse:.2f} vs mi={err_mi:.2f}"


class TestNonMonotoneMI:
    """Bin-permuted intensity LUTs (VERDICT r3 next-5): the remap is NOT
    monotone, so metrics that track intensity agreement (MSE; NCC likewise)
    cannot align the pair — only mutual information can. This is the regime
    Mattes MI exists for (the reference's default metric,
    ``/root/reference/dosma/resources/elastix/params/parameters-affine.txt``).
    """

    N_BINS = 16

    @staticmethod
    def _permute_lut(img, seed=11, n_bins=16):
        """Quantize to ``n_bins`` levels and shuffle the level values."""
        rs = np.random.RandomState(seed)
        perm = rs.permutation(n_bins).astype(np.float64)
        mn, mx = img.min(), img.max()
        q = np.clip(((img - mn) / (mx - mn + 1e-9) * n_bins).astype(int), 0, n_bins - 1)
        return perm[q] * 10.0 + 5.0

    def test_rigid_mi_recovers_mse_fails(self, phantom):
        """Done-criterion from the r3 verdict: MSE errs > 1 vox while MI
        recovers < 0.2 vox on the identical bin-permuted problem."""
        A = _affine()
        cw = _center_world(A)
        ang = np.deg2rad(10.0)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        M_true = np.eye(4)
        M_true[:3, :3] = R
        M_true[:3, 3] = cw - R @ cw + np.array([1.0, 1.0, -2.0])
        moving = self._permute_lut(np.asarray(warp_volume(phantom, M_true, A, A, SHAPE)))

        mi = RegistrationParams(
            transform="rigid", metric="mi", resolutions=3, iterations=400, num_samples=2048
        )
        mse = RegistrationParams(
            transform="rigid", metric="mse", resolutions=3, iterations=400, num_samples=2048
        )
        M_mi, _, _ = register_pair(phantom, A, moving, A, mi)
        M_mse, _, _ = register_pair(phantom, A, moving, A, mse)
        err_mi = _corner_error_vox(M_mi, M_true, A)
        err_mse = _corner_error_vox(M_mse, M_true, A)
        assert err_mi < 0.2, f"bin-permuted MI recovery error {err_mi:.3f} vox"
        assert err_mse > 1.0, f"MSE unexpectedly aligned the permuted pair ({err_mse:.3f})"

    def test_affine_mi(self, phantom):
        A = _affine()
        cw = _center_world(A)
        S = np.array([[1.06, 0.05, 0], [0.03, 0.95, 0], [0, 0, 1.02]])
        M_true = np.eye(4)
        M_true[:3, :3] = S
        M_true[:3, 3] = cw - S @ cw + np.array([0.8, -1.2, 1.5])
        moving = self._permute_lut(np.asarray(warp_volume(phantom, M_true, A, A, SHAPE)))

        p = RegistrationParams(
            transform="affine", metric="mi", resolutions=3, iterations=400, num_samples=2048
        )
        M, _, _ = register_pair(phantom, A, moving, A, p)
        err = _corner_error_vox(M, M_true, A)
        assert err < 0.5, f"bin-permuted affine MI recovery error {err:.3f} vox"

    def test_bspline_mi(self, phantom):
        """FFD recovery through a bin-permuted LUT: the estimated inverse
        displacement field must match -d_true to sub-half-voxel mean."""
        A = _affine()
        grid_shape, sp_vox = make_control_grid(SHAPE, A, 16.0)
        rs = np.random.RandomState(3)
        ctrl_true = (rs.rand(3, *grid_shape).astype(np.float32) - 0.5) * 2.0  # mm
        i, j, k = np.mgrid[0 : SHAPE[0], 0 : SHAPE[1], 0 : SHAPE[2]].astype(np.float32)
        pts = np.stack([i.ravel(), j.ravel(), k.ravel()])
        disp_mm = np.asarray(
            bspline_displacement(jnp.asarray(ctrl_true), jnp.asarray(pts), jnp.asarray(sp_vox))
        )
        disp_vox = np.linalg.inv(A)[:3, :3] @ disp_mm
        from scipy import ndimage

        moving = ndimage.map_coordinates(
            phantom, (pts + disp_vox).reshape(3, *SHAPE), order=1, mode="nearest"
        )
        moving = self._permute_lut(moving)

        p = RegistrationParams(
            transform="bspline", metric="mi", resolutions=3, iterations=300,
            num_samples=4096, grid_spacing_mm=16.0, bending_weight=1e-4,
        )
        ctrl_est, sp_est, _ = register_pair_bspline(phantom, A, moving, A, p)
        eval_pts = np.stack(np.mgrid[6:42:4, 6:42:4, 4:20:2].astype(np.float32)).reshape(3, -1)
        d_true = np.asarray(
            bspline_displacement(jnp.asarray(ctrl_true), jnp.asarray(eval_pts), jnp.asarray(sp_vox))
        )
        d_est = np.asarray(
            bspline_displacement(jnp.asarray(ctrl_est), jnp.asarray(eval_pts), jnp.asarray(sp_est))
        )
        err_vox = np.linalg.norm(d_est + d_true, axis=0) / SPACING.min()
        assert float(err_vox.mean()) < 0.3, f"mean FFD error {err_vox.mean():.3f} vox"
        assert float(err_vox.max()) < 1.0, f"max FFD error {err_vox.max():.3f} vox"


class TestBSplineRecovery:
    def test_known_ffd_warp(self, phantom):
        A = _affine()
        grid_shape, sp_vox = make_control_grid(SHAPE, A, 16.0)
        rs = np.random.RandomState(3)
        ctrl_true = (rs.rand(3, *grid_shape).astype(np.float32) - 0.5) * 4.0  # +-2 mm
        moving = np.asarray(
            warp_volume_chain(phantom, [("bspline", ctrl_true, sp_vox)], A, A, SHAPE)
        )

        params = RegistrationParams(
            transform="bspline",
            metric="mse",
            resolutions=3,
            iterations=300,
            num_samples=4096,
            grid_spacing_mm=16.0,
            bending_weight=1e-3,
        )
        ctrl, spv, _ = register_pair_bspline(phantom, A, moving, A, params)

        # Displacement-field accuracy on the interior: the FFD stage recovers
        # the INVERSE field, d_est ~= -d_true (|d| << its smoothness scale).
        ii, jj, kk = np.mgrid[8:40:4, 8:40:4, 4:20:2].astype(np.float32)
        pts = np.stack([ii.ravel(), jj.ravel(), kk.ravel()])
        d_true = np.asarray(
            bspline_displacement(jnp.asarray(ctrl_true), jnp.asarray(pts), jnp.asarray(sp_vox, jnp.float32))
        )
        d_est = np.asarray(
            bspline_displacement(jnp.asarray(ctrl), jnp.asarray(pts), jnp.asarray(spv, jnp.float32))
        )
        err_mm = np.linalg.norm(d_est + d_true, axis=0)
        assert err_mm.mean() < 0.5 * SPACING.min(), f"mean FFD error {err_mm.mean():.3f} mm"

        # Image-space alignment: warping the moving image back must cut the
        # interior RMSE by at least 2.5x.
        warped = np.asarray(warp_volume_chain(moving, [("bspline", ctrl, spv)], A, A, SHAPE))
        interior = (slice(6, -6), slice(6, -6), slice(3, -3))
        rmse_before = np.sqrt(((moving - phantom)[interior] ** 2).mean())
        rmse_after = np.sqrt(((warped - phantom)[interior] ** 2).mean())
        assert rmse_after < rmse_before / 2.5


class TestFacadeRecovery:
    def test_register_facade_rigid_affine_chain(self, phantom, tmp_path):
        """The public register() facade with shipped presets recovers a
        rotation+scale warp through the sequential rigid->affine chain."""
        from dosma_tpu.core.med_volume import MedicalVolume
        from dosma_tpu.core.registration import register

        A = _affine()
        cw = _center_world(A)
        ang = np.deg2rad(8.0)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        ) @ np.diag([1.04, 0.97, 1.0])
        M_true = np.eye(4)
        M_true[:3, :3] = R
        M_true[:3, 3] = cw - R @ cw + np.array([1.0, 0.5, -1.0])
        moving_arr = np.asarray(warp_volume(phantom, M_true, A, A, SHAPE))

        fixed_mv = MedicalVolume(phantom, A)
        moving_mv = MedicalVolume(moving_arr, A)
        out, vols = register(
            fixed_mv,
            moving_mv,
            parameters=["rigid", "affine"],
            output_path=str(tmp_path),
            sequential=True,
            collate=True,
            return_volumes=True,
            rtype=tuple,
        )
        warped = np.asarray(vols[0].volume)
        interior = (slice(6, -6), slice(6, -6), slice(3, -3))
        rmse_before = np.sqrt(((moving_arr - phantom)[interior] ** 2).mean())
        rmse_after = np.sqrt(((warped - phantom)[interior] ** 2).mean())
        assert rmse_after < rmse_before / 4, f"{rmse_before:.4f} -> {rmse_after:.4f}"


_CAPTURE_SHAPE = (96, 96, 32)
_CAPTURE_SPACING = np.array([1.5, 1.5, 3.0])  # FOV 144 x 144 x 96 mm (knee-like)


def _capture_affine():
    aff = np.diag([*_CAPTURE_SPACING, 1.0])
    aff[:3, 3] = [-70.0, -70.0, -48.0]
    return aff


def _capture_err_vox(M_est, M_true, aff, shape=_CAPTURE_SHAPE):
    corners = np.array(
        [[i, j, k, 1.0] for i in (0, shape[0] - 1) for j in (0, shape[1] - 1) for k in (0, shape[2] - 1)]
    )
    w = aff @ corners.T
    err_mm = np.linalg.norm((M_est @ w - np.linalg.inv(M_true) @ w)[:3], axis=0).max()
    return err_mm / _CAPTURE_SPACING.min()


@pytest.fixture(scope="module")
def capture_phantom():
    return _smooth_blobs(shape=_CAPTURE_SHAPE, seed=2, n=60)


class TestCaptureRange:
    """Large-initial-offset recovery (VERDICT r1 item 5): the smoothing
    pyramid must capture >= 10 mm translations and >= 15 deg rotations
    without any seeding, on a clinically-proportioned FOV (144 mm)."""

    def test_translation_12mm(self, capture_phantom):
        aff = _capture_affine()
        M_true = np.eye(4)
        M_true[:3, 3] = [12.0, -10.5, 11.0]  # mm
        moving = np.asarray(
            warp_volume(capture_phantom, M_true, aff, aff, _CAPTURE_SHAPE)
        )
        params = RegistrationParams(
            transform="rigid", metric="mse", resolutions=4, iterations=400,
            num_samples=4096, learning_rate=0.05,
        )
        M_est, _theta, info = register_pair(capture_phantom, aff, moving, aff, params)
        assert _capture_err_vox(M_est, M_true, aff) < 0.75
        assert not info["stalled"]

    def test_rotation_18deg_plus_translation(self, capture_phantom):
        aff = _capture_affine()
        th = np.deg2rad(18.0)
        c, s = np.cos(th), np.sin(th)
        M_true = np.eye(4)
        M_true[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        cidx = (np.array(_CAPTURE_SHAPE) - 1) / 2.0
        ctr = (aff @ np.r_[cidx, 1.0])[:3]
        M_true[:3, 3] = ctr - M_true[:3, :3] @ ctr + [6.0, -5.0, 4.0]
        moving = np.asarray(
            warp_volume(capture_phantom, M_true, aff, aff, _CAPTURE_SHAPE)
        )
        params = RegistrationParams(
            transform="rigid", metric="mse", resolutions=4, iterations=500,
            num_samples=4096, learning_rate=0.05,
        )
        M_est, _theta, _info = register_pair(capture_phantom, aff, moving, aff, params)
        assert _capture_err_vox(M_est, M_true, aff) < 1.0


class TestPartialOverlapMasked:
    """Partial field-of-view overlap with a dilated mask driving stage 2 —
    the CubeQuant interregister pattern end-to-end
    (ref ``scans.py:267-313``, ``cube_quant.py:73-137``)."""

    def test_masked_interregister_recovery(self, phantom, tmp_path):
        import os

        from dosma_tpu.core.med_volume import MedicalVolume
        from dosma_tpu.scan_sequences.mri.cube_quant import CubeQuant

        aff = _affine()
        shift_vox = np.array([4, -3, 1])
        # Target = phantom; moving spin locks = shifted + scaled copies with
        # the top-left region zeroed (partial overlap).
        target = MedicalVolume(phantom * 1000, aff)
        tpath = str(tmp_path / "target.nii.gz")
        target.save_volume(tpath)

        vols = []
        for i, scale in enumerate([1.0, 0.7, 0.5, 0.35]):
            arr = np.roll(phantom, shift_vox, axis=(0, 1, 2)) * 1000 * scale
            arr[:6, :6, :] = 0.0  # FOV truncation
            vols.append(MedicalVolume(arr.astype(np.float32), aff))

        # Mask over the structured center (world-space of the target grid).
        mask = np.zeros(SHAPE, np.float32)
        mask[8:-8, 8:-8, 3:-3] = 1.0
        mpath = str(tmp_path / "mask.nii.gz")
        MedicalVolume(mask, aff).save_volume(mpath)

        scan = CubeQuant(vols, spin_lock_times=[1.0, 10.0, 30.0, 60.0])
        scan.temp_path = str(tmp_path / "tmp")
        scan.interregister(tpath, target_mask_path=mpath)

        # The dilated-mask file must have been produced by __dilate_mask__.
        interreg_dir = os.path.join(scan.temp_path, "interregistered")
        assert os.path.isfile(os.path.join(interreg_dir, "dilated-mask.nii.gz"))
        # Transform files written for reuse.
        assert os.path.isfile(
            os.path.join(interreg_dir, "moving-0", "TransformParameters.1.json")
        )

        # Every spin lock lands on the target grid, aligned: correlation
        # with the target must beat the unregistered anchor by a wide margin.
        ref = np.asarray(target.volume)[8:-8, 8:-8, 3:-3]
        before = np.corrcoef(
            ref.ravel(), (np.asarray(vols[0].volume))[8:-8, 8:-8, 3:-3].ravel()
        )[0, 1]
        for v, scale in zip(scan.volumes, [1.0, 0.7, 0.5, 0.35]):
            got = np.asarray(v.volume)[8:-8, 8:-8, 3:-3]
            after = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
            assert after > 0.9, (after, before)
            assert after > before + 0.05


class TestCubicMetricSampling:
    """elastix BSplineInterpolationOrder=3 metric sampling: the optimizer
    samples the prefiltered cubic coefficients instead of trilinear. Must
    recover as well as (or better than) order 1 on the standard rigid
    case — it is the shipped elastix files' configuration when a user
    sets BSplineInterpolationOrder 3 explicitly."""

    def test_rigid_rotation_interp3(self, phantom):
        A = _affine()
        cw = _center_world(A)
        ang = np.deg2rad(8.0)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        M_true = np.eye(4)
        M_true[:3, :3] = R
        M_true[:3, 3] = cw - R @ cw + np.array([1.0, -1.0, 2.0])
        moving = np.asarray(warp_volume(phantom, M_true, A, A, SHAPE))

        params = RegistrationParams(
            transform="rigid", metric="mi", resolutions=3, iterations=250,
            num_samples=2048, interp_order=3,
        )
        M, _, _ = register_pair(phantom, A, moving, A, params)
        err = _corner_error_vox(M, M_true, A)
        assert err < 0.5, f"interp_order=3 recovery error {err:.2f} voxels"


class TestStallDiagnostics:
    """Documented failure mode: a featureless moving image cannot drive the
    metric — ``info['stalled']`` flags it (VERDICT r1 item 5)."""

    def test_featureless_moving_flags_stalled(self, phantom):
        aff = _affine()
        # All-zero moving image: the metric sees 0 at every sample for every
        # theta, so the loss is exactly flat — the canonical stall.
        flat = np.zeros(SHAPE, np.float32)
        params = RegistrationParams(
            transform="rigid", metric="mse", resolutions=2, iterations=120,
            num_samples=2048, learning_rate=0.05,
        )
        _M, _theta, info = register_pair(phantom, aff, flat, aff, params)
        assert info["stalled"]
        assert "loss_decrease" in info

    def test_good_problem_not_stalled(self, phantom):
        aff = _affine()
        moving = np.roll(phantom, (4, -3, 1), axis=(0, 1, 2))
        params = RegistrationParams(
            transform="rigid", metric="mse", resolutions=2, iterations=150,
            num_samples=2048, learning_rate=0.05,
        )
        _M, _theta, info = register_pair(phantom, aff, moving, aff, params)
        assert not info["stalled"]
