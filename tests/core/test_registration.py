"""Registration tests (model: reference tests/core/test_registration.py).

The reference synthesizes translated squares and verifies recovery
(``test_registration.py:17-25``); no elastix gating needed here — the
registrar is in-process.
"""

import os
import warnings

import numpy as np
import pytest

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.registration import apply_warp, register
from dosma_tpu.ops.registration import RegistrationParams


def _square_volumes(shift=(3, -2, 1), shape=(32, 32, 8), seed=0):
    rs = np.random.RandomState(seed)
    fixed = np.zeros(shape, np.float32)
    fixed[10:22, 10:22, 2:6] = 1.0
    fixed += 0.05 * rs.rand(*shape).astype(np.float32)
    moving = np.roll(fixed, shift, axis=(0, 1, 2))
    aff = np.eye(4)
    return MedicalVolume(fixed, aff), MedicalVolume(moving, aff)


_FAST = RegistrationParams(
    transform="rigid", metric="mse", resolutions=2, iterations=150,
    num_samples=2048, learning_rate=0.05,
)


class TestRegister:
    def test_recovers_translation(self, tmp_path):
        fixed, moving = _square_volumes()
        out = register(
            fixed, moving, _FAST, output_path=str(tmp_path), return_volumes=True
        )
        warped = out["volumes"][0]
        err_after = np.abs(np.asarray(warped.A) - np.asarray(fixed.A)).mean()
        err_before = np.abs(np.asarray(moving.A) - np.asarray(fixed.A)).mean()
        assert err_after < 0.35 * err_before

        spec = out["outputs"][0]
        assert os.path.isfile(spec.warped_file)
        assert all(os.path.isfile(t) for t in spec.transform)

    def test_sequential_stages_collated(self, tmp_path):
        fixed, moving = _square_volumes()
        stages = [
            RegistrationParams(transform="translation", metric="mse", resolutions=2,
                               iterations=100, num_samples=2048, learning_rate=0.05),
            _FAST,
        ]
        out = register(
            fixed, moving, stages, output_path=str(tmp_path),
            sequential=True, collate=True, return_volumes=True,
        )
        spec = out["outputs"][0]
        assert len(spec.transform) == 2
        assert len(spec.warped_files) == 2
        warped = out["volumes"][0]
        err_after = np.abs(np.asarray(warped.A) - np.asarray(fixed.A)).mean()
        err_before = np.abs(np.asarray(moving.A) - np.asarray(fixed.A)).mean()
        assert err_after < 0.35 * err_before

    def test_multiple_moving(self, tmp_path):
        fixed, moving = _square_volumes()
        _, moving2 = _square_volumes(shift=(-2, 1, 0))
        out = register(
            fixed, [moving, moving2], _FAST, output_path=str(tmp_path), return_volumes=True
        )
        assert len(out["outputs"]) == 2
        assert len(out["volumes"]) == 2

    def test_mask(self, tmp_path):
        fixed, moving = _square_volumes()
        mask = MedicalVolume((np.asarray(fixed.A) > 0.5).astype(np.float32), fixed.affine)
        out = register(
            fixed, moving, _FAST, output_path=str(tmp_path),
            target_mask=mask, use_mask=[True], return_volumes=True,
        )
        warped = out["volumes"][0]
        err_after = np.abs(np.asarray(warped.A) - np.asarray(fixed.A)).mean()
        err_before = np.abs(np.asarray(moving.A) - np.asarray(fixed.A)).mean()
        assert err_after < 0.5 * err_before

    def test_rtype_tuple(self, tmp_path):
        fixed, moving = _square_volumes()
        outputs, volumes = register(
            fixed, moving, _FAST, output_path=str(tmp_path),
            return_volumes=True, rtype=tuple,
        )
        assert len(outputs) == 1 and len(volumes) == 1

    def test_nifti_path_inputs(self, tmp_path):
        fixed, moving = _square_volumes()
        fpath = str(tmp_path / "fixed.nii.gz")
        mpath = str(tmp_path / "moving.nii.gz")
        fixed.save_volume(fpath)
        moving.save_volume(mpath)
        out = register(fpath, mpath, _FAST, output_path=str(tmp_path / "reg"))
        assert os.path.isfile(out["outputs"][0].warped_file)


class TestApplyWarp:
    def test_transform_reuse(self, tmp_path):
        """Register one echo; reuse transforms on another echo (the
        CubeQuant/Cones pattern, ref ``registration.py:497-508``)."""
        fixed, moving = _square_volumes()
        out = register(fixed, moving, _FAST, output_path=str(tmp_path), return_volumes=True)
        spec = out["outputs"][0]

        other_echo = MedicalVolume(np.asarray(moving.A) * 2.0, moving.affine)
        warped2 = apply_warp(other_echo, transform=spec.transform)
        assert isinstance(warped2, MedicalVolume)
        expected = np.asarray(out["volumes"][0].A) * 2.0
        # Same geometric transform applied to a scaled image.
        assert np.abs(np.asarray(warped2.A) - expected).mean() < 0.05

    def test_out_registration_argument(self, tmp_path):
        fixed, moving = _square_volumes()
        out = register(fixed, moving, _FAST, output_path=str(tmp_path))
        warped = apply_warp(moving, out_registration=out["outputs"][0])
        assert isinstance(warped, MedicalVolume)

    def test_rtype_str(self, tmp_path):
        fixed, moving = _square_volumes()
        out = register(fixed, moving, _FAST, output_path=str(tmp_path))
        path = apply_warp(
            moving, transform=out["outputs"][0].transform,
            output_path=str(tmp_path / "warp"), rtype=str,
        )
        assert os.path.isfile(path)

    def test_sequence_of_moving(self, tmp_path):
        fixed, moving = _square_volumes()
        out = register(fixed, moving, _FAST, output_path=str(tmp_path))
        outs = apply_warp([moving, moving], transform=out["outputs"][0].transform)
        assert isinstance(outs, list) and len(outs) == 2


class TestParamFiles:
    def test_yaml_presets_load(self):
        from dosma_tpu import file_constants
        from dosma_tpu.core.registration import _load_stage_params

        for path, expected in (
            (file_constants.ELASTIX_RIGID_PARAMS_FILE, "rigid"),
            (file_constants.ELASTIX_AFFINE_PARAMS_FILE, "affine"),
            (file_constants.ELASTIX_BSPLINE_PARAMS_FILE, "bspline"),
            (file_constants.ELASTIX_RIGID_INTERREGISTER_PARAMS_FILE, "rigid"),
            (file_constants.ELASTIX_AFFINE_INTERREGISTER_PARAMS_FILE, "affine"),
        ):
            cfg = _load_stage_params(path)
            assert cfg.transform == expected

    def test_elastix_txt_parsing(self, tmp_path):
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "params.txt"
        p.write_text(
            '(Transform "EulerTransform")\n'
            "(NumberOfResolutions 4)\n"
            "(MaximumNumberOfIterations 250)\n"
            "(NumberOfHistogramBins 64)\n"
            '(Metric "AdvancedMattesMutualInformation")\n'
        )
        cfg = _load_stage_params(str(p))
        assert cfg.transform == "rigid"
        assert cfg.resolutions == 4
        assert cfg.iterations == 250
        assert cfg.num_bins == 64
        assert cfg.metric == "mi"

    def test_elastix_txt_full_dsl(self, tmp_path):
        """Full elastix-DSL coverage: schedules, sampler, orders, bspline
        grid spacing — load-bearing keys map; unsupported values warn
        rather than drop silently."""
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "params-bspline.txt"
        p.write_text(
            "// deformable stage\n"
            '(Transform "BSplineTransform")\n'
            '(Metric "AdvancedMattesMutualInformation")\n'
            "(FinalGridSpacingInPhysicalUnits 30 30 30)\n"
            "(NumberOfResolutions 3)\n"
            "(MaximumNumberOfIterations 1000 500 250)\n"
            "(NumberOfHistogramBins 32)\n"
            "(NumberOfSpatialSamples 2000 2000 4000)\n"
            "(ImagePyramidSchedule 8 8 8 4 4 4 1 1 1)\n"
            '(ImageSampler "RandomCoordinate")\n'
            '(NewSamplesEveryIteration "true")\n'
            "(FinalBSplineInterpolationOrder 3)\n"
            "(DefaultPixelValue 0)\n"
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            cfg = _load_stage_params(str(p))
        assert cfg.transform == "bspline"
        assert cfg.grid_spacing_mm == 30.0
        assert cfg.iterations == 1000  # max of per-level schedule
        assert cfg.num_samples == 4000
        # bspline stages keep the TRUE per-level budgets (coarsest first)
        assert cfg.iteration_schedule == (1000, 500, 250)
        assert cfg.sample_schedule == (2000, 2000, 4000)
        assert cfg.pyramid_schedule == (8.0, 4.0, 1.0)
        assert cfg.resolutions == 3
        # Order-3 final resampling is now IMPLEMENTED (cubic B-spline
        # sampler, ops/interp.py) — the key maps cleanly, no warning.
        assert cfg.final_interp_order == 3
        assert not rec, [str(w.message) for w in rec]

    def test_elastix_txt_interp_orders(self, tmp_path):
        """(Final)BSplineInterpolationOrder mapping: supported orders pass
        through silently; unsupported spline orders round with a warning."""
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "orders.txt"
        p.write_text(
            '(Transform "EulerTransform")\n'
            "(BSplineInterpolationOrder 3)\n"
            "(FinalBSplineInterpolationOrder 0)\n"
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            cfg = _load_stage_params(str(p))
        assert cfg.interp_order == 3
        assert cfg.final_interp_order == 0
        assert not rec

        p2 = tmp_path / "orders2.txt"
        p2.write_text(
            '(Transform "EulerTransform")\n'
            "(FinalBSplineInterpolationOrder 5)\n"
        )
        with pytest.warns(UserWarning, match="FinalBSplineInterpolationOrder=5"):
            cfg = _load_stage_params(str(p2))
        assert cfg.final_interp_order == 3

    def test_elastix_txt_unknown_keys_warn(self, tmp_path):
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "params.txt"
        p.write_text(
            '(Transform "AffineTransform")\n'
            "(SP_a 400.0)\n"
            '(SomeCustomKnob "on")\n'
        )
        with pytest.warns(UserWarning, match="unmapped elastix keys"):
            cfg = _load_stage_params(str(p))
        assert cfg.transform == "affine"

    def test_reference_shipped_files_parse(self):
        """Parse the reference's five shipped elastix files verbatim when the
        reference checkout is present (rig-only; users won't have it)."""
        ref_dir = "/root/reference/dosma/resources/elastix/params"
        if not os.path.isdir(ref_dir):
            pytest.skip("reference checkout not present")
        from dosma_tpu.core.registration import _load_stage_params

        expected = {
            "parameters-affine.txt": ("affine", 1, 1000),
            "parameters-rigid.txt": ("rigid", 3, 1000),
            "parameters-bspline.txt": ("bspline", 3, 1000),
            "parameters-rigid-interregister.txt": ("rigid", 3, 400),
            "parameters-affine-interregister.txt": ("rigid", 3, 400),
        }
        for fname, (tf, res, its) in expected.items():
            cfg = _load_stage_params(os.path.join(ref_dir, fname))
            assert cfg.transform == tf, fname
            assert cfg.resolutions == res, fname
            assert cfg.iterations == its, fname
            assert cfg.num_bins == 32 and cfg.num_samples == 2000, fname
            assert cfg.metric == "mi", fname
            if tf == "bspline":
                assert cfg.grid_spacing_mm == 30.0

    def test_bspline_per_level_schedules_survive_parse(self, tmp_path):
        """Per-resolution iteration/sample vectors map onto the FFD chain's
        true per-level budgets (elastix MaximumNumberOfIterations /
        NumberOfSpatialSamples vectors); matrix stages still collapse to
        max with a warning."""
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "bspl.txt"
        p.write_text(
            '(Transform "BSplineTransform")\n'
            "(NumberOfResolutions 3)\n"
            "(MaximumNumberOfIterations 150 250 400)\n"
            "(NumberOfSpatialSamples 1024 2048 4096)\n"
            '(Metric "AdvancedMattesMutualInformation")\n'
        )
        cfg = _load_stage_params(str(p))
        assert cfg.iteration_schedule == (150, 250, 400)
        assert cfg.sample_schedule == (1024, 2048, 4096)
        assert cfg.iterations == 400 and cfg.num_samples == 4096
        assert cfg.level_budget(3) == ((150, 250, 400), (1024, 2048, 4096))
        # short schedules repeat the last value; flat budgets expand
        assert cfg.level_budget(4) == ((150, 250, 400, 400), (1024, 2048, 4096, 4096))

        q = tmp_path / "rigid.txt"
        q.write_text(
            '(Transform "EulerTransform")\n'
            "(MaximumNumberOfIterations 100 200)\n"
        )
        with pytest.warns(UserWarning, match="collapsed to max"):
            cfg2 = _load_stage_params(str(q))
        assert cfg2.iterations == 200 and cfg2.iteration_schedule is None

    def test_value_less_keys_warn_not_crash(self, tmp_path):
        """A bare ``(Key)`` line (no values) must be dropped with a warning,
        not crash ``max()``/``[0]`` indexing downstream."""
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "bare.txt"
        p.write_text(
            '(Transform "EulerTransform")\n'
            "(MaximumNumberOfIterations)\n"
            "(NumberOfSpatialSamples)\n"
            "(NumberOfResolutions)\n"
            "(NumberOfHistogramBins)\n"
        )
        with pytest.warns(UserWarning, match="no values"):
            cfg = _load_stage_params(str(p))
        assert cfg.transform == "rigid"
        # engine defaults survive
        assert cfg.iterations > 0 and cfg.num_samples > 0

    def test_symlink_stubs_warn(self):
        from dosma_tpu.core.registration import symlink_elastix, unlink_elastix

        with pytest.warns(UserWarning):
            symlink_elastix()
        with pytest.warns(UserWarning):
            unlink_elastix()


class TestCrossGridRegistration:
    def test_recovers_world_shift_across_grids(self, tmp_path):
        """Fixed sagittal anisotropic grid vs moving axial grid with
        different spacing/origin + a known 4mm world shift — exercises the
        full world-space coordinate plumbing (the CubeQuant<->qDESS case)."""
        from dosma_tpu.core.orientation import AXIAL, SAGITTAL, to_affine
        from dosma_tpu.ops.registration import warp_volume

        rs = np.random.RandomState(0)
        fixed_arr = np.zeros((40, 40, 20), np.float32)
        fixed_arr[12:28, 12:28, 6:14] = 1.0
        fixed_arr[16:24, 16:24, 8:12] = 2.0
        fixed_arr += 0.02 * rs.rand(*fixed_arr.shape).astype(np.float32)
        fixed_aff = to_affine(SAGITTAL, (1.0, 1.0, 1.5), (5, -10, 3))
        fixed = MedicalVolume(fixed_arr, fixed_aff)

        mov_aff = to_affine(AXIAL, (1.25, 1.25, 1.25), (0, 0, 0))
        M_true = np.eye(4)
        M_true[:3, 3] = [4.0, -2.0, 1.0]
        mov_arr = np.asarray(
            warp_volume(fixed_arr, np.linalg.inv(M_true), mov_aff, fixed_aff, (36, 36, 36))
        )
        moving = MedicalVolume(mov_arr, mov_aff)

        params = RegistrationParams(
            transform="rigid", metric="mi", resolutions=3, iterations=300,
            num_samples=4096, learning_rate=0.02,
        )
        out = register(fixed, moving, params, output_path=str(tmp_path), return_volumes=True)
        warped = np.asarray(out["volumes"][0].A)

        ident = np.asarray(
            warp_volume(mov_arr, np.eye(4), fixed_aff, mov_aff, fixed_arr.shape)
        )
        err_before = np.abs(ident - fixed_arr).mean()
        err_after = np.abs(warped - fixed_arr).mean()
        assert err_after < 0.4 * err_before


def test_register_with_moving_mask(tmp_path):
    """moving_masks must actually be applied (they were once validated then
    dropped). A mask that excludes a bright corrupting blob in the moving
    image lets the true shift win; without it the blob skews the fit."""
    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.core.registration import register

    rs = np.random.RandomState(2)
    shape = (64, 64, 16)
    fixed = np.zeros(shape, np.float32)
    fixed[16:-16, 16:-16, 4:-4] = 1000.0
    fixed += 30.0 * rs.rand(*shape).astype(np.float32)
    moving = np.roll(fixed, (3, -2, 0), axis=(0, 1, 2))
    # Corrupting structure only in the moving image.
    corrupted = moving.copy()
    corrupted[2:12, 2:12, :] = 4000.0
    mask = np.ones(shape, np.float32)
    mask[0:16, 0:16, :] = 0.0

    aff = np.diag([1.0, 1.0, 2.0, 1.0])
    fv = MedicalVolume(fixed, aff)
    mv = MedicalVolume(corrupted, aff)
    mk = MedicalVolume(mask, aff)

    (spec,), (wv,) = register(
        fv, mv, "translation", output_path=str(tmp_path), moving_masks=mk,
        use_mask=[True], return_volumes=True, rtype=tuple,
    )
    import json

    tdata = json.load(open(spec.transform[0]))
    t = np.asarray(tdata["matrix"])[:3, 3]
    truth = np.array([3.0, -2.0, 0.0])
    assert np.abs(t - truth).max() < 1.0, t


class TestElastixGridSpacingAndSchedules:
    """Regression tests: keys listed as mapped must actually be consumed."""

    def test_final_grid_spacing_in_voxels_parses_and_applies(self, tmp_path):
        import warnings as _warnings

        from dosma_tpu.core.registration import _load_stage_params
        from dosma_tpu.ops.bspline import make_control_grid

        p = tmp_path / "bspl_vox.txt"
        p.write_text(
            '(Transform "BSplineTransform")\n'
            "(FinalGridSpacingInVoxels 8 8 8)\n"
        )
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # silent drop would warn; none expected
            cfg = _load_stage_params(str(p))
        assert cfg.grid_spacing_vox == (8.0, 8.0, 8.0)
        # The engine must honor voxel units regardless of voxel size.
        _, sp = make_control_grid(
            (64, 64, 32), np.diag([0.5, 0.6, 2.0, 1.0]),
            cfg.grid_spacing_mm, cfg.grid_spacing_vox,
        )
        assert np.allclose(sp, 8.0)

    def test_final_grid_spacing_in_voxels_bad_count_collapses(self, tmp_path):
        """2-value spacing (malformed) must warn + collapse to the mean, not
        crash later in make_control_grid's (3,) broadcast."""
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "bspl_2d.txt"
        p.write_text(
            '(Transform "BSplineTransform")\n'
            "(FinalGridSpacingInVoxels 8 12)\n"
        )
        with pytest.warns(UserWarning, match="expected 1 or 3"):
            cfg = _load_stage_params(str(p))
        assert cfg.grid_spacing_vox == (10.0,)

    def test_empty_pyramid_schedule_warns_not_zero_resolutions(self, tmp_path):
        """'(ImagePyramidSchedule)' with no values must warn, not silently
        set resolutions=0 (which crashed register() far from the cause)."""
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "empty_sched.txt"
        p.write_text(
            '(Transform "AffineTransform")\n'
            "(ImagePyramidSchedule)\n"
        )
        with pytest.warns(UserWarning, match="no values"):
            cfg = _load_stage_params(str(p))
        assert cfg.resolutions >= 1
        assert cfg.pyramid_schedule is None

    def test_both_grid_spacing_keys_warn(self, tmp_path):
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "bspl_both.txt"
        p.write_text(
            '(Transform "BSplineTransform")\n'
            "(FinalGridSpacingInVoxels 8 8 8)\n"
            "(FinalGridSpacingInPhysicalUnits 30 30 30)\n"
        )
        with pytest.warns(UserWarning, match="voxel units take precedence"):
            cfg = _load_stage_params(str(p))
        assert cfg.grid_spacing_vox == (8.0, 8.0, 8.0)

    def test_moving_pyramid_schedule_differing_warns(self, tmp_path):
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "mov_sched.txt"
        p.write_text(
            '(Transform "AffineTransform")\n'
            "(ImagePyramidSchedule 4 4 4 1 1 1)\n"
            "(MovingImagePyramidSchedule 8 8 8 2 2 2)\n"
        )
        with pytest.warns(UserWarning, match="MovingImagePyramidSchedule"):
            cfg = _load_stage_params(str(p))
        assert cfg.pyramid_schedule == (4.0, 1.0)

    def test_moving_pyramid_schedule_alone_is_used(self, tmp_path):
        from dosma_tpu.core.registration import _load_stage_params

        p = tmp_path / "mov_only.txt"
        p.write_text(
            '(Transform "AffineTransform")\n'
            "(MovingImagePyramidSchedule 4 4 4 1 1 1)\n"
        )
        cfg = _load_stage_params(str(p))
        assert cfg.pyramid_schedule == (4.0, 1.0)

    def test_level_budget_truncation_keeps_finest(self):
        cfg = RegistrationParams(
            transform="bspline",
            iteration_schedule=(800, 400, 200, 100),
            iterations=800,
        )
        iters, _ = cfg.level_budget(3)
        # Coarsest n-1 entries plus the FINEST budget — not a mid-pyramid one.
        assert iters == (800, 400, 100)
        iters4, _ = cfg.level_budget(4)
        assert iters4 == (800, 400, 200, 100)

    def test_zero_iteration_stage_is_noop(self):
        """A 0-iteration B-spline stage must pass the control grid through
        unchanged (regression: Polyak tail average divided by zero and
        produced an all-NaN grid)."""
        from dosma_tpu.ops.registration import register_pair_bspline

        rs = np.random.RandomState(0)
        vol = rs.rand(24, 24, 12).astype(np.float32)
        aff = np.eye(4)
        params = RegistrationParams(
            transform="bspline", iterations=0, resolutions=1, num_samples=64
        )
        ctrl, spacing_vox, _ = register_pair_bspline(vol, aff, vol, aff, params)
        assert np.all(np.isfinite(np.asarray(ctrl)))
        assert np.allclose(np.asarray(ctrl), 0.0)


class TestZeroIterationStage:
    def test_iterations_zero_is_identity_noop(self):
        """Review r5: iterations=0 divided the Polyak tail average by zero,
        NaNing a previously legal no-op stage. The seed transform must
        pass through unchanged."""
        import numpy as np

        from dosma_tpu.ops.registration import RegistrationParams, register_pair

        rs = np.random.RandomState(0)
        vol = rs.rand(16, 16, 6).astype(np.float32)
        A = np.eye(4)
        params = RegistrationParams(
            transform="rigid", metric="mse", resolutions=1, iterations=0
        )
        M, losses, _ = register_pair(vol, A, vol, A, params)
        M = np.asarray(M)
        assert np.all(np.isfinite(M))
        np.testing.assert_allclose(M, np.eye(4), atol=1e-5)
