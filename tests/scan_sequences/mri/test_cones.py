"""Cones scan tests (model: reference ``tests/scan_sequences/mri/test_cones.py``).

Covers: echo-time resolution, the LAST-echo interregister anchor
(ref ``cones.py:99-123``), T2* mapping with/without masks, save/load, and
the legacy ``subvolumes`` from_dict path.
"""

import os

import numpy as np
import pytest

from dosma_tpu.core.io.nifti_io import NiftiReader, NiftiWriter
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL, to_affine
from dosma_tpu.scan_sequences.mri.cones import Cones
from dosma_tpu.utils import io_utils

CONES_ECHO_TIMES = [0.5, 2.0, 4.0, 8.0]


def _mock_cones(shape=(20, 20, 6), seed=13, metadata=True):
    rs = np.random.RandomState(seed)
    t2star = rs.rand(*shape) * 70 + 10
    a = 1.0 + rs.rand(*shape)
    affine = to_affine(SAGITTAL, (0.5, 0.5, 1.0))
    vols = []
    for i, t in enumerate(CONES_ECHO_TIMES):
        mv = MedicalVolume(a * np.exp(-t / t2star), affine)
        if metadata:
            mv.set_metadata("EchoTime", float(t), force=True)
            mv.set_metadata("EchoNumbers", i + 1, force=True)
        vols.append(mv)
    return vols, t2star


class TestConesBasics:
    def test_echo_times_from_headers(self):
        vols, _ = _mock_cones()
        scan = Cones(vols)
        assert scan.echo_times == CONES_ECHO_TIMES
        for v1, v2 in zip(scan.volumes, vols):
            np.testing.assert_array_equal(np.asarray(v1.A), np.asarray(v2.A))

    def test_explicit_echo_times_win(self):
        vols, _ = _mock_cones()
        new_times = [10.0, 20.0, 30.0, 40.0]
        assert Cones(vols, echo_times=new_times).echo_times == new_times

    def test_no_metadata_needs_explicit_times(self):
        vols, _ = _mock_cones(metadata=False)
        scan = Cones(vols, [10.0, 20.0, 30.0, 40.0])
        assert scan.echo_times == [10.0, 20.0, 30.0, 40.0]


class TestConesT2Star:
    def test_map_recovers_ground_truth(self):
        vols, t2star = _mock_cones()
        result = Cones(vols).generate_t2_star_map()
        est = np.asarray(result.volumetric_map.A)
        assert np.abs(est - t2star).mean() < 1.0
        assert "r2" in result.additional_volumes

    def test_mask_volume_and_mask_path_agree(self, tmp_path):
        vols, t2star = _mock_cones()
        mask = np.zeros(t2star.shape)
        mask[6:14] = 1
        mask_mv = MedicalVolume(mask, vols[0].affine)
        mask_path = os.path.join(tmp_path, "m.nii.gz")
        NiftiWriter().save(mask_mv, mask_path)

        from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

        tissue = FemoralCartilage()
        tissue.set_mask(mask_mv)
        by_tissue = Cones(vols).generate_t2_star_map(tissue)
        by_path = Cones(vols).generate_t2_star_map(mask_path=mask_path)
        np.testing.assert_allclose(
            np.asarray(by_tissue.volumetric_map.A), np.asarray(by_path.volumetric_map.A)
        )
        est = np.asarray(by_path.volumetric_map.A)
        assert np.all(est[mask == 0] == 0)

    def test_unbounded_fit_allows_long_t2star(self):
        # Bounds are (0, inf) — a 400 ms component must not be clipped.
        rs = np.random.RandomState(3)
        shape = (8, 8, 2)
        t2star = np.full(shape, 400.0)
        affine = to_affine(SAGITTAL, (1, 1, 1))
        vols = [
            MedicalVolume(np.exp(-t / t2star) * (1 + 0 * rs.rand(*shape)), affine)
            for t in CONES_ECHO_TIMES
        ]
        result = Cones(vols, CONES_ECHO_TIMES).generate_t2_star_map()
        est = np.asarray(result.volumetric_map.A)
        assert np.abs(est - 400.0).mean() < 5.0


class TestConesInterregister:
    def test_interregister_anchors_last_echo(self, tmp_path):
        vols, _ = _mock_cones(shape=(28, 28, 6))
        # Target = the last echo (highest SNR for UTE), shifted: the scan must
        # recover the shift for ALL echoes by reusing the anchor transform.
        shift = (2, -1)
        target_arr = np.roll(np.asarray(vols[-1].A), shift, axis=(0, 1))
        target_path = os.path.join(tmp_path, "target.nii.gz")
        NiftiWriter().save(MedicalVolume(target_arr, vols[-1].affine), target_path)

        scan = Cones(vols)
        scan.interregister(target_path)
        assert len(scan.volumes) == 4
        for orig, reg in zip(vols, scan.volumes):
            moved = np.asarray(reg.A)
            expected = np.roll(np.asarray(orig.A), shift, axis=(0, 1))
            # Compare away from the wrap-around borders.
            sl = (slice(4, -4), slice(4, -4), slice(None))
            err = np.abs(moved[sl] - expected[sl]).mean() / (np.abs(expected[sl]).mean() + 1e-8)
            assert err < 0.2, f"relative error {err:.3f}"


class TestConesIO:
    def test_save_load_roundtrip(self, tmp_path):
        vols, _ = _mock_cones()
        scan = Cones(vols)
        save_dir = os.path.join(tmp_path, "cones-save")
        pik = scan.save(save_dir, save_custom=True)
        assert set(os.listdir(save_dir)) >= {"volumes", f"{Cones.NAME}.data"}

        for src in (save_dir, pik, io_utils.load_pik(pik)):
            scan2 = Cones.load(src) if not isinstance(src, dict) else Cones.from_dict(src)
            assert scan2.echo_times == scan.echo_times
            for v1, v2 in zip(scan.volumes, scan2.volumes):
                np.testing.assert_allclose(np.asarray(v1.A), np.asarray(v2.A), atol=1e-5)

    def test_from_dict_roundtrip(self):
        vols, _ = _mock_cones()
        scan = Cones(vols)
        scan2 = Cones.from_dict(scan.__dict__)
        assert scan2.echo_times == scan.echo_times
        for v1, v2 in zip(scan2.volumes, vols):
            np.testing.assert_array_equal(np.asarray(v1.A), np.asarray(v2.A))

    def test_from_dict_legacy_subvolumes(self, tmp_path):
        # Pre-refactor archives stored interregistered volumes as paths under
        # a `subvolumes` key (reference test_cones.py from_dict legacy case).
        vols, _ = _mock_cones()
        subvol_dir = os.path.join(tmp_path, "legacy", "interregistered")
        os.makedirs(subvol_dir)
        writer = NiftiWriter()
        paths = []
        for idx, v in enumerate(vols):
            path = os.path.join(subvol_dir, f"{idx:03d}.nii.gz")
            writer.save(v, path)
            paths.append(path)

        scan = Cones.from_dict({"volumes": vols, "subvolumes": paths})
        assert len(scan.volumes) == 4
        for v1, v2 in zip(scan.volumes, vols):
            np.testing.assert_allclose(np.asarray(v1.A), np.asarray(v2.A), atol=1e-5)

    def test_cmd_line_actions_conformance(self):
        actions = dict((fn.__name__, aw) for fn, aw in Cones.cmd_line_actions())
        assert set(actions) == {"interregister", "generate_t2_star_map"}
        assert "t2_star" in actions["generate_t2_star_map"].aliases
