"""Mapss scan tests (model: reference ``tests/scan_sequences/mri/test_mapss.py``).

Synthetic physics: a single relaxation map drives all 7 echoes
(y = a * exp(-t / tc)), so both the T1ρ fit (echoes 0-3) and the T2 fit
(echoes 0, 4, 5, 6) must recover the same ground truth.
"""

import os

import numpy as np
import pytest

from dosma_tpu.core.io.nifti_io import NiftiWriter
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL, to_affine
from dosma_tpu.scan_sequences.mri.mapss import Mapss

MAPSS_ECHO_TIMES = [0.0, 10.0, 12.847, 25.695, 40.0, 51.39, 80.0]


def _mock_mapss(shape=(20, 20, 6), seed=11, metadata=True):
    rs = np.random.RandomState(seed)
    tc = rs.rand(*shape) * 70 + 10  # 10-80 ms, inside both fit bounds
    a = 1.0 + rs.rand(*shape)
    affine = to_affine(SAGITTAL, (0.5, 0.5, 1.0))
    vols = []
    for i, t in enumerate(MAPSS_ECHO_TIMES):
        mv = MedicalVolume(a * np.exp(-t / tc), affine)
        if metadata:
            mv.set_metadata("EchoTime", float(t), force=True)
            mv.set_metadata("EchoNumbers", i + 1, force=True)
        vols.append(mv)
    return vols, tc


class TestMapssBasics:
    def test_echo_times_from_headers(self):
        vols, _ = _mock_mapss()
        scan = Mapss(vols)
        assert scan.echo_times == MAPSS_ECHO_TIMES
        assert scan.volumes == vols

    def test_explicit_echo_times(self):
        vols, _ = _mock_mapss(metadata=False)
        times = list(np.arange(7.0))
        scan = Mapss(vols, echo_times=times)
        assert scan.echo_times == times

    def test_rejects_stacked_array(self):
        vols, _ = _mock_mapss()
        with pytest.raises(ValueError):
            Mapss(np.stack([np.asarray(v.A) for v in vols], axis=-1))

    def test_validate_echo_count(self):
        vols, _ = _mock_mapss()
        assert Mapss(vols).__validate_scan__()
        assert not Mapss(vols[:6]).__validate_scan__()


class TestMapssMaps:
    def test_t1_rho_recovers_ground_truth(self):
        vols, tc = _mock_mapss()
        qv_map = Mapss(vols).generate_t1_rho_map()
        est = np.asarray(qv_map.volumetric_map.A)
        assert np.abs(est - tc).mean() < 1.0
        assert "r2" in qv_map.additional_volumes

    def test_t2_recovers_ground_truth(self):
        vols, tc = _mock_mapss()
        qv_map = Mapss(vols).generate_t2_map()
        est = np.asarray(qv_map.volumetric_map.A)
        assert np.abs(est - tc).mean() < 1.0

    def test_full_mask_matches_unmasked(self):
        vols, _ = _mock_mapss()
        scan = Mapss(vols)
        from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

        unmasked = scan.generate_t1_rho_map()

        tissue = FemoralCartilage()
        tissue.set_mask(MedicalVolume(np.ones(vols[0].shape), vols[0].affine))
        masked = scan.generate_t1_rho_map(tissue)
        np.testing.assert_allclose(
            np.asarray(masked.volumetric_map.A), np.asarray(unmasked.volumetric_map.A)
        )
        # Map registered on the tissue.
        assert tissue.quantitative_values[-1] is masked

    def test_mask_as_path(self, tmp_path):
        vols, tc = _mock_mapss()
        scan = Mapss(vols)
        mask = np.zeros(tc.shape)
        mask[4:10] = 1
        mask_path = os.path.join(tmp_path, "mask.nii.gz")
        NiftiWriter().save(MedicalVolume(mask, vols[0].affine), mask_path)
        qv_map = scan.generate_t2_map(mask_path=mask_path)
        est = np.asarray(qv_map.volumetric_map.A)
        assert np.all(est[mask == 0] == 0)
        assert np.abs(est[mask == 1] - tc[mask == 1]).mean() < 1.0


class TestMapssIntraregister:
    def test_intraregister_replaces_volumes(self):
        vols, _ = _mock_mapss(shape=(24, 24, 6))
        # Simulate inter-echo motion on echoes 1..6.
        moved = [vols[0]]
        for v in vols[1:]:
            arr = np.roll(np.asarray(v.A), (1, -1), axis=(0, 1))
            mv = MedicalVolume(arr, v.affine)
            mv.set_metadata("EchoTime", float(v.get_metadata("EchoTime")), force=True)
            moved.append(mv)
        scan = Mapss(moved)
        originals = list(scan.volumes)
        scan.intraregister()
        assert scan.volumes is not originals
        assert len(scan.volumes) == 7
        # Echo 0 is the anchor; the others keep their original affines
        # (reference mapss.py:138-145 copies them back post-registration).
        for orig, reg in zip(moved[1:], scan.volumes[1:]):
            np.testing.assert_allclose(reg.affine, orig.affine)

    def test_intraregister_type_checks(self):
        vols, _ = _mock_mapss()
        scan = Mapss(vols)
        with pytest.raises(TypeError):
            scan.__intraregister__(vols[:3])


class TestMapssIO:
    def test_save_load_roundtrip(self, tmp_path):
        vols, _ = _mock_mapss()
        scan = Mapss(vols)
        save_dir = os.path.join(tmp_path, "mapss-save")
        pik = scan.save(save_dir, save_custom=True)
        assert os.path.isfile(pik)

        scan2 = Mapss.load(pik)
        assert scan2.echo_times == scan.echo_times
        for v1, v2 in zip(scan.volumes, scan2.volumes):
            np.testing.assert_allclose(np.asarray(v1.A), np.asarray(v2.A), atol=1e-5)

    def test_cmd_line_actions_conformance(self):
        actions = dict((fn.__name__, aw) for fn, aw in Mapss.cmd_line_actions())
        assert set(actions) == {"intraregister", "generate_t1_rho_map", "generate_t2_map"}
        assert "t1_rho" in actions["generate_t1_rho_map"].aliases
        assert "t2" in actions["generate_t2_map"].aliases
