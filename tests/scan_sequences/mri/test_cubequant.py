"""CubeQuant/Cones/Mapss tests (model: reference tests/scan_sequences/mri/)."""

import numpy as np
import pytest

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL, to_affine
from dosma_tpu.scan_sequences.mri.cones import Cones
from dosma_tpu.scan_sequences.mri.cube_quant import CubeQuant
from dosma_tpu.scan_sequences.mri.mapss import Mapss


def _mock_relaxometry_volumes(n, shape=(24, 24, 6), times=None, tc_range=(10, 80), seed=7):
    """Forward-model multi-time volumes y = a*exp(-t/tc) with EchoTime headers
    (ref ``test_cubequant.py:29-58`` pattern)."""
    rs = np.random.RandomState(seed)
    if times is None:
        times = [1.0 + 10.0 * i for i in range(n)]
    tc = rs.rand(*shape) * (tc_range[1] - tc_range[0]) + tc_range[0]
    a = 1.0 + rs.rand(*shape)
    affine = to_affine(SAGITTAL, (0.5, 0.5, 1.0))
    vols = []
    for t in times:
        arr = a * np.exp(-t / tc)
        mv = MedicalVolume(arr, affine)
        mv.set_metadata("EchoTime", float(t), force=True)
        vols.append(mv)
    return vols, times, tc


class TestCubeQuant:
    def test_spin_lock_times_from_headers(self):
        vols, times, _ = _mock_relaxometry_volumes(4)
        scan = CubeQuant(vols)
        assert scan.spin_lock_times == times

    def test_missing_times_explicit_arg(self):
        # Volumes without headers: spin_lock_times stays None unless given
        # explicitly (reference semantics, ``cube_quant.py:49-58``).
        vols, _, _ = _mock_relaxometry_volumes(4)
        bare = [MedicalVolume(np.asarray(v.A), v.affine) for v in vols]
        scan = CubeQuant(bare)
        assert scan.spin_lock_times is None
        scan = CubeQuant(bare, spin_lock_times=[1, 11, 21, 31])
        assert scan.spin_lock_times == [1, 11, 21, 31]

    def test_generate_t1_rho_map(self):
        vols, times, tc = _mock_relaxometry_volumes(4)
        scan = CubeQuant(vols)
        qv_map = scan.generate_t1_rho_map()
        est = np.asarray(qv_map.volumetric_map.A)
        valid = (tc > 1) & (tc < 500)
        assert np.abs(est[valid] - tc[valid]).mean() < 1.0
        assert "r2" in qv_map.additional_volumes

    def test_generate_t1_rho_map_with_mask(self):
        vols, times, tc = _mock_relaxometry_volumes(4)
        scan = CubeQuant(vols)
        mask = np.zeros(tc.shape)
        mask[5:15] = 1
        mask_mv = MedicalVolume(mask, vols[0].affine)
        qv_map = scan.generate_t1_rho_map(mask_path=mask_mv)
        est = np.asarray(qv_map.volumetric_map.A)
        assert np.all(est[mask == 0] == 0)

    def test_intraregister(self):
        vols, _, _ = _mock_relaxometry_volumes(4, shape=(24, 24, 8))
        # Shift later spin-locks to simulate motion.
        shifted = [vols[0]]
        for i, v in enumerate(vols[1:], 1):
            arr = np.roll(np.asarray(v.A), (1, -1, 0), axis=(0, 1, 2))
            mv = MedicalVolume(arr, v.affine)
            mv.set_metadata("EchoTime", float(v.get_metadata("EchoTime")), force=True)
            shifted.append(mv)
        scan = CubeQuant(shifted)
        scan.intraregister()
        assert len(scan.volumes) == 4
        # Headers transplanted back.
        assert scan.volumes[1].headers() is not None

    def test_cmd_line_actions(self):
        names = [w.name for _, w in CubeQuant.cmd_line_actions()]
        assert names == ["intraregister", "interregister", "generate_t1_rho_map"]


class TestCones:
    def test_generate_t2_star_map(self):
        vols, times, tc = _mock_relaxometry_volumes(4, times=[0.05, 5, 10, 20])
        scan = Cones(vols)
        qv_map = scan.generate_t2_star_map()
        est = np.asarray(qv_map.volumetric_map.A)
        assert np.abs(est - tc).mean() < 1.0

    def test_interregister(self, tmp_path):
        vols, _, _ = _mock_relaxometry_volumes(4, shape=(24, 24, 8))
        target = vols[-1]
        tpath = str(tmp_path / "target.nii.gz")
        target.save_volume(tpath)
        scan = Cones(vols)
        scan.interregister(tpath)
        assert len(scan.volumes) == 4

    def test_cmd_line_actions(self):
        names = [w.name for _, w in Cones.cmd_line_actions()]
        assert names == ["interregister", "generate_t2_star_map"]


class TestMapss:
    def test_t1rho_and_t2_echo_selection(self):
        vols, times, tc = _mock_relaxometry_volumes(
            7, times=[0, 10, 20, 30, 12.8, 25.6, 51.2]
        )
        scan = Mapss(vols)
        assert scan.__validate_scan__()

        t1rho = scan.generate_t1_rho_map()
        est = np.asarray(t1rho.volumetric_map.A)
        assert np.abs(est - tc).mean() < 1.0

        t2 = scan.generate_t2_map()
        est2 = np.asarray(t2.volumetric_map.A)
        valid = tc < 100
        assert np.abs(est2[valid] - tc[valid]).mean() < 1.0

    def test_cmd_line_actions(self):
        names = [w.name for _, w in Mapss.cmd_line_actions()]
        assert names == ["intraregister", "generate_t1_rho_map", "generate_t2_map"]


class TestCubeQuantSaveLoad:
    """Checkpoint/resume parity (ref ``test_cubequant.py`` test_save_load /
    test_from_dict)."""

    def test_save_load_roundtrip(self, tmp_path):
        vols, times, _tc = _mock_relaxometry_volumes(4)
        scan = CubeQuant(vols)
        scan.temp_path = str(tmp_path / "tmp")
        scan.save(str(tmp_path / "save"), save_custom=True)

        loaded = CubeQuant.load(str(tmp_path / "save"))
        assert loaded.spin_lock_times == times
        assert len(loaded.volumes) == 4
        for a, b in zip(scan.volumes, loaded.volumes):
            np.testing.assert_allclose(np.asarray(a.A), np.asarray(b.A), rtol=1e-6)

    def test_from_dict_interregistered_reload(self, tmp_path):
        """from_dict with a reference-style 'subvolumes' entry reloads the
        interregistered files by index (ref ``cube_quant.py`` from_dict +
        ``scans.py:212-265``)."""
        import os

        vols, times, _tc = _mock_relaxometry_volumes(3)
        interreg = tmp_path / "interregistered"
        os.makedirs(interreg)
        for i, v in enumerate(vols):
            v.save_volume(str(interreg / f"{i:03d}.nii.gz"))

        data = {
            "volumes": [MedicalVolume(np.zeros((4, 4, 2)), np.eye(4))] * 3,
            "spin_lock_times": times,
            "subvolumes": [str(interreg / f"{i:03d}.nii.gz") for i in range(3)],
        }
        scan = CubeQuant.from_dict(data, force=True)
        assert len(scan.volumes) == 3
        for i, v in enumerate(scan.volumes):
            np.testing.assert_allclose(
                np.asarray(v.A), np.asarray(vols[i].A), rtol=1e-4, atol=1e-5
            )
