"""QDess tests (model: reference tests/scan_sequences/mri/test_qdess.py)."""

import math
import warnings

import numpy as np
import pytest

from dosma_tpu.core.io.dicom import Tag
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.scan_sequences.mri.qdess import QDess


def generate_mock_data(shape=(10, 10, 10), metadata=True, seed=42):
    """Mock qDESS data with real-sequence metadata (ref ``test_qdess.py:27-50``)."""
    rs = np.random.RandomState(seed)
    e1 = MedicalVolume(rs.rand(*shape) * 80 + 0.1, affine=np.eye(4))
    e2 = MedicalVolume(rs.rand(*shape) * 40 + 0.1, affine=np.eye(4))
    ys = [e1, e2]
    ts = [8, 42]
    if metadata:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for idx, (y, t) in enumerate(zip(ys, ts)):
                y.set_metadata("EchoTime", t, force=True)
                y.set_metadata("EchoNumbers", idx + 1, force=True)
                y.set_metadata("RepetitionTime", 25.0, force=True)
                y.set_metadata("FlipAngle", 30.0, force=True)
                y.set_metadata(Tag(0x0019, 0x10B6), 3132.0, force=True)
                y.set_metadata(Tag(0x0019, 0x10B7), 1560.0, force=True)
    return ys, ts


def reference_t2_formula(e1, e2, tr=25.0, te=8.0, tg=1560.0, alpha=30.0, gl=3132.0, t1=1200.0,
                         diffusivity=1.25e-9):
    """Direct numpy transcription of the published physics (oracle)."""
    TR, TE, Tg, T1 = tr * 1e-3, te * 1e-3, tg * 1e-6, t1 * 1e-3
    a = math.radians(alpha)
    Gl = gl / (Tg * 1e6) * 100
    gamma = 4258 * 2 * math.pi
    dkL = gamma * Gl * Tg
    decay = np.exp(-TR / T1 - TR * dkL**2 * diffusivity)
    k = (math.sin(a / 2) ** 2) * (1 + decay) / (1 - math.cos(a) * decay)
    c1 = (TR - Tg / 3) * dkL**2 * diffusivity
    ratio = np.nan_to_num(e2 / e1)
    t2 = -2000 * (TR - TE) / (np.log(np.abs(ratio) / k) + c1)
    return np.nan_to_num(t2)


class TestQDess:
    def test_basic(self):
        ys, _ = generate_mock_data()
        scan = QDess(ys)
        assert scan.ref_dicom is ys[0].headers(flatten=True)[0]
        with pytest.raises(ValueError):
            QDess(ys + ys)

    def test_calc_rss(self):
        ys, _ = generate_mock_data()
        scan = QDess(ys)
        rss = scan.calc_rss()
        assert np.allclose(
            np.asarray(rss.A), np.sqrt(np.asarray(ys[0].A) ** 2 + np.asarray(ys[1].A) ** 2),
            rtol=1e-5,
        )

    def test_generate_t2_map_matches_physics(self):
        ys, _ = generate_mock_data()
        scan = QDess(ys)
        t2 = scan.generate_t2_map(t1=1200.0, nan_bounds=None, nan_to_num=None, decimals=None)
        expected = reference_t2_formula(np.asarray(ys[0].A), np.asarray(ys[1].A))
        out = np.asarray(t2.volumetric_map.A)
        assert np.allclose(out, expected, rtol=1e-3, atol=1e-3)

    def test_generate_t2_map_bounds(self):
        ys, _ = generate_mock_data()
        scan = QDess(ys)
        t2 = scan.generate_t2_map(t1=1200.0, nan_bounds=(0, 100), nan_to_num=0.0, decimals=1)
        out = np.asarray(t2.volumetric_map.A)
        assert np.all((out >= 0) & (out <= 100))
        # rounding applied
        assert np.allclose(out, np.round(out, 1))

    def test_missing_private_tags_raises(self):
        ys, _ = generate_mock_data(metadata=False)
        scan = QDess(ys)
        with pytest.raises((ValueError, RuntimeError)):
            scan.generate_t2_map(t1=1200.0)

    def test_explicit_params_no_headers(self):
        ys, _ = generate_mock_data(metadata=False)
        scan = QDess(ys)
        t2 = scan.generate_t2_map(
            t1=1200.0, tr=25.0, te=8.0, alpha=30.0, gl_area=3132.0, tg=1560.0
        )
        assert np.asarray(t2.volumetric_map.A).shape == ys[0].shape

    def test_set_metadata_override_honored(self):
        """``scan.set_metadata`` values must win over the reference DICOM in
        ``generate_t2_map``'s parameter resolution (ref ``qdess.py:176-189``
        reads via ``get_metadata``, which checks overrides first)."""
        ys, _ = generate_mock_data()
        scan = QDess(ys)
        scan.set_metadata("RepetitionTime", 30.0)
        t2 = scan.generate_t2_map(t1=1200.0, nan_bounds=None, nan_to_num=None, decimals=None)
        e1, e2 = np.asarray(ys[0].A), np.asarray(ys[1].A)
        out = np.asarray(t2.volumetric_map.A)
        assert np.allclose(out, reference_t2_formula(e1, e2, tr=30.0), rtol=1e-3, atol=1e-3)
        assert not np.allclose(out, reference_t2_formula(e1, e2, tr=25.0), rtol=1e-3, atol=1e-3)

    def test_save_load_roundtrip(self, tmp_path):
        ys, _ = generate_mock_data()
        scan = QDess(ys)
        path = scan.save(str(tmp_path), save_custom=True)
        import os

        assert os.path.isfile(path)
        loaded = QDess.load(str(tmp_path))
        # volumes have headers -> excluded from pickle; loading falls back or
        # reconstructs state. Scalar state must round trip.
        assert loaded.NAME == "qdess"

    def test_cmd_line_actions(self):
        actions = QDess.cmd_line_actions()
        names = [wrapper.name for _, wrapper in actions]
        assert "segment" in names and "generate_t2_map" in names


def test_segmentation_multiclass(tmp_path):
    """ref ``test_qdess.py::test_segmentation_multiclass``: scan.segment with
    a multi-class model wires each tissue's channel into its mask."""
    import jax

    from dosma_tpu.models.oaiunet2d import IWOAIOAIUnet2DNormalized
    from dosma_tpu.models.unet2d import init_unet2d_params
    from dosma_tpu.models.weights import save_keras_unet2d_weights
    from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage
    from dosma_tpu.tissues.meniscus import Meniscus

    from dosma_tpu.core.orientation import SAGITTAL, to_affine

    H = 96
    rs = np.random.RandomState(0)
    aff = to_affine(SAGITTAL, (0.3, 0.3, 0.7))
    vols = [MedicalVolume(rs.rand(H, H, 4) * 800, aff) for _ in range(2)]
    scan = QDess(vols)

    wpath = str(tmp_path / "iwoai-2019-unet2d-normalized_fc-tc-pc-men_weights.h5")
    save_keras_unet2d_weights(
        wpath, init_unet2d_params(jax.random.PRNGKey(0), num_classes=4)
    )
    model = IWOAIOAIUnet2DNormalized((H, H, 1), wpath)

    fc, men = FemoralCartilage(), Meniscus()
    masks = scan.segment(model, [fc, men], use_rss=True)
    assert set(masks) == {"fc", "tc", "pc", "men"}
    assert fc.get_mask() is not None
    assert men.get_mask() is not None
    assert {t.STR_ID for t in scan.tissues} == {"fc", "men"}
