"""Env-gated real-data / golden-weights tier.

These tests are skipped unless ``DOSMA_UNITTEST_DATA_PATH`` points at a
directory of real scans, golden outputs, and pretrained weights (layout
documented in :mod:`tests.util`). They mirror the reference's gated tier
(``/root/reference/tests/util.py:25-52``,
``/root/reference/tests/models/test_oaiunet2d.py:18-41``): synthetic fixtures
validate the math everywhere else; this file validates true pretrained-mask
parity and real-scan ingestion when the data exists.
"""

import os

import numpy as np
import pytest

from tests import util

requires_data = pytest.mark.skipif(
    not util.is_data_available(), reason="unittest data is not available"
)


def _oai_scan():
    from dosma_tpu.core.io.nifti_io import NiftiReader

    path = os.path.join(util.UNITTEST_DATA_PATH, "datasets/oai/test_001_V00.nii.gz")
    if not os.path.isfile(path):
        pytest.skip(f"{path} not present")
    return NiftiReader().load(path)


def _golden(name):
    path = os.path.join(util.UNITTEST_DATA_PATH, "datasets/oai/expected", name)
    if not os.path.isfile(path):
        pytest.skip(f"{path} not present")
    return np.load(path)


def _model(cls, alias, input_shape):
    from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

    weights_dir = os.path.join(util.UNITTEST_WEIGHTS_PATH, alias)
    if not os.path.isdir(weights_dir):
        pytest.skip(f"weights dir {weights_dir} not present")
    tissue = FemoralCartilage()
    tissue.find_weights(weights_dir)
    return cls(input_shape, tissue.weights_file_path)


@requires_data
class TestPretrainedMaskParity:
    """Golden-mask parity: pretrained keras .h5 weights through the JAX
    graphs must reproduce the reference's saved segmentations exactly
    (ref ``tests/models/test_oaiunet2d.py:19-41``)."""

    def test_iwoai_2019_t6(self):
        from dosma_tpu.models.oaiunet2d import IWOAIOAIUnet2D

        classes = ["fc", "tc", "pc", "men"]
        expected = _golden("test_001_V00-iwoai-2019-t6.npy")
        scan = _oai_scan()
        dims = scan.volume.shape
        model = _model(IWOAIOAIUnet2D, "iwoai-2019-t6", (dims[0], dims[1], 1))
        masks = model.generate_mask(scan)
        for i, t in enumerate(classes):
            assert np.all(np.asarray(masks[t].volume) == expected[..., i]), t

    def test_iwoai_2019_t6_normalized(self):
        from dosma_tpu.models.oaiunet2d import IWOAIOAIUnet2DNormalized

        classes = ["fc", "tc", "pc", "men"]
        expected = _golden("test_001_V00-iwoai-2019-t6-normalized.npy")
        scan = _oai_scan()
        dims = scan.volume.shape
        model = _model(
            IWOAIOAIUnet2DNormalized, "iwoai-2019-t6-normalized", (dims[0], dims[1], 1)
        )
        masks = model.generate_mask(scan)
        for i, t in enumerate(classes):
            assert np.all(np.asarray(masks[t].volume) == expected[..., i]), t

    def test_oai_unet2d(self):
        from dosma_tpu.models.oaiunet2d import OAIUnet2D

        expected = _golden("test_001_V00-oai-unet2d-fc.npy")
        scan = _oai_scan()
        dims = scan.volume.shape
        model = _model(OAIUnet2D, "oai-unet2d", (dims[0], dims[1], 1))
        # OAIUnet2D has a single-class head: generate_mask returns ONE
        # MedicalVolume (the fc mask), not a category dict.
        mask = model.generate_mask(scan)
        assert np.all(np.asarray(mask.volume) == expected)

    def test_stanford_qdess(self):
        from dosma_tpu.models.stanford_qdess import StanfordQDessUNet2D

        expected = _golden("test_001_V00-stanford-qdess.npy")
        scan = _oai_scan()
        dims = scan.volume.shape
        model = _model(
            StanfordQDessUNet2D, "stanford-qdess-2021-unet2d", (dims[0], dims[1], 1)
        )
        masks = model.generate_mask(scan)
        for i, t in enumerate(["pc", "fc", "tc", "men"]):
            assert np.all(np.asarray(masks[t].volume) == expected[..., i]), t


@requires_data
class TestRealScanIngestion:
    """Real multi-echo DICOM series load with the documented echo counts
    and flow through each scan pipeline's basic quantitative map."""

    @pytest.mark.parametrize("scan", util.SCANS)
    def test_load_real_series(self, scan):
        from dosma_tpu.core.io.dicom_io import DicomReader

        dicoms = util.get_dicoms_path(util.get_scan_dirpath(scan))
        if not os.path.isdir(dicoms):
            pytest.skip(f"{dicoms} not present")
        vols = DicomReader(num_workers=4).load(dicoms)
        assert len(vols) == util.SCANS_INFO[scan]["expected_num_echos"]
        shapes = {v.shape for v in vols}
        assert len(shapes) == 1  # echoes agree in geometry

    def test_qdess_t2_map_real(self):
        from dosma_tpu.scan_sequences.mri.qdess import QDess
        from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

        dicoms = util.get_dicoms_path(util.get_scan_dirpath("qdess"))
        if not os.path.isdir(dicoms):
            pytest.skip(f"{dicoms} not present")
        scan = QDess.from_dicom(dicoms, num_workers=4)
        t2 = scan.generate_t2_map(FemoralCartilage(), suppress_fat=True)
        vol = np.asarray(t2.volumetric_map.volume)
        assert np.isfinite(vol).any()
        inside = vol[(vol > 0) & np.isfinite(vol)]
        # Physiological knee-cartilage T2 range (ms) dominates the map.
        assert 5 < np.median(inside) < 120
