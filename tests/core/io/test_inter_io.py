"""Cross-format I/O tests (model: reference tests/core/io/test_inter_io.py)."""

import numpy as np

from dosma_tpu.core.io import format_io_utils as fio
from dosma_tpu.core.io.dicom_io import DicomReader
from dosma_tpu.core.io.format_io import ImageDataFormat
from tests.util import write_dicom_series


def test_dicom_to_nifti_consistency(tmp_path):
    src = tmp_path / "dicoms"
    write_dicom_series(str(src), shape=(16, 12, 4), n_echos=1)
    vol = DicomReader().load(str(src))[0]

    nifti_path = str(tmp_path / "vol.nii.gz")
    fio.write(vol, nifti_path)
    vol2 = fio.read(nifti_path)
    assert np.array_equal(np.asarray(vol.volume), np.asarray(vol2.volume))
    assert np.allclose(vol.affine, vol2.affine, atol=1e-3)


def test_read_dispatch_by_format(tmp_path):
    src = tmp_path / "dicoms"
    write_dicom_series(str(src), shape=(8, 8, 2), n_echos=2)
    vols = fio.read(str(src), group_by="EchoNumbers")
    assert isinstance(vols, list) and len(vols) == 2


def test_format_inference():
    assert ImageDataFormat.get_image_data_format("x/y.nii.gz") == ImageDataFormat.nifti
    assert ImageDataFormat.get_image_data_format("x/y.nii") == ImageDataFormat.nifti
    assert ImageDataFormat.get_image_data_format("x/y.dcm") == ImageDataFormat.dicom
    assert ImageDataFormat.get_image_data_format("some/dir") == ImageDataFormat.dicom


def test_filepath_variations():
    variations = fio.get_filepath_variations("/a/b/dicoms")
    assert "/a/b/dicoms.nii.gz" in variations
    assert "/a/b/dicoms" in variations


def test_generic_load(tmp_path):
    src = tmp_path / "scan"
    write_dicom_series(str(src), shape=(8, 8, 2), n_echos=1)
    vol = fio.generic_load(str(src), expected_num_volumes=1)
    assert vol.shape == (8, 8, 2)
