"""I/O dispatch tests (model: reference ``tests/core/io/test_format_io_utils.py``:
reader/writer registries, format path conversion, generic_load probing,
read/write inference)."""

import numpy as np
import pytest

from dosma_tpu.core.io import format_io_utils as fio_utils
from dosma_tpu.core.io.dicom_io import DicomReader, DicomWriter
from dosma_tpu.core.io.format_io import ImageDataFormat
from dosma_tpu.core.io.nifti_io import NiftiReader, NiftiWriter
from dosma_tpu.core.med_volume import MedicalVolume


def _vol(shape=(6, 6, 3)):
    return MedicalVolume(np.random.RandomState(0).rand(*shape).astype(np.float32), np.eye(4))


class TestRegistries:
    def test_get_reader_writer(self):
        assert isinstance(fio_utils.get_reader(ImageDataFormat.nifti), NiftiReader)
        assert isinstance(fio_utils.get_writer(ImageDataFormat.nifti), NiftiWriter)
        assert isinstance(fio_utils.get_reader(ImageDataFormat.dicom), DicomReader)
        assert isinstance(fio_utils.get_writer(ImageDataFormat.dicom), DicomWriter)


class TestPathConversion:
    def test_convert_image_data_format(self):
        assert fio_utils.convert_image_data_format(
            "/x/series", ImageDataFormat.nifti
        ) == "/x/series.nii.gz"
        assert fio_utils.convert_image_data_format(
            "/x/series.nii.gz", ImageDataFormat.dicom
        ) == "/x/series"
        # no-op when already in the target format
        assert fio_utils.convert_image_data_format(
            "/x/a.nii.gz", ImageDataFormat.nifti
        ) == "/x/a.nii.gz"

    def test_get_filepath_variations(self):
        variations = fio_utils.get_filepath_variations("/x/series")
        assert set(variations) == {"/x/series", "/x/series.nii.gz"}


class TestGenericLoad:
    def test_loads_nifti_variant(self, tmp_path):
        vol = _vol()
        NiftiWriter().save(vol, str(tmp_path / "scan.nii.gz"))
        # probe with the dicom-style basename: the nifti variant is found
        loaded = fio_utils.generic_load(str(tmp_path / "scan"), expected_num_volumes=1)
        assert np.allclose(np.asarray(loaded.volume), np.asarray(vol.volume), atol=1e-6)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            fio_utils.generic_load(str(tmp_path / "nope"), expected_num_volumes=1)

    def test_ambiguous_raises(self, tmp_path):
        NiftiWriter().save(_vol(), str(tmp_path / "scan.nii.gz"))
        (tmp_path / "scan").mkdir()
        with pytest.raises(ValueError, match="Ambiguous"):
            fio_utils.generic_load(str(tmp_path / "scan"))

    def test_expected_count_enforced(self, tmp_path):
        NiftiWriter().save(_vol(), str(tmp_path / "scan.nii.gz"))
        with pytest.raises(AssertionError):
            fio_utils.generic_load(str(tmp_path / "scan"), expected_num_volumes=2)


class TestReadWriteDispatch:
    def test_nifti_round_trip_inferred(self, tmp_path):
        vol = _vol()
        path = str(tmp_path / "v.nii.gz")
        fio_utils.write(vol, path)  # format inferred from extension
        back = fio_utils.read(path)
        assert np.allclose(np.asarray(back.volume), np.asarray(vol.volume), atol=1e-6)

    def test_load_save_aliases(self):
        assert fio_utils.load is fio_utils.read
        assert fio_utils.save is fio_utils.write

    def test_kwargs_split_between_init_and_load(self, tmp_path):
        """Reader init kwargs (num_workers) and load kwargs (group_by) both
        pass through the dispatch layer."""
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from util import write_dicom_series

        src = tmp_path / "dcm"
        write_dicom_series(str(src), shape=(8, 8, 2), n_echos=2)
        vols = fio_utils.read(str(src), num_workers=0, group_by="EchoNumbers")
        assert len(vols) == 2

    def test_format_inference_from_path(self):
        assert ImageDataFormat.get_image_data_format("/a/b.nii.gz") == ImageDataFormat.nifti
        assert ImageDataFormat.get_image_data_format("/a/series_dir") == ImageDataFormat.dicom


class TestImageDataFormat:
    """Mirror of the reference's dedicated ImageDataFormat suite
    (``/root/reference/tests/core/io/test_format_io.py``)."""

    def test_is_filetype(self):
        assert ImageDataFormat.dicom.is_filetype("data.dcm")
        assert not ImageDataFormat.dicom.is_filetype("data.nii.gz")
        assert ImageDataFormat.nifti.is_filetype("data.nii.gz")
        assert ImageDataFormat.nifti.is_filetype("data.nii")
        assert not ImageDataFormat.nifti.is_filetype("data.dcm")

    def test_get_image_data_format(self):
        assert ImageDataFormat.get_image_data_format("data.dcm") == ImageDataFormat.dicom
        # Extension-less paths (directories) default to dicom.
        assert ImageDataFormat.get_image_data_format("/path/to/dir") == ImageDataFormat.dicom
        assert ImageDataFormat.get_image_data_format("data.nii.gz") == ImageDataFormat.nifti
