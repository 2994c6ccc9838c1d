"""DICOM I/O tests (model: reference tests/core/io/test_dicom_io.py)."""

import os

import numpy as np
import pytest

from dosma_tpu.core.io.dicom_io import DicomReader, DicomWriter, to_RAS_affine
from tests.util import build_dicom_dataset, write_dicom_series


class TestDicomReader:
    def test_load_group_by_echo(self, tmp_path):
        arr = write_dicom_series(str(tmp_path), shape=(16, 12, 4), n_echos=2)
        reader = DicomReader(group_by="EchoNumbers")
        vols = reader.load(str(tmp_path))
        assert len(vols) == 2
        for e, v in enumerate(vols):
            assert v.shape == (16, 12, 4)
            assert np.array_equal(np.asarray(v.volume), arr[:, :, :, e])
            assert v.headers() is not None
            assert v.headers().shape == (1, 1, 4)
            assert v.get_metadata("EchoNumbers") == e + 1

    def test_affine_lps_to_ras(self, tmp_path):
        write_dicom_series(
            str(tmp_path), shape=(8, 8, 3), n_echos=1, spacing=(0.5, 0.7, 1.2), origin=(5, -3, 2)
        )
        vols = DicomReader().load(str(tmp_path))
        v = vols[0]
        # LPS origin (5,-3,2) → RAS origin (-5,3,2)
        assert np.allclose(v.scanner_origin, (-5, 3, 2))
        assert np.allclose(sorted(v.pixel_spacing), sorted((0.5, 0.7, 1.2)))
        # Identity in-plane direction, axial acquisition
        assert v.orientation[2] == "IS"

    def test_sort_by(self, tmp_path):
        write_dicom_series(str(tmp_path), shape=(8, 8, 3), n_echos=1)
        vols = DicomReader().load(str(tmp_path), sort_by="InstanceNumber")
        assert len(vols) == 1

    def test_group_by_missing_tag(self, tmp_path):
        write_dicom_series(str(tmp_path), shape=(8, 8, 2), n_echos=1)
        with pytest.raises(KeyError):
            DicomReader().load(str(tmp_path), group_by="TemporalPositionIdentifier")

    def test_load_files_list(self, tmp_path):
        write_dicom_series(str(tmp_path), shape=(8, 8, 3), n_echos=1)
        files = sorted(
            os.path.join(tmp_path, f) for f in os.listdir(tmp_path) if f.endswith(".dcm")
        )
        vols = DicomReader().load(files)
        assert vols[0].shape == (8, 8, 3)

    def test_load_bytes(self, tmp_path):
        write_dicom_series(str(tmp_path), shape=(8, 8, 2), n_echos=1)
        files = sorted(
            os.path.join(tmp_path, f) for f in os.listdir(tmp_path) if f.endswith(".dcm")
        )
        blobs = [open(f, "rb").read() for f in files]
        vols = DicomReader().load(blobs)
        assert vols[0].shape == (8, 8, 2)

    def test_num_workers(self, tmp_path):
        arr = write_dicom_series(str(tmp_path), shape=(8, 8, 4), n_echos=2)
        serial = DicomReader(num_workers=0).load(str(tmp_path))
        threaded = DicomReader(num_workers=4).load(str(tmp_path))
        assert len(serial) == len(threaded)
        for a, b in zip(serial, threaded):
            assert a.is_identical(b)


class TestDicomWriter:
    def test_roundtrip(self, tmp_path):
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(16, 12, 4), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        DicomWriter().save(vol, str(dst))
        files = [f for f in os.listdir(dst) if f.endswith(".dcm")]
        assert len(files) == 4
        vol2 = DicomReader().load(str(dst))[0]
        assert np.array_equal(np.asarray(vol.volume), np.asarray(vol2.volume))
        assert np.allclose(vol.affine, vol2.affine)

    def test_write_no_headers_raises(self, tmp_path):
        from dosma_tpu.core.med_volume import MedicalVolume

        mv = MedicalVolume(np.zeros((4, 4, 2)), np.eye(4))
        with pytest.raises(ValueError):
            DicomWriter().save(mv, str(tmp_path / "out"))

    def test_write_after_reformat_roundtrip(self, tmp_path):
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(16, 12, 4), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        flipped = vol.reformat(vol.orientation[::-1])
        DicomWriter().save(flipped, str(dst))
        vol2 = DicomReader().load(str(dst))[0]
        assert np.array_equal(np.asarray(vol.volume), np.asarray(vol2.volume))


    def test_write_4d_multi_echo(self, tmp_path):
        """A 4D (rows, cols, slices, echoes) volume writes one file per
        slice-echo and reloads into the original echo groups."""
        import dosma_tpu.core.numpy_routines as nr

        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(16, 12, 4), n_echos=2)
        vols = DicomReader().load(str(src))
        v4 = nr.stack(vols, axis=-1)
        assert v4.shape == (16, 12, 4, 2)

        DicomWriter().save(v4, str(dst))
        files = [f for f in os.listdir(dst) if f.endswith(".dcm")]
        assert len(files) == 8  # 4 slices x 2 echoes

        back = DicomReader().load(str(dst), group_by="EchoNumbers")
        assert len(back) == 2
        for orig, reloaded in zip(vols, back):
            assert np.array_equal(np.asarray(orig.volume), np.asarray(reloaded.volume))
            assert np.allclose(orig.affine, reloaded.affine)

    def test_write_sort_by_instance_number(self, tmp_path):
        """sort_by reorders output files by the header attribute."""
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(8, 8, 3), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        DicomWriter().save(vol, str(dst), sort_by="InstanceNumber")
        files = sorted(f for f in os.listdir(dst) if f.endswith(".dcm"))
        # file k holds InstanceNumber k (ascending)
        from dosma_tpu.core.io.dicom.reader import read_dicom

        numbers = [int(read_dicom(str(dst / f)).InstanceNumber) for f in files]
        assert numbers == sorted(numbers)

    def test_write_custom_fname_fmt(self, tmp_path):
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(8, 8, 3), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        DicomWriter().save(vol, str(dst), fname_fmt="slice_%03d.dcm")
        assert sorted(os.listdir(dst)) == ["slice_001.dcm", "slice_002.dcm", "slice_003.dcm"]

    def test_write_float_data_coerced_to_header_bits(self, tmp_path):
        """Float voxels are coerced to a 16-bit dtype covering their range
        (the header declares BitsAllocated=16)."""
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(8, 8, 2), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        shifted = (vol - 5).astype(np.int32)  # negative ints, 32-bit
        DicomWriter().save(shifted, str(dst))
        back = DicomReader().load(str(dst))[0]
        assert np.array_equal(np.asarray(back.volume), np.asarray(shifted.volume))
        assert back.headers().flatten()[0].BitsAllocated == 16

    def test_write_out_of_range_raises(self, tmp_path):
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        write_dicom_series(str(src), shape=(8, 8, 2), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        too_big = vol.astype(np.float32) * 1e9  # exceeds every 16-bit dtype
        with pytest.raises(ValueError):
            DicomWriter().save(too_big, str(dst))

    def test_write_parallel_workers_match_serial(self, tmp_path):
        src = tmp_path / "src"
        write_dicom_series(str(src), shape=(8, 8, 4), n_echos=1)
        vol = DicomReader().load(str(src))[0]
        DicomWriter(num_workers=0).save(vol, str(tmp_path / "serial"))
        DicomWriter(num_workers=4).save(vol, str(tmp_path / "parallel"))
        a = DicomReader().load(str(tmp_path / "serial"))[0]
        b = DicomReader().load(str(tmp_path / "parallel"))[0]
        assert np.array_equal(np.asarray(a.volume), np.asarray(b.volume))


class TestToRASAffine:
    def test_single_slice_cross_product(self):
        ds = build_dicom_dataset(np.zeros((4, 4), dtype=np.uint16))
        affine = to_RAS_affine([ds])
        assert affine.shape == (4, 4)
        assert affine[3, 3] == 1
        # k-vector from cross product of identity in-plane dirs → z
        assert abs(affine[2, 2]) == 1.0
