"""NIfTI I/O tests (model: reference tests/core/io/test_nifti_io.py)."""

import numpy as np
import pytest

from dosma_tpu.core.io.nifti_io import NiftiReader, NiftiWriter
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import AXIAL, CORONAL, SAGITTAL, to_affine


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize("ornt", [SAGITTAL, CORONAL, AXIAL])
def test_roundtrip(tmp_path, ext, ornt):
    rs = np.random.RandomState(1)
    mv = MedicalVolume(
        rs.rand(8, 9, 10).astype(np.float32),
        to_affine(ornt, (0.5, 0.6, 0.7), (1.0, -2.0, 3.0)),
    )
    path = str(tmp_path / f"vol{ext}")
    NiftiWriter().save(mv, path)
    mv2 = NiftiReader().load(path)
    assert np.allclose(mv2.A, mv.A)
    assert np.allclose(mv2.affine, mv.affine, atol=1e-4)
    assert mv2.orientation == mv.orientation


def test_mmap(tmp_path):
    mv = MedicalVolume(np.arange(60, dtype=np.int16).reshape(3, 4, 5), np.eye(4))
    path = str(tmp_path / "v.nii")
    NiftiWriter().save(mv, path)
    mv2 = NiftiReader(mmap=True).load(path)
    assert mv2.is_mmap
    assert np.array_equal(np.asarray(mv2.A), mv.A)


def test_bad_extension(tmp_path):
    mv = MedicalVolume(np.zeros((2, 2, 2)), np.eye(4))
    with pytest.raises(ValueError):
        NiftiWriter().save(mv, str(tmp_path / "vol.txt"))
    with pytest.raises(FileNotFoundError):
        NiftiReader().load(str(tmp_path / "missing.nii"))


def test_4d_roundtrip(tmp_path):
    rs = np.random.RandomState(2)
    mv = MedicalVolume(rs.rand(4, 5, 6, 3), to_affine(SAGITTAL))
    path = str(tmp_path / "v4.nii.gz")
    NiftiWriter().save(mv, path)
    mv2 = NiftiReader().load(path)
    assert mv2.shape == (4, 5, 6, 3)
    assert np.allclose(mv2.A, mv.A)


def test_loaded_volume_is_writable(tmp_path):
    """Arrays read from NIfTI must support in-place math (frombuffer over
    bytes is read-only; the reader must copy)."""
    import numpy as np

    from dosma_tpu.core.io.nifti_io import NiftiReader, NiftiWriter
    from dosma_tpu.core.med_volume import MedicalVolume

    p = str(tmp_path / "w.nii.gz")
    NiftiWriter().save(MedicalVolume(np.ones((4, 5, 6), np.float32), np.eye(4)), p)
    mv = NiftiReader().load(p)
    mv *= 2  # must not raise "assignment destination is read-only"
    mv[0:1] = 0
    assert float(np.asarray(mv.volume).max()) == 2.0


def test_nan_scl_slope_means_unscaled(tmp_path):
    """scl_slope=NaN in the header means 'unset' (nibabel semantics) — it
    must not scale the whole array into NaN."""
    import gzip
    import struct

    import numpy as np

    from dosma_tpu.core.io.nifti_io import NiftiReader, NiftiWriter
    from dosma_tpu.core.med_volume import MedicalVolume

    p = str(tmp_path / "x.nii")
    NiftiWriter().save(MedicalVolume(np.ones((3, 3, 3), np.float32), np.eye(4)), p)
    raw = bytearray(open(p, "rb").read())
    # scl_slope is a float32 at byte offset 112 of the 348-byte header.
    raw[112:116] = struct.pack("<f", float("nan"))
    open(p, "wb").write(bytes(raw))
    mv = NiftiReader().load(p)
    assert np.isfinite(np.asarray(mv.volume)).all()


def test_gz_multi_member_chunk_boundaries(tmp_path):
    """Large volumes write as concatenated gzip members (RFC 1952); bodies
    at, below, and straddling the 8 MB chunk boundary all round-trip."""
    import gzip

    from dosma_tpu.core.io.nifti import _gzip_write

    rs = np.random.RandomState(3)
    chunk = 8 * 1024 * 1024
    for size in (100, chunk - 352, chunk, chunk + 1, int(2.5 * chunk)):
        body = rs.bytes(size)
        p = str(tmp_path / f"b{size}.gz")
        _gzip_write(p, body)
        with gzip.open(p, "rb") as f:
            assert f.read() == body, size


def test_gz_large_volume_roundtrip(tmp_path):
    # >8 MB int16 volume through the public writer/reader.
    rs = np.random.RandomState(4)
    arr = (rs.randint(0, 2000, (256, 256, 48))).astype(np.int16)
    mv = MedicalVolume(arr, to_affine(SAGITTAL, (0.4, 0.4, 1.0)))
    p = str(tmp_path / "big.nii.gz")
    NiftiWriter().save(mv, p)
    out = NiftiReader().load(p)
    assert np.array_equal(np.asarray(out.A), arr)
    assert np.allclose(out.affine, mv.affine, atol=1e-4)


def test_lying_dims_raise_cleanly(tmp_path):
    """A header claiming more data than the file holds must raise ValueError,
    not attempt the claimed allocation (a 30000^3 dim field ~ 100 TB)."""
    import gzip
    import struct

    from dosma_tpu.core.io.nifti import read_nifti, write_nifti

    p = str(tmp_path / "a.nii")
    write_nifti(p, np.zeros((4, 4, 2), np.float32), np.eye(4))
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<8h", raw, 40, 3, 30000, 30000, 30000, 1, 1, 1, 1)
    bad = str(tmp_path / "big.nii")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="claims"):
        read_nifti(bad)
    bad_gz = str(tmp_path / "big.nii.gz")
    open(bad_gz, "wb").write(gzip.compress(bytes(raw)))
    with pytest.raises(ValueError, match="claims"):
        read_nifti(bad_gz)
    # negative / zero dims are rejected up front
    struct.pack_into("<8h", raw, 40, 3, -4, 4, 2, 1, 1, 1, 1)
    bad2 = str(tmp_path / "neg.nii")
    open(bad2, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="Invalid NIfTI dims"):
        read_nifti(bad2)


class TestNiftiRoundTripPropertySweep:
    """Seeded randomized round-trips: every storable dtype, randomized
    oblique affines (rotations + anisotropic scales + flips), odd shapes,
    extreme values. The NIfTI-1 codec is from scratch (nibabel absent from
    this env; ref delegates to nibabel at
    ``/root/reference/dosma/core/io/nifti_io.py``), so dtype x affine
    handling is property-checked for exactness rather than only on
    axis-aligned float32 volumes."""

    DTYPES = [np.uint8, np.int16, np.uint16, np.int32, np.float32, np.float64]

    @pytest.mark.parametrize("dtype", DTYPES)
    @pytest.mark.parametrize("seed", [0, 1])
    def test_randomized_roundtrip(self, tmp_path, dtype, seed):
        rs = np.random.RandomState(300 + seed)
        shape = tuple(int(rs.randint(3, 14)) for _ in range(3))

        # Random rotation basis with random anisotropic scales — an
        # oblique, non-axis-aligned affine; odd seeds flip one axis so
        # negative-determinant (mirrored) affines are exercised too.
        q, _ = np.linalg.qr(rs.randn(3, 3))
        if (np.linalg.det(q) < 0) != bool(seed % 2):
            q[:, 0] *= -1
        scales = rs.uniform(0.2, 4.0, 3)
        aff = np.eye(4)
        aff[:3, :3] = q * scales
        aff[:3, 3] = rs.uniform(-100, 100, 3)

        if np.issubdtype(dtype, np.floating):
            arr = (rs.randn(*shape) * 1e3).astype(dtype)
            arr.flat[0] = 0.0
        else:
            info = np.iinfo(dtype)
            arr = rs.randint(info.min, int(info.max) + 1, size=shape).astype(dtype)
            arr.flat[0], arr.flat[-1] = info.min, info.max

        mv = MedicalVolume(arr, aff)
        path = str(tmp_path / f"v_{np.dtype(dtype).name}_{seed}.nii.gz")
        NiftiWriter().save(mv, path)
        back = NiftiReader().load(path)

        assert back.A.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(back.A, arr)
        np.testing.assert_allclose(back.affine, aff, atol=1e-4)
