"""MedicalVolume behavior tests (model: reference tests/core/test_med_volume.py)."""

import numpy as np
import pytest

import dosma_tpu as dm
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import AXIAL, CORONAL, SAGITTAL, to_affine


def build_mv(shape=(10, 20, 30), ornt=SAGITTAL, spacing=(0.5, 0.6, 0.7), origin=(1, 2, 3), seed=0):
    rs = np.random.RandomState(seed)
    return MedicalVolume(rs.rand(*shape), to_affine(ornt, spacing, origin))


class TestConstruction:
    def test_basic(self):
        mv = build_mv()
        assert mv.shape == (10, 20, 30)
        assert mv.ndim == 3
        assert mv.orientation == SAGITTAL
        assert np.allclose(mv.pixel_spacing, (0.5, 0.6, 0.7))
        assert np.allclose(mv.scanner_origin, (1, 2, 3))

    def test_bad_affine(self):
        with pytest.raises(ValueError):
            MedicalVolume(np.zeros((3, 3, 3)), np.eye(3))

    def test_A_property(self):
        mv = build_mv()
        assert mv.A is mv.volume


class TestReformat:
    def test_roundtrip(self):
        mv = build_mv()
        for target in (AXIAL, CORONAL, SAGITTAL):
            mv2 = mv.reformat(target)
            assert mv2.orientation == target
            mv3 = mv2.reformat(mv.orientation)
            assert np.allclose(mv3.A, mv.A)
            assert np.allclose(mv3.affine, mv.affine)

    def test_flip_only(self):
        mv = build_mv()
        flipped = mv.reformat(("IS", "PA", "RL"))
        assert np.allclose(flipped.A, mv.A[::-1, ::-1, ::-1])
        back = flipped.reformat(SAGITTAL)
        assert np.allclose(back.A, mv.A)
        assert np.allclose(back.affine, mv.affine)

    def test_inplace(self):
        mv = build_mv()
        out = mv.reformat(AXIAL, inplace=True)
        assert out is mv
        assert mv.orientation == AXIAL

    def test_reformat_as(self):
        mv = build_mv()
        other = build_mv(ornt=AXIAL)
        assert mv.reformat_as(other).orientation == AXIAL

    def test_4d(self):
        rs = np.random.RandomState(2)
        mv = MedicalVolume(rs.rand(4, 5, 6, 3), to_affine(SAGITTAL))
        mv2 = mv.reformat(AXIAL)
        assert mv2.shape[-1] == 3
        assert np.allclose(mv2.reformat(SAGITTAL).A, mv.A)


class TestSlicing:
    def test_spatial_slice_affine(self):
        mv = build_mv()
        s = mv[2:5, 1:, ::2]
        assert s.shape == (3, 19, 15)
        expected_origin = mv.affine @ np.array([2, 1, 0, 1])
        assert np.allclose(np.asarray(s.scanner_origin), expected_origin[:3])
        assert np.allclose(s.pixel_spacing, (0.5, 0.6, 1.4))

    def test_scalar_spatial_disallowed(self):
        mv = build_mv()
        with pytest.raises(IndexError):
            mv[0]
        with pytest.raises(IndexError):
            mv[:, :, 0]

    def test_nonspatial_int_ok(self):
        rs = np.random.RandomState(3)
        mv = MedicalVolume(rs.rand(4, 5, 6, 3), np.eye(4))
        s = mv[:, :, :, 0]
        assert s.shape == (4, 5, 6)

    def test_empty_slice_raises(self):
        mv = build_mv()
        with pytest.raises(IndexError):
            mv[3:3]

    def test_setitem(self):
        mv = build_mv()
        mv[2:5] = 0
        assert np.all(mv.A[2:5] == 0)

    def test_setitem_mv_value(self):
        mv = build_mv()
        sub = mv[2:5]
        expected = sub.A.copy() + 1
        sub2 = sub.clone()
        sub2 += 1
        mv[2:5] = sub2
        assert np.allclose(mv.A[2:5], expected)

    def test_boolean_mask_mv_index(self):
        mv = build_mv()
        mask = mv.clone()
        mask.volume = (mv.A > 0.5).astype(np.uint8)
        # Getting with a MedicalVolume mask reformats and uses its array.
        with pytest.raises(IndexError):
            # fancy index in spatial dims is disallowed
            mv[mask]


class TestArithmetic:
    def test_binary_ops(self):
        mv = build_mv()
        mv2 = build_mv(seed=1)
        assert np.allclose((mv + mv2).A, mv.A + mv2.A)
        assert np.allclose((mv - mv2).A, mv.A - mv2.A)
        assert np.allclose((mv * mv2).A, mv.A * mv2.A)
        assert np.allclose((mv / mv2).A, mv.A / mv2.A)
        assert np.allclose((mv**2).A, mv.A**2)
        assert np.allclose((mv + 5).A, mv.A + 5)

    def test_comparison_ops(self):
        mv = build_mv()
        out = mv > 0.5
        assert out.A.dtype == bool
        assert np.array_equal(out.A, mv.A > 0.5)

    def test_inplace_ops(self):
        mv = build_mv()
        base = mv.A.copy()
        mv += 1
        assert np.allclose(mv.A, base + 1)
        mv *= 2
        assert np.allclose(mv.A, (base + 1) * 2)

    def test_mismatched_dims_raises(self):
        mv = build_mv()
        other = build_mv(origin=(0, 0, 0))
        with pytest.raises(ValueError):
            mv + other

    def test_ufunc(self):
        mv = build_mv()
        out = np.exp(mv)
        assert isinstance(out, MedicalVolume)
        assert np.allclose(out.A, np.exp(mv.A))

    def test_unsupported_ufunc_method_raises(self):
        mv = build_mv()
        with pytest.raises(TypeError):
            np.add.outer(mv, mv)


class TestReductions:
    def test_spatial_reduce_raises(self):
        mv = build_mv()
        with pytest.raises(ValueError):
            mv.sum(axis=0)

    def test_nonspatial_reduce(self):
        rs = np.random.RandomState(5)
        mv = MedicalVolume(rs.rand(4, 5, 6, 3), np.eye(4))
        out = mv.sum(axis=-1)
        assert out.shape == (4, 5, 6)
        assert np.allclose(out.A, mv.A.sum(-1))
        out = mv.mean(axis=3, keepdims=True)
        assert out.shape == (4, 5, 6, 1)

    def test_global_reduce_scalar(self):
        mv = build_mv()
        total = mv.sum()
        assert np.isscalar(total) or getattr(total, "ndim", None) == 0
        assert np.allclose(float(total), mv.A.sum())


class TestComparisons:
    def test_is_identical(self):
        mv = build_mv()
        assert mv.is_identical(mv.clone())
        mv2 = mv.clone()
        mv2 += 1
        assert not mv.is_identical(mv2)

    def test_is_same_dimensions(self):
        mv = build_mv()
        assert mv.is_same_dimensions(mv.clone())
        assert not mv.is_same_dimensions(build_mv(origin=(9, 9, 9)))
        with pytest.raises(ValueError):
            mv.is_same_dimensions(build_mv(origin=(9, 9, 9)), err=True)


class TestCloneAndDevice:
    def test_clone_independent(self):
        mv = build_mv()
        c = mv.clone()
        c += 10
        assert not np.allclose(c.A, mv.A)

    def test_astype(self):
        mv = build_mv()
        out = mv.astype(np.float32)
        assert out is mv
        assert mv.dtype == np.float32

    def test_to_device_roundtrip(self):
        mv = build_mv()
        mvj = mv.to(dm.Device(0))
        assert mvj.device != dm.cpu_device
        back = mvj.cpu()
        assert back.device == dm.cpu_device
        assert np.allclose(back.A, mv.A, atol=1e-6)

    def test_copy_to_host_async(self):
        # Device-backed: starts the background D2H and returns self; the
        # later host pull sees identical data. Host-backed: pure no-op.
        mv = build_mv().astype(np.float32)
        mvj = mv.to(dm.Device(0))
        assert mvj.copy_to_host_async() is mvj
        assert np.allclose(np.asarray(mvj.A), mv.A, atol=1e-6)
        assert mv.copy_to_host_async() is mv

    def test_jit_through_pytree(self):
        import jax

        mv = build_mv().astype(np.float32)
        mvj = mv.to(dm.Device(0))
        f = jax.jit(lambda m: m * 2.0)
        out = f(mvj)
        assert isinstance(out, MedicalVolume)
        assert out.orientation == mv.orientation
        assert np.allclose(np.asarray(out.A), mv.A * 2, atol=1e-6)


class TestHeaders:
    def test_set_metadata_force(self):
        mv = build_mv()
        with pytest.raises(ValueError):
            mv.set_metadata("EchoTime", 10.0)
        mv.set_metadata("EchoTime", 10.0, force=True)
        assert mv.get_metadata("EchoTime") == 10.0

    def test_get_metadata_default(self):
        mv = build_mv()
        mv.set_metadata("EchoTime", 10.0, force=True)
        assert mv.get_metadata("NotAField", default=7) == 7
        with pytest.raises(KeyError):
            mv.get_metadata("NotAField")
        assert mv.get_metadata("EchoTime", dtype=int) == 10


def test_set_metadata_force_contract():
    """Missing keys are created only under force=True (reference
    ``med_volume.py:724-732``); force=False raises."""
    import numpy as np
    import pytest

    from tests.util import build_dummy_headers
    from dosma_tpu.core.med_volume import MedicalVolume

    headers = build_dummy_headers((1, 1, 2), fields={"EchoTime": 10.0})
    mv = MedicalVolume(np.zeros((4, 4, 2)), np.eye(4), headers=headers)
    mv.set_metadata("EchoTime", 25.0)  # existing key: fine
    assert mv.get_metadata("EchoTime", float) == 25.0
    with pytest.raises(KeyError):
        mv.set_metadata("InversionTime", 5.0)
    mv.set_metadata("InversionTime", 5.0, force=True)
    assert mv.get_metadata("InversionTime", float) == 5.0


class TestTorchInterop:
    """torch/DLPack interop incl. complex views (ref ``med_volume.py:564-638``,
    ``:1005-1116``)."""

    def test_to_torch_zero_copy_cpu(self):
        import torch

        arr = np.random.RandomState(0).rand(4, 5, 6).astype(np.float32)
        mv = MedicalVolume(arr, np.eye(4))
        t = mv.to_torch()
        assert isinstance(t, torch.Tensor) and t.shape == (4, 5, 6)
        # Zero-copy: mutating the tensor mutates the volume.
        t[0, 0, 0] = 99.0
        assert float(np.asarray(mv.A)[0, 0, 0]) == 99.0

    def test_to_torch_requires_grad_contiguous(self):
        arr = np.random.RandomState(0).rand(3, 3, 3)
        t = MedicalVolume(arr, np.eye(4)).to_torch(requires_grad=True, contiguous=True)
        assert t.requires_grad and t.is_contiguous()

    def test_complex_to_torch(self):
        import torch

        arr = (np.random.RandomState(0).rand(3, 4, 5)
               + 1j * np.random.RandomState(1).rand(3, 4, 5)).astype(np.complex64)
        mv = MedicalVolume(arr, np.eye(4))
        t = mv.to_torch()
        assert t.dtype == torch.complex64

        tr = mv.to_torch(view_as_real=True)
        assert tr.dtype == torch.float32 and tr.shape == (3, 4, 5, 2)
        np.testing.assert_allclose(tr[..., 0].numpy(), arr.real)
        np.testing.assert_allclose(tr[..., 1].numpy(), arr.imag)

    def test_from_torch_roundtrip(self):
        import torch

        t = torch.arange(24, dtype=torch.float32).reshape(2, 3, 4)
        mv = MedicalVolume.from_torch(t, np.eye(4))
        np.testing.assert_array_equal(np.asarray(mv.A), t.numpy())

    def test_to_from_torch_full_cycle(self):
        """(Was shadowed by this class redefining TestTorchInterop —
        re-homed so it actually runs.)"""
        mv = build_mv()
        t = mv.to_torch()
        assert t.shape == mv.shape
        mv2 = MedicalVolume.from_torch(t, mv.affine)
        assert np.allclose(mv2.A, mv.A)

    def test_from_torch_affine_tensor(self):
        import torch

        t = torch.ones(2, 3, 4)
        mv = MedicalVolume.from_torch(t, torch.eye(4))
        np.testing.assert_array_equal(mv.affine, np.eye(4))

    def test_from_torch_to_complex(self):
        import torch

        rs = np.random.RandomState(0)
        real_view = torch.tensor(rs.rand(3, 4, 5, 2).astype(np.float32))
        mv = MedicalVolume.from_torch(real_view, np.eye(4), to_complex=True)
        assert mv.dtype == np.complex64 and mv.shape == (3, 4, 5)
        np.testing.assert_allclose(np.asarray(mv.A).real, real_view[..., 0].numpy())
        np.testing.assert_allclose(np.asarray(mv.A).imag, real_view[..., 1].numpy())

    def test_from_torch_complex_dtype_passthrough(self):
        import torch

        t = torch.complex(torch.ones(2, 3, 4), torch.zeros(2, 3, 4))
        mv = MedicalVolume.from_torch(t, np.eye(4), to_complex=True)
        assert mv.dtype == np.complex64 and mv.shape == (2, 3, 4)

    def test_from_torch_validation(self):
        import torch

        with pytest.raises(ValueError):
            MedicalVolume.from_torch(torch.ones(3, 4), np.eye(4))
        with pytest.raises(ValueError):
            MedicalVolume.from_torch(torch.ones(3, 4, 5), np.eye(4), to_complex=True)
        with pytest.raises(ValueError):
            MedicalVolume.from_torch(torch.ones(3, 4, 5, 3), np.eye(4), to_complex=True)

    def test_jax_cpu_dlpack_to_torch(self):
        import jax.numpy as jnp
        import torch

        arr = jnp.asarray(np.random.RandomState(0).rand(2, 3, 4).astype(np.float32))
        mv = MedicalVolume(arr, np.eye(4))
        t = mv.to_torch()
        assert isinstance(t, torch.Tensor)
        np.testing.assert_allclose(t.numpy(), np.asarray(arr))

    def test_complex_volume_roundtrip_through_torch(self):
        arr = (np.random.RandomState(2).rand(3, 3, 3)
               + 1j * np.random.RandomState(3).rand(3, 3, 3)).astype(np.complex128)
        mv = MedicalVolume(arr, np.eye(4))
        back = MedicalVolume.from_torch(
            mv.to_torch(view_as_real=True), np.eye(4), to_complex=True
        )
        assert back.dtype == np.complex128
        np.testing.assert_allclose(np.asarray(back.A), arr)


class TestReferenceParityMatrix:
    """Cases ported from the reference's test_med_volume.py that had no
    analog here (VERDICT r1 item 4)."""

    _AFFINE = np.asarray(
        [
            [0.0, 0.0, 0.8, -171.41],
            [0.0, -0.3125, 0.0, 96.0154],
            [-0.3125, 0.0, 0.0, 47.0233],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )

    def test_set_volume_inplace_math(self):
        """ref ``test_set_volume``: in-place math through the .volume view."""
        mv = MedicalVolume(np.ones((10, 20, 30)), self._AFFINE)
        mv.volume += 2
        assert np.all(np.asarray(mv.volume) == 3)

    def test_slice_with_headers_matrix(self):
        """ref ``test_slice_with_headers``: the 4D header-broadcast slicing
        edge cases (``med_volume.py:1132-1156``)."""
        from tests.util import build_dummy_headers

        vol = np.stack([np.ones((10, 20, 30)), 2 * np.ones((10, 20, 30))], axis=-1)
        headers = np.stack(
            [
                build_dummy_headers((1, 1, vol.shape[2]), {"EchoTime": 2}),
                build_dummy_headers((1, 1, vol.shape[2]), {"EchoTime": 10}),
            ],
            axis=-1,
        )
        mv = MedicalVolume(vol, self._AFFINE, headers=headers)

        mv2 = mv[..., 0]
        assert mv2.headers().shape == (1, 1, 30)
        for h in mv2.headers(flatten=True):
            assert h["EchoTime"].value == 2

        mv2 = mv[..., 1]
        assert mv2.headers().shape == (1, 1, 30)
        for h in mv2.headers(flatten=True):
            assert h["EchoTime"].value == 10

        mv2 = mv[:10, :5, 8:10, :1]
        assert mv2.headers().shape == (1, 1, 2, 1)

        mv2 = mv[:10]
        assert mv2.headers().shape == (1, 1, 30, 2)
        mv2 = mv[:, :10]
        assert mv2.headers().shape == (1, 1, 30, 2)

        mv2 = mv[..., 0:1]
        assert mv2.headers().shape == (1, 1, 30, 1)

        # A single broadcast header column shares identity across volumes.
        headers = build_dummy_headers((1, 1, vol.shape[2]), {"EchoTime": 2})[..., np.newaxis]
        mv = MedicalVolume(vol, self._AFFINE, headers=headers)
        mv1, mv2 = mv[..., 0], mv[..., 1]
        assert mv1.headers().shape == (1, 1, 30)
        assert mv2.headers().shape == (1, 1, 30)
        for h1, h2 in zip(mv1.headers(flatten=True), mv2.headers(flatten=True)):
            assert id(h1) == id(h2)

    def test_reformat_headers_follow(self):
        """ref ``test_reformat_header``: headers transpose/flip with the
        volume."""
        from tests.util import build_dummy_headers

        vol = np.random.RandomState(0).rand(10, 20, 30)
        headers = build_dummy_headers((1, 1, 30))
        mv = MedicalVolume(vol, self._AFFINE, headers=headers)
        ornt = tuple(o[::-1] for o in mv.orientation[::-1])
        mv2 = mv.reformat(ornt)
        assert mv2.headers().shape == (30, 1, 1)
        mv3 = mv2.reformat(mv.orientation)
        assert mv3.headers().shape == (1, 1, 30)
        for h1, h2 in zip(mv.headers(flatten=True), mv3.headers(flatten=True)):
            assert id(h1) == id(h2)

    def test_math_affine_and_values(self):
        """ref ``test_math``: arithmetic matrix preserves affine and does
        not mutate operands."""
        mv1 = MedicalVolume(np.ones((10, 20, 30)), self._AFFINE)
        mv2 = MedicalVolume(2 * np.ones((10, 20, 30)), self._AFFINE)

        for op, expected in (
            (lambda a, b: a + b, 3),
            (lambda a, b: a - b, -1),
            (lambda a, b: a * b, 2),
            (lambda a, b: a / b, 0.5),
        ):
            out = op(mv1, mv2)
            assert np.all(np.asarray(out.volume) == expected)
            assert np.allclose(out.affine, self._AFFINE)
            assert np.all(np.asarray(mv1.volume) == 1)
            assert np.all(np.asarray(mv2.volume) == 2)

        # Mismatched orientation raises.
        mv3 = mv2.reformat(tuple(o[::-1] for o in mv2.orientation))
        with pytest.raises(ValueError):
            mv1 + mv3

    def test_dtype_astype_matrix(self):
        """ref ``test_dtype``: astype casts through common dtypes."""
        mv = MedicalVolume(np.random.RandomState(0).rand(4, 5, 6) * 100, np.eye(4))
        for dt in (np.float32, np.float64, np.int16, np.uint8, np.bool_, np.complex64):
            out = mv.clone().astype(dt)
            assert out.dtype == dt

    def test_repr_and_str(self):
        mv = MedicalVolume(np.ones((4, 5, 6)), self._AFFINE)
        r = repr(mv)
        assert "MedicalVolume" in r and "4, 5, 6" in r.replace("(", "").replace(")", "")

    def test_hdf5_roundtrip(self, tmp_path):
        """ref ``test_hdf5``: volumes round-trip through the h5 utils."""
        h5py = pytest.importorskip("h5py")  # noqa: F841
        from dosma_tpu.utils import io_utils

        arr = np.random.RandomState(0).rand(4, 5, 6)
        path = str(tmp_path / "vol.h5")
        io_utils.save_h5(path, {"volume": arr, "affine": self._AFFINE})
        back = io_utils.load_h5(path)
        np.testing.assert_allclose(back["volume"], arr)
        np.testing.assert_allclose(back["affine"], self._AFFINE)

    def test_mmap_nifti(self, tmp_path):
        """ref ``test_mmap_nifti``: uncompressed NIfTI loads memory-mapped;
        writes materialize copy-on-write."""
        from dosma_tpu.core.io.nifti_io import NiftiReader, NiftiWriter

        arr = np.random.RandomState(0).rand(6, 7, 8).astype(np.float32)
        path = str(tmp_path / "v.nii")  # uncompressed → mmap-able
        NiftiWriter().save(MedicalVolume(arr, np.eye(4)), path)

        mv = NiftiReader().load(path, mmap=True)
        assert mv.is_mmap
        mv[0, 0, 0] = 5.0  # copy-on-write materialization
        assert not mv.is_mmap
        assert float(np.asarray(mv.A)[0, 0, 0]) == 5.0
        # File unchanged.
        mv2 = NiftiReader().load(path)
        assert float(np.asarray(mv2.A)[0, 0, 0]) == arr[0, 0, 0]

    def test_mmap_numpy(self, tmp_path):
        """ref ``test_mmap_numpy``: a memmap-backed volume reports is_mmap
        and materializes on demand."""
        path = str(tmp_path / "arr.npy")
        np.save(path, np.random.RandomState(0).rand(4, 5, 6))
        arr = np.load(path, mmap_mode="r")
        mv = MedicalVolume(arr, np.eye(4))
        assert mv.is_mmap
        mv2 = mv.materialize()
        assert not mv2.is_mmap

    def test_metadata_matrix(self):
        """ref ``test_metadata``: get/set across all headers."""
        from tests.util import build_dummy_headers

        vol = np.ones((4, 5, 6))
        mv = MedicalVolume(vol, self._AFFINE, headers=build_dummy_headers((1, 1, 6)))
        # Creating a missing key needs force=True (ref ``:724-732``)...
        with pytest.raises(KeyError):
            mv.set_metadata("EchoTime", 12.0)
        mv.set_metadata("EchoTime", 12.0, force=True)
        assert mv.get_metadata("EchoTime") == 12.0
        # ...updating an existing key does not.
        mv.set_metadata("EchoTime", 14.0)
        assert mv.get_metadata("EchoTime") == 14.0
        mv.set_metadata("EchoTime", 12.0, force=True)
        for h in mv.headers(flatten=True):
            assert float(h["EchoTime"].value) == 12.0

        assert mv.get_metadata("FlipAngle", default=30) == 30
        with pytest.raises((KeyError, AttributeError)):
            mv.get_metadata("FlipAngle")


class TestNibInterop:
    """``to_nib``/``from_nib`` exercised against a faithful stand-in for the
    nibabel API surface they consume (``Nifti1Image(dataobj, affine)`` with
    ``.affine``/``.dataobj`` — ref ``med_volume.py:477-495``). nibabel is
    absent from this env, so the stand-in is injected as ``sys.modules
    ['nibabel']``; the code path under test is the REAL one."""

    @pytest.fixture()
    def fake_nibabel(self, monkeypatch):
        import sys
        import types

        from dosma_tpu.utils import env

        class Nifti1Image:
            def __init__(self, dataobj, affine):
                self.dataobj = dataobj
                self.affine = np.asarray(affine)

            def get_fdata(self):
                return np.asarray(self.dataobj, np.float64)

        mod = types.ModuleType("nibabel")
        mod.Nifti1Image = Nifti1Image
        monkeypatch.setitem(sys.modules, "nibabel", mod)
        monkeypatch.setitem(env._SUPPORTED_PACKAGES, "nibabel", True)
        return mod

    def test_to_nib_from_nib_roundtrip(self, fake_nibabel):
        rs = np.random.RandomState(0)
        aff = np.eye(4)
        aff[:3, :3] = rs.randn(3, 3)
        aff[:3, 3] = rs.uniform(-50, 50, 3)
        arr = rs.rand(5, 6, 7).astype(np.float32)
        mv = MedicalVolume(arr, aff)

        img = mv.to_nib()
        assert isinstance(img, fake_nibabel.Nifti1Image)
        np.testing.assert_array_equal(np.asarray(img.dataobj), arr)
        np.testing.assert_allclose(img.affine, aff)
        # to_nib must hand out an affine COPY, not a live view.
        img.affine[0, 0] = 999.0
        assert mv.affine[0, 0] != 999.0

        back = MedicalVolume.from_nib(img, affine_precision=None, origin_precision=None)
        np.testing.assert_array_equal(np.asarray(back.A), arr)
        np.testing.assert_allclose(back.affine[1:], aff[1:])

    def test_from_nib_precision_rounding(self, fake_nibabel):
        """affine_precision/origin_precision round the basis and origin
        separately (reference's default 4-digit rounding)."""
        import nibabel as nib

        aff = np.eye(4)
        aff[0, 0] = 0.123456789
        aff[0, 3] = 10.987654321
        img = nib.Nifti1Image(np.zeros((2, 2, 2), np.float32), aff)
        mv = MedicalVolume.from_nib(img, affine_precision=4, origin_precision=2)
        assert mv.affine[0, 0] == pytest.approx(0.1235, abs=1e-12)
        assert mv.affine[0, 3] == pytest.approx(10.99, abs=1e-12)

    def test_importerror_without_nibabel(self):
        """Without the package the contract is a clean ImportError."""
        from dosma_tpu.utils import env

        if env.nibabel_available():  # pragma: no cover - absent in this env
            pytest.skip("real nibabel present")
        mv = MedicalVolume(np.zeros((2, 2, 2)), np.eye(4))
        with pytest.raises(ImportError, match="nibabel"):
            mv.to_nib()
        with pytest.raises(ImportError, match="nibabel"):
            MedicalVolume.from_nib(object())
