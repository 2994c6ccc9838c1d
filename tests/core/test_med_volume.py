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

    def test_jit_through_pytree(self):
        import jax

        mv = build_mv().astype(np.float32)
        mvj = mv.to(dm.Device(0))
        f = jax.jit(lambda m: m * 2.0)
        out = f(mvj)
        assert isinstance(out, MedicalVolume)
        assert out.orientation == mv.orientation
        assert np.allclose(np.asarray(out.A), mv.A * 2, atol=1e-6)


class TestTorchInterop:
    def test_to_from_torch(self):
        mv = build_mv()
        t = mv.to_torch()
        assert t.shape == mv.shape
        mv2 = MedicalVolume.from_torch(t, mv.affine)
        assert np.allclose(mv2.A, mv.A)


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
