"""numpy_routines registry tests (model: reference tests/core/test_numpy_routines.py)."""

import numpy as np
import pytest

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import AXIAL, SAGITTAL, to_affine
from tests.util import build_dummy_headers


def build_mv(shape=(4, 5, 6), nd_extra=0, seed=0, headers=False):
    rs = np.random.RandomState(seed)
    full_shape = shape + (2,) * nd_extra
    headers_arr = build_dummy_headers(full_shape[2:]) if headers else None
    return MedicalVolume(rs.rand(*full_shape), to_affine(SAGITTAL), headers=headers_arr)


class TestReductions:
    def test_nan_variants(self):
        mv = build_mv(nd_extra=1)
        arr = np.asarray(mv.A).copy()
        arr[0, 0, 0, 0] = np.nan
        mv.volume = arr
        out = np.nanmean(mv, axis=-1)
        assert out.shape == (4, 5, 6)
        expected = np.nanmean(arr, axis=-1)
        assert np.allclose(out.A, expected, equal_nan=True)

    def test_argmin_argmax(self):
        mv = build_mv(nd_extra=1)
        out = np.argmax(mv, axis=-1)
        assert np.array_equal(out.A, np.argmax(np.asarray(mv.A), axis=-1))

    def test_all_any(self):
        mv = build_mv()
        assert bool(np.all(mv > -1))
        assert not bool(np.all(mv > 0.5))
        assert bool(np.any(mv > 0.5))


class TestElementwise:
    def test_nan_to_num(self):
        mv = build_mv()
        arr = np.asarray(mv.A).copy()
        arr[0, 0, 0] = np.nan
        mv.volume = arr
        out = np.nan_to_num(mv, nan=7.0)
        assert out.A[0, 0, 0] == 7.0

    def test_clip(self):
        mv = build_mv()
        out = np.clip(mv, 0.2, 0.8)
        assert out.A.min() >= 0.2 and out.A.max() <= 0.8

    def test_around(self):
        mv = build_mv()
        out = np.around(mv, 1)
        assert np.allclose(out.A, np.around(np.asarray(mv.A), 1))

    def test_zeros_ones_like(self):
        mv = build_mv()
        assert np.all(np.zeros_like(mv).A == 0)
        assert np.all(np.ones_like(mv).A == 1)


class TestStackConcat:
    def test_stack_default_axis(self):
        mv = build_mv()
        out = np.stack([mv, mv])
        assert out.shape == (4, 5, 6, 2)

    def test_stack_spatial_raises(self):
        mv = build_mv()
        with pytest.raises(ValueError):
            np.stack([mv, mv], axis=0)

    def test_stack_headers(self):
        mv = build_mv(headers=True)
        out = np.stack([mv, mv])
        assert out.headers() is not None
        assert out.headers().shape[-1] == 2

    def test_concatenate_nonspatial(self):
        mv = build_mv(nd_extra=1)
        out = np.concatenate([mv, mv], axis=-1)
        assert out.shape == (4, 5, 6, 4)

    def test_concatenate_spatial_contiguous(self):
        mv = build_mv()
        # Second volume must start where the first ends along axis 2.
        affine2 = mv.affine.copy()
        ijk = np.array([0, 0, mv.shape[2], 1.0])
        affine2[:3, 3] = (mv.affine @ ijk)[:3]
        mv2 = MedicalVolume(np.asarray(mv.A).copy(), affine2)
        out = np.concatenate([mv, mv2], axis=2)
        assert out.shape == (4, 5, 12)

    def test_concatenate_spatial_noncontiguous_raises(self):
        mv = build_mv()
        with pytest.raises(ValueError):
            np.concatenate([mv, mv], axis=2)

    def test_concatenate_nonspatial_affine_mismatch_raises(self):
        mv = build_mv(nd_extra=1)
        mv2 = MedicalVolume(np.asarray(mv.A).copy(), to_affine(SAGITTAL, origin=(5, 5, 5)))
        with pytest.raises(ValueError):
            np.concatenate([mv, mv2], axis=-1)


class TestShapeOps:
    def test_expand_squeeze(self):
        mv = build_mv()
        out = np.expand_dims(mv, -1)
        assert out.shape == (4, 5, 6, 1)
        back = np.squeeze(out)
        assert back.shape == (4, 5, 6)

    def test_expand_spatial_raises(self):
        mv = build_mv()
        with pytest.raises(ValueError):
            np.expand_dims(mv, 0)

    def test_squeeze_spatial_raises(self):
        mv = MedicalVolume(np.zeros((1, 5, 6)), np.eye(4))
        with pytest.raises(ValueError):
            np.squeeze(mv, 0)


class TestPad:
    def test_pad_shifts_origin(self):
        mv = build_mv()
        out = np.pad(mv, ((1, 1), (2, 2), (3, 3)))
        assert out.shape == (6, 9, 12)
        expected_origin = mv.affine @ np.array([-1, -2, -3, 1.0])
        assert np.allclose(np.asarray(out.scanner_origin), expected_origin[:3])

    def test_pad_nonzero_origin_correct(self):
        # Homogeneous-coordinate regression: origin must include the old
        # translation (the reference's formula dropped it).
        mv = MedicalVolume(np.zeros((3, 4, 5)), to_affine(AXIAL, (1, 1, 1), (10, 20, 30)))
        out = np.pad(mv, ((1, 0), (0, 0), (0, 0)))
        expected = mv.affine @ np.array([-1, 0, 0, 1.0])
        assert np.allclose(np.asarray(out.scanner_origin), expected[:3])


class TestMemory:
    def test_shares_memory(self):
        arr = np.random.rand(3, 4, 5)
        mv1 = MedicalVolume(arr, np.eye(4))
        mv2 = MedicalVolume(arr, np.eye(4))
        mv3 = MedicalVolume(arr.copy(), np.eye(4))
        assert np.shares_memory(mv1, mv2)
        assert not np.shares_memory(mv1, mv3)


class TestReferenceParityMatrix:
    """Cases ported from the reference's test_numpy_routines.py that had no
    analog here (VERDICT r1 item 4)."""

    def test_where_indexing(self):
        """ref ``test_where``: np.where output indexes/assigns a volume."""
        mv = MedicalVolume(np.ones((10, 20, 30)), np.eye(4))
        mv[np.where(np.asarray(mv.A) == 1)] = 5
        assert np.all(np.asarray(mv.A) == 5)
        assert not np.any(np.asarray(mv.A) == 1)

    def test_where_function(self):
        mv = MedicalVolume(np.arange(24.0).reshape(2, 3, 4), np.eye(4))
        out = np.where(mv > 10, mv, 0)
        expected = np.where(np.asarray(mv.A) > 10, np.asarray(mv.A), 0)
        np.testing.assert_array_equal(np.asarray(out.A), expected)

    def test_exp_ufunc(self):
        """ref ``test_exp``: transcendental ufuncs dispatch elementwise."""
        mv = MedicalVolume(np.ones((4, 5, 6)), np.eye(4))
        np.testing.assert_allclose(np.asarray(np.exp(mv).A), np.exp(np.asarray(mv.A)))
        np.testing.assert_allclose(np.asarray(np.sqrt(mv).A), np.ones((4, 5, 6)))
        np.testing.assert_allclose(
            np.asarray(np.log(mv + 1).A), np.log(2) * np.ones((4, 5, 6))
        )

    def test_ndarray_arithmetic(self):
        """ref ``test_ndarray_arithmetic``: mixing raw ndarrays in."""
        mv = MedicalVolume(np.ones((10, 20, 30)), np.eye(4))
        mv2 = mv + np.ones(mv.shape)
        assert np.all(np.asarray(mv2.A) == 2)
        mv3 = 3 * mv
        assert np.all(np.asarray(mv3.A) == 3)

    def test_reduce_funcs_4d(self):
        """ref ``test_reduce_funcs``: reductions over the non-spatial axis
        of a 4D volume."""
        rs = np.random.RandomState(0)
        arr = rs.rand(4, 5, 6, 2)
        mv = MedicalVolume(arr, np.eye(4))
        for fn in (np.sum, np.mean, np.amin, np.amax, np.std):
            out = fn(mv, axis=-1)
            np.testing.assert_allclose(
                np.asarray(out.A), fn(arr, axis=-1), rtol=1e-6
            )
            assert out.shape == (4, 5, 6)

    def test_stats_funcs_scalars(self):
        """ref ``test_stats_funcs``: whole-volume reductions give scalars."""
        rs = np.random.RandomState(1)
        arr = rs.rand(4, 5, 6)
        mv = MedicalVolume(arr, np.eye(4))
        assert np.isclose(np.sum(mv), arr.sum())
        assert np.isclose(np.mean(mv), arr.mean())
        assert np.isclose(np.std(mv), arr.std())
        assert np.isclose(np.amax(mv), arr.max())
        assert np.isclose(np.amin(mv), arr.min())
