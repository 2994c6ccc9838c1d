"""SimpleITK interop math, validated against hand-built affines.

SimpleITK cannot be installed in this environment, so these tests exercise
the pure-numpy conversion math (``dosma_tpu/core/sitk_interop.py``) and the
MedicalVolume ``to_sitk(headless=True)`` / ``from_sitk`` paths that share it.
Reference semantics: ``/root/reference/dosma/core/med_volume.py:497-562,945-1003``.
"""

import numpy as np
import pytest

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.sitk_interop import (
    HeadlessSitkImage,
    medvol_to_sitk_params,
    permute_inplane_params,
    sitk_params_to_medvol,
)


def _affine(spacing=(0.5, 0.6, 2.0), origin=(10.0, -20.0, 5.0)):
    """A non-trivial RAS affine: axes i->-y(P), j->-z(I), k->+x(R)."""
    aff = np.zeros((4, 4))
    aff[1, 0] = -spacing[0]
    aff[2, 1] = -spacing[1]
    aff[0, 2] = spacing[2]
    aff[:3, 3] = origin
    aff[3, 3] = 1
    return aff


class TestParamMath:
    def test_to_params_axis_order_and_lps(self):
        vol = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.float32)
        aff = _affine()
        arr, origin, spacing, direction = medvol_to_sitk_params(vol, aff, (0.5, 0.6, 2.0))

        # Axis order reversed: (i, j, k) -> (k, j, i).
        assert arr.shape == (4, 3, 2)
        np.testing.assert_array_equal(arr, vol.transpose(2, 1, 0))

        # Origin and direction are LPS+: x/y components of the RAS affine flip.
        assert origin == (-10.0, 20.0, 5.0)
        d = np.asarray(direction).reshape(3, 3)
        # Column 0 = direction of image axis x = our axis i = -y(RAS) = +y(LPS).
        np.testing.assert_allclose(d[:, 0], [0, 1, 0], atol=1e-12)
        np.testing.assert_allclose(d[:, 1], [0, 0, -1], atol=1e-12)
        np.testing.assert_allclose(d[:, 2], [-1, 0, 0], atol=1e-12)
        # Unit-norm columns: spacing fully factored out.
        np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-12)

    def test_roundtrip_recovers_affine(self):
        rs = np.random.RandomState(0)
        vol = rs.rand(5, 4, 3).astype(np.float32)
        aff = _affine(spacing=(0.7, 1.1, 3.0), origin=(-4.0, 8.0, 2.5))
        params = medvol_to_sitk_params(vol, aff, (0.7, 1.1, 3.0))
        vol2, aff2 = sitk_params_to_medvol(*params)
        np.testing.assert_array_equal(vol2, vol)
        np.testing.assert_allclose(aff2, aff, atol=1e-12)

    def test_vector_dim_stays_last(self):
        vol = np.zeros((5, 4, 3, 2), np.float32)
        vol[1, 2, 0, 1] = 7
        arr, *_ = medvol_to_sitk_params(vol, np.eye(4), (1, 1, 1), vdim=-1)
        assert arr.shape == (3, 4, 5, 2)
        assert arr[0, 2, 1, 1] == 7
        back, _ = sitk_params_to_medvol(arr, (0, 0, 0), (1, 1, 1), np.eye(3).ravel(), is_vector=True)
        np.testing.assert_array_equal(back, vol)

    def test_permute_inplane_is_involution_on_geometry(self):
        rs = np.random.RandomState(1)
        vol = rs.rand(5, 4, 3)
        aff = _affine()
        params = medvol_to_sitk_params(vol, aff, (0.5, 0.6, 2.0))
        twice = permute_inplane_params(*permute_inplane_params(*params))
        np.testing.assert_array_equal(twice[0], params[0])
        assert twice[1:] == params[1:]

    def test_permute_inplane_swaps_spacing_and_columns(self):
        vol = np.zeros((5, 4, 3))
        params = medvol_to_sitk_params(vol, _affine(), (0.5, 0.6, 2.0))
        arr, origin, spacing, direction = permute_inplane_params(*params)
        assert arr.shape == (3, 5, 4)  # (z, y, x) with x<->y swapped
        assert spacing == (0.6, 0.5, 2.0)
        assert origin == params[1]  # origin is the physical index-(0,0,0) point
        d0 = np.asarray(params[3]).reshape(3, 3)
        d1 = np.asarray(direction).reshape(3, 3)
        np.testing.assert_array_equal(d1[:, 0], d0[:, 1])
        np.testing.assert_array_equal(d1[:, 1], d0[:, 0])

    def test_permute_then_convert_matches_reference_convention(self):
        # Converting a permuted image back must still reproduce volume+affine
        # when from_sitk also applies transpose_inplane.
        rs = np.random.RandomState(2)
        vol = rs.rand(6, 5, 4)
        aff = _affine()
        params = medvol_to_sitk_params(vol, aff, (0.5, 0.6, 2.0))
        permuted = permute_inplane_params(*params)
        unpermuted = permute_inplane_params(*permuted)
        vol2, aff2 = sitk_params_to_medvol(*unpermuted)
        np.testing.assert_array_equal(vol2, vol)
        np.testing.assert_allclose(aff2, aff, atol=1e-12)


class TestMedicalVolumeSitk:
    def test_headless_roundtrip(self):
        rs = np.random.RandomState(3)
        vol = rs.rand(7, 6, 5).astype(np.float32)
        mv = MedicalVolume(vol, _affine())
        img = mv.to_sitk(headless=True)

        assert img.GetSize() == (7, 6, 5)  # sitk (x, y, z) == our (i, j, k)
        assert img.GetNumberOfComponentsPerPixel() == 1
        np.testing.assert_allclose(img.GetSpacing(), mv.pixel_spacing)

        back = MedicalVolume.from_sitk(img)
        np.testing.assert_array_equal(back.volume, mv.volume)
        np.testing.assert_allclose(back.affine, mv.affine, atol=1e-10)

    def test_headless_roundtrip_transpose_inplane(self):
        rs = np.random.RandomState(4)
        vol = rs.rand(7, 6, 5).astype(np.float32)
        mv = MedicalVolume(vol, _affine())
        img = mv.to_sitk(headless=True, transpose_inplane=True)
        back = MedicalVolume.from_sitk(img, transpose_inplane=True)
        np.testing.assert_array_equal(back.volume, mv.volume)
        np.testing.assert_allclose(back.affine, mv.affine, atol=1e-10)

    def test_vector_volume_roundtrip(self):
        rs = np.random.RandomState(5)
        vol = rs.rand(4, 5, 6, 3).astype(np.float32)
        mv = MedicalVolume(vol, _affine())
        img = mv.to_sitk(vdim=-1, headless=True)
        assert img.GetNumberOfComponentsPerPixel() == 3
        back = MedicalVolume.from_sitk(img)
        np.testing.assert_array_equal(back.volume, vol)

    def test_from_sitk_rejects_2d(self):
        img = HeadlessSitkImage(np.zeros((4, 5)), (0, 0), (1, 1), np.eye(2).ravel())
        with pytest.raises(ValueError, match="3D"):
            MedicalVolume.from_sitk(img)

    def test_to_sitk_requires_sitk_without_headless(self):
        from dosma_tpu.utils import env

        mv = MedicalVolume(np.zeros((2, 2, 2)), np.eye(4))
        if not env.sitk_available():
            with pytest.raises(ImportError):
                mv.to_sitk()

    def test_copy_semantics(self):
        vol = np.zeros((3, 3, 3), np.float32)
        mv = MedicalVolume(vol, np.eye(4))
        img = mv.to_sitk(headless=True)
        shared = MedicalVolume.from_sitk(img, copy=False)
        copied = MedicalVolume.from_sitk(img, copy=True)
        img.array_from_image()[0, 0, 0] = 9  # mutate backing store
        assert np.asarray(shared.volume)[0, 0, 0] == 9
        assert np.asarray(copied.volume)[0, 0, 0] == 0
