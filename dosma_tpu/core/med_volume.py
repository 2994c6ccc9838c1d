"""The medical image data structure: array + RAS+ affine + DICOM headers.

TPU-native re-design of ``/root/reference/dosma/core/med_volume.py:38-1386``.
The pixel array is either a host ``numpy.ndarray`` or a device-resident
``jax.Array`` (TPU HBM); the 4x4 affine and the header table always live on
the host. ``MedicalVolume`` is registered as a JAX pytree (array leaf +
static metadata) so volumes can flow through ``jit``/``vmap``/``pjit``
directly.

Feature parity (same citation scheme as SURVEY.md §2.2):
  - ``reformat``/``reformat_as`` via transpose+flip with affine and origin
    recomputation (ref ``med_volume.py:177-288``)
  - spatial-first slicing ``__getitem__`` slicing headers and affine
    (ref ``:1222-1249``); ``__setitem__`` (ref ``:1251-1264``)
  - ufunc interception (shape-preserving calls + non-spatial reductions,
    ref ``:1328-1356``, ``:1180-1192``) and ``__array_function__`` registry
    dispatch (ref ``:1358-1367``)
  - header metadata get/set (ref ``:657-732``), device movement (ref
    ``:433-452``), torch/DLPack interop (ref ``:564-638``), comparisons
    (ref ``:290-385``), clone/_partial_clone (ref ``:417-431, 1118-1130``).
"""

from __future__ import annotations

import warnings
from copy import deepcopy
from numbers import Number
from typing import Optional, Sequence, Tuple, Union

import numpy as np
from numpy.lib.mixins import NDArrayOperatorsMixin

from dosma_tpu.core import orientation as stdo
from dosma_tpu.core.device import Device, cpu_device, get_device
from dosma_tpu.defaults import SCANNER_ORIGIN_DECIMAL_PRECISION
from dosma_tpu.utils import env

__all__ = ["MedicalVolume"]

_NoValue = object()


def _is_jax(x) -> bool:
    import jax

    return isinstance(x, jax.Array)


class MedicalVolume(NDArrayOperatorsMixin):
    """Spatially-aware ndarray with RAS+ affine tracking.

    Args:
        volume: array-like pixel data, ndim >= 3 with spatial dims first.
        affine: 4x4 array mapping (i, j, k) voxel coordinates of the first
            three axes to RAS+ world coordinates.
        headers: optional array of DICOM header datasets, broadcastable
            against ``volume.shape``.
    """

    def __init__(self, volume, affine, headers=None):
        if not _is_jax(volume) and not isinstance(volume, np.memmap):
            volume = np.asarray(volume)
        self._volume = volume
        self._affine = np.array(affine, dtype=np.float64)
        if self._affine.shape != (4, 4):
            raise ValueError(f"`affine` must be 4x4, got shape {self._affine.shape}")
        self._headers = self._validate_and_format_headers(headers) if headers is not None else None

    # ------------------------------------------------------------------
    # I/O
    # ------------------------------------------------------------------
    def save_volume(self, file_path: str, data_format=None):
        """Write volume in the specified data format (default from preferences)."""
        from dosma_tpu.core.io import format_io_utils
        from dosma_tpu.defaults import preferences

        if data_format is None:
            data_format = preferences.image_data_format
        writer = format_io_utils.get_writer(data_format)
        writer.save(self.cpu() if self.device != cpu_device else self, file_path)

    # ------------------------------------------------------------------
    # Reformatting
    # ------------------------------------------------------------------
    def reformat(self, new_orientation: Sequence, inplace: bool = False) -> "MedicalVolume":
        """Reorient to ``new_orientation`` by transposing/flipping spatial axes.

        Transposing axes permutes affine columns; flipping negates the column
        and shifts the origin by ``(n-1)`` voxels along the flipped direction
        (ref ``med_volume.py:177-275``).
        """
        xp = self.device.xp
        headers = self._headers

        new_orientation = tuple(new_orientation)
        if new_orientation == self.orientation:
            return self if inplace else self._partial_clone(volume=self._volume)

        temp_orientation = self.orientation
        temp_affine = np.array(self._affine)

        transpose_inds = stdo.get_transpose_inds(temp_orientation, new_orientation)
        all_transpose_inds = transpose_inds + tuple(range(3, self._volume.ndim))

        volume = xp.transpose(self._volume, all_transpose_inds)
        if headers is not None:
            headers = np.transpose(headers, all_transpose_inds)
        for i in range(len(transpose_inds)):
            temp_affine[..., i] = self._affine[..., transpose_inds[i]]

        temp_orientation = tuple(self.orientation[i] for i in transpose_inds)

        flip_axs_inds = list(stdo.get_flip_inds(temp_orientation, new_orientation))
        if flip_axs_inds:
            volume = xp.flip(volume, axis=tuple(flip_axs_inds))
            if headers is not None:
                headers = np.flip(headers, axis=tuple(flip_axs_inds))

        a_vecs = temp_affine[:3, :3]
        a_origin = temp_affine[:3, 3]

        # phi: +1 keep, -1 flip, per array axis.
        phi = np.ones(3)
        phi[flip_axs_inds] *= -1

        b_vecs = a_vecs * phi[np.newaxis, :]

        # Origin moves by (n-1) voxels along each flipped axis.
        vol_shape_vec = (np.asarray(volume.shape[:3]) - 1) * (phi < 0).astype(np.float64)
        b_origin = np.round(
            a_origin - b_vecs @ vol_shape_vec,
            SCANNER_ORIGIN_DECIMAL_PRECISION,
        )

        new_affine = np.array(self._affine)
        new_affine[:3, :3] = b_vecs
        new_affine[:3, 3] = b_origin
        new_affine[new_affine == 0] = 0  # drop negative zeros

        if inplace:
            self._affine = new_affine
            self._volume = volume
            self._headers = headers
            mv = self
        else:
            mv = self._partial_clone(volume=volume, affine=new_affine, headers=headers)

        assert mv.orientation == new_orientation, (
            f"Orientation mismatch: expected {new_orientation}, got {mv.orientation}"
        )
        return mv

    def reformat_as(self, other, inplace: bool = False) -> "MedicalVolume":
        """Reformat to the orientation of ``other``."""
        return self.reformat(other.orientation, inplace=inplace)

    # ------------------------------------------------------------------
    # Comparisons
    # ------------------------------------------------------------------
    def is_identical(self, mv) -> bool:
        """True if same pixel_spacing, orientation, scanner_origin, and values."""
        if not isinstance(mv, MedicalVolume):
            raise TypeError("`mv` must be a MedicalVolume.")
        if self.device != mv.device:
            raise RuntimeError(f"Expected device {self.device}, got {mv.device}.")
        return self.is_same_dimensions(mv) and bool((mv.volume == self.volume).all())

    def _allclose_spacing(self, mv, precision: int = None, ignore_origin: bool = False) -> bool:
        if precision is not None:
            tol = 10 ** (-precision)
            return np.allclose(mv.affine[:3, :3], self.affine[:3, :3], atol=tol) and (
                ignore_origin or np.allclose(mv.scanner_origin, self.scanner_origin, rtol=tol)
            )
        return bool((mv.affine == self.affine).all()) or (
            ignore_origin and bool((mv.affine[:, :3] == self.affine[:, :3]).all())
        )

    def is_same_dimensions(self, mv, precision: int = None, err: bool = False) -> bool:
        """True if same pixel spacing, orientation, scanner origin, and shape."""
        if not isinstance(mv, MedicalVolume):
            raise TypeError("`mv` must be a MedicalVolume.")

        is_close_spacing = self._allclose_spacing(mv, precision)
        is_same_orientation = mv.orientation == self.orientation
        is_same_shape = tuple(mv.volume.shape) == tuple(self.volume.shape)
        out = is_close_spacing and is_same_orientation and is_same_shape

        if err and not out:
            tol_str = f" (tol: 1e-{precision})" if precision else ""
            if not is_close_spacing:
                raise ValueError(
                    f"Affine matrices not equal{tol_str}:\n{self._affine}\n{mv._affine}"
                )
            if not is_same_orientation:
                raise ValueError(f"Orientations not equal: {self.orientation}, {mv.orientation}")
            raise ValueError(f"Shapes not equal: {self._volume.shape}, {mv._volume.shape}")
        return out

    # ------------------------------------------------------------------
    # Cloning & dtype/device movement
    # ------------------------------------------------------------------
    def clone(self, headers: bool = True) -> "MedicalVolume":
        """Deep copy. ``headers=False`` shares the header array (ref ``:417-431``)."""
        return self.__class__(
            self._volume.copy() if not _is_jax(self._volume) else self._volume,
            self._affine.copy(),
            headers=deepcopy(self._headers) if headers else self._headers,
        )

    def _partial_clone(self, **kwargs) -> "MedicalVolume":
        """Copy constructor args from ``self`` unless overridden in ``kwargs``."""
        if kwargs.get("volume", None) is False:
            kwargs["volume"] = self._volume
        for k in ("volume", "affine"):
            if k not in kwargs or kwargs[k] is True:
                val = getattr(self, f"_{k}")
                kwargs[k] = val if (k == "volume" and _is_jax(val)) else val.copy()
        if "headers" not in kwargs:
            kwargs["headers"] = self._headers
        elif isinstance(kwargs["headers"], bool) and kwargs["headers"]:
            kwargs["headers"] = deepcopy(self._headers)
        return self.__class__(**kwargs)

    def astype(self, dtype, **kwargs) -> "MedicalVolume":
        """Cast volume dtype in place and return self (ref ``:454-474``)."""
        self._volume = self._volume.astype(dtype, **kwargs)
        return self

    def to(self, device) -> "MedicalVolume":
        """Move to ``device``. No-op (returns self) if already there."""
        import jax

        device = Device(device)
        if device == self.device:
            return self
        if device == cpu_device:
            volume = np.asarray(self._volume)
        else:
            volume = jax.device_put(self._volume, device.jax_device)
        return self._partial_clone(volume=volume)

    def cpu(self) -> "MedicalVolume":
        return self.to(cpu_device)

    def device_put(self, device=None, sharding=None) -> "MedicalVolume":
        """TPU-native extension: place volume with an explicit jax sharding."""
        import jax

        target = sharding if sharding is not None else Device(device).jax_device
        return self._partial_clone(volume=jax.device_put(self._volume, target))

    def materialize(self) -> "MedicalVolume":
        if self.is_mmap:
            self._volume = np.asarray(self._volume)
        return self

    def copy_to_host_async(self) -> "MedicalVolume":
        """TPU-native extension: start an async device->host copy of the pixels.

        No-op for host-backed volumes. The transfer proceeds in the
        background, so a later ``np.asarray(mv.A)`` / ``mv.cpu()`` completes
        against the prefetched copy instead of starting a fresh serialized
        D2H transfer — use it to overlap map readback with host-side work
        (e.g. region splitting before regional analytics). Returns ``self``.
        """
        if _is_jax(self._volume):
            try:
                self._volume.copy_to_host_async()
            except (AttributeError, RuntimeError):  # pragma: no cover
                pass  # backend/array type without async-copy support
        return self

    # ------------------------------------------------------------------
    # Interop
    # ------------------------------------------------------------------
    def to_nib(self):
        """Convert to ``nibabel.Nifti1Image`` (requires nibabel)."""
        if not env.nibabel_available():  # pragma: no cover - nibabel absent in image
            raise ImportError("nibabel is not installed")
        import nibabel as nib

        return nib.Nifti1Image(np.asarray(self.cpu()._volume), self._affine.copy())

    @classmethod
    def from_nib(cls, image, affine_precision=4, origin_precision=4) -> "MedicalVolume":
        if not env.nibabel_available():  # pragma: no cover
            raise ImportError("nibabel is not installed")
        affine = np.array(image.affine)
        if affine_precision is not None:
            affine[:3, :3] = np.round(affine[:3, :3], affine_precision)
        if origin_precision is not None:
            affine[:3, 3] = np.round(affine[:3, 3], origin_precision)
        return cls(np.asarray(image.dataobj), affine)

    def to_sitk(self, vdim: int = None, transpose_inplane: bool = False, headless: bool = None):
        """Convert to a SimpleITK Image (ref ``med_volume.py:497-562``).

        Args:
            vdim: Axis holding vector components (sitk vector pixel types).
            transpose_inplane: Swap the in-plane axes to match SimpleITK's
                DICOM loading convention (equivalent to the reference's
                ``PermuteAxesImageFilter([1, 0, 2])``, applied here as pure
                parameter math).
            headless: If ``True``, return a
                :class:`~dosma_tpu.core.sitk_interop.HeadlessSitkImage`
                stand-in instead of requiring the SimpleITK package. Default
                (``None``) uses SimpleITK when installed and raises
                ``ImportError`` otherwise, matching the reference.
        """
        from dosma_tpu.core.sitk_interop import (
            HeadlessSitkImage,
            medvol_to_sitk_params,
            permute_inplane_params,
        )

        if headless is None:
            headless = False
        if not headless and not env.sitk_available():
            raise ImportError(
                "SimpleITK is not installed. Pass headless=True for a numpy-backed stand-in."
            )
        if self.device != cpu_device:
            raise RuntimeError(f"MedicalVolume must be on cpu, got {self.device}")

        params = medvol_to_sitk_params(
            np.asarray(self._volume), self.affine, self.pixel_spacing, vdim=vdim
        )
        if transpose_inplane:
            params = permute_inplane_params(*params, is_vector=vdim is not None)
        arr, origin, spacing, direction = params

        if headless:
            return HeadlessSitkImage(arr, origin, spacing, direction, is_vector=vdim is not None)

        import SimpleITK as sitk  # pragma: no cover - sitk absent in this env

        img = sitk.GetImageFromArray(arr, isVector=vdim is not None)
        img.SetOrigin(origin)
        img.SetSpacing(spacing)
        img.SetDirection(direction)
        return img

    @classmethod
    def from_sitk(cls, image, copy: bool = False, transpose_inplane: bool = False) -> "MedicalVolume":
        """Construct from a SimpleITK image (ref ``med_volume.py:945-1003``).

        Accepts a real ``SimpleITK.Image`` or the
        :class:`~dosma_tpu.core.sitk_interop.HeadlessSitkImage` stand-in.
        Headers are not copied (reference parity).
        """
        from dosma_tpu.core.sitk_interop import (
            HeadlessSitkImage,
            permute_inplane_params,
            sitk_params_to_medvol,
        )

        if len(image.GetSize()) < 3:
            raise ValueError("`image` must be 3D.")
        is_vector = image.GetNumberOfComponentsPerPixel() > 1

        if isinstance(image, HeadlessSitkImage):
            arr = image.array_from_image(copy=copy)
        else:  # pragma: no cover - sitk absent in this env
            import SimpleITK as sitk

            arr = sitk.GetArrayFromImage(image) if copy else sitk.GetArrayViewFromImage(image)

        params = (arr, image.GetOrigin(), image.GetSpacing(), image.GetDirection())
        if transpose_inplane:
            params = permute_inplane_params(*params, is_vector=is_vector)
        volume, affine = sitk_params_to_medvol(*params, is_vector=is_vector)
        return cls(volume, affine)

    def to_torch(
        self, requires_grad: bool = False, contiguous: bool = False,
        view_as_real: bool = False,
    ):
        """Conversion to ``torch.Tensor`` (ref ``:564-638``).

        Zero-copy where the memory spaces allow it: host numpy arrays via
        ``torch.from_numpy``, CPU-backend jax arrays via DLPack. TPU-backed
        arrays transfer to host first (torch has no TPU DLPack consumer).
        Complex volumes become complex tensors; ``view_as_real=True``
        returns the real view with a trailing (real, imag) channel pair.
        """
        import torch

        arr = self._volume
        if _is_jax(arr):
            try:
                # CPU jax arrays exchange zero-copy through DLPack.
                tensor = torch.utils.dlpack.from_dlpack(arr)
            except Exception:
                tensor = torch.from_numpy(np.asarray(arr))
        else:
            tensor = torch.from_numpy(arr)

        if view_as_real and tensor.is_complex():
            tensor = torch.view_as_real(tensor)
        if contiguous:
            tensor = tensor.contiguous()
        if requires_grad:
            tensor = tensor.detach().requires_grad_(True)
        return tensor

    @classmethod
    def from_torch(cls, tensor, affine, headers=None, to_complex: bool = None) -> "MedicalVolume":
        """Construction from a PyTorch tensor (ref ``:1005-1116``).

        ``to_complex=True`` interprets a real ``(..., 2)`` tensor as the
        real view of a complex array and restructures it (no copy).
        """
        import torch

        if isinstance(affine, torch.Tensor):
            if affine.device.type != "cpu":
                raise RuntimeError("Affine matrix must be on the cpu")
            affine = affine.numpy()

        # Already-complex tensors convert directly; the view logic is only
        # for real tensors holding interleaved (real, imag) channels.
        to_complex = bool(to_complex) and tensor.dtype not in (
            torch.complex64, torch.complex128
        )

        if (not to_complex and tensor.ndim < 3) or (to_complex and tensor.ndim < 4):
            raise ValueError(
                f"Tensor must have three spatial dimensions. Got shape {tuple(tensor.shape)}."
            )
        if to_complex and tensor.shape[-1] != 2:
            raise ValueError(
                f"tensor.shape[-1] must have shape 2 when to_complex is specified. "
                f"Got shape {tuple(tensor.shape)}."
            )

        array = tensor.detach().cpu().numpy()

        if to_complex:
            if array.dtype == np.float32:
                array = np.ascontiguousarray(array).view(np.complex64)
            elif array.dtype == np.float64:
                array = np.ascontiguousarray(array).view(np.complex128)
            else:
                raise ValueError(
                    f"to_complex requires float32/float64 data, got {array.dtype}"
                )
            array = array.reshape(array.shape[:-1])

        return cls(array, affine, headers=headers)

    def to_jax(self):
        """The underlying array as a ``jax.Array`` (device transfer if on host)."""
        import jax.numpy as jnp

        return jnp.asarray(self._volume)

    # ------------------------------------------------------------------
    # Headers & metadata
    # ------------------------------------------------------------------
    def headers(self, flatten: bool = False):
        if flatten and self._headers is not None:
            return self._headers.flatten()
        return self._headers

    def get_metadata(self, key, dtype=None, default=_NoValue):
        """Get metadata value from the first header (ref ``:657-700``)."""
        if self._headers is None:
            raise RuntimeError("No headers found. MedicalVolume must be initialized with `headers`")
        headers = self.headers(flatten=True)
        if key not in headers[0]:
            if default is not _NoValue:
                return default
            raise KeyError(f"{key} not found in header")
        val = headers[0][key].value
        if dtype is not None:
            val = dtype(val)
        return val

    def set_metadata(self, key, value, force: bool = False):
        """Set metadata on all headers (ref ``:702-732``)."""
        from dosma_tpu.core.io.dicom import Dataset

        if self._headers is None:
            if not force:
                raise ValueError(
                    "No headers found. To generate headers and write keys, `force` must be True."
                )
            self._headers = self._validate_and_format_headers([Dataset()])
            warnings.warn(
                "Headers were generated and may not contain all attributes "
                "required to save the volume in DICOM format."
            )
        for h in self.headers(flatten=True):
            # Reference contract: a missing key is only CREATED under
            # force=True; otherwise it raises (ref ``med_volume.py:724-732``).
            h.set_value(key, value, create=force)

    # ------------------------------------------------------------------
    # Reductions & elementwise conveniences
    # ------------------------------------------------------------------
    def round(self, decimals=0, affine=False) -> "MedicalVolume":
        from dosma_tpu.core.numpy_routines import around

        return around(self, decimals, affine)

    def sum(self, axis=None, dtype=None, out=None, keepdims=False, initial=_NoValue, where=_NoValue):
        from dosma_tpu.core.numpy_routines import sum_np

        if out is not None:
            raise ValueError("`out` must be None")
        return sum_np(self, axis=axis, dtype=dtype, keepdims=keepdims)

    def mean(self, axis=None, dtype=None, out=None, keepdims=False, where=_NoValue):
        from dosma_tpu.core.numpy_routines import mean_np

        if out is not None:
            raise ValueError("`out` must be None")
        return mean_np(self, axis=axis, dtype=dtype, keepdims=keepdims)

    def std(self, axis=None, dtype=None, out=None, ddof=0, keepdims=False):
        from dosma_tpu.core.numpy_routines import std

        if out is not None:
            raise ValueError("`out` must be None")
        return std(self, axis=axis, dtype=dtype, ddof=ddof, keepdims=keepdims)

    def min(self, axis=None, keepdims=False):
        from dosma_tpu.core.numpy_routines import amin

        return amin(self, axis=axis, keepdims=keepdims)

    def max(self, axis=None, keepdims=False):
        from dosma_tpu.core.numpy_routines import amax

        return amax(self, axis=axis, keepdims=keepdims)

    # ------------------------------------------------------------------
    # Properties
    # ------------------------------------------------------------------
    @property
    def A(self):
        """The pixel array (alias of :attr:`volume`)."""
        return self._volume

    @property
    def volume(self):
        return self._volume

    @volume.setter
    def volume(self, value):
        if value.ndim != self._volume.ndim:
            raise ValueError("New volume must have same number of dimensions as current volume")
        if tuple(self._volume.shape) != tuple(value.shape):
            self._headers = None
        if not _is_jax(value):
            value = np.asarray(value)
        self._volume = value

    @property
    def pixel_spacing(self) -> Tuple[float, ...]:
        vecs = self._affine[:3, :3]
        return tuple(np.sqrt(np.sum(vecs**2, axis=0)))

    @property
    def orientation(self) -> Tuple[str, ...]:
        return stdo.orientation_from_affine(self._affine)

    @property
    def scanner_origin(self) -> Tuple[float, ...]:
        return tuple(self._affine[:3, 3])

    @property
    def affine(self) -> np.ndarray:
        return self._affine

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._volume.shape)

    @property
    def ndim(self) -> int:
        return self._volume.ndim

    @property
    def dtype(self):
        return self._volume.dtype

    @property
    def device(self) -> Device:
        return get_device(self._volume)

    @property
    def is_mmap(self) -> bool:
        return isinstance(self._volume, np.memmap)

    # ------------------------------------------------------------------
    # Internal helpers
    # ------------------------------------------------------------------
    def _validate_and_format_headers(self, headers):
        """Broadcast-shape the header array against the volume (ref ``:1132-1156``)."""
        headers = _to_object_array(headers)
        if headers.ndim > self._volume.ndim:
            raise ValueError(
                f"`headers` has too many dimensions. "
                f"Got headers.ndim={headers.ndim}, but volume.ndim={self._volume.ndim}"
            )
        for dim in range(-headers.ndim, 0)[::-1]:
            if headers.shape[dim] not in (1, self._volume.shape[dim]):
                raise ValueError(
                    f"`headers` must follow standard broadcasting shape. "
                    f"Got headers.shape={headers.shape}, but volume.shape={self._volume.shape}"
                )
        ndim = self._volume.ndim
        shape = (1,) * (ndim - headers.ndim) + headers.shape
        return np.reshape(headers, shape)

    def _extract_input_array_ufunc(self, input, device=None):
        if device is None:
            device = self.device
        if isinstance(input, Number):
            return input
        if isinstance(input, np.ndarray):
            if device != cpu_device:
                raise RuntimeError(f"Expected device {device} but got device {cpu_device}")
            return input
        if _is_jax(input):
            return input
        if isinstance(input, MedicalVolume):
            if device != input.device:
                raise RuntimeError(f"Expected device {device} but got device {input.device}")
            assert self.is_same_dimensions(input, err=True)
            return input._volume
        return NotImplemented

    def _check_reduce_axis(self, axis) -> Optional[Union[int, Tuple[int, ...]]]:
        if axis is None:
            return None
        is_sequence = isinstance(axis, Sequence)
        if not is_sequence:
            axis = (axis,)
        axis = tuple(x if x >= 0 else self._volume.ndim + x for x in axis)
        assert all(x >= 0 for x in axis)
        if any(x < 3 for x in axis):
            raise ValueError("Cannot reduce MedicalVolume along spatial dimensions")
        return axis if is_sequence else axis[0]

    def _reduce_array(self, func, *inputs, **kwargs):
        reduce_axis = self._check_reduce_axis(kwargs.get("axis"))
        kwargs["axis"] = reduce_axis
        if not isinstance(reduce_axis, tuple):
            reduce_axis = (reduce_axis,)
        kwargs = {k: v for k, v in kwargs.items() if v is not _NoValue}
        volume = func(*inputs, **kwargs)

        if np.isscalar(volume) or getattr(volume, "ndim", 0) == 0:
            return volume

        keepdims = kwargs.get("keepdims", False)
        if self._headers is not None:
            headers_slices = tuple(
                slice(None) if x not in reduce_axis else (slice(0, 1) if keepdims else 0)
                for x in range(self._headers.ndim)
            )
            headers = self._headers[headers_slices]
        else:
            headers = None
        return self._partial_clone(volume=volume, headers=headers)

    # ------------------------------------------------------------------
    # Indexing
    # ------------------------------------------------------------------
    def __getitem__(self, _slice):
        if isinstance(_slice, MedicalVolume):
            _slice = np.asarray(_slice.reformat_as(self).A)

        _slice = _canonical_slicers(_slice, self.shape)

        volume = self._volume[_slice]
        if any(dim == 0 for dim in volume.shape):
            raise IndexError("Empty slice requested")

        headers = self._headers
        if headers is not None:
            _slice_headers = []
            for idx, x in enumerate(_slice):
                if headers.shape[idx] == 1 and not isinstance(x, int):
                    _slice_headers.append(slice(None))
                elif headers.shape[idx] == 1 and isinstance(x, int):
                    _slice_headers.append(0)
                else:
                    _slice_headers.append(x)
            headers = headers[tuple(_slice_headers)]

        affine = _slice_affine(self._affine, _slice, self.shape)
        return self._partial_clone(volume=volume, affine=affine, headers=headers)

    def __setitem__(self, _slice, value):
        if isinstance(value, MedicalVolume):
            image = self[_slice]
            assert value.is_same_dimensions(image, err=True)
            value = value._volume
        if _is_jax(self._volume):
            self._volume = self._volume.at[_slice].set(value)
        else:
            self._volume[_slice] = value
            if self.is_mmap and getattr(self._volume, "mode", None) == "c":
                self._volume = np.asarray(self._volume)

    def __repr__(self) -> str:
        nltb = "\n  "
        return (
            f"{self.__class__.__name__}({nltb}shape={self.shape},{nltb}"
            f"ornt={self.orientation}),{nltb}spacing={self.pixel_spacing},{nltb}"
            f"origin={self.scanner_origin},{nltb}device={self.device}\n)"
        )

    # ------------------------------------------------------------------
    # In-place arithmetic
    # ------------------------------------------------------------------
    def _iops(self, other, opname: str):
        if isinstance(other, MedicalVolume):
            assert self.is_same_dimensions(other, err=True)
            other = other.volume
        if _is_jax(self._volume):
            binop = {
                "__iadd__": "add", "__isub__": "subtract", "__imul__": "multiply",
                "__itruediv__": "true_divide", "__ifloordiv__": "floor_divide",
                "__ipow__": "power",
            }[opname]
            import jax.numpy as jnp

            self._volume = getattr(jnp, binop)(self._volume, other)
        else:
            getattr(self._volume, opname)(other)
            if self.is_mmap and getattr(self._volume, "mode", None) == "c":
                self._volume = np.asarray(self._volume)
        return self

    def __iadd__(self, other):
        return self._iops(other, "__iadd__")

    def __ifloordiv__(self, other):
        return self._iops(other, "__ifloordiv__")

    def __imul__(self, other):
        return self._iops(other, "__imul__")

    def __ipow__(self, other):
        return self._iops(other, "__ipow__")

    def __isub__(self, other):
        return self._iops(other, "__isub__")

    def __itruediv__(self, other):
        return self._iops(other, "__itruediv__")

    # ------------------------------------------------------------------
    # NumPy protocols
    # ------------------------------------------------------------------
    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(self._volume)
        if dtype is not None:
            arr = arr.astype(dtype)
        return arr

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method not in ("__call__", "reduce"):
            return NotImplemented

        device = self.device
        _inputs = []
        for inp in inputs:
            inp = self._extract_input_array_ufunc(inp, device)
            if inp is NotImplemented:
                return NotImplemented
            _inputs.append(inp)

        if device != cpu_device:
            # Route through jax.numpy so the op compiles/executes on-device.
            import jax.numpy as jnp

            fn = getattr(jnp, ufunc.__name__, None)
            if fn is None:
                return NotImplemented
        else:
            fn = ufunc

        if method == "__call__":
            kwargs = {k: v for k, v in kwargs.items() if v is not _NoValue}
            volume = fn(*_inputs, **kwargs)
            if tuple(volume.shape) != tuple(self._volume.shape):
                raise ValueError(
                    f"{self.__class__.__name__} does not support operations that change shape. "
                    f"Use operations on `self.volume` to modify array objects."
                )
            return self._partial_clone(volume=volume)
        else:  # reduce
            if device != cpu_device:
                reduce_fn = {
                    "add": device.xp.sum, "multiply": device.xp.prod,
                    "minimum": device.xp.min, "maximum": device.xp.max,
                }.get(ufunc.__name__)
                if reduce_fn is None:
                    return NotImplemented
            else:
                reduce_fn = ufunc.reduce
            return self._reduce_array(reduce_fn, *_inputs, **kwargs)

    def __array_function__(self, func, types, args, kwargs):
        from dosma_tpu.core.numpy_routines import _HANDLED_NUMPY_FUNCTIONS

        if func not in _HANDLED_NUMPY_FUNCTIONS:
            return NotImplemented
        if not all(issubclass(t, (MedicalVolume, self.__class__)) for t in types):
            return NotImplemented
        return _HANDLED_NUMPY_FUNCTIONS[func](*args, **kwargs)


def _to_object_array(headers) -> np.ndarray:
    """Build an object ndarray of header datasets WITHOUT letting numpy
    iterate into the datasets themselves (Dataset is itself iterable)."""
    if isinstance(headers, np.ndarray) and headers.dtype == object:
        return headers
    if not isinstance(headers, (list, tuple)):
        headers = [headers]
    arr = np.empty(len(headers), dtype=object)
    for i, h in enumerate(headers):
        arr[i] = h
    return arr


def _canonical_slicers(slicer, shape) -> tuple:
    """Canonicalize a slicer: expand Ellipsis, pad to ndim, enforce
    slice-only indexing on the first three (spatial) axes.

    Mirrors nibabel's ``SpatialFirstSlicer.check_slicing`` semantics used by
    the reference (``med_volume.py:1222-1230``).
    """
    if not isinstance(slicer, tuple):
        slicer = (slicer,)
    # Expand Ellipsis.
    if any(s is Ellipsis for s in slicer):
        if sum(s is Ellipsis for s in slicer) > 1:
            raise IndexError("Only one Ellipsis allowed")
        idx = slicer.index(Ellipsis)
        n_explicit = len([s for s in slicer if s is not None]) - 1
        fill = (slice(None),) * (len(shape) - n_explicit)
        slicer = slicer[:idx] + fill + slicer[idx + 1 :]
    n_explicit = len([s for s in slicer if s is not None])
    if n_explicit > len(shape):
        raise IndexError("Too many indices for volume")
    slicer = slicer + (slice(None),) * (len(shape) - n_explicit)

    out = []
    dim = 0
    for s in slicer:
        if s is None:
            raise IndexError("New axis not permitted in MedicalVolume slicing")
        if isinstance(s, (int, np.integer)):
            if dim < 3:
                raise IndexError(
                    "Scalar indices disallowed in spatial dimensions; use `x:x+1` instead."
                )
            s = int(s)
            if s < 0:
                s += shape[dim]
            if not (0 <= s < shape[dim]):
                raise IndexError(f"Index {s} out of bounds for axis {dim} (size {shape[dim]})")
        elif isinstance(s, slice):
            pass
        elif isinstance(s, (np.ndarray, list)):
            if dim < 3:
                raise IndexError("Fancy indexing disallowed in spatial dimensions")
        else:
            raise IndexError(f"Unsupported index: {s!r}")
        out.append(s)
        dim += 1
    return tuple(out)


def _slice_affine(affine: np.ndarray, slicer: tuple, shape) -> np.ndarray:
    """Update affine for a canonical slicer on the first three axes.

    ``A' = A @ T`` where T scales column i by the step and offsets the origin
    by the start index (nibabel ``SpatialFirstSlicer.slice_affine``).
    """
    transform = np.eye(4, dtype=np.float64)
    for i, s in enumerate(slicer[:3]):
        if isinstance(s, slice):
            start, _, step = s.indices(shape[i])
        else:  # pragma: no cover - spatial ints are rejected earlier
            start, step = int(s), 1
        transform[i, i] = step
        transform[i, 3] = start
    return affine @ transform


# ----------------------------------------------------------------------
# JAX pytree registration: array is the leaf; affine/headers are static.
# ----------------------------------------------------------------------
class _StaticMeta:
    """Hashable wrapper for static MedicalVolume metadata in pytree aux data."""

    __slots__ = ("affine_bytes", "shape", "headers")

    def __init__(self, affine: np.ndarray, headers):
        self.affine_bytes = affine.tobytes()
        self.shape = affine.shape
        self.headers = headers

    def affine(self) -> np.ndarray:
        return np.frombuffer(self.affine_bytes, dtype=np.float64).reshape(self.shape).copy()

    def __hash__(self):
        return hash((self.affine_bytes, id(self.headers)))

    def __eq__(self, other):
        return (
            isinstance(other, _StaticMeta)
            and self.affine_bytes == other.affine_bytes
            and self.headers is other.headers
        )


def _mv_flatten(mv: MedicalVolume):
    return (mv._volume,), _StaticMeta(mv._affine, mv._headers)


def _mv_unflatten(meta: _StaticMeta, leaves):
    obj = MedicalVolume.__new__(MedicalVolume)
    obj._volume = leaves[0]
    obj._affine = meta.affine()
    obj._headers = meta.headers
    return obj


def _register_pytree():
    import jax

    jax.tree_util.register_pytree_node(MedicalVolume, _mv_flatten, _mv_unflatten)


_register_pytree()
