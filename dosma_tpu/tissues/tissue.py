"""Anatomical-tissue base class.

Parity target: ``/root/reference/dosma/tissues/tissue.py`` (mask bookkeeping
in the SAGITTAL frame, weights lookup, quantitative-value registry, per-tissue
save/load layout, connected-component filtering). The implementation here is
organized around a ``mask`` property and a small save/load layout helper
instead of the reference's get/set + inline-path style.
"""

from __future__ import annotations

import glob
import os
from abc import ABC, abstractmethod
from typing import List, Optional, Union

import numpy as np
import pandas as pd

from dosma_tpu.core.io import format_io_utils as fio_utils
from dosma_tpu.core.io.format_io import ImageDataFormat
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL
from dosma_tpu.core.quant_vals import QuantitativeValue, QuantitativeValueType
from dosma_tpu.defaults import preferences
from dosma_tpu.utils import io_utils

WEIGHTS_FILE_EXT = "h5"

__all__ = ["Tissue", "largest_cc"]


class Tissue(ABC):
    """Base class for anatomical structures (cartilage, meniscus, bone, ...).

    Subclasses declare class-level identity constants and implement the
    region-splitting / quantitation hooks:

    - ``ID`` / ``STR_ID`` / ``FULL_NAME``: integer id, short slug (e.g.
      ``"fc"``), and display name.
    - ``T1_EXPECTED``: nominal T1 (ms) used to pick spin-lock/echo defaults.
    - :meth:`split_regions` and ``__calc_quant_vals__`` /
      ``__save_quant_data__``: per-tissue anatomy + analytics.

    The segmentation mask is always stored in the SAGITTAL frame; setting a
    mask in any other orientation reformats it on assignment.
    """

    ID: int = -1
    STR_ID: str = ""
    FULL_NAME: str = ""
    T1_EXPECTED: Optional[float] = None
    #: Whether this tissue's analytics read the FULL quant map on the host.
    #: Tissues with compressed (masked-gather) analytics set this False so
    #: device-resident maps never pay a full-volume D2H.
    _PREFETCH_FULL_MAP: bool = True

    def __init__(self, weights_dir: str = None, medial_to_lateral: bool = None):
        self.pid: Optional[str] = None
        self.medial_to_lateral = medial_to_lateral
        self.quantitative_values: List[QuantitativeValue] = []
        #: name -> (unrolled map(s), DataFrame of per-region metrics)
        self.quant_vals = {}
        self.__mask__: Optional[MedicalVolume] = None
        self.weights_file_path = self.find_weights(weights_dir) if weights_dir else None

    # ------------------------------------------------------------------ mask

    @property
    def mask(self) -> Optional[MedicalVolume]:
        """Binary segmentation mask (SAGITTAL frame), or ``None`` if unset."""
        return self.__mask__

    @mask.setter
    def mask(self, value: MedicalVolume):
        if type(value) is not MedicalVolume:
            raise AssertionError("mask for tissue must be of type MedicalVolume")
        self.__mask__ = value.reformat(SAGITTAL)

    def set_mask(self, mask: MedicalVolume):
        """Compat alias for ``self.mask = mask`` (reference ``tissue.py:251``)."""
        assert type(mask) is MedicalVolume, "mask for tissue must be of type MedicalVolume"
        self.mask = mask

    def get_mask(self) -> Optional[MedicalVolume]:
        """Compat alias for :attr:`mask` (reference ``tissue.py:261``)."""
        return self.mask

    # -------------------------------------------------------- quantitation

    @abstractmethod
    def split_regions(self, base_map: Union[np.ndarray, MedicalVolume]):
        """Partition ``base_map`` into this tissue's anatomical regions."""
        raise NotImplementedError  # pragma: no cover

    def calc_quant_vals(self):
        """Run per-region analytics for every registered quantitative value."""
        for qv in self.quantitative_values:
            self.__calc_quant_vals__(qv.volumetric_map, qv.qv_type)

    @abstractmethod
    def __calc_quant_vals__(self, quant_map: MedicalVolume, map_type: QuantitativeValueType):
        """Validate inputs and align ``quant_map`` with the stored mask.

        Subclasses call ``super().__calc_quant_vals__(...)`` first, then do
        the tissue-specific region analysis.
        """
        if not isinstance(quant_map, MedicalVolume):
            raise TypeError("quant_map must be a MedicalVolume")
        if not isinstance(map_type, QuantitativeValueType):
            raise TypeError("map_type must be a QuantitativeValueType")
        if self.__mask__ is None:
            raise ValueError(f"Please initialize mask for {self.FULL_NAME}")
        quant_map.reformat(self.__mask__.orientation, inplace=True)
        # The compressed analytics gather the map at the mask's nonzero
        # indices — on a mismatched map that would silently produce wrong
        # region statistics instead of an indexing error, so shapes are
        # validated here (the dense reference path failed on broadcast:
        # ref ``tissues/femoral_cartilage.py:86-135``).
        if tuple(quant_map.shape[:3]) != tuple(self.__mask__.shape[:3]):
            raise ValueError(
                f"quant_map shape {tuple(quant_map.shape[:3])} does not match "
                f"mask shape {tuple(self.__mask__.shape[:3])} for {self.FULL_NAME}"
            )

    def __store_quant_vals__(self, quant_map, quant_df: pd.DataFrame, map_type):
        self.quant_vals[map_type.name] = (quant_map, quant_df)

    def add_quantitative_value(self, qv_new: QuantitativeValue):
        """Register a fitted quantitative value (T2, T1ρ, ...) with the tissue.

        For tissues whose analytics read the full map on the host, a
        device-resident map starts its D2H copy now — the transfer overlaps
        the host-side mask/region work that runs first. Tissues with
        compressed analytics (``_PREFETCH_FULL_MAP = False``) gather the
        masked voxels on device instead, so no full-volume transfer is
        started.
        """
        vm = qv_new.volumetric_map
        if self._PREFETCH_FULL_MAP and isinstance(vm, MedicalVolume):
            vm.copy_to_host_async()
        self.quantitative_values.append(qv_new)

    # ---------------------------------------------------------------- weights

    def find_weights(self, weights_dir: str) -> str:
        """Resolve the ``.h5`` segmentation-weights file for this tissue.

        The match rule (reference ``tissue.py:128-161``): a regular file in
        ``weights_dir`` whose basename contains :attr:`STR_ID` and has the
        ``h5`` extension. Exactly one file may match.
        """
        # endswith (not glob) so ".hdf5" matches the "h5" extension exactly
        # as in the reference.
        candidates = [
            p
            for p in glob.glob(os.path.join(weights_dir, "*"))
            if os.path.isfile(p)
            and self.STR_ID in os.path.basename(p)
            and p.endswith(WEIGHTS_FILE_EXT)
        ]
        if not candidates:
            raise ValueError(
                f"No file found that contains '{self.STR_ID}' and ends in '{WEIGHTS_FILE_EXT}'"
            )
        if len(candidates) > 1:
            raise ValueError("There are multiple weights files, please remove duplicates")
        self.weights_file_path = candidates[0]
        return self.weights_file_path

    # ---------------------------------------------------------------- disk IO

    def __save_dirpath__(self, dirpath: str) -> str:
        """``dirpath/STR_ID``, created on demand — this tissue's data root."""
        return io_utils.mkdirs(os.path.join(dirpath, self.STR_ID))

    def _mask_filepath(self, root: str) -> str:
        return os.path.join(root, f"{self.STR_ID}.nii.gz")

    def save_data(self, save_dirpath: str, data_format: ImageDataFormat = None):
        """Persist mask, quantitative values, and analytics to disk.

        Layout: ``save_dirpath/STR_ID/{STR_ID}.nii.gz`` for the mask, one
        subdirectory per quantitative value, plus whatever
        ``__save_quant_data__`` emits. Subclasses extending this should call
        ``super().save_data(...)`` first.
        """
        if data_format is None:
            data_format = preferences.image_data_format
        root = self.__save_dirpath__(save_dirpath)

        if self.__mask__ is not None:
            path = fio_utils.convert_image_data_format(self._mask_filepath(root), data_format)
            self.__mask__.save_volume(path, data_format=data_format)

        for qv in self.quantitative_values:
            qv.save_data(root, data_format)

        self.__save_quant_data__(root)

    @abstractmethod
    def __save_quant_data__(self, dirpath: str):
        """Write tissue-specific analytics (figures, spreadsheets) to ``dirpath``."""
        raise NotImplementedError  # pragma: no cover

    def save_quant_data(self, dirpath: str):
        """Public wrapper over ``__save_quant_data__`` (no mask/map output)."""
        return self.__save_quant_data__(dirpath)

    def load_data(self, load_dir_path: str):
        """Restore mask + quantitative values previously written by :meth:`save_data`.

        A missing mask file is not an error — a tissue with no saved mask
        simply has nothing to restore.
        """
        root = self.__save_dirpath__(load_dir_path)
        try:
            msk = fio_utils.generic_load(self._mask_filepath(root), expected_num_volumes=1)
        except FileNotFoundError:
            msk = None
        if msk is not None:
            # Dispatch through set_mask so subclass overrides run their
            # region splitting — calc_quant_vals on a loaded mask needs
            # regions_mask populated (ref ``tissue.py:214-218``).
            self.set_mask(msk)
        self.quantitative_values = QuantitativeValue.load_qvs(root)

    # ---------------------------------------------------------------- plotting

    def __get_axis_bounds__(self, im: np.ndarray, ignore_nan=True, leave_buffer=False):
        """Per-axis (min, max) index bounds of the nonzero support of ``im``.

        Used to clamp plotting windows to the tissue extent so colormaps keep
        a useful dynamic range. ``leave_buffer`` widens each bound by 5 px.
        """
        arr = np.nan_to_num(im) if ignore_nan else im
        pad = 5 if leave_buffer else 0
        return [(idx.min() - pad, idx.max() + pad) for idx in np.nonzero(arr)]


def largest_cc(mask: np.ndarray, num: int = 1) -> np.ndarray:
    """Keep only the ``num`` largest connected component(s) of a mask.

    Parity: reference ``tissue.py:318-350`` (itself adapted from nipy).

    Args:
        mask: Boolean/integer nD mask.
        num: Number of components to retain, by descending voxel count.

    Returns:
        Boolean mask covering the retained components.

    Raises:
        ValueError: If the mask has no nonzero voxels.
    """
    import scipy.ndimage as sni

    labels, n_components = sni.label(np.asarray(mask))
    if n_components == 0:
        raise ValueError("No non-zero values: no connected components")
    if n_components == 1:
        return labels.astype(bool)
    # Voxel count per label; label 0 (background) never competes.
    counts = np.bincount(labels.ravel())
    counts[0] = 0
    if num == 1:
        return labels == counts.argmax()
    keep = np.argsort(counts)[::-1][:num]
    return np.isin(labels, keep[counts[keep] > 0])
