"""Tissue base class (re-design of ``/root/reference/dosma/tissues/tissue.py``).

Mask get/set with SAGITTAL reformat (ref ``:251-266``), per-tissue constants
ID/STR_ID/FULL_NAME/T1_EXPECTED, weights lookup by STR_ID substring (ref
``:128-161``), quantitative-value bookkeeping + calc loop (ref ``:79-85``),
save/load of mask + qvs + analytics (ref ``:163-233``), and the
``largest_cc`` connected-component filter (ref ``:318-350``).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Union

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
    """Abstract base for anatomical tissues (bones, cartilage, meniscus...)."""

    ID = -1
    STR_ID = ""
    FULL_NAME = ""
    T1_EXPECTED = None

    def __init__(self, weights_dir: str = None, medial_to_lateral: bool = None):
        self.pid = None
        self.__mask__ = None
        self.quant_vals = {}
        self.weights_file_path = None
        if weights_dir is not None:
            self.weights_file_path = self.find_weights(weights_dir)
        self.medial_to_lateral = medial_to_lateral
        self.quantitative_values = []

    @abstractmethod
    def split_regions(self, base_map: Union[np.ndarray, MedicalVolume]):
        """Split mask into anatomical regions (per-tissue)."""
        pass  # pragma: no cover

    def calc_quant_vals(self):
        """Compute per-region quantitative metrics for every stored qv."""
        for qv in self.quantitative_values:
            self.__calc_quant_vals__(qv.volumetric_map, qv.qv_type)

    @abstractmethod
    def __calc_quant_vals__(self, quant_map: MedicalVolume, map_type: QuantitativeValueType):
        if not isinstance(quant_map, MedicalVolume):
            raise TypeError("`Expected type 'MedicalVolume' for `quant_map`")
        if not isinstance(map_type, QuantitativeValueType):
            raise TypeError("`Expected type 'QuantitativeValueType' for `map_type`")
        if self.__mask__ is None:
            raise ValueError(f"Please initialize mask for {self.FULL_NAME}")
        quant_map.reformat(self.__mask__.orientation, inplace=True)

    def __store_quant_vals__(self, quant_map, quant_df: pd.DataFrame, map_type):
        self.quant_vals[map_type.name] = (quant_map, quant_df)

    def find_weights(self, weights_dir: str) -> str:
        """Locate the ``.h5`` weights file whose name contains ``STR_ID``."""
        files = os.listdir(weights_dir)
        weights_file = None
        for f in files:
            file = os.path.join(weights_dir, f)
            if os.path.isfile(file) and f.endswith(WEIGHTS_FILE_EXT) and self.STR_ID in f:
                if weights_file is not None:
                    raise ValueError("There are multiple weights files, please remove duplicates")
                weights_file = file
        if weights_file is None:
            raise ValueError(
                f"No file found that contains '{self.STR_ID}' and ends in '{WEIGHTS_FILE_EXT}'"
            )
        self.weights_file_path = weights_file
        return weights_file

    def save_data(self, save_dirpath: str, data_format: ImageDataFormat = None):
        """Save mask + quantitative values + analytics under ``dirpath/STR_ID``."""
        if data_format is None:
            data_format = preferences.image_data_format
        save_dirpath = self.__save_dirpath__(save_dirpath)

        if self.__mask__ is not None:
            mask_file_path = os.path.join(save_dirpath, f"{self.STR_ID}.nii.gz")
            mask_file_path = fio_utils.convert_image_data_format(mask_file_path, data_format)
            self.__mask__.save_volume(mask_file_path, data_format=data_format)

        for qv in self.quantitative_values:
            qv.save_data(save_dirpath, data_format)

        self.__save_quant_data__(save_dirpath)

    @abstractmethod
    def __save_quant_data__(self, dirpath: str):
        pass  # pragma: no cover

    def save_quant_data(self, dirpath: str):
        return self.__save_quant_data__(dirpath)

    def load_data(self, load_dir_path: str):
        load_dir_path = self.__save_dirpath__(load_dir_path)
        mask_file_path = os.path.join(load_dir_path, f"{self.STR_ID}.nii.gz")
        try:
            msk = fio_utils.generic_load(mask_file_path, expected_num_volumes=1)
            self.set_mask(msk)
        except FileNotFoundError:
            pass
        self.quantitative_values = QuantitativeValue.load_qvs(load_dir_path)

    def __save_dirpath__(self, dirpath: str) -> str:
        return io_utils.mkdirs(os.path.join(dirpath, self.STR_ID))

    def set_mask(self, mask: MedicalVolume):
        assert type(mask) is MedicalVolume, "mask for tissue must be of type MedicalVolume"
        mask = mask.reformat(SAGITTAL)
        self.__mask__ = mask

    def get_mask(self):
        return self.__mask__

    def add_quantitative_value(self, qv_new: QuantitativeValue):
        self.quantitative_values.append(qv_new)

    def __get_axis_bounds__(self, im: np.ndarray, ignore_nan=True, leave_buffer=False):
        """Tightest nonzero bounds per axis for plotting dynamic range."""
        im_temp = np.nan_to_num(im) if ignore_nan else im
        axs = []
        non_zero_elems = np.nonzero(im_temp)
        for i in range(len(non_zero_elems)):
            v_min = np.min(non_zero_elems[i])
            v_max = np.max(non_zero_elems[i])
            if leave_buffer:
                v_min -= 5
                v_max += 5
            axs.append((v_min, v_max))
        return axs


def largest_cc(mask: np.ndarray, num: int = 1) -> np.ndarray:
    """Largest ``num`` connected component(s) of a 3D mask (ref ``tissue.py:318-350``)."""
    import scipy.ndimage as sni

    mask = np.asarray(mask)
    labels, label_nb = sni.label(mask)
    if not label_nb:
        raise ValueError("No non-zero values: no connected components")
    if label_nb == 1:
        return mask.astype(bool)
    label_count = np.bincount(labels.ravel().astype(np.int64))
    label_count[0] = 0
    if num == 1:
        return labels == label_count.argmax()
    order = np.argsort(label_count)[1:][::-1]
    return np.isin(labels, order[:num])
