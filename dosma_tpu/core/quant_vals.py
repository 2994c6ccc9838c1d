"""Quantitative value wrappers: T1ρ / T2 / T2* maps + regional metrics.

Behavior-parity re-design of ``/root/reference/dosma/core/quant_vals.py``:
``QuantitativeValue`` wraps a parameter map + named extra volumes (e.g. r²),
saves/loads as NIfTI under ``dir/NAME/NAME.nii.gz`` (ref ``:78-126``), and
``to_metrics`` produces a pandas DataFrame of Mean/Std/Median/#Voxels per
labeled region (ref ``:145-229``).
"""

from __future__ import annotations

import os
import warnings
from collections import defaultdict
from enum import Enum
from typing import Callable, Dict, Optional, Tuple, Union

import numpy as np
import pandas as pd

from dosma_tpu.core.med_volume import MedicalVolume

__all__ = ["QuantitativeValueType", "QuantitativeValue", "T1Rho", "T2", "T2Star", "get_qv"]


class QuantitativeValueType(Enum):
    T1_RHO = 1
    T2 = 2
    T2_STAR = 3


class QuantitativeValue:
    """Tracks a volumetric quantitative map + associated volumes (e.g. r²)."""

    ID = 0
    NAME = ""

    def __init__(self, volumetric_map: Optional[MedicalVolume] = None):
        assert self.ID > 0, f"Attribute `ID` not initialized for {type(self)}"
        assert self.NAME != "", f"Attribute `NAME` not initialized for {type(self)}"
        if volumetric_map is not None and not isinstance(volumetric_map, MedicalVolume):
            raise TypeError("`volumetric_map` must be of type MedicalVolume")
        self.volumetric_map = volumetric_map
        self.additional_volumes: Dict[str, MedicalVolume] = {}

    # ------------------------------------------------------------------
    def save_data(self, dir_path: str, data_format=None):
        """Save map + extra volumes to ``dir_path/NAME/`` as NIfTI (ref ``:78-110``)."""
        from dosma_tpu.core.io.format_io import ImageDataFormat

        if data_format is not None and data_format != ImageDataFormat.nifti:
            warnings.warn(
                "Due to bit depth issues, only nifti format is supported for quantitative "
                "values. Writing as nifti file..."
            )
        data_format = ImageDataFormat.nifti

        if self.volumetric_map is not None:
            filepath = os.path.join(dir_path, self.NAME, f"{self.NAME}.nii.gz")
            self.volumetric_map.save_volume(filepath, data_format=data_format)
        for volume_name, vol in self.additional_volumes.items():
            path = os.path.join(dir_path, self.NAME, f"{self.NAME}-{volume_name}.nii.gz")
            vol.save_volume(path, data_format=data_format)

    def load_data(self, dir_path: str):
        from dosma_tpu.core.io import format_io_utils as fio_utils

        file_path = os.path.join(dir_path, self.NAME, f"{self.NAME}.nii.gz")
        self.volumetric_map = fio_utils.generic_load(file_path, expected_num_volumes=1)

    def add_additional_volume(self, name: str, volume: MedicalVolume):
        if not isinstance(volume, MedicalVolume):
            raise TypeError("`volume` must be of type MedicalVolume")
        self.additional_volumes[name] = volume

    # ------------------------------------------------------------------
    def to_metrics(
        self,
        mask: Optional[MedicalVolume] = None,
        labels: Optional[Dict[int, str]] = None,
        bounds: Optional[Tuple[float, float]] = None,
        closed: str = "right",
        fns: Optional[Dict[str, Callable]] = None,
    ) -> pd.DataFrame:
        """Regional Mean/Std/Median/#Voxels DataFrame (ref ``quant_vals.py:145-229``)."""
        volume = np.asarray(self.volumetric_map.volume)
        valid_mask = np.isfinite(volume)
        if bounds:
            assert len(bounds) == 2, len(bounds)
            lb, ub = bounds
            assert lb <= ub, f"lower:{lb}, upper: {ub}"
            assert closed in ("right", "left", "both", "neither"), closed
            lb_mask = volume >= lb if closed in ("left", "both") else volume > lb
            ub_mask = volume <= ub if closed in ("right", "both") else volume < ub
            valid_mask &= lb_mask & ub_mask

        if mask is not None:
            mask = mask.reformat(self.volumetric_map.orientation)
            mask = np.asarray(mask.volume)
            if labels is None:
                unique_vals = [x for x in np.unique(mask) if x > 0]
                labels = {int(i): f"label_{int(i)}" for i in unique_vals}
            labels = dict(labels)
            labels.update({-1: "total"})
            mask = mask.copy()
            mask[~valid_mask] = 0
        else:
            labels = {-2: "total"}

        fns = fns or {}
        metrics = defaultdict(list)
        for label, name in labels.items():
            if label == -2:
                qv_region_vals = volume[valid_mask]
            elif label == -1:
                qv_region_vals = volume[mask > 0]
            else:
                qv_region_vals = volume[mask == label]
            num_voxels = int(np.prod(qv_region_vals.shape))

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                metrics["Category"].append(name)
                metrics["Mean"].append(np.nanmean(qv_region_vals) if num_voxels else np.nan)
                metrics["Std"].append(np.nanstd(qv_region_vals) if num_voxels else np.nan)
                metrics["Median"].append(np.nanmedian(qv_region_vals) if num_voxels else np.nan)
                metrics["# Voxels"].append(num_voxels)
            for fname, fn in fns.items():
                metrics[fname].append(fn(qv_region_vals))
        return pd.DataFrame(metrics)

    def to(self, device):
        self.volumetric_map = self.volumetric_map.to(device)
        self.additional_volumes = {k: v.to(device) for k, v in self.additional_volumes.items()}
        return self

    # ------------------------------------------------------------------
    @staticmethod
    def get_qv(qv_id: Union[int, str]) -> "QuantitativeValue":
        for qv in [T1Rho(), T2(), T2Star()]:
            if qv.NAME.lower() == qv_id or qv.NAME == qv_id or qv.ID == qv_id:
                return qv
        raise ValueError(f"Quantitative Value with name or id {qv_id} not found")

    @staticmethod
    def save_qvs(dir_path: str, qvs):
        for qv in qvs:
            if not isinstance(qv, QuantitativeValue):
                raise TypeError("All members of `qvs` must be instances of QuantitativeValue")
            qv.save_data(dir_path)

    @staticmethod
    def load_qvs(dir_path: str):
        qvs = []
        for qv in [T1Rho(), T2(), T2Star()]:
            path = os.path.join(dir_path, qv.NAME, f"{qv.NAME}.nii.gz")
            if os.path.isfile(path):
                qv.load_data(dir_path)
                qvs.append(qv)
        return qvs

    @property
    def qv_type(self) -> QuantitativeValueType:
        raise NotImplementedError(f"Quantitative value type not implemented for {type(self)}")


class T1Rho(QuantitativeValue):
    """T1ρ MRI parameter."""

    ID = 1
    NAME = "t1_rho"

    @property
    def qv_type(self):
        return QuantitativeValueType.T1_RHO


class T2(QuantitativeValue):
    """T2 MRI parameter."""

    ID = 2
    NAME = "t2"

    @property
    def qv_type(self):
        return QuantitativeValueType.T2


class T2Star(QuantitativeValue):
    """T2* MRI parameter."""

    ID = 3
    NAME = "t2_star"

    @property
    def qv_type(self):
        return QuantitativeValueType.T2_STAR


get_qv = QuantitativeValue.get_qv
