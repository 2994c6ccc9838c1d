"""Quantitative value wrappers: T1ρ / T2 / T2* maps + regional metrics.

Behavior-parity re-design of ``/root/reference/dosma/core/quant_vals.py``:
``QuantitativeValue`` wraps a parameter map + named extra volumes (e.g. r²),
saves/loads as NIfTI under ``dir/NAME/NAME.nii.gz`` (ref ``:78-126``), and
``to_metrics`` produces a pandas DataFrame of Mean/Std/Median/#Voxels per
labeled region (ref ``:145-229``). Subclasses self-register via
``__init_subclass__`` instead of the reference's hard-coded instance lists.
"""

from __future__ import annotations

import os
import warnings
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


# Sentinel labels used by to_metrics for the aggregate rows.
_LABEL_ALL_MASKED = -1  # union of all mask labels
_LABEL_EVERYTHING = -2  # every finite/in-bounds voxel (no mask given)


class QuantitativeValue:
    """A volumetric quantitative parameter map plus companion volumes.

    Concrete subclasses (``T1Rho``, ``T2``, ``T2Star``) define ``ID``/``NAME``
    and are collected automatically into :attr:`_registry` for lookup and
    directory-scan loading.
    """

    ID = 0
    NAME = ""
    _registry: Dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if cls.NAME:
            QuantitativeValue._registry[cls.NAME] = cls

    def __init__(self, volumetric_map: Optional[MedicalVolume] = None):
        assert self.ID > 0, f"Attribute `ID` not initialized for {type(self)}"
        assert self.NAME != "", f"Attribute `NAME` not initialized for {type(self)}"
        if volumetric_map is not None and not isinstance(volumetric_map, MedicalVolume):
            raise TypeError("`volumetric_map` must be of type MedicalVolume")
        self.volumetric_map = volumetric_map
        self.additional_volumes: Dict[str, MedicalVolume] = {}

    # ------------------------------------------------------------------
    def _map_path(self, dir_path: str, suffix: str = "") -> str:
        stem = f"{self.NAME}-{suffix}" if suffix else self.NAME
        return os.path.join(dir_path, self.NAME, f"{stem}.nii.gz")

    def save_data(self, dir_path: str, data_format=None):
        """Write map + companion volumes under ``dir_path/NAME/`` (ref ``:78-110``).

        Always NIfTI: DICOM's integer pixel storage would truncate the
        floating-point parameter values.
        """
        from dosma_tpu.core.io.format_io import ImageDataFormat

        if data_format is not None and data_format != ImageDataFormat.nifti:
            warnings.warn(
                "Due to bit depth issues, only nifti format is supported for quantitative "
                "values. Writing as nifti file..."
            )
        data_format = ImageDataFormat.nifti

        # Start every device->host transfer up front so they overlap the
        # serial gzip encodes below.
        if self.volumetric_map is not None:
            self.volumetric_map.copy_to_host_async()
        for vol in self.additional_volumes.values():
            vol.copy_to_host_async()

        if self.volumetric_map is not None:
            self.volumetric_map.save_volume(self._map_path(dir_path), data_format=data_format)
        for name, vol in self.additional_volumes.items():
            vol.save_volume(self._map_path(dir_path, suffix=name), data_format=data_format)

    def load_data(self, dir_path: str):
        from dosma_tpu.core.io import format_io_utils as fio_utils

        self.volumetric_map = fio_utils.generic_load(
            self._map_path(dir_path), expected_num_volumes=1
        )

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
        """Per-region summary statistics (ref ``quant_vals.py:145-229``).

        One DataFrame row per mask label (plus a ``total`` row); columns are
        Category / Mean / Std / Median / # Voxels plus any caller-supplied
        reduction in ``fns``.

        Device-resident maps run METRICS-ONLY: with a mask, each region's
        voxels gather on device (:func:`dosma_tpu.ops.analytics.compressed_values`)
        and only the compressed vectors cross D2H — the full map never
        does (it is ~48 MB of f32 per qDESS knee over a ~1-2% mask; the r4
        driver measured the full readback at 1.33 s of a 2.89 s e2e).
        Validity (finite + ``bounds``) depends only on the voxel VALUE, so
        filtering the compressed vectors host-side is bit-identical to the
        reference's zero-out of the host mask. Unmasked device maps reduce
        on device (one nan-aware program, scalar D2H) unless caller ``fns``
        need the raw values.
        """
        vol_in = self.volumetric_map.volume
        device_map = not isinstance(vol_in, np.ndarray) and hasattr(vol_in, "devices")

        if device_map and mask is not None:
            return self._to_metrics_device(mask, labels, bounds, closed, fns)
        if device_map and mask is None and not fns:
            return self._to_metrics_device_unmasked(bounds, closed)

        volume = np.asarray(vol_in)
        valid = np.isfinite(volume) & self._bounds_mask(volume, bounds, closed)

        if mask is None:
            regions = {_LABEL_EVERYTHING: "total"}
            mask_arr = None
        else:
            mask_arr = np.asarray(mask.reformat(self.volumetric_map.orientation).volume).copy()
            if labels is None:
                labels = {int(v): f"label_{int(v)}" for v in np.unique(mask_arr) if v > 0}
            regions = {**labels, _LABEL_ALL_MASKED: "total"}
            mask_arr[~valid] = 0

        rows = {"Category": [], "Mean": [], "Std": [], "Median": [], "# Voxels": []}
        for fname in fns or {}:
            rows[fname] = []
        for label, name in regions.items():
            if label == _LABEL_EVERYTHING:
                values = volume[valid]
            elif label == _LABEL_ALL_MASKED:
                values = volume[mask_arr > 0]
            else:
                values = volume[mask_arr == label]
            rows["Category"].append(name)
            rows["# Voxels"].append(values.size)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                for col, reducer in (("Mean", np.nanmean), ("Std", np.nanstd), ("Median", np.nanmedian)):
                    rows[col].append(reducer(values) if values.size else np.nan)
            for fname, fn in (fns or {}).items():
                rows[fname].append(fn(values))
        return pd.DataFrame(rows)

    def _to_metrics_device(self, mask, labels, bounds, closed, fns) -> pd.DataFrame:
        """Masked metrics for a device-resident map: per-region device
        gathers, host reducers over the compressed vectors (bit-identical
        to the numpy path — validity is a per-value predicate)."""
        from dosma_tpu.ops.analytics import compressed_values

        vol = self.volumetric_map.volume
        mask_arr = np.asarray(mask.reformat(self.volumetric_map.orientation).volume)
        if labels is None:
            labels = {int(v): f"label_{int(v)}" for v in np.unique(mask_arr) if v > 0}
        regions = {**labels, _LABEL_ALL_MASKED: "total"}

        # ONE gather of every masked voxel (mask > 0), partitioned per
        # label host-side — labels share the compressed vector instead of
        # issuing one device program each.
        iy, ix, iz = np.nonzero(mask_arr)
        all_vals = compressed_values(vol, (iy, ix, iz))  # float64 host
        region_labels = mask_arr[iy, ix, iz]
        valid = np.isfinite(all_vals) & self._bounds_mask(all_vals, bounds, closed)

        rows = {"Category": [], "Mean": [], "Std": [], "Median": [], "# Voxels": []}
        for fname in fns or {}:
            rows[fname] = []
        f32 = np.float32  # reducer inputs match the host path's map dtype
        for label, name in regions.items():
            sel = valid if label == _LABEL_ALL_MASKED else (valid & (region_labels == label))
            values = all_vals[sel].astype(f32, copy=False)
            rows["Category"].append(name)
            rows["# Voxels"].append(values.size)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                for col, reducer in (("Mean", np.nanmean), ("Std", np.nanstd), ("Median", np.nanmedian)):
                    rows[col].append(reducer(values) if values.size else np.nan)
            for fname, fn in (fns or {}).items():
                rows[fname].append(fn(values))
        return pd.DataFrame(rows)

    def _to_metrics_device_unmasked(self, bounds, closed) -> pd.DataFrame:
        """Whole-volume metrics reduced ON device; only 4 scalars cross."""
        import jax.numpy as jnp

        x = jnp.asarray(self.volumetric_map.volume, jnp.float32)
        valid = jnp.isfinite(x)
        if bounds:
            lb, ub = bounds
            assert lb <= ub, f"lower:{lb}, upper: {ub}"
            assert closed in ("right", "left", "both", "neither"), closed
            above = x >= lb if closed in ("left", "both") else x > lb
            below = x <= ub if closed in ("right", "both") else x < ub
            valid = valid & above & below
        xm = jnp.where(valid, x, jnp.nan)
        n = int(jnp.sum(valid))
        mean = float(jnp.nanmean(xm)) if n else np.nan
        std = float(jnp.nanstd(xm)) if n else np.nan
        med = float(jnp.nanmedian(xm)) if n else np.nan
        return pd.DataFrame(
            {"Category": ["total"], "Mean": [mean], "Std": [std],
             "Median": [med], "# Voxels": [n]}
        )

    @staticmethod
    def _bounds_mask(volume: np.ndarray, bounds, closed: str) -> np.ndarray:
        if not bounds:
            return np.ones(volume.shape, bool)
        assert len(bounds) == 2, len(bounds)
        lb, ub = bounds
        assert lb <= ub, f"lower:{lb}, upper: {ub}"
        assert closed in ("right", "left", "both", "neither"), closed
        above = volume >= lb if closed in ("left", "both") else volume > lb
        below = volume <= ub if closed in ("right", "both") else volume < ub
        return above & below

    def to(self, device):
        self.volumetric_map = self.volumetric_map.to(device)
        self.additional_volumes = {k: v.to(device) for k, v in self.additional_volumes.items()}
        return self

    # ------------------------------------------------------------------
    @staticmethod
    def get_qv(qv_id: Union[int, str]) -> "QuantitativeValue":
        """Instantiate a registered QV by name (case-insensitive) or integer ID."""
        for cls in QuantitativeValue._registry.values():
            if qv_id in (cls.NAME, cls.NAME.lower(), cls.ID):
                return cls()
        raise ValueError(f"Quantitative Value with name or id {qv_id} not found")

    @staticmethod
    def save_qvs(dir_path: str, qvs):
        for qv in qvs:
            if not isinstance(qv, QuantitativeValue):
                raise TypeError("All members of `qvs` must be instances of QuantitativeValue")
            qv.save_data(dir_path)

    @staticmethod
    def load_qvs(dir_path: str):
        """Load every registered QV that has a saved map under ``dir_path``."""
        found = []
        for cls in QuantitativeValue._registry.values():
            qv = cls()
            if os.path.isfile(qv._map_path(dir_path)):
                qv.load_data(dir_path)
                found.append(qv)
        return found

    @property
    def qv_type(self) -> QuantitativeValueType:
        raise NotImplementedError(f"Quantitative value type not implemented for {type(self)}")


class T1Rho(QuantitativeValue):
    """Spin-lattice relaxation in the rotating frame (T1ρ)."""

    ID = 1
    NAME = "t1_rho"

    @property
    def qv_type(self):
        return QuantitativeValueType.T1_RHO


class T2(QuantitativeValue):
    """Spin-spin (transverse) relaxation time."""

    ID = 2
    NAME = "t2"

    @property
    def qv_type(self):
        return QuantitativeValueType.T2


class T2Star(QuantitativeValue):
    """Effective transverse relaxation time (T2*)."""

    ID = 3
    NAME = "t2_star"

    @property
    def qv_type(self):
        return QuantitativeValueType.T2_STAR


get_qv = QuantitativeValue.get_qv
