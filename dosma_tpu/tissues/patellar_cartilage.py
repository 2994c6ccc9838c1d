"""Patellar cartilage analytics (re-design of
``/root/reference/dosma/tissues/patellar_cartilage.py``).

Flat tissue → coronal-projection unrolling; deep/superficial split by
per-column local COM in the A/P direction; M/L by global COM
(ref ``:42-131``).
"""

from __future__ import annotations

import itertools
import warnings

import numpy as np
import pandas as pd

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.quant_vals import QuantitativeValueType
from dosma_tpu.tissues._plot import save_quant_maps_and_tables
from dosma_tpu.tissues.tissue import Tissue, largest_cc
from dosma_tpu.utils import geometry_utils

__all__ = ["PatellarCartilage"]

BOUNDS = {
    QuantitativeValueType.T2: 80.0,
    QuantitativeValueType.T1_RHO: 100.0,
    QuantitativeValueType.T2_STAR: 80.0,
}


class PatellarCartilage(Tissue):
    """Patellar cartilage: deep/superficial + medial/lateral analytics."""

    ID = 3
    STR_ID = "pc"
    FULL_NAME = "patellar cartilage"
    T1_EXPECTED = 1000  # ms

    _ANTERIOR_KEY = 0
    _POSTERIOR_KEY = 1
    _CORONAL_KEYS = [_ANTERIOR_KEY, _POSTERIOR_KEY]

    _MEDIAL_KEY = 0
    _LATERAL_KEY = 1
    _SAGITTAL_KEYS = [_MEDIAL_KEY, _LATERAL_KEY]

    _REGION_DEEP_KEY = 0
    _REGION_SUPERFICIAL_KEY = 1
    _TOTAL_AXIAL_KEY = -1

    def __init__(self, weights_dir: str = None, medial_to_lateral: bool = None):
        super().__init__(weights_dir=weights_dir, medial_to_lateral=medial_to_lateral)
        self.regions_mask = None

    def unroll_coronal(self, quant_map: np.ndarray):
        """Project onto the coronal plane (flat tissue) — ref ``:59-90``."""
        mask = np.asarray(self.__mask__.volume)
        assert self.regions_mask is not None, "region_mask not initialized"
        region_deep_sup = self.regions_mask[..., 0]

        def layer(sel):
            vals = sel * mask * quant_map
            vals = np.where(vals == 0, np.nan, vals)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                return np.nanmean(vals, axis=2)

        superficial = layer(region_deep_sup == self._REGION_SUPERFICIAL_KEY)
        deep = layer(region_deep_sup == self._REGION_DEEP_KEY)
        total = layer(np.ones_like(mask, dtype=bool))
        return total, superficial, deep

    def split_regions(self, base_map):
        """Deep/superficial by per-column A/P local COM; M/L by global COM
        (ref ``patellar_cartilage.py:92-131``)."""
        base_map = np.asarray(base_map)
        if np.sum(base_map) == 0:
            warnings.warn(f"No mask for `{self.FULL_NAME}` was found.")

        locs = base_map.sum(axis=1).nonzero()
        region_sup_deep = np.full(base_map.shape, self._REGION_DEEP_KEY, dtype=np.int64)
        if len(locs[0]):
            cols = base_map[locs[0], :, locs[1]]  # (n_cols, AP)
            ap = np.arange(cols.shape[1])[None, :]
            w = cols.astype(np.float64)
            coms = np.ceil((ap * w).sum(1) / w.sum(1)).astype(np.int64)
            for i in range(len(coms)):
                region_sup_deep[locs[0][i], : coms[i], locs[1][i]] = self._REGION_SUPERFICIAL_KEY

        midpoint_ml = int(np.ceil(geometry_utils.center_of_mass(base_map)[2])) if base_map.sum() else 0
        region_med_lat = np.full(base_map.shape, self._LATERAL_KEY, dtype=np.int64)
        medial_span = slice(0, midpoint_ml) if self.medial_to_lateral else slice(midpoint_ml, None)
        region_med_lat[:, :, medial_span] = self._MEDIAL_KEY

        self.regions_mask = np.stack([region_sup_deep, region_med_lat], axis=-1)

    def __calc_quant_vals__(self, quant_map, map_type):
        super().__calc_quant_vals__(quant_map, map_type)
        assert self.regions_mask is not None, "region_mask not initialized"

        qvol = np.asarray(self.__mask__.volume) * np.asarray(quant_map.volume)
        deep_superficial_map = self.regions_mask[..., 0]
        med_lat_map = self.regions_mask[..., 1]

        axial_names = ["deep", "superficial", "total"]
        sagittal_names = ["medial", "lateral"]

        pd_header = ["Subject", "Location", "Condyle", "Mean", "Std", "Median"]
        pd_list = []
        for axial, sagittal in itertools.product(
            [self._REGION_SUPERFICIAL_KEY, self._REGION_DEEP_KEY, self._TOTAL_AXIAL_KEY],
            [self._MEDIAL_KEY, self._LATERAL_KEY],
        ):
            if axial == self._TOTAL_AXIAL_KEY:
                axial_map = (deep_superficial_map == self._REGION_SUPERFICIAL_KEY) | (
                    deep_superficial_map == self._REGION_DEEP_KEY
                )
            else:
                axial_map = deep_superficial_map == axial
            sagittal_map = med_lat_map == sagittal

            vals = qvol * axial_map * sagittal_map
            vals = vals[vals != 0]
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                pd_list.append(
                    [
                        self.pid,
                        axial_names[axial],
                        sagittal_names[sagittal],
                        np.nanmean(vals) if len(vals) else np.nan,
                        np.nanstd(vals) if len(vals) else np.nan,
                        np.nanmedian(vals) if len(vals) else np.nan,
                    ]
                )

        total, superficial, deep = self.unroll_coronal(np.asarray(quant_map.volume))

        df = pd.DataFrame(pd_list, columns=pd_header)
        qv_name = map_type.name
        maps = [
            {
                "title": f"{qv_name} {layer}",
                "data": data,
                "xlabel": "Slice",
                "ylabel": "Angle (binned)",
                "filename": f"{qv_name}_{layer}",
                "raw_data_filename": f"{qv_name}_{layer}.data",
            }
            for layer, data in (
                ("superficial", superficial), ("deep", deep), ("total", total)
            )
        ]
        self.__store_quant_vals__(maps, df, map_type)

    def set_mask(self, mask: MedicalVolume, use_largest_cc: bool = True):
        if use_largest_cc:
            msk = np.asarray(largest_cc(np.asarray(mask.A)), dtype=np.uint8)
        else:
            msk = np.asarray(mask.A, dtype=np.uint8)
        super().set_mask(mask._partial_clone(volume=msk))
        self.split_regions(np.asarray(self.__mask__.volume))

    def __save_quant_data__(self, dirpath):
        save_quant_maps_and_tables(dirpath, self.quant_vals, BOUNDS)
