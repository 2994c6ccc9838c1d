"""Meniscus analytics (re-design of ``/root/reference/dosma/tissues/meniscus.py``).

COM-based anterior/posterior, superior/inferior, medial/lateral splitting
with a ``split_ml_only`` option (ref ``:49-70, 134-222``); axial unrolling;
metrics via categorical-label ``QuantitativeValue.to_metrics``.
"""

from __future__ import annotations

import itertools
import warnings

import numpy as np

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.quant_vals import QuantitativeValueType, T2
from dosma_tpu.tissues._plot import save_quant_maps_and_tables
from dosma_tpu.tissues.tissue import Tissue
from dosma_tpu.utils import geometry_utils

__all__ = ["Meniscus"]

BOUNDS = {
    QuantitativeValueType.T2: 60.0,
    QuantitativeValueType.T1_RHO: 100.0,
    QuantitativeValueType.T2_STAR: 50.0,
}


class Meniscus(Tissue):
    """Meniscus: COM-split regions + axial unrolling."""

    ID = 2
    STR_ID = "men"
    FULL_NAME = "meniscus"
    T1_EXPECTED = 1000  # ms

    _ANTERIOR_KEY = 0
    _POSTERIOR_KEY = 1
    _CORONAL_KEYS = [_ANTERIOR_KEY, _POSTERIOR_KEY]

    _MEDIAL_KEY = 0
    _LATERAL_KEY = 1
    _SAGGITAL_KEYS = [_MEDIAL_KEY, _LATERAL_KEY]

    _SUPERIOR_KEY = 0
    _INFERIOR_KEY = 1
    _TOTAL_AXIAL_KEY = -1

    def __init__(self, weights_dir: str = None, medial_to_lateral: bool = None,
                 split_ml_only: bool = False):
        super().__init__(weights_dir=weights_dir, medial_to_lateral=medial_to_lateral)
        self.split_ml_only = split_ml_only
        self.regions_mask = None

    def unroll_axial(self, quant_map: np.ndarray):
        """Axial nanmean projection of S/I layers (ref ``meniscus.py:73-99``)."""
        mask = np.asarray(self.__mask__.volume)
        assert self.regions_mask is not None, "region_mask not initialized"
        region_sup_inf = self.regions_mask[..., 0]

        def layer(sel):
            vals = sel * mask * quant_map
            vals = np.where(vals == 0, np.nan, vals)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                return np.nanmean(vals, axis=0)

        superior = layer(region_sup_inf == self._SUPERIOR_KEY)
        inferior = layer(region_sup_inf == self._INFERIOR_KEY)
        total = layer(np.ones_like(mask, dtype=bool))
        return total, superior, inferior

    def split_regions(self, base_map):
        """Global-COM splits along all three axes (ref ``meniscus.py:101-132``)."""
        base_map = np.asarray(base_map)
        com = geometry_utils.center_of_mass(base_map)
        com_sup_inf = int(np.ceil(com[0]))
        com_ant_post = int(np.ceil(com[1]))
        com_med_lat = int(np.ceil(com[2]))

        region_sup_inf = np.zeros(base_map.shape)
        region_sup_inf[com_sup_inf:, :, :] = self._INFERIOR_KEY

        region_ant_post = np.zeros(base_map.shape)
        region_ant_post[:, com_ant_post:, :] = self._POSTERIOR_KEY

        region_med_lat = np.zeros(base_map.shape)
        region_med_lat[:, :, :com_med_lat] = (
            self._MEDIAL_KEY if self.medial_to_lateral else self._LATERAL_KEY
        )
        region_med_lat[:, :, com_med_lat:] = (
            self._LATERAL_KEY if self.medial_to_lateral else self._MEDIAL_KEY
        )

        self.regions_mask = np.stack(
            [region_sup_inf, region_ant_post, region_med_lat], axis=-1
        )

    def __calc_quant_vals__(self, quant_map: MedicalVolume, map_type):
        super().__calc_quant_vals__(quant_map, map_type)
        assert self.regions_mask is not None, "region_mask not initialized"

        axial_region = self.regions_mask[..., 0]
        coronal_region = self.regions_mask[..., 1]
        sagittal_region = self.regions_mask[..., 2]

        axial_categories = [
            (self._SUPERIOR_KEY, "superior"), (self._INFERIOR_KEY, "inferior"), (-1, "total"),
        ]
        coronal_categories = [
            (self._ANTERIOR_KEY, "anterior"), (self._POSTERIOR_KEY, "posterior"), (-1, "total"),
        ]
        sagittal_categories = [(self._MEDIAL_KEY, "medial"), (self._LATERAL_KEY, "lateral")]
        if self.split_ml_only:
            axial_categories = [x for x in axial_categories if x[0] == -1]
            coronal_categories = [x for x in coronal_categories if x[0] == -1]

        categorical_mask = np.zeros(self.regions_mask.shape[:-1])
        base_mask = np.asarray(self.__mask__.A, dtype=bool)
        labels = {}
        for idx, ((axial, a_name), (coronal, c_name), (sagittal, s_name)) in enumerate(
            itertools.product(axial_categories, coronal_categories, sagittal_categories)
        ):
            label = idx + 1
            axial_map = np.asarray([True]) if axial == -1 else axial_region == axial
            coronal_map = np.asarray([True]) if coronal == -1 else coronal_region == coronal
            sagittal_map = sagittal_region == sagittal
            categorical_mask[base_mask & axial_map & coronal_map & sagittal_map] = label
            labels[label] = f"{a_name}-{c_name}-{s_name}"

        t2 = T2(quant_map)
        categorical_mv = MedicalVolume(categorical_mask, affine=quant_map.affine)
        df = t2.to_metrics(categorical_mv, labels=labels, bounds=(0, np.inf), closed="neither")
        df.insert(0, "Subject", self.pid)

        total, superior, inferior = self.unroll_axial(np.asarray(quant_map.volume))
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
                ("superior", superior), ("inferior", inferior), ("total", total)
            )
        ]
        self.__store_quant_vals__(maps, df, map_type)

    def set_mask(self, mask: MedicalVolume):
        msk = np.asarray(mask.A, dtype=np.uint8)
        super().set_mask(mask._partial_clone(volume=msk))
        self.split_regions(np.asarray(self.__mask__.volume))

    def __save_quant_data__(self, dirpath):
        save_quant_maps_and_tables(dirpath, self.quant_vals, BOUNDS)
