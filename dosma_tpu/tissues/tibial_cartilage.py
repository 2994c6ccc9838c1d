"""Tibial cartilage analytics (re-design of
``/root/reference/dosma/tissues/tibial_cartilage.py``).

Plane-projection analytics: superior/inferior by per-column local COM,
anterior/central/posterior by per-plateau AP thirds, medial/lateral by
global COM slice (ref ``:62-160``); axial unrolling via nanmean projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.quant_vals import QuantitativeValueType
from dosma_tpu.tissues._plot import save_quant_maps_and_tables
from dosma_tpu.tissues.tissue import Tissue, largest_cc
from dosma_tpu.utils import geometry_utils

__all__ = ["TibialCartilage"]

BOUNDS = {
    QuantitativeValueType.T2: 60.0,
    QuantitativeValueType.T1_RHO: 100.0,
    QuantitativeValueType.T2_STAR: 50.0,
}


class TibialCartilage(Tissue):
    """Tibial cartilage: S/I, A/C/P, M/L region analytics."""

    ID = 4
    STR_ID = "tc"
    FULL_NAME = "tibial cartilage"
    T1_EXPECTED = 1000  # ms
    _PREFETCH_FULL_MAP = False  # compressed analytics: masked gather on device

    _ANTERIOR_KEY = 0
    _POSTERIOR_KEY = 1
    _CENTRAL_KEY = 2
    _CORONAL_KEYS = [_ANTERIOR_KEY, _CENTRAL_KEY, _POSTERIOR_KEY]

    _MEDIAL_KEY = 0
    _LATERAL_KEY = 1
    _SAGITTAL_KEYS = [_MEDIAL_KEY, _LATERAL_KEY]

    _SUPERIOR_KEY = 0
    _INFERIOR_KEY = 1
    _TOTAL_AXIAL_KEY = -1

    def __init__(self, weights_dir=None, medial_to_lateral=None):
        super().__init__(weights_dir=weights_dir, medial_to_lateral=medial_to_lateral)
        self.regions_mask = None

    # ------------------------------------------------------------------
    def unroll_axial(self, quant_map):
        """Project S/I layers onto the axial plane via nanmean (ref ``:42-62``)."""
        mask = np.asarray(self.__mask__.volume)
        assert self.regions_mask is not None, "region_mask not initialized"
        quant_map = np.asarray(quant_map)
        if quant_map.shape != mask.shape:
            # The dense formulation (sel * mask * quant_map) raised on
            # mismatched grids; the compressed gather must too, not silently
            # index a wrong-strided volume.
            raise ValueError(
                f"quant_map shape {quant_map.shape} does not match mask shape {mask.shape}"
            )
        nz = np.nonzero(mask)
        vq_sel = mask[nz].astype(np.float64) * quant_map[nz]
        axial_sel = self.regions_mask[..., 0][nz]
        return self._unroll_axial_tables(vq_sel, axial_sel, nz[1], nz[2], mask.shape[1:])

    def _unroll_axial_tables(self, vq_sel, axial_sel, mx, mz, out_shape):
        """Scatter-mean the compressed masked values onto the axial plane.

        Equivalent to the dense ``nanmean(where(sel*mask*qv == 0, nan, ...),
        axis=0)`` projection: zero products and NaNs are dropped, empty
        columns come out NaN."""
        w, s = int(out_shape[0]), int(out_shape[1])
        keys = mx.astype(np.int64) * s + mz
        good = (vq_sel != 0) & ~np.isnan(vq_sel)

        def layer(lane):
            sel = good if lane is None else (good & lane)
            sums = np.zeros(w * s)
            counts = np.zeros(w * s)
            np.add.at(sums, keys[sel], vq_sel[sel])
            np.add.at(counts, keys[sel], 1)
            with np.errstate(invalid="ignore"):
                return (sums / counts).reshape(w, s)

        superior = layer(axial_sel == self._SUPERIOR_KEY)
        inferior = layer(axial_sel == self._INFERIOR_KEY)
        total = layer(None)
        return total, superior, inferior

    # ------------------------------------------------------------------
    def split_regions(self, base_map):
        """S/I by per-column local COM, A/C/P by per-plateau thirds, M/L by
        global COM (ref ``tibial_cartilage.py:83-160``; Black et al. ISMRM 2020)."""
        base_map = np.asarray(base_map)
        com = geometry_utils.center_of_mass(base_map)
        com_med_lat = int(np.ceil(com[2]))

        # M/L
        region_med_lat = np.zeros(base_map.shape)
        region_med_lat[:, :, :com_med_lat] = (
            self._MEDIAL_KEY if self.medial_to_lateral else self._LATERAL_KEY
        )
        region_med_lat[:, :, com_med_lat:] = (
            self._LATERAL_KEY if self.medial_to_lateral else self._MEDIAL_KEY
        )

        # S/I via local center of mass per (AP, slice) column.
        locs = base_map.sum(axis=0).nonzero()
        region_sup_inf = np.full(base_map.shape, self._INFERIOR_KEY, dtype=np.int64)
        if len(locs[0]):
            cols = base_map[:, locs[0], locs[1]]  # (SI, n_cols)
            si = np.arange(cols.shape[0])[:, None]
            w = cols.astype(np.float64)
            coms = np.ceil((si * w).sum(0) / w.sum(0)).astype(np.int64)
            for i in range(len(coms)):
                region_sup_inf[: coms[i], locs[0][i], locs[1][i]] = self._SUPERIOR_KEY

        # A/C/P by per-plateau thirds of the AP extent.
        region_ant_post = np.zeros(base_map.shape)
        for plateau in [slice(0, com_med_lat), slice(com_med_lat, None)]:
            cum_ap = np.nonzero(base_map[..., plateau].sum(axis=(0, 2)))[0]
            if len(cum_ap) == 0:
                continue
            min_ap = np.min(cum_ap)
            ap_range = np.max(cum_ap) - min_ap
            thresh1 = int(np.ceil(min_ap + 1 / 3 * ap_range))
            thresh2 = int(np.ceil(min_ap + 2 / 3 * ap_range))
            region_ant_post[:, :thresh1, plateau] = self._ANTERIOR_KEY
            region_ant_post[:, thresh1:thresh2, plateau] = self._CENTRAL_KEY
            region_ant_post[:, thresh2:, plateau] = self._POSTERIOR_KEY

        self.regions_mask = np.stack(
            [region_sup_inf, region_ant_post, region_med_lat], axis=-1
        )

    # ------------------------------------------------------------------
    def __calc_quant_vals__(self, quant_map, map_type):
        """Per-region stats + axial unroll, fully compressed: the qv map is
        gathered at the mask voxels (on device for device-resident maps —
        only the compressed vector crosses D2H) and all region selections
        run on the compressed index lists."""
        import warnings

        from dosma_tpu.ops.analytics import compressed_values

        super().__calc_quant_vals__(quant_map, map_type)
        assert self.regions_mask is not None, "region_mask not initialized"

        mask = np.asarray(self.__mask__.volume)
        nz = np.nonzero(mask)
        vq_sel = mask[nz].astype(np.float64) * compressed_values(quant_map.volume, nz)
        axial_sel = self.regions_mask[..., 0][nz]
        sagittal_sel = self.regions_mask[..., 1][nz]
        coronal_sel = self.regions_mask[..., 2][nz]
        # NaN != 0 is True: NaN voxels stay selected (and are then ignored
        # by the nan-aware stats), matching the dense ``vals[vals != 0]``.
        nonzero_sel = vq_sel != 0

        axial_names = ["superior", "inferior", "total"]
        coronal_names = ["medial", "lateral"]
        sagittal_names = ["anterior", "posterior", "central"]

        pd_header = ["Subject", "Location", "Side", "Region", "Mean", "Std", "Median"]
        pd_list = []
        for axial in [self._SUPERIOR_KEY, self._INFERIOR_KEY, self._TOTAL_AXIAL_KEY]:
            if axial == self._TOTAL_AXIAL_KEY:
                axial_match = (axial_sel == self._SUPERIOR_KEY) | (
                    axial_sel == self._INFERIOR_KEY
                )
            else:
                axial_match = axial_sel == axial
            for coronal in [self._MEDIAL_KEY, self._LATERAL_KEY]:
                for sagittal in [self._ANTERIOR_KEY, self._POSTERIOR_KEY, self._CENTRAL_KEY]:
                    vals = vq_sel[
                        nonzero_sel
                        & axial_match
                        & (coronal_sel == coronal)
                        & (sagittal_sel == sagittal)
                    ]
                    with warnings.catch_warnings():
                        warnings.simplefilter("ignore", RuntimeWarning)
                        pd_list.append(
                            [
                                self.pid,
                                axial_names[axial],
                                coronal_names[coronal],
                                sagittal_names[sagittal],
                                np.nanmean(vals) if len(vals) else np.nan,
                                np.nanstd(vals) if len(vals) else np.nan,
                                np.nanmedian(vals) if len(vals) else np.nan,
                            ]
                        )

        total, superior, inferior = self._unroll_axial_tables(
            vq_sel, axial_sel, nz[1], nz[2], mask.shape[1:]
        )

        df = pd.DataFrame(pd_list, columns=pd_header)
        qv_name = map_type.name
        maps = [
            {
                "title": f"{qv_name} {layer}",
                "data": data,
                "xlabel": "Slice",
                "ylabel": "",
                "filename": f"{qv_name}_{layer}",
                "raw_data_filename": f"{qv_name}_{layer}.data",
            }
            for layer, data in (
                ("superior", superior), ("inferior", inferior), ("total", total)
            )
        ]
        self.__store_quant_vals__(maps, df, map_type)

    def set_mask(self, mask: MedicalVolume, use_largest_ccs: bool = False):
        if use_largest_ccs:
            msk = np.asarray(largest_cc(np.asarray(mask.A), num=2), dtype=np.uint8)
        else:
            msk = np.asarray(mask.A, dtype=np.uint8)
        super().set_mask(mask._partial_clone(volume=msk))
        self.split_regions(np.asarray(self.__mask__.volume))

    def __save_quant_data__(self, dirpath):
        save_quant_maps_and_tables(dirpath, self.quant_vals, BOUNDS)
