"""SKM-TEA / Stanford qDESS U-Net (re-design of
``/root/reference/dosma/models/stanford_qdess.py:27-205``).

Head order is {pc, fc, tc, men} — note this DIFFERS from the IWOAI model's
{fc, tc, pc, men}. Accepts 3D RSS input or 4D two-echo input (RSS computed
internally, ref ``:172-173``).
"""

from __future__ import annotations


import numpy as np

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL
from dosma_tpu.models.seg_model import JaxSegModel, whiten_volume
from dosma_tpu.models.unet2d import Unet2D

__all__ = ["StanfordQDessUNet2D"]


class StanfordQDessUNet2D(JaxSegModel):
    """2D U-Net for SKM-TEA qDESS knee segmentation (pc/fc/tc/men head)."""

    ALIASES = ("stanford-qdess-2021-unet2d", "skm-tea-unet2d")
    sigmoid_threshold = 0.5
    CATEGORIES = ["pc", "fc", "tc", "men"]

    def __load_model__(self, input_shape):
        from dosma_tpu.defaults import preferences

        return Unet2D(
            input_shape, num_classes=4, precision=preferences.segmentation_precision
        )

    def generate_mask(self, volume: MedicalVolume):
        """Segment from 3D RSS or 4D two-echo input (ref ``stanford_qdess.py:159-203``)."""
        ndim = volume.ndim
        if ndim not in (3, 4):
            raise ValueError("`volume` must either be 3D or 4D")

        vol_copy = volume
        if ndim == 4:
            vol_copy = np.sqrt(np.sum(vol_copy**2, axis=-1))
        vol_copy = vol_copy.reformat(SAGITTAL)

        mask = self._predict_slices(vol_copy)  # (S, H, W, 4)
        mask = np.transpose(mask, (1, 2, 0, 3))

        vols = {}
        for i, category in enumerate(self.CATEGORIES):
            vol_cp = vol_copy._partial_clone(volume=mask[..., i], headers=True)
            vol_cp.reformat(volume.orientation, inplace=True)
            vols[category] = vol_cp
        return vols

    def __preprocess_volume__(self, volume: np.ndarray):
        return whiten_volume(volume, eps=1e-8)

    def __whiten_stats__(self, volume: np.ndarray):
        from dosma_tpu.models.seg_model import whiten_stats

        return whiten_stats(volume, eps=1e-8)

    def __whiten_eps__(self):
        return 1e-8
