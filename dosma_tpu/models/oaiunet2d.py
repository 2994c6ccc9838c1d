"""OAI U-Net segmentation models (re-design of ``/root/reference/dosma/models/oaiunet2d.py``).

Same architectures and channel orders as the reference so pretrained
weights produce identical masks:

- :class:`OAIUnet2D` — 1-channel sigmoid head (ref ``:24-175``)
- :class:`IWOAIOAIUnet2D` — 4-channel head ordered {fc, tc, pc, men}
  (ref ``:178-320``)
- :class:`IWOAIOAIUnet2DNormalized` — adds whitening (ref ``:326-345``)
"""

from __future__ import annotations

import os

import numpy as np

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL
from dosma_tpu.models.seg_model import JaxSegModel, whiten_volume
from dosma_tpu.models.unet2d import Unet2D

__all__ = ["OAIUnet2D", "IWOAIOAIUnet2D", "IWOAIOAIUnet2DNormalized"]


def _vol_and_xp(mv: MedicalVolume):
    """(device array, jnp) for the segmentation ingest.

    Host volumes are staged to the accelerator HERE, in ONE transfer of
    the volume's NATIVE (row-major) layout; the slice-major transpose and
    per-batch slicing then run on device. Transposing on the host instead
    (the r4 pipeline) materializes every 16-slice batch through a
    4-bytes-per-256-byte strided read — measured 2.4 s of the 2.2 s
    config4 wall for a 37 MB volume the tunnel uploads in 0.04 s.
    Device-resident volumes (e.g. from
    :func:`dosma_tpu.core.io.prefetch.load_to_device`) pass through."""
    import jax
    import jax.numpy as jnp

    if isinstance(mv.volume, jax.Array):
        return mv.volume, jnp
    return jax.device_put(np.asarray(mv.volume)), jnp


class OAIUnet2D(JaxSegModel):
    """2D U-Net from Chaudhari et al. IWOAI 2018 (single-class head)."""

    ALIASES = ["oai-unet2d", "oai_unet2d"]
    sigmoid_threshold = 0.5

    def __load_model__(self, input_shape):
        from dosma_tpu.defaults import preferences

        return Unet2D(
            input_shape, num_classes=1, precision=preferences.segmentation_precision
        )

    def generate_mask(self, volume: MedicalVolume):
        """Sagittal reformat → per-slice batched inference → threshold 0.5 →
        reformat back (ref ``oaiunet2d.py:146-171``).

        Transfer-minimizing: slices are uploaded in their source dtype and
        whitening/thresholding run on device (``unet2d_predict_mask``); only
        the packed uint8 mask returns to the host. Device-resident volumes
        (e.g. from :func:`dosma_tpu.core.io.prefetch.load_to_device`) feed
        the network with zero extra host↔device round trips.
        """
        vol_copy = volume.reformat(SAGITTAL)
        mask = self._predict_slices(vol_copy)  # (S, H, W, 1)

        mask = np.transpose(np.squeeze(mask, axis=-1), (1, 2, 0))
        vol_copy.volume = mask
        vol_copy.reformat(volume.orientation, inplace=True)
        return vol_copy


    def __preprocess_volume__(self, volume: np.ndarray):
        return whiten_volume(volume, eps=1e-8)

    def __whiten_stats__(self, volume: np.ndarray):
        """Whitening scalars matching ``__preprocess_volume__`` (None = no
        normalization); applied on device by the fused inference path."""
        from dosma_tpu.models.seg_model import whiten_stats

        return whiten_stats(volume, eps=1e-8)

    def __whiten_eps__(self):
        """Whitening std-epsilon for the fused volume program; None = no
        whitening (must agree with ``__whiten_stats__``)."""
        return 1e-8


class IWOAIOAIUnet2D(OAIUnet2D):
    """IWOAI 2019 Team 6 model: 4-class head {fc, tc, pc, men}."""

    ALIASES = ["iwoai-2019-t6"]
    _WEIGHTS_FILE = "iwoai-2019-unet2d_fc-tc-pc-men_weights.h5"
    CATEGORIES = ["fc", "tc", "pc", "men"]

    def __init__(self, input_shape, weights_path, force_weights=False):
        if not force_weights and os.path.basename(weights_path) != self._WEIGHTS_FILE:
            raise ValueError(f"Weights {weights_path} not supported for {type(self)}")
        super().__init__(input_shape, weights_path)

    def __load_model__(self, input_shape):
        from dosma_tpu.defaults import preferences

        return Unet2D(
            input_shape, num_classes=4, precision=preferences.segmentation_precision
        )

    def generate_mask(self, volume: MedicalVolume):
        vol_copy = volume.reformat(SAGITTAL)
        mask = self._predict_slices(vol_copy)  # (S, H, W, C)

        # (H, W, slice, classes)
        mask = np.transpose(mask, (1, 2, 0, 3))

        vols = {}
        for i, category in enumerate(self.CATEGORIES):
            vol_cp = vol_copy._partial_clone(volume=mask[..., i], headers=True)
            vol_cp.reformat(volume.orientation, inplace=True)
            vols[category] = vol_cp
        return vols

    def __preprocess_volume__(self, volume: np.ndarray):
        return volume

    def __whiten_stats__(self, volume: np.ndarray):
        return None  # IWOAI 2019 T6 runs on raw intensities

    def __whiten_eps__(self):
        return None


class IWOAIOAIUnet2DNormalized(IWOAIOAIUnet2D):
    """IWOAI 2019 Team 6 model with zero-mean/unit-std input normalization."""

    ALIASES = ("iwoai-2019-t6-normalized",)
    _WEIGHTS_FILE = "iwoai-2019-unet2d-normalized_fc-tc-pc-men_weights.h5"

    def __preprocess_volume__(self, volume: np.ndarray):
        return whiten_volume(volume)

    def __whiten_stats__(self, volume: np.ndarray):
        from dosma_tpu.models.seg_model import whiten_stats

        return whiten_stats(volume, eps=0.0)

    def __whiten_eps__(self):
        return 0.0
