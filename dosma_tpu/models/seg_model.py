"""Segmentation model base classes.

Re-design of ``/root/reference/dosma/models/seg_model.py``: the reference
wraps Keras; here models are pure-JAX forward functions with parameter
pytrees loaded from the same ``.h5`` weight files (see
:mod:`dosma_tpu.models.weights`), jit-compiled and batched on TPU.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.defaults import preferences

__all__ = ["SegModel", "JaxSegModel", "whiten_volume"]

__VOLUME_DIMENSIONS__ = 3
__EPSILON__ = 1e-8


class SegModel(ABC):
    """Abstract segmentation model (ref ``seg_model.py:14-80``).

    Args:
        input_shape: (height, width, channels) for model initialization.
        weights_path: path to ``.h5`` weights.
        force_weights: skip weight-filename validation.
    """

    ALIASES = [""]

    def __init__(self, input_shape, weights_path, force_weights=False):
        self.batch_size = preferences.segmentation_batch_size
        self.seg_model = self.build_model(input_shape, weights_path)

    @abstractmethod
    def build_model(self, input_shape, weights_path):
        pass  # pragma: no cover

    @abstractmethod
    def generate_mask(self, volume: MedicalVolume):
        pass  # pragma: no cover

    def __call__(self, *args, **kwargs):
        return self.generate_mask(*args, **kwargs)

    def __preprocess_volume__(self, volume: np.ndarray):
        return volume

    def __postprocess_volume__(self, volume: np.ndarray):
        return volume


class JaxSegModel(SegModel):
    """Base for JAX models with Keras-h5-convertible weights.

    Subclasses define ``__load_model__(input_shape)`` returning a
    (params, forward_fn) pair; ``build_model`` loads/converts weights.
    """

    def build_model(self, input_shape, weights_path=None):
        model = self.__load_model__(input_shape)
        if weights_path:
            model.load_weights(weights_path)
        return model

    @abstractmethod
    def __load_model__(self, input_shape):
        pass  # pragma: no cover

    def __whiten_eps__(self):
        """Whitening std-epsilon for the fused volume program; None = no
        whitening. Must agree with the subclass's ``__whiten_stats__``."""
        return None

    def _predict_slices(self, vol_copy: MedicalVolume) -> np.ndarray:
        """(S, H, W, C) uint8 masks for a sagittal-reformatted volume.

        Preferred path: the single fused device program
        (:func:`dosma_tpu.models.unet2d.unet2d_segment_volume` — one
        dispatch, one packed D2H). Shapes outside its packing constraints
        fall back to the batched predict_mask pipeline.
        """
        from dosma_tpu.models.oaiunet2d import _vol_and_xp

        vol, xp = _vol_and_xp(vol_copy)
        eps = self.__whiten_eps__()
        try:
            return self.seg_model.predict_mask_volume(
                vol, batch_size=self.batch_size,
                threshold=self.sigmoid_threshold,
                whiten=eps is not None, whiten_eps=eps or 0.0,
            )
        except ValueError:
            stats = self.__whiten_stats__(vol)
            mean, std = stats if stats is not None else (0.0, 1.0)
            v = xp.expand_dims(xp.transpose(vol, (2, 0, 1)), axis=-1)
            return self.seg_model.predict_mask(
                v, batch_size=self.batch_size,
                threshold=self.sigmoid_threshold, mean=mean, std=std,
            )


# Backwards-compat alias matching the reference class name.
KerasSegModel = JaxSegModel


def whiten_volume(x: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Zero-mean/unit-std normalization over all voxels (ref ``seg_model.py:114-127``)."""
    if len(x.shape) != __VOLUME_DIMENSIONS__:
        raise ValueError(f"Input has {x.ndim} dimensions. Expected {__VOLUME_DIMENSIONS__}")
    return (x - np.mean(x)) / (np.std(x) + eps)


def whiten_stats(x, eps: float = 0.0):
    """(mean, std + eps) of the whole volume — the whitening scalars the
    fused device-side inference path applies on-chip (so the volume itself
    never needs a host-side f32 copy).

    Device arrays return device SCALARS (0-d jax arrays) so a
    device-resident volume is whitened without any host synchronization.
    """
    if len(x.shape) != __VOLUME_DIMENSIONS__:
        raise ValueError(f"Input has {x.ndim} dimensions. Expected {__VOLUME_DIMENSIONS__}")
    import jax

    if isinstance(x, jax.Array):
        import jax.numpy as jnp

        xf = x.astype(jnp.float32)
        return jnp.mean(xf), jnp.std(xf) + eps
    return float(np.mean(x)), float(np.std(x)) + eps
