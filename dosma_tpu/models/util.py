"""Model registry + YAML config loading (re-design of
``/root/reference/dosma/models/util.py``)."""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import yaml

from dosma_tpu.models.oaiunet2d import IWOAIOAIUnet2D, IWOAIOAIUnet2DNormalized, OAIUnet2D
from dosma_tpu.models.seg_model import SegModel
from dosma_tpu.models.stanford_qdess import StanfordQDessUNet2D

__all__ = ["get_model", "model_from_config", "SUPPORTED_MODELS"]

__SUPPORTED_MODELS__ = [OAIUnet2D, IWOAIOAIUnet2D, IWOAIOAIUnet2DNormalized, StanfordQDessUNet2D]

SUPPORTED_MODELS = [x.ALIASES[0] for x in __SUPPORTED_MODELS__]


def get_model(model_str, input_shape, weights_path, **kwargs):
    """Build a model by alias or class name (ref ``util.py:24-35``)."""
    for m in __SUPPORTED_MODELS__:
        if model_str in m.ALIASES or model_str == m.__name__:
            return m(input_shape, weights_path, **kwargs)
    raise LookupError(f"{model_str} model type not supported")


def model_from_config(cfg_file_or_dict, weights_dir=None, **kwargs) -> SegModel:
    """Build a model from a YAML config with keys DOSMA_MODEL / CATEGORIES /
    WEIGHTS_FILE, rebinding ``generate_mask`` to remap categories
    (ref ``util.py:38-94``)."""

    def _gen_mask(func, *_args, **_kwargs):
        out = func(*_args, **_kwargs)
        if isinstance(out, dict):
            out = out.values()
        elif not isinstance(out, Sequence):
            out = [out]
        out = list(out)
        if len(categories) != len(out):
            raise ValueError(f"Got {len(out)} outputs, but {len(categories)} categories")
        return {cat: o for cat, o in zip(categories, out)}

    if isinstance(cfg_file_or_dict, str):
        with open(cfg_file_or_dict) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = cfg_file_or_dict

    base_model = cfg["DOSMA_MODEL"]
    categories = cfg["CATEGORIES"]
    weights = cfg["WEIGHTS_FILE"]
    if not os.path.isfile(weights):
        assert weights_dir, "`weights_dir` must be specified"
        weights = os.path.join(weights_dir, cfg["WEIGHTS_FILE"])

    try:
        model: SegModel = get_model(base_model, weights_path=weights, force_weights=True, **kwargs)
    except LookupError as e:
        raise LookupError(f"BASE_MODEL '{base_model}' not supported \n{e}")

    model.generate_mask = partial(_gen_mask, model.generate_mask)
    return model
