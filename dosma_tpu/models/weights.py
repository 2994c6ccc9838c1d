"""Keras ``.h5`` → JAX parameter-pytree weight conversion.

The reference ships pretrained Keras weights (``model.save_weights`` HDF5
layout: root attr ``layer_names``, per-layer groups with ``weight_names``).
This module converts them to the :mod:`dosma_tpu.models.unet2d` pytree so
pretrained models produce identical masks on TPU.

Layout notes (validated in tests against torch oracles):
- Keras Conv2D kernel: (kh, kw, in, out) — identical to our HWIO layout.
- Keras Conv2DTranspose kernel: (kh, kw, out, in) — kept as-is; the forward
  pass consumes the Keras layout directly.
- BatchNorm weights order: gamma, beta, moving_mean, moving_variance.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["load_keras_unet2d_weights", "read_keras_h5"]


def _layer_index(name: str) -> Tuple[str, int]:
    """('conv2d_12' → ('conv2d', 12)); un-suffixed layers are index 0."""
    m = re.match(r"^(.*?)(?:_(\d+))?$", name)
    base, idx = m.group(1), m.group(2)
    return base, int(idx) if idx is not None else 0


def read_keras_h5(path: str) -> List[Tuple[str, List[np.ndarray]]]:
    """Read (layer_name, [weights...]) in model order from a Keras h5 file."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = root.attrs.get("layer_names")
        if layer_names is None:
            layer_names = list(root.keys())
        layer_names = [n.decode() if isinstance(n, bytes) else n for n in layer_names]
        for lname in layer_names:
            if lname not in root:
                continue
            g = root[lname]
            weight_names = g.attrs.get("weight_names", [])
            weight_names = [n.decode() if isinstance(n, bytes) else n for n in weight_names]
            if not weight_names:
                continue
            weights = [np.asarray(g[wn]) for wn in weight_names]
            out.append((lname, weights))
    return out


def load_keras_unet2d_weights(path: str) -> Dict:
    """Convert a reference U-Net ``.h5`` into the unet2d parameter pytree.

    Relies on layer creation order (the reference builds encoder convs/BNs
    first, then decoder transpose+convs+BNs, then the 1x1 head —
    ``oaiunet2d.py:56-144``), classifying layers by name prefix.
    """
    from dosma_tpu.models.unet2d import DEPTH

    layers = read_keras_h5(path)

    convs = []  # (idx, [w, b]) plain Conv2D
    convts = []  # Conv2DTranspose
    bns = []
    for lname, weights in layers:
        base, idx = _layer_index(lname)
        if "conv2d_transpose" in lname or "deconv" in lname.lower():
            convts.append((idx, weights))
        elif "conv" in lname.lower():
            convs.append((idx, weights))
        elif "batch_normalization" in lname or lname.lower().startswith("bn"):
            bns.append((idx, weights))
    convs.sort(key=lambda t: t[0])
    convts.sort(key=lambda t: t[0])
    bns.sort(key=lambda t: t[0])

    n_down_convs = 2 * DEPTH
    n_up_convs = 2 * (DEPTH - 1)
    expected_convs = n_down_convs + n_up_convs + 1
    if len(convs) != expected_convs:
        raise ValueError(
            f"Expected {expected_convs} Conv2D layers in {path}, found {len(convs)}"
        )
    if len(convts) != DEPTH - 1:
        raise ValueError(
            f"Expected {DEPTH - 1} Conv2DTranspose layers in {path}, found {len(convts)}"
        )
    if len(bns) != 2 * DEPTH - 1:
        raise ValueError(
            f"Expected {2 * DEPTH - 1} BatchNormalization layers in {path}, found {len(bns)}"
        )

    def conv_params(weights):
        w, b = weights
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    def bn_params(weights):
        gamma, beta, mean, var = weights
        return {
            "gamma": jnp.asarray(gamma),
            "beta": jnp.asarray(beta),
            "mean": jnp.asarray(mean),
            "var": jnp.asarray(var),
        }

    params = {"down": [], "up": [None] * (DEPTH - 1), "final": None}
    ci, bi = 0, 0
    for d in range(DEPTH):
        params["down"].append(
            {
                "conv1": conv_params(convs[ci][1]),
                "conv2": conv_params(convs[ci + 1][1]),
                "bn": bn_params(bns[bi][1]),
            }
        )
        ci += 2
        bi += 1
    # Decoder was created from depth-2 down to 0.
    for ti, d in enumerate(range(DEPTH - 2, -1, -1)):
        params["up"][d] = {
            "convT": conv_params(convts[ti][1]),
            "conv1": conv_params(convs[ci][1]),
            "conv2": conv_params(convs[ci + 1][1]),
            "bn": bn_params(bns[bi][1]),
        }
        ci += 2
        bi += 1
    params["final"] = conv_params(convs[ci][1])
    return params


def save_keras_unet2d_weights(path: str, params: Dict):
    """Write a parameter pytree back out in the Keras h5 layout.

    Used by tests to validate h5 round-tripping without real weight files.
    """
    import h5py

    from dosma_tpu.models.unet2d import DEPTH

    layer_specs = []  # (layer_name, [(weight_name, array), ...])
    conv_i, bn_i, convt_i = 0, 0, 0

    def conv_name():
        nonlocal conv_i
        name = "conv2d" if conv_i == 0 else f"conv2d_{conv_i}"
        conv_i += 1
        return name

    def bn_name():
        nonlocal bn_i
        name = "batch_normalization" if bn_i == 0 else f"batch_normalization_{bn_i}"
        bn_i += 1
        return name

    def convt_name():
        nonlocal convt_i
        name = "conv2d_transpose" if convt_i == 0 else f"conv2d_transpose_{convt_i}"
        convt_i += 1
        return name

    def add_conv(p):
        name = conv_name()
        layer_specs.append(
            (name, [(f"{name}/kernel:0", np.asarray(p["w"])), (f"{name}/bias:0", np.asarray(p["b"]))])
        )

    def add_convt(p):
        name = convt_name()
        layer_specs.append(
            (name, [(f"{name}/kernel:0", np.asarray(p["w"])), (f"{name}/bias:0", np.asarray(p["b"]))])
        )

    def add_bn(p):
        name = bn_name()
        layer_specs.append(
            (
                name,
                [
                    (f"{name}/gamma:0", np.asarray(p["gamma"])),
                    (f"{name}/beta:0", np.asarray(p["beta"])),
                    (f"{name}/moving_mean:0", np.asarray(p["mean"])),
                    (f"{name}/moving_variance:0", np.asarray(p["var"])),
                ],
            )
        )

    for d in range(DEPTH):
        add_conv(params["down"][d]["conv1"])
        add_conv(params["down"][d]["conv2"])
        add_bn(params["down"][d]["bn"])
    for d in range(DEPTH - 2, -1, -1):
        add_convt(params["up"][d]["convT"])
        add_conv(params["up"][d]["conv1"])
        add_conv(params["up"][d]["conv2"])
        add_bn(params["up"][d]["bn"])
    add_conv(params["final"])

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([s[0].encode() for s in layer_specs])
        for lname, weights in layer_specs:
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array([wn.encode() for wn, _ in weights])
            for wn, arr in weights:
                g.create_dataset(wn, data=arr)
