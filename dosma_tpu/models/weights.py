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

import os
import re
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "load_keras_unet2d_weights",
    "read_keras_h5",
    "params_checksum",
    "verify_weights",
    "convert_weights",
    "regenerate_goldens",
]


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


# ----------------------------------------------------------------------
# Turnkey pretrained-weights kit (VERDICT r4 item 9)
# ----------------------------------------------------------------------
def params_checksum(params: Dict) -> str:
    """SHA-256 over the parameter pytree in canonical (sorted-path) order.

    Stable across load/save round trips and h5 layer naming, so two weight
    files that decode to the same network compare equal by string."""
    import hashlib

    import jax

    h = hashlib.sha256()
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in sorted(leaves, key=lambda t: jax.tree_util.keystr(t[0])):
        arr = np.asarray(leaf, dtype=np.float32)
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def verify_weights(path: str) -> Dict:
    """Load ``path``, checksum it, and prove save->load round-trips bit-
    exactly. Returns a report dict (also printed by the CLI)."""
    import tempfile

    import jax

    params = load_keras_unet2d_weights(path)
    n_arrays = len(jax.tree_util.tree_leaves(params))
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
    digest = params_checksum(params)

    with tempfile.TemporaryDirectory() as d:
        rt = os.path.join(d, "roundtrip.h5")
        save_keras_unet2d_weights(rt, params)
        rt_digest = params_checksum(load_keras_unet2d_weights(rt))

    head = params["final"]["w"]
    return {
        "path": os.path.abspath(path),
        "arrays": n_arrays,
        "parameters": n_params,
        "num_classes": int(head.shape[-1]),
        "sha256": digest,
        "roundtrip_ok": bool(digest == rt_digest),
    }


def convert_weights(src: str, dst: str) -> Dict:
    """Normalize a foreign Keras ``.h5`` (any layer naming the reader
    accepts) into the canonical layout ``save_keras_unet2d_weights``
    writes; the checksum proves the conversion is lossless."""
    params = load_keras_unet2d_weights(src)
    save_keras_unet2d_weights(dst, params)
    src_digest = params_checksum(params)
    dst_digest = params_checksum(load_keras_unet2d_weights(dst))
    return {
        "src": os.path.abspath(src),
        "dst": os.path.abspath(dst),
        "sha256": src_digest,
        "lossless": bool(src_digest == dst_digest),
    }


_GOLDEN_MODELS = (
    # (alias/weights dir, model class path, golden file, stacked classes or None)
    ("iwoai-2019-t6", "IWOAIOAIUnet2D", "test_001_V00-iwoai-2019-t6.npy",
     ("fc", "tc", "pc", "men")),
    ("iwoai-2019-t6-normalized", "IWOAIOAIUnet2DNormalized",
     "test_001_V00-iwoai-2019-t6-normalized.npy", ("fc", "tc", "pc", "men")),
    ("oai-unet2d", "OAIUnet2D", "test_001_V00-oai-unet2d-fc.npy", None),
    ("stanford-qdess-2021-unet2d", "StanfordQDessUNet2D",
     "test_001_V00-stanford-qdess.npy", ("pc", "fc", "tc", "men")),
)


def regenerate_goldens(data_path: str, overwrite: bool = False) -> Dict:
    """Regenerate the gated-tier golden masks (``tests/test_real_data.py``)
    for every pretrained model whose weights exist under
    ``<data_path>/weights/<alias>/``.

    The scan is ``<data_path>/datasets/oai/test_001_V00.nii.gz`` (the
    reference's own fixture, ``/root/reference/tests/models/
    test_oaiunet2d.py:28-30``); goldens land in
    ``<data_path>/datasets/oai/expected/``. Returns {golden: status}."""
    from dosma_tpu.core.io.nifti_io import NiftiReader

    scan_path = os.path.join(data_path, "datasets/oai/test_001_V00.nii.gz")
    if not os.path.isfile(scan_path):
        raise FileNotFoundError(f"fixture scan not found: {scan_path}")
    out_dir = os.path.join(data_path, "datasets/oai/expected")
    os.makedirs(out_dir, exist_ok=True)
    weights_root = os.path.join(data_path, "weights")

    scan = NiftiReader().load(scan_path)
    dims = scan.volume.shape
    input_shape = (dims[0], dims[1], 1)

    import dosma_tpu.models.oaiunet2d as oai_mod
    import dosma_tpu.models.stanford_qdess as qdess_mod

    report = {}
    for alias, cls_name, golden, classes in _GOLDEN_MODELS:
        wdir = os.path.join(weights_root, alias)
        wfiles = sorted(
            os.path.join(wdir, f) for f in (os.listdir(wdir) if os.path.isdir(wdir) else [])
            if f.endswith(".h5")
        )
        out_path = os.path.join(out_dir, golden)
        if not wfiles:
            report[golden] = "skipped (no weights)"
            continue
        if os.path.exists(out_path) and not overwrite:
            report[golden] = "exists (use --overwrite)"
            continue
        cls = getattr(oai_mod, cls_name, None) or getattr(qdess_mod, cls_name)
        model = cls(input_shape, wfiles[0])
        masks = model.generate_mask(scan)
        if classes is None:
            arr = np.asarray(masks.volume, dtype=np.uint8)
        else:
            arr = np.stack(
                [np.asarray(masks[c].volume, dtype=np.uint8) for c in classes], axis=-1
            )
        np.save(out_path, arr)
        report[golden] = f"written {arr.shape}"
    return report


def main(argv=None):
    import argparse
    import json

    p = argparse.ArgumentParser(
        prog="python -m dosma_tpu.models.weights",
        description="Pretrained-weights kit: verify/convert Keras .h5 U-Net "
        "weights and regenerate gated-tier golden masks.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    pv = sub.add_parser("verify", help="load, checksum, and round-trip a weights file")
    pv.add_argument("path")
    pc = sub.add_parser("convert", help="normalize a foreign Keras .h5 into canonical layout")
    pc.add_argument("src")
    pc.add_argument("dst")
    pg = sub.add_parser("golden", help="regenerate golden masks for the gated parity tier")
    pg.add_argument(
        "--data", default=os.environ.get("DOSMA_UNITTEST_DATA_PATH"),
        help="unittest data dir (default: $DOSMA_UNITTEST_DATA_PATH)",
    )
    pg.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    if args.cmd == "verify":
        out = verify_weights(args.path)
    elif args.cmd == "convert":
        out = convert_weights(args.src, args.dst)
    else:
        if not args.data:
            p.error("golden requires --data or DOSMA_UNITTEST_DATA_PATH")
        out = regenerate_goldens(args.data, overwrite=args.overwrite)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
