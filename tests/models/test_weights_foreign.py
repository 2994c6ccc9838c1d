"""Foreign Keras-2.4 ``.h5`` fixture for the weight converter (VERDICT r3
next-4): the converter must parse a file shaped exactly like
``keras.Model.save`` output — NOT one produced by our own
``save_keras_unet2d_weights`` writer — including:

- weights nested under a ``model_weights`` group with ``backend`` /
  ``keras_version`` attrs (full ``model.save`` layout, ref loading site
  ``/root/reference/dosma/models/seg_model.py:87-92``),
- fixed-length bytes (``S``-dtype) attr arrays,
- weightless layer groups (InputLayer, MaxPooling2D, Concatenate) with
  empty ``weight_names``,
- NON-sequential layer-name suffixes (a model built after others in a
  Keras session numbers its layers ``conv2d_37``, ``conv2d_38``, ...),
- HDF5 groups created in SHUFFLED order (model order lives only in the
  ``layer_names`` attr),
- nested weight paths (``conv2d_37/kernel:0`` resolves through a
  same-named subgroup).

Every weight array encodes its (kind, ordinal) as values, so any
ordering, naming, or attrs bug maps to a concrete wrong number.
"""

import numpy as np
import pytest

from dosma_tpu.models.unet2d import DEPTH
from dosma_tpu.models.weights import load_keras_unet2d_weights

h5py = pytest.importorskip("h5py")

# Keras session-order suffix offsets (deliberately non-zero, distinct).
CONV_OFF = 37
CONVT_OFF = 8
BN_OFF = 12
POOL_OFF = 5
CONCAT_OFF = 2


def _conv_spec(k):
    name = f"conv2d_{CONV_OFF + k}"
    return (
        name,
        [
            (f"{name}/kernel:0", np.full((3, 3, 2, 2), 100.0 + k, np.float32)),
            (f"{name}/bias:0", np.full((2,), 100.0 + k, np.float32)),
        ],
    )


def _convt_spec(t):
    name = f"conv2d_transpose_{CONVT_OFF + t}"
    return (
        name,
        [
            (f"{name}/kernel:0", np.full((2, 2, 2, 2), 200.0 + t, np.float32)),
            (f"{name}/bias:0", np.full((2,), 200.0 + t, np.float32)),
        ],
    )


def _bn_spec(b):
    name = f"batch_normalization_{BN_OFF + b}"
    return (
        name,
        [
            (f"{name}/gamma:0", np.full((2,), 300.0 + b, np.float32)),
            (f"{name}/beta:0", np.full((2,), 310.0 + b, np.float32)),
            (f"{name}/moving_mean:0", np.full((2,), 320.0 + b, np.float32)),
            (f"{name}/moving_variance:0", np.full((2,), 330.0 + b, np.float32)),
        ],
    )


def _model_order_specs():
    """Layer list in Keras creation order for the reference U-Net graph
    (encoder conv/conv/bn/pool x6, decoder convT/concat/conv/conv/bn x5,
    1x1 head — ref ``oaiunet2d.py:56-144``)."""
    specs = [("input_1", [])]
    ci = bi = ti = pi = cc = 0
    for d in range(DEPTH):
        specs.append(_conv_spec(ci)); ci += 1
        specs.append(_conv_spec(ci)); ci += 1
        specs.append(_bn_spec(bi)); bi += 1
        if d < DEPTH - 1:
            specs.append((f"max_pooling2d_{POOL_OFF + pi}", [])); pi += 1
    for _ in range(DEPTH - 1):
        specs.append(_convt_spec(ti)); ti += 1
        specs.append((f"concatenate_{CONCAT_OFF + cc}", [])); cc += 1
        specs.append(_conv_spec(ci)); ci += 1
        specs.append(_conv_spec(ci)); ci += 1
        specs.append(_bn_spec(bi)); bi += 1
    specs.append(_conv_spec(ci))
    return specs


def _write_foreign_h5(path, specs, shuffle_seed=3):
    """Byte-faithful Keras 2.4 ``model.save`` weights section."""
    rs = np.random.RandomState(shuffle_seed)
    order = rs.permutation(len(specs))
    with h5py.File(path, "w") as f:
        f.attrs["keras_version"] = np.bytes_("2.4.0")
        f.attrs["backend"] = np.bytes_("tensorflow")
        mw = f.create_group("model_weights")
        mw.attrs["backend"] = np.bytes_("tensorflow")
        mw.attrs["keras_version"] = np.bytes_("2.4.0")
        mw.attrs["layer_names"] = np.array([s[0].encode() for s in specs], dtype="S")
        # Groups land on disk in SHUFFLED order — only layer_names has
        # the model order.
        for i in order:
            lname, weights = specs[i]
            g = mw.create_group(lname)
            if weights:
                g.attrs["weight_names"] = np.array(
                    [wn.encode() for wn, _ in weights], dtype="S"
                )
            else:
                g.attrs["weight_names"] = np.array([], dtype="S1")
            for wn, arr in weights:
                # "conv2d_37/kernel:0" creates the nested same-named
                # subgroup exactly like Keras does.
                g.create_dataset(wn, data=arr)


class TestForeignKerasH5:
    def test_converter_maps_every_slot(self, tmp_path):
        path = str(tmp_path / "foreign_keras24.h5")
        _write_foreign_h5(path, _model_order_specs())
        params = load_keras_unet2d_weights(path)

        # Encoder: conv ordinals 0,1 / 2,3 / ... and bn ordinals 0..5.
        for d in range(DEPTH):
            blk = params["down"][d]
            assert float(blk["conv1"]["w"][0, 0, 0, 0]) == 100.0 + 2 * d
            assert float(blk["conv2"]["b"][0]) == 100.0 + 2 * d + 1
            assert float(blk["bn"]["gamma"][0]) == 300.0 + d
            assert float(blk["bn"]["var"][0]) == 330.0 + d
        # Decoder was created from depth-2 down to 0: convT ordinal ti maps
        # to up[DEPTH-2-ti]; conv ordinals continue from 2*DEPTH.
        ci = 2 * DEPTH
        for ti, d in enumerate(range(DEPTH - 2, -1, -1)):
            blk = params["up"][d]
            assert float(blk["convT"]["w"][0, 0, 0, 0]) == 200.0 + ti
            assert float(blk["conv1"]["w"][0, 0, 0, 0]) == 100.0 + ci
            assert float(blk["conv2"]["w"][0, 0, 0, 0]) == 100.0 + ci + 1
            assert float(blk["bn"]["beta"][0]) == 310.0 + DEPTH + ti
            ci += 2
        # 1x1 head is the last conv.
        assert float(params["final"]["w"][0, 0, 0, 0]) == 100.0 + ci

    def test_group_shuffle_invariance(self, tmp_path):
        """Two files with different on-disk group orders load identically."""
        import jax

        p1 = str(tmp_path / "a.h5")
        p2 = str(tmp_path / "b.h5")
        specs = _model_order_specs()
        _write_foreign_h5(p1, specs, shuffle_seed=3)
        _write_foreign_h5(p2, specs, shuffle_seed=17)
        t1 = load_keras_unet2d_weights(p1)
        t2 = load_keras_unet2d_weights(p2)
        for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_save_weights_layout_no_model_weights_group(self, tmp_path):
        """``model.save_weights`` writes layers at the FILE root (no
        ``model_weights`` wrapper) — same attrs conventions."""
        path = str(tmp_path / "root_layout.h5")
        specs = _model_order_specs()
        rs = np.random.RandomState(7)
        with h5py.File(path, "w") as f:
            f.attrs["layer_names"] = np.array([s[0].encode() for s in specs], dtype="S")
            f.attrs["backend"] = np.bytes_("tensorflow")
            f.attrs["keras_version"] = np.bytes_("2.4.0")
            for i in rs.permutation(len(specs)):
                lname, weights = specs[i]
                g = f.create_group(lname)
                g.attrs["weight_names"] = np.array(
                    [wn.encode() for wn, _ in weights], dtype="S" if weights else "S1"
                )
                for wn, arr in weights:
                    g.create_dataset(wn, data=arr)
        params = load_keras_unet2d_weights(path)
        assert float(params["down"][0]["conv1"]["w"][0, 0, 0, 0]) == 100.0


class TestWeightsKit:
    """Turnkey kit (VERDICT r4 item 9): verify/convert CLI over synthetic
    weight files; the golden-regen path is exercised by the gated tier."""

    def _fresh_h5(self, tmp_path, name="w.h5", num_classes=4):
        import jax

        from dosma_tpu.models.unet2d import init_unet2d_params
        from dosma_tpu.models.weights import save_keras_unet2d_weights

        path = str(tmp_path / name)
        save_keras_unet2d_weights(
            path, init_unet2d_params(jax.random.PRNGKey(3), num_classes=num_classes)
        )
        return path

    def test_verify_roundtrip_and_checksum(self, tmp_path):
        from dosma_tpu.models.weights import verify_weights

        path = self._fresh_h5(tmp_path)
        rep = verify_weights(path)
        assert rep["roundtrip_ok"]
        assert rep["num_classes"] == 4
        assert len(rep["sha256"]) == 64
        # Same weights -> same digest; different weights -> different.
        assert verify_weights(path)["sha256"] == rep["sha256"]
        other = self._fresh_h5(tmp_path, "w1.h5", num_classes=1)
        assert verify_weights(other)["sha256"] != rep["sha256"]

    def test_convert_foreign_lossless(self, tmp_path):
        from dosma_tpu.models.weights import convert_weights, params_checksum
        from dosma_tpu.models.weights import load_keras_unet2d_weights

        src = str(tmp_path / "foreign.h5")
        _write_foreign_h5(src, _model_order_specs(), shuffle_seed=9)
        dst = str(tmp_path / "canonical.h5")
        rep = convert_weights(src, dst)
        assert rep["lossless"]
        assert params_checksum(load_keras_unet2d_weights(dst)) == rep["sha256"]

    def test_cli_verify(self, tmp_path, capsys):
        import json

        from dosma_tpu.models.weights import main

        path = self._fresh_h5(tmp_path)
        assert main(["verify", path]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["roundtrip_ok"] and rep["parameters"] > 10_000_000

    def test_golden_regen_synthetic(self, tmp_path):
        """End-to-end golden regen on a synthetic data dir: fixture scan +
        synthetic weights in two alias dirs -> goldens written with the
        gated tier's exact shapes/dtype."""
        import jax

        from dosma_tpu.core.io.nifti_io import NiftiWriter
        from dosma_tpu.core.med_volume import MedicalVolume
        from dosma_tpu.core.orientation import SAGITTAL, to_affine
        from dosma_tpu.models.unet2d import init_unet2d_params
        from dosma_tpu.models.weights import regenerate_goldens, save_keras_unet2d_weights

        data = tmp_path / "unittest-data"
        (data / "datasets/oai").mkdir(parents=True)
        rs = np.random.RandomState(0)
        vol = MedicalVolume(
            rs.rand(96, 96, 4).astype(np.float32) * 100,
            to_affine(SAGITTAL, (0.3, 0.3, 0.7)),
        )
        NiftiWriter().save(vol, str(data / "datasets/oai/test_001_V00.nii.gz"))

        wdir = data / "weights/iwoai-2019-t6-normalized"
        wdir.mkdir(parents=True)
        save_keras_unet2d_weights(
            str(wdir / "iwoai-2019-unet2d-normalized_fc-tc-pc-men_weights.h5"),
            init_unet2d_params(jax.random.PRNGKey(0), num_classes=4),
        )
        wdir1 = data / "weights/oai-unet2d"
        wdir1.mkdir(parents=True)
        save_keras_unet2d_weights(
            str(wdir1 / "oai-unet2d_fc_weights.h5"),
            init_unet2d_params(jax.random.PRNGKey(1), num_classes=1),
        )

        report = regenerate_goldens(str(data))
        assert report["test_001_V00-iwoai-2019-t6-normalized.npy"].startswith("written")
        assert report["test_001_V00-oai-unet2d-fc.npy"].startswith("written")
        assert report["test_001_V00-iwoai-2019-t6.npy"] == "skipped (no weights)"

        g4 = np.load(data / "datasets/oai/expected/test_001_V00-iwoai-2019-t6-normalized.npy")
        g1 = np.load(data / "datasets/oai/expected/test_001_V00-oai-unet2d-fc.npy")
        assert g4.shape == (96, 96, 4, 4) and g4.dtype == np.uint8
        assert g1.shape == (96, 96, 4) and g1.dtype == np.uint8
        assert set(np.unique(g4)) <= {0, 1} and set(np.unique(g1)) <= {0, 1}

        # Idempotence guard: refuses to clobber without --overwrite.
        report2 = regenerate_goldens(str(data))
        assert report2["test_001_V00-oai-unet2d-fc.npy"].startswith("exists")
