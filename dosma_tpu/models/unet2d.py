"""2D U-Net forward pass in pure JAX (the DOSMA segmentation backbone).

Exact functional re-implementation of the Keras graph in
``/root/reference/dosma/models/oaiunet2d.py:56-144``:

- 6 depths, features ``32 * 2^d``
- per block: two 3x3 same convs (ReLU) then BatchNorm(momentum .95, eps .001)
- odd-size-aware pooling: 2x2/stride-2 when the height is even, 3x3/stride-3
  when odd (Keras MaxPooling2D default strides == pool_size)
- decoder: 3x3 transpose-conv with matching stride, concat [up, skip],
  two convs + BN
- 1x1 sigmoid head with ``num_classes`` channels.

Weights come from the reference's Keras ``.h5`` files via
:mod:`dosma_tpu.models.weights` so pretrained models produce identical masks.
Transpose convolution reproduces TF's ``SAME`` semantics via an
input-dilated correlation with the spatially-flipped kernel (validated
against ``torch.nn.functional.conv_transpose2d`` in tests).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_unet2d_params", "unet2d_forward", "unet2d_predict_mask", "Unet2D"]

DEPTH = 6
FEATURES = [32 * 2**d for d in range(DEPTH)]


def _conv_same(x, w, b):
    """3x3 (or 1x1) SAME conv, NHWC x HWIO."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _conv_transpose_same(x, w_keras, b, stride: int):
    """TF/Keras ``Conv2DTranspose(k=3, strides=s, padding='same')``.

    ``w_keras``: (kh, kw, out_ch, in_ch) — Keras transpose-conv layout.
    Computed as the gradient-of-conv: dilate input by ``s``, full-pad,
    correlate with the spatially flipped kernel, then crop to ``H*s``.
    """
    k = w_keras.shape[0]
    # flip spatial dims; reorder to HWIO with in=x channels.
    w = jnp.flip(w_keras, axis=(0, 1))  # (kh, kw, out, in)
    w = jnp.transpose(w, (0, 1, 3, 2))  # (kh, kw, in, out)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(k - 1, k - 1), (k - 1, k - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Crop SAME region: pad_before = (k - s) // 2 (=0 for k=3, s in {2,3}).
    pb = (k - stride) // 2
    H = x.shape[1] * stride
    W = x.shape[2] * stride
    out = out[:, pb : pb + H, pb : pb + W, :]
    return out + b


def _batchnorm(x, bn):
    """Inference-mode BN with stored moving statistics (eps=1e-3, Keras default)."""
    gamma, beta, mean, var = bn["gamma"], bn["beta"], bn["mean"], bn["var"]
    inv = jax.lax.rsqrt(var + 1e-3)
    return (x - mean) * inv * gamma + beta


def _maxpool(x, size: int):
    """Keras MaxPooling2D(pool_size=s) — stride s, VALID padding."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, size, size, 1),
        padding="VALID",
    )


def init_unet2d_params(
    rng: jax.Array, in_channels: int = 1, num_classes: int = 1, features=None
) -> Dict:
    """He-normal initialized parameter pytree (for tests / training).

    ``features`` overrides the per-depth channel widths (default: the
    reference architecture's ``32 * 2^d`` for 6 depths); shorter lists give
    proportionally shallower U-Nets — :func:`unet2d_forward` derives depth
    from the pytree, so any width list round-trips.
    """
    features = list(FEATURES if features is None else features)
    depth = len(features)

    def he_conv(key, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * np.sqrt(2.0 / fan_in)

    keys = iter(jax.random.split(rng, 64))
    params = {"down": [], "up": [], "final": None}
    cin = in_channels
    for d in range(depth):
        f = features[d]
        block = {
            "conv1": {"w": he_conv(next(keys), 3, 3, cin, f), "b": jnp.zeros((f,))},
            "conv2": {"w": he_conv(next(keys), 3, 3, f, f), "b": jnp.zeros((f,))},
            "bn": {
                "gamma": jnp.ones((f,)), "beta": jnp.zeros((f,)),
                "mean": jnp.zeros((f,)), "var": jnp.ones((f,)),
            },
        }
        params["down"].append(block)
        cin = f
    for d in range(depth - 2, -1, -1):
        f = features[d]
        # The previous decoder (or bottleneck) block outputs features[d+1] ch.
        f_in = features[d + 1]
        # Keras transpose kernel layout: (kh, kw, out, in).
        wt = jnp.transpose(he_conv(next(keys), 3, 3, f_in, f), (0, 1, 3, 2))
        block = {
            "convT": {"w": wt, "b": jnp.zeros((f,))},
            "conv1": {"w": he_conv(next(keys), 3, 3, 2 * f, f), "b": jnp.zeros((f,))},
            "conv2": {"w": he_conv(next(keys), 3, 3, f, f), "b": jnp.zeros((f,))},
            "bn": {
                "gamma": jnp.ones((f,)), "beta": jnp.zeros((f,)),
                "mean": jnp.zeros((f,)), "var": jnp.ones((f,)),
            },
        }
        params["up"].insert(0, block)
    params["final"] = {
        "w": he_conv(next(keys), 1, 1, features[0], num_classes),
        "b": jnp.zeros((num_classes,)),
    }
    return params


def unet2d_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass. ``x``: (B, H, W, C) → sigmoid probabilities (B, H, W, num_classes)."""
    depth = len(params["down"])
    skips = []
    h = x
    for d in range(depth):
        blk = params["down"][d]
        h = jax.nn.relu(_conv_same(h, blk["conv1"]["w"], blk["conv1"]["b"]))
        h = jax.nn.relu(_conv_same(h, blk["conv2"]["w"], blk["conv2"]["b"]))
        h = _batchnorm(h, blk["bn"])
        skips.append(h)
        if d < depth - 1:
            size = 2 if h.shape[1] % 2 == 0 else 3
            h = _maxpool(h, size)

    for d in range(depth - 2, -1, -1):
        blk = params["up"][d]
        target = skips[d]
        stride = 2 if target.shape[1] % 2 == 0 else 3
        up = _conv_transpose_same(h, blk["convT"]["w"], blk["convT"]["b"], stride)
        if up.shape[1] != target.shape[1] or up.shape[2] != target.shape[2]:
            raise ValueError(
                f"U-Net size mismatch at depth {d}: upsampled {up.shape[1:3]} vs skip "
                f"{target.shape[1:3]}. Input spatial dims must survive the reference's "
                f"even/odd pooling schedule (e.g. 256, 384, 288)."
            )
        h = jnp.concatenate([up, target], axis=3)
        h = jax.nn.relu(_conv_same(h, blk["conv1"]["w"], blk["conv1"]["b"]))
        h = jax.nn.relu(_conv_same(h, blk["conv2"]["w"], blk["conv2"]["b"]))
        h = _batchnorm(h, blk["bn"])

    logits = _conv_same(h, params["final"]["w"], params["final"]["b"])
    return jax.nn.sigmoid(logits)


@jax.jit
def unet2d_predict_mask(params, chunk, mean, std, threshold):
    """Fused device-side inference → binary mask.

    Minimizes host↔device traffic for segmentation: ``chunk`` is uploaded
    in its SOURCE dtype (DICOM pixel data is uint16 — half the bytes of
    f32), whitening ``(x - mean) / std`` happens on device, and only the
    thresholded ``uint8`` mask comes back (4x smaller than f32
    probabilities). The reference round-trips f32 both ways
    (``oaiunet2d.py:146-171``).
    """
    x = (chunk.astype(jnp.float32) - mean) / std
    # Match the parameter precision (bfloat16 inference casts x down too).
    x = x.astype(jax.tree_util.tree_leaves(params)[0].dtype)
    probs = unet2d_forward(params, x)
    return (probs > threshold.astype(probs.dtype)).astype(jnp.uint8)


@jax.jit
def unet2d_predict_mask_packed(params, chunk, mean, std, threshold):
    """:func:`unet2d_predict_mask` with the class axis packed into bits.

    The C binary class masks of each pixel collapse into one ``uint8``
    bitfield (bit c = class c) — a C× smaller device→host readback, the
    dominant cost of full-volume segmentation on tunneled rigs. Host side
    unpacks with ``(packed >> c) & 1``.
    """
    m = unet2d_predict_mask(params, chunk, mean, std, threshold)  # (B, H, W, C)
    weights = (1 << jnp.arange(m.shape[-1], dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint8)  # (B, H, W)


@functools.partial(jax.jit, static_argnames=("bits_per_px",))
def unet2d_predict_mask_subbyte(params, chunk, mean, std, threshold, *, bits_per_px):
    """:func:`unet2d_predict_mask_packed` packed below one byte per pixel.

    With C classes only ``bits_per_px`` (1/2/4) bits of each pixel's
    bitfield are live, so ``8 // bits_per_px`` adjacent row pixels pack
    into one byte — the D2H readback hits its information floor (8× less
    for a single-class head, 2× for the 4-class IWOAI head).
    Returns ``(B, H, W * bits_per_px // 8)`` uint8.
    """
    m = unet2d_predict_mask_packed(params, chunk, mean, std, threshold)
    ppb = 8 // bits_per_px
    b, h, w = m.shape
    m = m.reshape(b, h, w // ppb, ppb)
    shifts = (jnp.arange(ppb, dtype=jnp.uint8) * jnp.uint8(bits_per_px)).astype(jnp.uint8)
    return jnp.sum(m << shifts, axis=-1, dtype=jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("batch_size", "bits_per_px", "whiten", "whiten_eps")
)
def unet2d_segment_volume(params, vol, threshold, *, batch_size: int,
                          bits_per_px: int, whiten: bool, whiten_eps: float):
    """The ENTIRE volume-segmentation device path as ONE program.

    ``vol``: (H, W, S) device array in its source dtype. Inside the
    program: f32 cast, whole-volume whitening stats (optional), the
    slice-major transpose, slab padding, a ``lax.map`` over batches of
    the fused forward+threshold+subbyte-pack kernel. One dispatch + one
    packed D2H replace the eager chain (stats, transpose, N batch
    programs) whose per-dispatch tunnel RTT (~27 ms each) dominated the
    bilateral pipeline's segment stage.
    """
    x = vol.astype(jnp.float32)
    if whiten:
        mean = jnp.mean(x)
        std = jnp.std(x) + jnp.float32(whiten_eps)
    else:
        mean = jnp.float32(0.0)
        std = jnp.float32(1.0)
    v = jnp.transpose(x, (2, 0, 1))[..., None]  # (S, H, W, 1)
    s = v.shape[0]
    nb = -(-s // batch_size)
    pad = nb * batch_size - s
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
    slabs = v.reshape(nb, batch_size, *v.shape[1:])
    thr = jnp.asarray(threshold, jnp.float32)

    def one(slab):
        return unet2d_predict_mask_subbyte(
            params, slab, mean, std, thr, bits_per_px=bits_per_px
        )

    out = jax.lax.map(one, slabs)  # (nb, B, H, W * bpp / 8)
    return out.reshape(nb * batch_size, *out.shape[2:])[:s]


class Unet2D:
    """Holds U-Net params + a jitted forward; mirrors the Keras Model surface."""

    def __init__(
        self,
        input_shape: Tuple[int, int, int],
        num_classes: int = 1,
        precision: str = "float32",
    ):
        if not isinstance(input_shape, tuple) or len(input_shape) != 3 or input_shape[2] != 1:
            raise ValueError("input_size must be a tuple of size (height, width, 1)")
        if precision not in ("float32", "bfloat16"):
            raise ValueError("precision must be 'float32' or 'bfloat16'")
        self.input_shape = input_shape
        self.num_classes = num_classes
        # bfloat16 runs convs MXU-native (~15% faster, max prob delta ~7e-3
        # vs float32 on this backbone); float32 is the bit-parity default.
        self.precision = precision
        # Parameters materialize lazily: every pretrained-model path calls
        # load_weights immediately, so generating ~31M random weights in
        # __init__ would be pure startup waste.
        self._params = None
        self._forward = jax.jit(unet2d_forward)
        self._bf16_params = None  # cast lazily, cached per weight load

    @property
    def params(self):
        if self._params is None:
            self._params = init_unet2d_params(
                jax.random.PRNGKey(0),
                in_channels=self.input_shape[2],
                num_classes=self.num_classes,
            )
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._bf16_params = None

    def load_weights(self, weights_path: str):
        from dosma_tpu.models.weights import load_keras_unet2d_weights

        self.params = load_keras_unet2d_weights(weights_path)

    def _inference_params(self):
        """Parameters at the model precision; the bfloat16 copy is cast once
        per weight load, not per predict call (the cast walks the whole
        tree on device)."""
        if self.precision != "bfloat16":
            return self.params
        if self._bf16_params is None:
            self._bf16_params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), self.params
            )
        return self._bf16_params

    def predict(self, v: np.ndarray, batch_size: int = 16, verbose: int = 0) -> np.ndarray:
        """Batched inference over the leading axis (Keras ``model.predict`` surface).

        Chunks are padded to ``batch_size`` so only one XLA program is compiled.
        """
        n = v.shape[0]
        params = self._inference_params()
        in_dtype = jnp.bfloat16 if self.precision == "bfloat16" else jnp.float32
        outs = []
        for start in range(0, n, batch_size):
            chunk = v[start : start + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out = self._forward(params, jnp.asarray(chunk, in_dtype))
            out = np.asarray(out.astype(jnp.float32))
            if pad:
                out = out[:-pad]
            outs.append(out)
        return np.concatenate(outs, axis=0)

    def predict_mask_volume(
        self,
        vol,
        batch_size: int = 16,
        threshold: float = 0.5,
        whiten: bool = False,
        whiten_eps: float = 0.0,
    ):
        """Segment a DEVICE-resident (H, W, S) volume in ONE program.

        Returns the (S, H, W, C) uint8 mask on the host (the packed mask
        is the only D2H). Requires C <= 8 and W divisible by the subbyte
        packing factor; callers fall back to :meth:`predict_mask` when
        the constraints don't hold.
        """
        c = self.num_classes
        bits_per_px = 1 if c == 1 else (2 if c == 2 else (4 if c <= 4 else 8))
        px_per_byte = 8 // bits_per_px
        if c > 8 or (px_per_byte > 1 and vol.shape[1] % px_per_byte != 0):
            raise ValueError("predict_mask_volume constraints not met")
        params = self._inference_params()
        packed = unet2d_segment_volume(
            params, vol, jnp.float32(threshold),
            batch_size=int(batch_size), bits_per_px=bits_per_px,
            whiten=bool(whiten), whiten_eps=float(whiten_eps),
        )
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        host = np.asarray(packed)
        s, h = host.shape[0], host.shape[1]
        out = np.unpackbits(host[..., None], axis=-1, bitorder="little")
        if px_per_byte > 1:
            return out.reshape(s, h, vol.shape[1], bits_per_px)[..., :c]
        return out.reshape(s, h, vol.shape[1], 8)[..., :c]

    def predict_mask(
        self,
        v: np.ndarray,
        batch_size: int = 16,
        threshold: float = 0.5,
        mean: float = 0.0,
        std: float = 1.0,
    ) -> np.ndarray:
        """Batched inference returning the thresholded uint8 mask.

        Transfer-minimizing path: slices go up in their source dtype
        (uint16 DICOM pixels stay uint16), whitening and thresholding run
        on device, and only uint8 masks come back — ~3x less H2D+D2H than
        :meth:`predict` + host thresholding.
        """
        import jax

        n = v.shape[0]
        params = self._inference_params()
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        thr = jnp.asarray(threshold, jnp.float32)
        device_in = isinstance(v, jax.Array)
        xp = jnp if device_in else np

        # Dispatch ALL batches first (H2D + compute are async), then read
        # back: upload of batch k+1 and compute overlap the readback of
        # batch k instead of serializing H2D → compute → D2H per batch.
        # Bit-packing needs every class to fit one uint8 (C <= 8); wider
        # heads return the plain per-class mask.
        c = self.num_classes
        pack = c <= 8
        # Sub-byte pixel packing: with c live bits per pixel, 8 // bits
        # adjacent row pixels share a byte — D2H at the information floor.
        bits_per_px = 1 if c == 1 else (2 if c == 2 else (4 if c <= 4 else 8))
        px_per_byte = 8 // bits_per_px
        subbyte = pack and px_per_byte > 1 and v.shape[2] % px_per_byte == 0
        predict = unet2d_predict_mask_packed if pack else unet2d_predict_mask
        dev_outs = []
        pads = []
        for start in range(0, n, batch_size):
            chunk = v[start : start + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = xp.concatenate(
                    [chunk, xp.zeros((pad,) + tuple(chunk.shape[1:]), chunk.dtype)]
                )
            if not device_in:
                chunk = jnp.asarray(chunk)
            if subbyte:
                out = unet2d_predict_mask_subbyte(
                    params, chunk, mean, std, thr, bits_per_px=bits_per_px
                )
            else:
                out = predict(params, chunk, mean, std, thr)
            # Start the D2H for this batch immediately: jax dispatch is
            # async, so the transfer of batch k's packed mask overlaps the
            # forward compute of batch k+1 (double-buffered inference —
            # the wall approaches max(compute, transfer) instead of their
            # sum).
            if hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()
            dev_outs.append(out)
            if not pack:
                pads.append(pad)

        if pack:
            # Per-batch overlapped readbacks of the (sub-)byte-packed
            # masks land in order; the host-side concat of a few MB of
            # packed bytes is noise next to the transfers it overlaps.
            host_outs = [np.asarray(o) for o in dev_outs]
            packed = (
                host_outs[0] if len(host_outs) == 1 else np.concatenate(host_outs)
            )[:n]
            # Single C-level unpack (np.unpackbits is ~10x the shift/mask
            # loop on this host): little-endian bit order matches the
            # device-side packing (bit b of each lane = class b).
            if subbyte:
                # Each byte holds px_per_byte pixel lanes of bits_per_px
                # bits; unpacking all 8 bits little-endian and reshaping
                # (..., px_per_byte, bits_per_px) lands every pixel's class
                # bits in the last axis directly.
                out = np.unpackbits(packed[..., None], axis=-1, bitorder="little")
                return out.reshape(n, v.shape[1], v.shape[2], bits_per_px)[..., :c]
            return np.unpackbits(packed[..., None], axis=-1, bitorder="little", count=c)

        outs = []
        for out, pad in zip(dev_outs, pads):
            o = np.asarray(out)
            if pad:
                o = o[:-pad]
            outs.append(o)
        return np.concatenate(outs, axis=0)
