"""Segmentation-model training on TPU meshes (capability extension).

The reference ships only pretrained Keras weights — no training loop. A
production TPU framework needs one: this module trains the
:mod:`dosma_tpu.models.unet2d` backbone with Dice+BCE loss, sharded over a
2-D ``(data, model)`` mesh:

- **data parallelism**: the slice batch is sharded over the ``data`` axis;
  gradient all-reduce is inserted by XLA (rides ICI),
- **tensor parallelism**: wide conv kernels/biases are sharded over output
  channels on the ``model`` axis (512/1024-feature encoder levels),

so one ``jit`` of the train step compiles to SPMD across the whole mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dosma_tpu.models.unet2d import init_unet2d_params, unet2d_forward

__all__ = ["dice_bce_loss", "make_sharded_train_step", "SegTrainer", "param_shardings"]

# Shard conv output channels over the model axis once they are at least
# this wide (keeps small kernels replicated — no benefit below VPU width).
_TP_MIN_CHANNELS = 256


def dice_bce_loss(probs: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Soft-Dice + binary cross-entropy (standard segmentation objective)."""
    probs = jnp.clip(probs, eps, 1 - eps)
    bce = -jnp.mean(labels * jnp.log(probs) + (1 - labels) * jnp.log(1 - probs))
    intersect = jnp.sum(probs * labels)
    denom = jnp.sum(probs) + jnp.sum(labels)
    dice = 1.0 - (2 * intersect + eps) / (denom + eps)
    return bce + dice


def param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """NamedShardings for the U-Net pytree: wide conv kernels sharded over
    output channels on ``model_axis``; everything else replicated."""

    def spec_for(path_leaf: jnp.ndarray):
        shape = path_leaf.shape
        if len(shape) == 4 and shape[-1] >= _TP_MIN_CHANNELS:
            # (kh, kw, cin, cout) or Keras-transpose (kh, kw, cout, cin):
            # shard the last axis — valid for both (they are >=256 wide
            # only at levels where both channel dims are wide).
            return NamedSharding(mesh, P(None, None, None, model_axis))
        if len(shape) == 1 and shape[0] >= _TP_MIN_CHANNELS:
            return NamedSharding(mesh, P(model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def make_sharded_train_step(
    mesh: Mesh,
    learning_rate: float = 1e-3,
    data_axis: str = "data",
    model_axis: str = "model",
    num_classes: int = 1,
    features=None,
):
    """Build (params, opt_state, train_step) with mesh shardings applied.

    The returned ``train_step(params, opt_state, images, labels)`` is a
    jitted SPMD program: images/labels sharded over ``data_axis``, params
    per :func:`param_shardings`.
    """
    optimizer = optax.adam(learning_rate)
    params = init_unet2d_params(
        jax.random.PRNGKey(0), num_classes=num_classes, features=features
    )
    p_shardings = param_shardings(params, mesh, model_axis)
    params = jax.device_put(params, p_shardings)

    opt_state = optimizer.init(params)
    # Optimizer state mirrors param shapes; place its array leaves likewise.
    opt_shardings = jax.tree_util.tree_map(
        lambda leaf: (
            param_shardings({"x": leaf}, mesh, model_axis)["x"]
            if hasattr(leaf, "shape")
            else None
        ),
        opt_state,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    opt_state = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s) if s is not None else leaf,
        opt_state,
        opt_shardings,
        is_leaf=lambda x: hasattr(x, "shape"),
    )

    batch_sharding = NamedSharding(mesh, P(data_axis, None, None, None))

    def loss_fn(p, images, labels):
        probs = unet2d_forward(p, images)
        return dice_bce_loss(probs, labels)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, images, labels)
        updates, state = optimizer.update(grads, state, p)
        p = optax.apply_updates(p, updates)
        return p, state, loss

    def place_batch(images: np.ndarray, labels: np.ndarray):
        return (
            jax.device_put(jnp.asarray(images, jnp.float32), batch_sharding),
            jax.device_put(jnp.asarray(labels, jnp.float32), batch_sharding),
        )

    return params, opt_state, train_step, place_batch


class SegTrainer:
    """Minimal high-level trainer for U-Net segmentation on a device mesh."""

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        learning_rate: float = 1e-3,
        num_classes: int = 1,
        features=None,
    ):
        if mesh is None:
            devices = np.asarray(jax.devices())
            n = devices.size
            model_par = 2 if n % 2 == 0 and n >= 2 else 1
            mesh = Mesh(devices.reshape(n // model_par, model_par), ("data", "model"))
        self.mesh = mesh
        (
            self.params,
            self.opt_state,
            self._train_step,
            self._place_batch,
        ) = make_sharded_train_step(
            mesh, learning_rate, num_classes=num_classes, features=features
        )

    def step(self, images: np.ndarray, labels: np.ndarray) -> float:
        """One optimization step; returns the loss."""
        images, labels = self._place_batch(images, labels)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, images, labels
        )
        return float(loss)
