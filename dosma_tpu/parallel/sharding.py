"""Multi-device sharding for dosma_tpu (SPMD over a jax Mesh).

The reference's only scale-out mechanism is chunking voxels across worker
processes (``/root/reference/dosma/core/fitting.py:861-867``). The TPU-native
equivalent: shard the flattened voxel axis of a fit (or the slice axis of
inference) across devices with a ``NamedSharding`` and let XLA compile the
same program SPMD — collectives ride ICI automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "get_mesh",
    "shard_voxels",
    "sharded_lm_fit",
    "sharded_register_chain_batch",
    "sharded_unet_inference",
]


def get_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, 0
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, mode="edge"), pad


def shard_voxels(arr: np.ndarray, mesh: Mesh, axis_name: str = "data"):
    """Place a voxel-batched array (N, ...) with N sharded across the mesh.

    Pads N to a multiple of the mesh size (padding rows are fit like any
    other voxel and dropped by the caller via the returned pad count).
    """
    n_dev = mesh.devices.size
    arr, pad = _pad_to_multiple(np.asarray(arr), n_dev, axis=0)
    sharding = NamedSharding(mesh, P(axis_name, *([None] * (arr.ndim - 1))))
    return jax.device_put(arr, sharding), pad


def _is_library_model(model_fn, name: str) -> bool:
    """True when ``model_fn`` IS the library model function (identity only —
    a user function that merely shares the name may use a different
    parametrization, and silently fitting the wrong model would be far
    worse than taking the generic path)."""
    try:
        from dosma_tpu.core import fitting

        return model_fn is getattr(fitting, name)
    except (ImportError, AttributeError):  # pragma: no cover
        return False


def _is_monoexponential(model_fn) -> bool:
    return _is_library_model(model_fn, "monoexponential")


def _is_biexponential(model_fn) -> bool:
    return _is_library_model(model_fn, "biexponential")


def sharded_lm_fit(
    model_fn,
    x,
    y,
    p0,
    mesh: Optional[Mesh] = None,
    kernel: str = "auto",
    axis_name: str = "data",
    **kwargs,
):
    """Data-parallel version of :func:`dosma_tpu.ops.nlls.lm_fit`.

    ``y``: (N, T) host array; the voxel axis is sharded across the mesh.
    Everything inside the LM loop is elementwise in N or a reduction over
    the tiny T axis, so XLA compiles it without any cross-device
    communication — pure SPMD scaling.

    ``kernel`` selects the per-shard engine:

    - ``"auto"``: the fused Pallas kernel when ``model_fn`` is the library
      monoexponential or biexponential; otherwise the generic VMEM-resident
      Pallas kernel for traceable models with P <= 4 (falling back to the
      HBM-streaming engine when the model does not lower to Mosaic).
    - ``"pallas_monoexp"`` / ``"pallas_biexp"`` / ``"pallas_generic"``:
      force a Pallas kernel (each shard runs it under ``shard_map``; works
      in interpret mode on CPU for tests).
    - ``"generic"``: skip the library-model identity check (the generic
      Pallas kernel still applies when eligible).
    """
    from dosma_tpu.ops.monoexp_pallas import pallas_supported
    from dosma_tpu.ops.nlls import lm_fit

    if kernel not in ("auto", "pallas_monoexp", "pallas_biexp",
                      "pallas_generic", "generic"):
        raise ValueError(f"Unknown kernel {kernel!r}")
    if mesh is None:
        mesh = get_mesh()
    y = np.asarray(y)
    N = y.shape[0]

    y_sharded, pad = shard_voxels(y, mesh)
    p0 = np.asarray(p0)
    p0_is_per_voxel = p0.ndim == 2
    if p0_is_per_voxel:
        p0_sharded, _ = shard_voxels(p0, mesh)
    else:
        p0_sharded = p0

    if kernel == "auto" and pallas_supported():
        if _is_monoexponential(model_fn):
            kernel = "pallas_monoexp"
        elif _is_biexponential(model_fn):
            kernel = "pallas_biexp"
    if kernel in ("pallas_monoexp", "pallas_biexp"):
        popt, r2, converged = _shard_mapped_pallas(
            kernel, x, y_sharded, p0_sharded, mesh, axis_name, p0_is_per_voxel, **kwargs
        )
    else:
        import jax.numpy as jnp

        if _is_monoexponential(model_fn):
            # The library models are curve_fit-style (x, a, b, ...); lm_fit
            # wants model_fn(x_col, params_tuple).
            def model_fn(x_col, params):  # noqa: F811
                return params[0] * jnp.exp(params[1] * x_col)

        elif _is_biexponential(model_fn):
            def model_fn(x_col, params):  # noqa: F811
                return params[0] * jnp.exp(params[1] * x_col) + params[2] * jnp.exp(
                    params[3] * x_col
                )

        # Generic VMEM-resident Pallas kernel per shard for any traceable
        # model with P <= 4 (same engine order as the curve_fit facade);
        # Mosaic-incompatible models fall back to the HBM-streaming engine.
        P_n = p0.shape[-1] if p0.ndim else 0
        done = False
        # "pallas_generic" forces the kernel (tests run it in interpret
        # mode on CPU, where pallas_supported() is False).
        if kernel == "pallas_generic" or (
            pallas_supported() and 1 <= P_n <= 4
        ):
            try:
                popt, r2, converged = _shard_mapped_generic(
                    model_fn, x, y_sharded, p0_sharded, mesh, axis_name,
                    p0_is_per_voxel, **kwargs
                )
                done = True
            except Exception as e:  # Mosaic lowering / compile failure
                import warnings

                warnings.warn(
                    f"Sharded generic Pallas LM unavailable "
                    f"({type(e).__name__}); using the HBM-streaming engine."
                )
        if not done:
            popt, r2, converged = lm_fit(model_fn, x, y_sharded, p0_sharded, **kwargs)
    if pad:
        popt, r2, converged = popt[:N], r2[:N], converged[:N]
    return popt, r2, converged


def _shard_mapped_pallas(
    kernel: str, x, y_sharded, p0_sharded, mesh: Mesh, axis_name: str,
    p0_is_per_voxel: bool, **kwargs
):
    """Run a fused Pallas LM kernel per shard under ``shard_map``.

    The kernel is a ``pallas_call`` — XLA cannot auto-partition it from a
    NamedSharding alone, so each device runs the kernel on its local voxel
    block explicitly. No collectives: the fit is voxel-independent.
    """
    import jax.numpy as jnp
    from jax import shard_map

    if kernel == "pallas_monoexp":
        from dosma_tpu.ops.monoexp_pallas import _detect_uniform_x
        from dosma_tpu.ops.monoexp_pallas import monoexp_lm_pallas as kernel_fn

        # x is concrete here; inside shard_map it traces, so resolve the
        # uniform-spacing specialization before entering.
        kwargs.setdefault("uniform_x", _detect_uniform_x(x))
    else:
        from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas as kernel_fn

    x = jnp.asarray(x, jnp.float32)
    row = P(axis_name, *([None] * (y_sharded.ndim - 1)))

    def per_shard(y_local, p0_local):
        return kernel_fn(x, y_local, p0_local, **kwargs)

    p0_spec = P(axis_name, None) if p0_is_per_voxel else P()
    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(row, p0_spec),
        out_specs=(P(axis_name, None), P(axis_name), P(axis_name)),
        # pallas_call out_shapes carry no varying-mesh-axes info; skip the check.
        check_vma=False,
    )
    return fn(y_sharded, jnp.asarray(p0_sharded, jnp.float32))


def _shard_mapped_generic(
    model_fn, x, y_sharded, p0_sharded, mesh: Mesh, axis_name: str,
    p0_is_per_voxel: bool, **kwargs
):
    """Per-shard :func:`dosma_tpu.ops.generic_lm_pallas.generic_lm_pallas`
    under ``shard_map`` — the multi-chip form of the generic VMEM-resident
    LM engine. Voxel-independent: no collectives."""
    import jax.numpy as jnp
    from jax import shard_map

    from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas

    x = jnp.asarray(x, jnp.float32)
    row = P(axis_name, *([None] * (y_sharded.ndim - 1)))

    def per_shard(y_local, p0_local):
        return generic_lm_pallas(model_fn, x, y_local, p0_local, **kwargs)

    p0_spec = P(axis_name, None) if p0_is_per_voxel else P()
    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(row, p0_spec),
        out_specs=(P(axis_name, None), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return fn(y_sharded, jnp.asarray(p0_sharded, jnp.float32))


def sharded_register_chain_batch(
    fixed_arr,
    fixed_affine,
    moving_arrs,
    moving_affine,
    stage_cfgs,
    fixed_mask=None,
    use_mask=None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
):
    """Shard a batch registration's MOVING axis across the mesh.

    Each device runs the full multi-stage pyramid chain
    (:func:`dosma_tpu.ops.registration._optimize_chain_impl`) for its local
    moving images under ``shard_map`` — registrations are independent, so
    there are no collectives; the fixed image is replicated. This is the
    multi-chip form of SURVEY §2.10 "parallel registrations".

    Returns ``(Ms (M, S, 4, 4) cumulative host matrices, warped (M, ...)
    sharded device array)``.
    """
    import jax.numpy as jnp
    from jax import shard_map

    from dosma_tpu.ops import registration as R

    stage_cfgs = list(stage_cfgs)
    if any(cfg.transform == "bspline" for cfg in stage_cfgs):
        raise ValueError("sharded_register_chain_batch supports matrix stages only")
    if mesh is None:
        mesh = get_mesh()
    if use_mask is None:
        use_mask = [fixed_mask is not None] * len(stage_cfgs)

    moving_arrs = np.asarray(moving_arrs, np.float32)
    n_img = moving_arrs.shape[0]
    m_sharded, pad = shard_voxels(moving_arrs, mesh, axis_name)
    offsets, _ = shard_voxels(
        np.arange(m_sharded.shape[0], dtype=np.int32), mesh, axis_name
    )

    use_fmask = [bool(u) and fixed_mask is not None for u in use_mask]
    statics = R._chain_statics(stage_cfgs, use_fmask, [False] * len(stage_cfgs))
    center, scales, sigmas = R._chain_host_args(
        stage_cfgs, np.asarray(fixed_arr).shape, fixed_affine
    )

    fixed_dev = jnp.asarray(fixed_arr, jnp.float32)
    fmask_dev = (
        jnp.asarray(fixed_mask, jnp.float32)
        if (fixed_mask is not None and any(use_fmask)) else None
    )
    f_aff = jnp.asarray(fixed_affine, jnp.float32)
    m_aff = jnp.asarray(moving_affine, jnp.float32)
    center_dev = jnp.asarray(center)
    init = jnp.eye(4, dtype=jnp.float32)

    def _one(m_arr, off):
        seeds = tuple(jnp.asarray(cfg.seed, jnp.int32) + off for cfg in stage_cfgs)
        Ms, warped, _extras, _losses = R._optimize_chain_impl(
            fixed_dev, f_aff, fmask_dev, m_arr, m_aff, None,
            None, init, center_dev, scales, sigmas, seeds,
            statics, 0,
        )
        return jnp.stack(Ms), warped

    def per_shard(m_local, off_local):
        return jax.vmap(_one)(m_local, off_local)

    row = P(axis_name, *([None] * (m_sharded.ndim - 1)))
    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(row, P(axis_name)),
        out_specs=(P(axis_name, None, None, None), row),
        check_vma=False,
    )
    Ms, warped = fn(m_sharded, offsets)
    Ms = np.asarray(Ms, np.float64)[:n_img]
    return Ms, warped[:n_img] if pad else warped


_JITTED_UNET_FORWARD = None


def sharded_unet_inference(model, v: np.ndarray, mesh: Optional[Mesh] = None):
    """Shard U-Net slice-batch inference across devices (batch axis)."""
    import jax.numpy as jnp

    global _JITTED_UNET_FORWARD
    if _JITTED_UNET_FORWARD is None:
        # Module-level jit: a fresh jax.jit wrapper per call would retrace
        # and recompile the network every invocation.
        from dosma_tpu.models.unet2d import unet2d_forward

        _JITTED_UNET_FORWARD = jax.jit(unet2d_forward)

    if mesh is None:
        mesh = get_mesh()
    n = v.shape[0]
    v_sharded, pad = shard_voxels(v.astype(np.float32), mesh)
    out = _JITTED_UNET_FORWARD(model.params, jnp.asarray(v_sharded))
    out = np.asarray(out)
    return out[:n] if pad else out
