"""Device-side helpers for tissue analytics.

The reference's tissue analytics (``/root/reference/dosma/tissues/*.py``)
operate on full-volume numpy arrays, which for a device-resident
quantitative map means a full f32 volume D2H (18 MB per knee at
384x384x32) before any region math can run. The tissue masks cover only
a few percent of the volume, so the TPU-native design gathers the masked
voxels ON DEVICE and ships only the compressed value vector to the host;
the region analytics then run on compressed index lists (see
``tissues/femoral_cartilage.py``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["gather_voxels", "compressed_values"]


def _jit_gather():
    import jax

    @jax.jit
    def gather_voxels(volume, flat_idx):
        import jax.numpy as jnp

        return jnp.ravel(volume)[flat_idx]

    return gather_voxels


_gather = None


def gather_voxels(volume, flat_idx):
    """``volume.ravel()[flat_idx]`` as one jitted device gather.

    NaNs in ``volume`` pass through untouched — host-side NaN semantics
    (``nan_to_num`` / ``> 0`` exclusion) are applied by the caller so they
    stay bit-identical to the numpy path.

    The index vector is padded to the next power of two before the jitted
    call: every distinct mask size would otherwise be a distinct XLA
    program (one compile per subject per tissue), so a handful of bucket
    sizes cover all masks. Pad lanes gather index 0 and are sliced off.
    """
    global _gather
    if _gather is None:
        _gather = _jit_gather()
    n = int(flat_idx.shape[0])
    bucket = 1 << max(int(n - 1).bit_length(), 10) if n else 1024
    if bucket != n:
        import jax.numpy as jnp

        flat_idx = jnp.zeros(bucket, flat_idx.dtype).at[:n].set(flat_idx)
    return _gather(volume, flat_idx)[:n]


def compressed_values(volume, indices) -> np.ndarray:
    """Gather ``volume[iy, ix, iz]`` as a float64 host vector.

    ``indices`` is the ``(iy, ix, iz)`` tuple from ``np.nonzero(mask)``.
    numpy volumes gather on the host; jax volumes gather on their device
    (one jitted program) so only ``len(iy) * 4`` bytes cross D2H instead
    of the full volume.
    """
    iy, ix, iz = indices
    if isinstance(volume, np.ndarray):
        return np.asarray(volume[iy, ix, iz], dtype=np.float64)
    try:
        import jax
        import jax.numpy as jnp

        if isinstance(volume, jax.Array):
            _, w, s = volume.shape
            flat = (iy.astype(np.int32) * w + ix.astype(np.int32)) * s + iz.astype(
                np.int32
            )
            return np.asarray(gather_voxels(volume, jnp.asarray(flat))).astype(
                np.float64
            )
    except ImportError:  # pragma: no cover - jax is always present here
        pass
    return np.asarray(np.asarray(volume)[iy, ix, iz], dtype=np.float64)
