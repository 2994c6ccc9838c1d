"""Device-side analytics gather tests (``ops/analytics.py``)."""

import numpy as np

from dosma_tpu.ops import analytics
from dosma_tpu.ops.analytics import compressed_values, gather_voxels


def test_gather_voxels_bucket_padding_exact():
    """Bucket padding must be invisible: results match a host gather for
    sizes around every bucket boundary, including empty."""
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    vol = rs.rand(9, 7, 5).astype(np.float32)
    volj = jnp.asarray(vol)
    for n in (0, 1, 3, 1023, 1024, 1025, 2000):
        idx = rs.randint(0, vol.size, size=n)
        out = np.asarray(gather_voxels(volj, jnp.asarray(idx)))
        np.testing.assert_array_equal(out, vol.ravel()[idx])


def test_gather_voxels_one_program_per_bucket():
    """Distinct mask sizes inside one power-of-two bucket reuse one XLA
    program (regression: every subject's voxel count was a fresh compile)."""
    import jax.numpy as jnp

    vol = jnp.asarray(np.arange(9 * 7 * 5, dtype=np.float32).reshape(9, 7, 5))
    gather_voxels(vol, jnp.arange(10))  # prime the 1024 bucket
    before = analytics._gather._cache_size()
    for n in (11, 100, 513, 1000):
        gather_voxels(vol, jnp.arange(n))
    assert analytics._gather._cache_size() == before


def test_compressed_values_matches_host_gather():
    import jax.numpy as jnp

    rs = np.random.RandomState(2)
    vol = rs.rand(8, 6, 4).astype(np.float32)
    vol[vol < 0.1] = np.nan  # NaNs must pass through untouched
    mask = rs.rand(8, 6, 4) > 0.6
    nz = np.nonzero(mask)
    host = compressed_values(vol, nz)
    dev = compressed_values(jnp.asarray(vol), nz)
    np.testing.assert_array_equal(host, dev)
