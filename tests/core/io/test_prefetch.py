"""Async host→device prefetch tests (``dosma_tpu/core/io/prefetch.py``)."""

import numpy as np

import jax

from dosma_tpu.core.io.prefetch import load_to_device
from tests.util import write_dicom_series


class TestLoadToDevice:
    def test_groups_land_on_device(self, tmp_path):
        arr = write_dicom_series(str(tmp_path), shape=(16, 12, 4), n_echos=2)
        vols = load_to_device(str(tmp_path), group_by="EchoNumbers")
        assert len(vols) == 2
        for e, v in enumerate(vols):
            assert isinstance(v.volume, jax.Array)
            assert v.volume.devices() == {jax.devices()[0]}
            assert np.array_equal(np.asarray(v.volume), arr[:, :, :, e])
            # Headers/affine stay host-side and intact.
            assert v.headers() is not None
            assert v.get_metadata("EchoNumbers") == e + 1

    def test_explicit_device_and_arithmetic(self, tmp_path):
        write_dicom_series(str(tmp_path), shape=(8, 8, 3), n_echos=1)
        vols = load_to_device(str(tmp_path), device=0)
        v = vols[0]
        # Volumes are immediately usable in jitted compute.
        out = jax.jit(lambda x: 2.0 * x)(v.volume)
        assert np.allclose(np.asarray(out), 2.0 * np.asarray(v.volume))

    def test_sharded_placement(self, tmp_path):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        write_dicom_series(str(tmp_path), shape=(8, 8, 4), n_echos=1)
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("data",))
        sharding = NamedSharding(mesh, P(None, None, "data"))
        vols = load_to_device(str(tmp_path), sharding=sharding)
        v = vols[0]
        assert len(v.volume.devices()) == 4
        assert v.volume.sharding.is_equivalent_to(sharding, ndim=3)
