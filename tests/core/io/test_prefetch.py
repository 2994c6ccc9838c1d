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


class TestIterGroupsPipelining:
    def test_iter_groups_matches_load(self, tmp_path):
        from dosma_tpu.core.io.dicom_io import DicomReader

        write_dicom_series(str(tmp_path), shape=(12, 10, 3), n_echos=3)
        reader = DicomReader(num_workers=2)
        eager = reader.load(str(tmp_path), group_by="EchoNumbers")
        lazy = list(reader.iter_groups(str(tmp_path), group_by="EchoNumbers"))
        assert len(lazy) == len(eager) == 3
        for a, b in zip(eager, lazy):
            np.testing.assert_array_equal(np.asarray(a.volume), np.asarray(b.volume))
            np.testing.assert_allclose(a.affine, b.affine)
            assert a.get_metadata("EchoNumbers") == b.get_metadata("EchoNumbers")

    def test_group_parse_is_deferred(self, tmp_path, monkeypatch):
        """Pipeline structure: group k+1's PIXEL parse must not happen until
        group k has been yielded (so a consumer's async device_put of group k
        overlaps it). Instrumented via a slow/counting parse hook."""
        import dosma_tpu.core.io.dicom_io as dio
        from dosma_tpu.core.io.dicom import read_dicom_bytes as real_read

        n_echos, n_slices = 3, 4
        write_dicom_series(str(tmp_path), shape=(10, 10, n_slices), n_echos=n_echos)

        full_parses = []

        def counting_read(data, stop_before_pixels=False):
            if not stop_before_pixels:
                full_parses.append(1)
            return real_read(data, stop_before_pixels=stop_before_pixels)

        monkeypatch.setattr(dio, "read_dicom_bytes", counting_read)
        reader = dio.DicomReader(num_workers=0)
        gen = reader.iter_groups(str(tmp_path), group_by="EchoNumbers")

        assert full_parses == []  # nothing parsed until the first pull
        next(gen)
        assert sum(full_parses) == n_slices  # exactly group 0
        next(gen)
        assert sum(full_parses) == 2 * n_slices  # group 1 parsed only now
        next(gen)
        assert sum(full_parses) == 3 * n_slices

    def test_transfer_overlaps_next_parse(self, tmp_path, monkeypatch):
        """End-to-end overlap: with an artificially slow parse, the device
        arrays of earlier groups are already fully committed by the time the
        LAST group finishes parsing — i.e. transfers did not wait for the
        whole series."""
        import time

        import dosma_tpu.core.io.dicom_io as dio
        from dosma_tpu.core.io.dicom import read_dicom_bytes as real_read

        write_dicom_series(str(tmp_path), shape=(10, 10, 2), n_echos=2)

        def slow_read(data, stop_before_pixels=False):
            if not stop_before_pixels:
                time.sleep(0.05)
            return real_read(data, stop_before_pixels=stop_before_pixels)

        monkeypatch.setattr(dio, "read_dicom_bytes", slow_read)

        committed = []
        reader = dio.DicomReader(num_workers=0)
        for vol in reader.iter_groups(str(tmp_path), group_by="EchoNumbers"):
            arr = jax.device_put(np.asarray(vol.volume), jax.devices()[0])
            arr.block_until_ready()
            committed.append(time.monotonic())
        # First group's transfer completed strictly before the second group
        # was even available (its parse alone takes >= 2*0.05s).
        assert committed[1] - committed[0] >= 0.08
