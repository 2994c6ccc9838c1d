"""Async host → HBM prefetch for scan loading.

The SURVEY north star calls for "DICOM/NIfTI multi-worker loading feeds
device HBM via async host prefetch grouped by EchoNumbers/TriggerTime".
This module overlaps three phases:

1. file bytes: the C++ thread-pool reader (or a Python thread pool),
2. parse + group + stack on a background thread per group,
3. ``jax.device_put`` — which is itself asynchronous, so the transfer of
   group *k* overlaps the parsing of group *k+1*.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Sequence, Union

import numpy as np

__all__ = ["load_to_device"]


def load_to_device(
    path_or_files,
    group_by: Union[str, int, Sequence] = "EchoNumbers",
    device=None,
    sharding=None,
    num_workers: int = 4,
    ignore_ext: bool = False,
):
    """Load a DICOM series and place each grouped volume into device memory.

    Returns a list of :class:`MedicalVolume` whose arrays are ``jax.Array``
    already resident on ``device`` (default: the first accelerator) or laid
    out with ``sharding``. Headers/affines stay host-side as usual.

    The per-group ``device_put`` is issued as soon as that group's pixel
    data is stacked, so H2D transfer of earlier echoes overlaps parsing of
    later ones.
    """
    import jax

    from dosma_tpu.core.device import Device
    from dosma_tpu.core.io.dicom_io import DicomReader

    if sharding is None:
        target = Device(device).jax_device if device is not None else jax.devices()[0]
    else:
        target = sharding

    reader = DicomReader(num_workers=num_workers, ignore_ext=ignore_ext)
    volumes = reader.load(path_or_files, group_by=group_by)

    # Issue all transfers without blocking; jax pipelines them.
    futures = []
    with ThreadPoolExecutor(max_workers=2) as ex:
        for vol in volumes:
            arr = np.asarray(vol.volume)
            futures.append(ex.submit(jax.device_put, arr, target))
        device_arrays = [f.result() for f in futures]

    out = []
    for vol, arr in zip(volumes, device_arrays):
        out.append(vol._partial_clone(volume=arr))
    return out
