"""Async host → HBM prefetch for scan loading.

The SURVEY north star calls for "DICOM/NIfTI multi-worker loading feeds
device HBM via async host prefetch grouped by EchoNumbers/TriggerTime".
This module overlaps three phases:

1. file bytes: one bulk read via a thread pool,
2. per-group pixel parsing, deferred inside ``DicomReader.iter_groups`` —
   group *k+1* is parsed only after group *k* has been yielded,
3. ``jax.device_put`` — asynchronous, so the H2D transfer of group *k*
   is in flight while the generator parses group *k+1*.
"""

from __future__ import annotations

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

    # Pull groups from the lazy generator: jax.device_put is asynchronous, so
    # the moment group k is yielded its H2D transfer is in flight while the
    # generator parses group k+1's pixel data on the host.
    out = []
    for vol in reader.iter_groups(path_or_files, group_by=group_by):
        arr = np.ascontiguousarray(np.asarray(vol.volume))
        out.append(vol._partial_clone(volume=jax.device_put(arr, target)))
    return out
