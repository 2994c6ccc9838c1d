"""Scan-sequence pipelines (re-exports mirror the reference's package
surface, ``/root/reference/dosma/scan_sequences/__init__.py``: both
``from dosma_tpu.scan_sequences import QDess`` and the ``mri``/``scans``
submodule paths work)."""

from dosma_tpu.scan_sequences import mri  # noqa: F401
from dosma_tpu.scan_sequences import scans  # noqa: F401
from dosma_tpu.scan_sequences.scans import NonTargetSequence, ScanSequence  # noqa: F401

__all__ = ["QDess", "CubeQuant", "Mapss", "Cones", "ScanSequence", "NonTargetSequence"]

# Scan classes stay lazy (mirrors mri/__init__): importing the package must
# not pay for every pipeline's dependency graph.
_LAZY = {"QDess", "CubeQuant", "Mapss", "Cones"}


def __getattr__(name):
    if name in _LAZY:
        return getattr(mri, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
