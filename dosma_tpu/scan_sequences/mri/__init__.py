"""MRI scan sequences."""

from dosma_tpu.scan_sequences.mri.qdess import QDess  # noqa: F401


def __getattr__(name):
    from importlib import import_module

    lazy = {
        "CubeQuant": "dosma_tpu.scan_sequences.mri.cube_quant",
        "Mapss": "dosma_tpu.scan_sequences.mri.mapss",
        "Cones": "dosma_tpu.scan_sequences.mri.cones",
    }
    if name in lazy:
        return getattr(import_module(lazy[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
