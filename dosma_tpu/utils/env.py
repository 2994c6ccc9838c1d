"""Environment probing utilities.

TPU-native re-design of the reference environment layer
(``/root/reference/dosma/utils/env.py:12-150``): lazy optional-dependency
detection, debug flag via ``DOSMA_DEBUG``, and standard resource/temp/log
paths. Additions for the TPU build: JAX backend probing helpers.
"""

from __future__ import annotations

import importlib
import os
from typing import Optional

__all__ = [
    "debug",
    "get_version",
    "package_available",
    "sitk_available",
    "cupy_available",
    "torch_available",
    "h5py_available",
    "nibabel_available",
    "pydicom_available",
    "tpu_available",
    "resources_dir",
    "output_dir",
    "temp_dir",
    "log_file_path",
]

_SUPPORTED_PACKAGES = {}

_DOSMA_DIR = os.path.expanduser("~/.dosma_tpu")


def package_available(name: str) -> bool:
    """Return True if the package ``name`` is importable (cached)."""
    global _SUPPORTED_PACKAGES
    if name not in _SUPPORTED_PACKAGES:
        try:
            spec = importlib.util.find_spec(name)
            _SUPPORTED_PACKAGES[name] = spec is not None
        except (ImportError, ModuleNotFoundError, ValueError):
            _SUPPORTED_PACKAGES[name] = False
    return _SUPPORTED_PACKAGES[name]


def get_version(package_or_name) -> str:
    name = (
        package_or_name if isinstance(package_or_name, str) else package_or_name.__name__
    )
    if not package_available(name):
        raise ValueError(f"Package '{name}' not available")
    module = importlib.import_module(name)
    return getattr(module, "__version__", "unknown")


def sitk_available() -> bool:
    return package_available("SimpleITK")


def cupy_available() -> bool:
    return package_available("cupy")


def torch_available() -> bool:
    return package_available("torch")


def h5py_available() -> bool:
    return package_available("h5py")


def nibabel_available() -> bool:
    return package_available("nibabel")


def pydicom_available() -> bool:
    return package_available("pydicom")


_TPU_AVAILABLE: Optional[bool] = None


def tpu_available() -> bool:
    """True if a TPU backend is reachable through JAX (cached)."""
    global _TPU_AVAILABLE
    if _TPU_AVAILABLE is None:
        try:
            import jax

            _TPU_AVAILABLE = any(
                d.platform in ("tpu", "axon") for d in jax.devices()
            )
        except Exception:
            _TPU_AVAILABLE = False
    return _TPU_AVAILABLE


def debug(value: Optional[bool] = None) -> bool:
    """Get/set debug mode (mirrors reference ``env.debug``).

    Setting debug mode reconfigures the package logger level.
    """
    if value is not None:
        if not isinstance(value, bool):
            raise ValueError("value must be a bool")
        import logging

        os.environ["DOSMA_DEBUG"] = str(value)
        from dosma_tpu.utils import logger as _logger

        _logger.setup_logger.cache_clear()
        pkg_logger = _logger.setup_logger()
        # setup_logger keeps existing handlers, so re-level them explicitly
        # (the reference iterates logger.handlers the same way).
        lvl = logging.DEBUG if value else logging.INFO
        for h in pkg_logger.handlers:
            if isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler):
                h.setLevel(lvl)
    return os.environ.get("DOSMA_DEBUG", "").lower() in ("true", "1")


def resources_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


def output_dir() -> str:
    return os.environ.get("DOSMA_OUTPUT_DIR", os.path.join(_DOSMA_DIR, "outputs"))


def temp_dir() -> str:
    path = os.environ.get("DOSMA_TEMP_DIR", os.path.join(_DOSMA_DIR, "temp"))
    os.makedirs(path, exist_ok=True)
    return path


def log_file_path() -> str:
    return os.path.join(_DOSMA_DIR, "dosma.log")
