"""Bridge to the optional C++ I/O accelerator (``native/dosma_io.cpp``).

Provides batched DICOM file parsing off the Python interpreter. Falls back
gracefully (``available() == False``) when the shared library has not been
built — all call sites must guard on :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "_lib", "libdosma_io.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if os.path.isfile(path):
        try:
            _LIB = ctypes.CDLL(path)
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def read_dicom_files(files: List[str]):
    """Parse many DICOM files via the C++ helper; returns list of Datasets.

    The C++ layer handles file reading + gunzip-free byte slurping in
    parallel; element parsing stays in Python for full fidelity.
    """
    from dosma_tpu.core.io.dicom import read_dicom_bytes

    lib = _load()
    if lib is None:
        raise RuntimeError("native I/O library not available")
    blobs = read_files_bytes(files)
    return [read_dicom_bytes(b) for b in blobs]


def read_files_bytes(files: List[str]) -> List[bytes]:
    """Read many files into memory using the C++ threaded reader."""
    lib = _load()
    lib.dosma_read_files.restype = ctypes.c_int
    n = len(files)
    c_paths = (ctypes.c_char_p * n)(*[f.encode() for f in files])
    sizes = (ctypes.c_longlong * n)()
    # First pass: get sizes.
    if lib.dosma_file_sizes(c_paths, n, sizes) != 0:
        raise IOError("native file size probe failed")
    bufs = [ctypes.create_string_buffer(max(int(s), 1)) for s in sizes]
    buf_ptrs = (ctypes.c_char_p * n)(*[ctypes.cast(b, ctypes.c_char_p) for b in bufs])
    if lib.dosma_read_files(c_paths, n, buf_ptrs, sizes) != 0:
        raise IOError("native file read failed")
    return [bufs[i].raw[: int(sizes[i])] for i in range(n)]
