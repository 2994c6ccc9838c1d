"""JPEG 2000 codec for DICOM pixel data, backed by Pillow/OpenJPEG.

Covers the last two compressed transfer syntaxes:

- **JPEG 2000 Lossless** ``1.2.840.10008.1.2.4.90`` (reversible 5/3 DWT)
- **JPEG 2000** ``1.2.840.10008.1.2.4.91`` (irreversible 9/7 DWT)

Architecture note: the reference does not implement JPEG 2000 either — it
delegates to whichever pixel handler pydicom finds installed (gdcm /
openjpeg / Pillow, ``/root/reference/dosma/core/io/dicom_io.py:264-270``).
This module is the same design point: Pillow (with its OpenJPEG bindings)
is part of this stack's baked-in dependencies, so J2K rides it; when
Pillow lacks OpenJPEG, the codec dispatch surfaces the actionable
transcode error instead.

DICOM PS3.5 A.4.4 encapsulates the raw JPEG 2000 CODESTREAM (SOC marker
``FF4F``), not a JP2 container — Pillow reads raw codestreams directly
and writes them when the target filename carries a ``.j2k`` suffix, so
encoding goes through a temp file.
"""

from __future__ import annotations

import io
import os
import tempfile

import numpy as np

__all__ = ["jpeg_2000_decode", "jpeg_2000_encode", "pil_j2k_available"]


def pil_j2k_available() -> bool:
    try:
        from PIL import features

        return bool(features.check("jpg_2000"))
    except Exception:  # pragma: no cover - Pillow absent
        return False


def _require_pil():
    if not pil_j2k_available():
        raise NotImplementedError(
            "JPEG 2000 support requires Pillow built with OpenJPEG "
            "(PIL.features.check('jpg_2000')). Install pillow with openjpeg, "
            "or transcode the series (e.g. `gdcmconv --raw`)."
        )


def jpeg_2000_decode(data: bytes) -> np.ndarray:
    """Decode a JPEG 2000 codestream (or JP2 container) to an ndarray."""
    _require_pil()
    from PIL import Image

    im = Image.open(io.BytesIO(data))
    arr = np.asarray(im)
    if arr.dtype == np.int32:
        # OpenJPEG surfaces >8-bit grayscale as mode "I"; DICOM samples are
        # unsigned here (PixelRepresentation handled by the caller).
        arr = arr.astype(np.uint16)
    return arr


def jpeg_2000_encode(frame: np.ndarray, lossless: bool = True) -> bytes:
    """Encode one grayscale frame as a raw JPEG 2000 codestream."""
    _require_pil()
    from PIL import Image

    arr = np.ascontiguousarray(frame)
    if arr.ndim != 2:
        raise NotImplementedError("JPEG 2000 encoder supports 1 component")
    if arr.dtype == np.uint8:
        im = Image.frombytes("L", (arr.shape[1], arr.shape[0]), arr.tobytes())
    elif arr.dtype == np.uint16:
        im = Image.frombytes("I;16", (arr.shape[1], arr.shape[0]), arr.tobytes())
    else:
        raise ValueError("JPEG 2000 encoder expects uint8/uint16 input")

    # Pillow only emits a RAW codestream (DICOM's required form) when the
    # filename ends in .j2k; BytesIO targets get a JP2 container.
    fd, path = tempfile.mkstemp(suffix=".j2k")
    os.close(fd)
    try:
        if lossless:
            im.save(path, irreversible=False)
        else:
            im.save(path, irreversible=True, quality_mode="rates", quality_layers=[10])
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)
