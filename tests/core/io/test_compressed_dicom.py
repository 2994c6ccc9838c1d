"""Compressed DICOM transfer syntaxes: RLE Lossless + JPEG Lossless.

Round-trips synthetic encapsulated files through the from-scratch codecs
(reference reads these via pydicom pixel handlers,
``/root/reference/dosma/core/io/dicom_io.py:303-314``).
"""

import io

import numpy as np
import pytest

from dosma_tpu.core.io.dicom import Dataset, read_dicom_bytes, write_dicom
from dosma_tpu.core.io.dicom import codecs
from dosma_tpu.core.io.dicom.codecs import (
    JPEG_LOSSLESS,
    JPEG_LOSSLESS_SV1,
    RLE_LOSSLESS,
    EncapsulatedPixelData,
    jpeg_lossless_decode,
    jpeg_lossless_encode,
    packbits_decode,
    packbits_encode,
    rle_decode_frame,
    rle_encode_frame,
)

def _mr_dataset(arr2d, nframes=None):
    from tests.util import build_dicom_dataset

    ds = build_dicom_dataset(arr2d if arr2d.ndim == 2 else arr2d[0])
    if nframes is not None:
        ds.NumberOfFrames = nframes
        ds["PixelData"] = np.ascontiguousarray(arr2d.astype(np.uint16)).tobytes()
    return ds


class TestPackBits:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"\x00" * 500,
            b"abc",
            bytes(range(256)) * 3,
            b"aaabccccdddddd" * 11,
            np.random.RandomState(3).bytes(1024),
        ],
    )
    def test_roundtrip(self, data):
        assert packbits_decode(packbits_encode(data), expected=len(data)) == data

    def test_noop_control_byte_skipped(self):
        assert packbits_decode(b"\x80\x01ab") == b"ab"

    def test_long_runs_split(self):
        data = b"z" * 1000
        enc = packbits_encode(data)
        assert len(enc) <= 2 * (1000 // 128 + 1)
        assert packbits_decode(enc) == data


class TestRLEFrames:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_frame_roundtrip(self, dtype):
        rs = np.random.RandomState(0)
        maxv = np.iinfo(dtype).max
        frame = (rs.rand(31, 45) * maxv).astype(dtype)
        data = rle_encode_frame(frame)
        out = rle_decode_frame(data, 31, 45, 1, frame.dtype.itemsize * 8)
        np.testing.assert_array_equal(out, frame)

    def test_multi_sample_roundtrip(self):
        rs = np.random.RandomState(1)
        frame = (rs.rand(16, 20, 3) * 255).astype(np.uint8)  # RGB
        data = rle_encode_frame(frame)
        out = rle_decode_frame(data, 16, 20, 3, 8)
        np.testing.assert_array_equal(out, frame)

    def test_constant_frame_compresses(self):
        frame = np.full((64, 64), 1234, np.uint16)
        data = rle_encode_frame(frame)
        assert len(data) < frame.nbytes / 10
        out = rle_decode_frame(data, 64, 64, 1, 16)
        np.testing.assert_array_equal(out, frame)

    def test_header_mismatch_raises(self):
        frame = np.zeros((8, 8), np.uint16)
        data = rle_encode_frame(frame)
        with pytest.raises(ValueError):
            rle_decode_frame(data, 8, 8, 1, 8)  # wrong bits_allocated


class TestJPEGLossless:
    @pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
    def test_predictor_roundtrip(self, predictor):
        rs = np.random.RandomState(predictor)
        frame = (rs.rand(23, 37) * 4000).astype(np.uint16)
        blob = jpeg_lossless_encode(frame, precision=12, predictor=predictor)
        np.testing.assert_array_equal(jpeg_lossless_decode(blob), frame)

    def test_full_16bit_range(self):
        rs = np.random.RandomState(9)
        frame = rs.randint(0, 2**16, size=(19, 17)).astype(np.uint16)
        frame[0, 0] = 0
        frame[0, 1] = 65535  # max-magnitude first-row diff
        blob = jpeg_lossless_encode(frame, precision=16)
        np.testing.assert_array_equal(jpeg_lossless_decode(blob), frame)

    def test_smooth_image_compresses(self):
        y, x = np.mgrid[0:64, 0:64]
        frame = (1000 + 3 * y + 2 * x).astype(np.uint16)
        blob = jpeg_lossless_encode(frame, precision=12)
        assert len(blob) < frame.nbytes / 2
        np.testing.assert_array_equal(jpeg_lossless_decode(blob), frame)

    def test_point_transform(self):
        frame = (np.arange(64, dtype=np.uint16).reshape(8, 8)) * 8
        blob = jpeg_lossless_encode(frame, precision=12, point_transform=3)
        out = jpeg_lossless_decode(blob)
        np.testing.assert_array_equal(out, frame)  # multiples of 8 survive Pt=3

    def test_single_pixel_and_single_row(self):
        for shape in [(1, 1), (1, 9), (9, 1)]:
            frame = (np.arange(np.prod(shape), dtype=np.uint16) * 7 + 3).reshape(shape)
            blob = jpeg_lossless_encode(frame, precision=12)
            np.testing.assert_array_equal(jpeg_lossless_decode(blob), frame)

    def test_rejects_non_sof3(self):
        # Baseline JPEG header (SOF0)
        blob = b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        with pytest.raises(NotImplementedError):
            jpeg_lossless_decode(blob)


class TestEncapsulatedFiles:
    @pytest.mark.parametrize("syntax", [RLE_LOSSLESS, JPEG_LOSSLESS_SV1, JPEG_LOSSLESS])
    def test_file_roundtrip(self, syntax):
        rs = np.random.RandomState(5)
        frame = (rs.rand(32, 48) * 3000).astype(np.uint16)
        ds = _mr_dataset(frame)

        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=syntax)
        back = read_dicom_bytes(buf.getvalue())

        assert back.file_meta.get("TransferSyntaxUID") == syntax
        assert isinstance(back["PixelData"].value, EncapsulatedPixelData)
        np.testing.assert_array_equal(back.pixel_array, frame)
        # Non-pixel metadata survives the compressed write.
        assert back.Rows == 32 and back.Columns == 48

    def test_multiframe_rle(self):
        rs = np.random.RandomState(6)
        arr = (rs.rand(3, 16, 16) * 1000).astype(np.uint16)
        ds = _mr_dataset(arr, nframes=3)

        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=RLE_LOSSLESS)
        back = read_dicom_bytes(buf.getvalue())
        assert len(back["PixelData"].value.fragments) == 3
        np.testing.assert_array_equal(back.pixel_array, arr)

    def test_reencapsulation_preserved_on_rewrite(self):
        frame = (np.arange(256, dtype=np.uint16)).reshape(16, 16)
        ds = _mr_dataset(frame)
        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=RLE_LOSSLESS)
        back = read_dicom_bytes(buf.getvalue())

        # Rewriting a dataset that is already encapsulated keeps fragments.
        buf2 = io.BytesIO()
        write_dicom(back, buf2)
        again = read_dicom_bytes(buf2.getvalue())
        assert again.file_meta.get("TransferSyntaxUID") == RLE_LOSSLESS
        np.testing.assert_array_equal(again.pixel_array, frame)

    def test_frames_grouping_with_bot(self):
        frags = [b"aa", b"bb", b"cc", b"dd"]
        # 2 frames x 2 fragments; offsets to fragment 0 and fragment 2.
        bot = [0, 8 + 2 + 8 + 2]
        enc = EncapsulatedPixelData(frags, bot)
        assert enc.frames(2) == [b"aabb", b"ccdd"]

    def test_frames_grouping_without_bot(self):
        enc = EncapsulatedPixelData([b"xx", b"yy", b"zz"])
        assert enc.frames(3) == [b"xx", b"yy", b"zz"]
        assert enc.frames(1) == [b"xxyyzz"]
        with pytest.raises(ValueError):
            enc.frames(2)


class TestCompressedSeriesEndToEnd:
    def test_dicom_reader_loads_rle_series(self, tmp_path):
        """A full compressed series flows through the high-level reader."""
        import os

        from dosma_tpu.core.io.dicom_io import DicomReader
        from tests.util import build_dicom_dataset
        from dosma_tpu.core.io.dicom.writer import generate_uid

        rs = np.random.RandomState(11)
        series_uid = generate_uid()
        vol = (rs.rand(16, 16, 4) * 2000).astype(np.uint16)
        for s in range(4):
            ds = build_dicom_dataset(
                vol[:, :, s],
                instance_number=s + 1,
                position=(0.0, 0.0, float(s)),
                series_uid=series_uid,
            )
            write_dicom(ds, os.path.join(tmp_path, f"{s}.dcm"), transfer_syntax=RLE_LOSSLESS)

        (mv,) = DicomReader().load(str(tmp_path))
        np.testing.assert_array_equal(np.asarray(mv.volume).squeeze(), vol)


_native_missing = True
try:
    from dosma_tpu.core.io import _native as _native_mod

    _native_missing = not _native_mod.codecs_available()
except Exception:  # pragma: no cover
    pass


@pytest.mark.skipif(_native_missing, reason="native codec library not built")
class TestNativeCodecParity:
    """The C++ decoders (native/dosma_codecs.cpp) must be bit-exact twins
    of the Python codecs — decode_frames dispatches to them when built."""

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_rle_parity(self, dtype):
        rs = np.random.RandomState(3)
        arr = (rs.rand(61, 83) * (255 if dtype == np.uint8 else 65535)).astype(dtype)
        enc = rle_encode_frame(arr)
        bits = arr.dtype.itemsize * 8
        py = rle_decode_frame(enc, 61, 83, 1, bits)
        nat = _native_mod.rle_decode(enc, 61, 83, 1, bits)
        assert np.array_equal(np.asarray(py, dtype), np.asarray(nat, dtype))

    def test_rle_multi_sample_parity(self):
        rs = np.random.RandomState(4)
        arr = (rs.rand(32, 40, 3) * 65535).astype(np.uint16)
        enc = rle_encode_frame(arr)
        py = rle_decode_frame(enc, 32, 40, 3, 16)
        nat = _native_mod.rle_decode(enc, 32, 40, 3, 16)
        assert np.array_equal(np.asarray(py, np.uint16), np.asarray(nat, np.uint16))

    @pytest.mark.parametrize("predictor", list(range(1, 8)))
    def test_jpeg_lossless_parity(self, predictor):
        rs = np.random.RandomState(predictor)
        arr = (rs.rand(45, 57) * 4000).astype(np.uint16)
        je = jpeg_lossless_encode(arr, 16, predictor=predictor)
        assert np.array_equal(jpeg_lossless_decode(je), _native_mod.jpeg_lossless_decode(je))
        assert np.array_equal(_native_mod.jpeg_lossless_decode(je), arr)

    def test_jpeg_point_transform_parity(self):
        rs = np.random.RandomState(9)
        arr = ((rs.rand(40, 44) * 4000).astype(np.uint16)) & np.uint16(0xFFF8)
        je = jpeg_lossless_encode(arr, 16, point_transform=3)
        assert np.array_equal(jpeg_lossless_decode(je), _native_mod.jpeg_lossless_decode(je))

    def test_corrupt_stream_raises_not_crashes(self):
        with pytest.raises(ValueError):
            _native_mod.jpeg_lossless_decode(b"\xff\xd8\xff\xc3garbage")
        with pytest.raises(ValueError):
            _native_mod.rle_decode(b"\x00" * 63, 8, 8, 1, 16)

    def test_decode_frames_uses_native_path(self, monkeypatch):
        """decode_frames must route through the native decoder when built."""
        rs = np.random.RandomState(11)
        arr = (rs.rand(16, 16) * 65535).astype(np.uint16)
        enc = EncapsulatedPixelData([rle_encode_frame(arr)])
        hits = {}
        real = _native_mod.rle_decode

        def spy(*a, **k):
            hits["native"] = True
            return real(*a, **k)

        monkeypatch.setattr(_native_mod, "rle_decode", spy)
        out = codecs.decode_frames(enc, RLE_LOSSLESS, 16, 16, 1, 16)
        assert hits.get("native")
        assert np.array_equal(out, arr)

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_rle_encode_byte_parity(self, dtype):
        rs = np.random.RandomState(21)
        arr = (rs.rand(47, 61) * (255 if dtype == np.uint8 else 65535)).astype(dtype)
        assert _native_mod.rle_encode(arr) == rle_encode_frame(arr)

    @pytest.mark.parametrize("predictor", list(range(1, 8)))
    def test_jpeg_encode_byte_parity(self, predictor):
        rs = np.random.RandomState(predictor + 30)
        arr = (rs.rand(33, 49) * 4000).astype(np.uint16)
        assert _native_mod.jpeg_lossless_encode(
            arr, 16, predictor=predictor
        ) == jpeg_lossless_encode(arr, 16, predictor=predictor)

    def test_encode_frames_uses_native_path(self, monkeypatch):
        rs = np.random.RandomState(12)
        arr = (rs.rand(16, 16) * 65535).astype(np.uint16)
        hits = {}
        real = _native_mod.rle_encode

        def spy(*a, **k):
            hits["native"] = True
            return real(*a, **k)

        monkeypatch.setattr(_native_mod, "rle_encode", spy)
        enc = codecs.encode_frames(arr, RLE_LOSSLESS)
        assert hits.get("native")
        out = codecs.decode_frames(enc, RLE_LOSSLESS, 16, 16, 1, 16)
        assert np.array_equal(out, arr)


class TestSignedAndTranscode:
    """Regression tests: signed pixel data through compressed syntaxes, and
    transfer-syntax changes on already-encapsulated datasets."""

    def test_signed_rle_roundtrip(self):
        arr = np.array([[-5, -1], [100, -32000]], np.int16)
        ds = _mr_dataset(np.zeros((2, 2), np.uint16))
        ds.PixelRepresentation = 1
        ds["PixelData"] = arr.tobytes()
        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=RLE_LOSSLESS)
        out = read_dicom_bytes(buf.getvalue())
        assert np.array_equal(out.pixel_array, arr)
        assert out.pixel_array.dtype == np.int16

    def test_signed_jpeg_lossless_roundtrip(self):
        rs = np.random.RandomState(5)
        arr = (rs.rand(16, 16) * 4000 - 2000).astype(np.int16)
        ds = _mr_dataset(np.zeros((16, 16), np.uint16))
        ds.PixelRepresentation = 1
        ds["PixelData"] = arr.tobytes()
        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=JPEG_LOSSLESS)
        out = read_dicom_bytes(buf.getvalue())
        assert np.array_equal(out.pixel_array, arr)

    def test_decompress_on_write(self):
        """Explicit VR LE request on an encapsulated dataset expands the
        fragments instead of writing a corrupt file."""
        from dosma_tpu.core.io.dicom import tags as T

        rs = np.random.RandomState(6)
        arr = (rs.rand(8, 8) * 65535).astype(np.uint16)
        ds = _mr_dataset(arr)
        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=RLE_LOSSLESS)
        compressed = read_dicom_bytes(buf.getvalue())

        buf2 = io.BytesIO()
        write_dicom(compressed, buf2, transfer_syntax=T.EXPLICIT_VR_LE)
        plain = read_dicom_bytes(buf2.getvalue())
        assert plain.file_meta.get("TransferSyntaxUID") == T.EXPLICIT_VR_LE
        assert np.array_equal(plain.pixel_array, arr)

    def test_transcode_between_compressed_syntaxes(self):
        rs = np.random.RandomState(7)
        arr = (rs.rand(8, 8) * 4000).astype(np.uint16)
        ds = _mr_dataset(arr)
        buf = io.BytesIO()
        write_dicom(ds, buf, transfer_syntax=RLE_LOSSLESS)
        compressed = read_dicom_bytes(buf.getvalue())

        buf2 = io.BytesIO()
        write_dicom(compressed, buf2, transfer_syntax=JPEG_LOSSLESS)
        out = read_dicom_bytes(buf2.getvalue())
        assert out.file_meta.get("TransferSyntaxUID") == JPEG_LOSSLESS
        assert np.array_equal(out.pixel_array, arr)
