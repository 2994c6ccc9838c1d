"""Low-level DICOM codec tests: implicit VR, sequences, private tags,
pickle/deepcopy of datasets."""

import copy
import io
import pickle
import struct

import numpy as np
import pytest

from dosma_tpu.core.io.dicom import Dataset, Tag, read_dicom_bytes, write_dicom
from dosma_tpu.core.io.dicom.writer import generate_uid


def _implicit_elem(group, el, value_bytes):
    return struct.pack("<HHI", group, el, len(value_bytes)) + value_bytes


def _explicit_elem(group, el, vr, val):
    if len(val) % 2:
        val += b"\x00"
    return struct.pack("<HH", group, el) + vr + struct.pack("<H", len(val)) + val


def _implicit_blob(with_meta=True):
    body = b""
    body += _implicit_elem(0x0008, 0x0060, b"MR")
    body += _implicit_elem(0x0018, 0x0081, b"10.5")
    body += _implicit_elem(0x0018, 0x0086, b"1 ")
    body += _implicit_elem(0x0020, 0x0032, b"1.0\\2.0\\3.0")
    body += _implicit_elem(0x0028, 0x0010, struct.pack("<H", 4))
    body += _implicit_elem(0x0028, 0x0011, struct.pack("<H", 6))
    body += _implicit_elem(0x0028, 0x0030, b"0.5\\0.5 ")
    body += _implicit_elem(0x0028, 0x0100, struct.pack("<H", 16))
    body += _implicit_elem(0x0028, 0x0103, struct.pack("<H", 0))
    arr = (np.arange(24) * 3).astype("<u2")
    body += _implicit_elem(0x7FE0, 0x0010, arr.tobytes())
    if not with_meta:
        return body, arr
    fm = _explicit_elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2")
    fm_len = _explicit_elem(0x0002, 0x0000, b"UL", struct.pack("<I", len(fm)))
    return b"\x00" * 128 + b"DICM" + fm_len + fm + body, arr


class TestImplicitVR:
    def test_part10_implicit(self):
        blob, arr = _implicit_blob()
        ds = read_dicom_bytes(blob)
        assert ds.Modality == "MR"
        assert ds.EchoTime == 10.5
        assert ds.ImagePositionPatient == [1.0, 2.0, 3.0]
        assert np.array_equal(ds.pixel_array.ravel(), arr)

    def test_bare_implicit_dataset(self):
        body, arr = _implicit_blob(with_meta=False)
        ds = read_dicom_bytes(body)
        assert ds.Modality == "MR"
        assert np.array_equal(ds.pixel_array.ravel(), arr)


class TestDatasetModel:
    def test_tag_constructors(self):
        assert Tag(0x0018, 0x0081) == Tag(0x00180081) == Tag("EchoTime")
        assert Tag(0x0019, 0x10B6).is_private
        assert not Tag("EchoTime").is_private
        assert Tag("EchoTime").keyword == "EchoTime"

    def test_attribute_and_item_access(self):
        ds = Dataset()
        ds.EchoTime = 12.0
        assert ds["EchoTime"].value == 12.0
        assert ds[Tag(0x0018, 0x0081)].value == 12.0
        assert "EchoTime" in ds and 0x00180081 in ds
        del ds["EchoTime"]
        assert "EchoTime" not in ds

    def test_unknown_keyword_raises(self):
        ds = Dataset()
        with pytest.raises(TypeError):
            ds.NotARealKeyword = 1
        with pytest.raises(AttributeError):
            _ = ds.EchoTime

    def test_pickle_and_deepcopy(self):
        ds = Dataset()
        ds.EchoTime = 10.0
        ds[Tag(0x0019, 0x10B6)] = 3132.0
        ds2 = pickle.loads(pickle.dumps(ds))
        ds3 = copy.deepcopy(ds)
        for d in (ds2, ds3):
            assert d.EchoTime == 10.0
            assert d[0x001910B6].value == 3132.0

    def test_sequence_roundtrip(self):
        inner = Dataset()
        inner.EchoTime = 5.0
        ds = Dataset()
        ds.SOPInstanceUID = generate_uid()
        ds.add_new(Tag(0x0008, 0x1140), "SQ", [inner])
        buf = io.BytesIO()
        write_dicom(ds, buf)
        back = read_dicom_bytes(buf.getvalue())
        assert back[Tag(0x0008, 0x1140)].value[0].EchoTime == 5.0

    def test_undecodable_transfer_syntax_rejected(self):
        # An unknown compressed syntax (J2K now decodes via OpenJPEG).
        fm = _explicit_elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.99")
        fm_len = _explicit_elem(0x0002, 0x0000, b"UL", struct.pack("<I", len(fm)))
        blob = b"\x00" * 128 + b"DICM" + fm_len + fm
        with pytest.raises(NotImplementedError):
            read_dicom_bytes(blob)


def test_qdess_private_tags_have_vr():
    """The GE qDESS private tags live in the creator-gated private registry;
    ImagerPixelSpacing is a standard tag."""
    from dosma_tpu.core.io.dicom import tags as T

    assert T.PRIVATE_TAG_VR[0x001910B6] == ("GEMS_ACQU", "DS")
    assert T.PRIVATE_TAG_VR[0x001910B7] == ("GEMS_ACQU", "DS")
    assert T.TAG_TO_VR[0x00181164] == "DS"  # ImagerPixelSpacing


def test_private_tag_vr_is_creator_gated():
    """The GE qDESS private VRs apply only when the block's private-creator
    element matches GEMS_ACQU (pydicom's private-dictionary behavior)."""
    from dosma_tpu.core.io.dicom.reader import _resolve_implicit_vr

    # No creator recorded -> stays UN.
    assert _resolve_implicit_vr(0x001910B6, {}) == "UN"
    # Matching creator -> DS.
    creators = {(0x0019, 0x10): "GEMS_ACQU_01"}
    assert _resolve_implicit_vr(0x001910B6, creators) == "DS"
    assert _resolve_implicit_vr(0x001910B7, creators) == "DS"
    # Foreign vendor in the same block -> raw bytes.
    assert _resolve_implicit_vr(0x001910B6, {(0x0019, 0x10): "OTHER_VENDOR"}) == "UN"


class TestMalformedStreams:
    """Malformed Part-10 input must fail with clean exceptions — no hangs,
    no unbounded allocations, no silent wrong volumes."""

    def _raw(self, tmp_path):
        import os as _os

        from tests.util import write_dicom_series

        d = _os.path.join(tmp_path, "s")
        write_dicom_series(d, shape=(16, 16, 2), n_echos=1)
        f = _os.path.join(d, sorted(_os.listdir(d))[0])
        with open(f, "rb") as fh:
            return fh.read()

    def test_truncations_raise_cleanly(self, tmp_path):
        import pytest as _pytest

        from dosma_tpu.core.io.dicom import read_dicom_bytes

        raw = self._raw(tmp_path)
        for data in (
            b"\x00" * 132,          # magic-sized garbage
            raw[:140],               # truncated header
            raw[: len(raw) // 2],    # truncated mid-element
            raw[:-50],               # truncated pixel data
        ):
            with _pytest.raises((EOFError, ValueError)):
                read_dicom_bytes(data)

    def test_garbage_after_magic_raises(self, tmp_path):
        import pytest as _pytest

        from dosma_tpu.core.io.dicom import read_dicom_bytes

        raw = self._raw(tmp_path)
        with _pytest.raises((EOFError, ValueError)):
            read_dicom_bytes(raw[:132] + b"\xff" * 64)
