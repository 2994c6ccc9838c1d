"""Orientation utilities tests (model: reference tests/core/test_orientation.py)."""

import itertools

import numpy as np
import pytest

from dosma_tpu.core.orientation import (
    AXIAL,
    CORONAL,
    SAGITTAL,
    get_flip_inds,
    get_transpose_inds,
    orientation_from_affine,
    orientation_nib_to_standard,
    orientation_standard_to_nib,
    to_affine,
)

_ALL_ORNT = [
    (a, b, c)
    for a in ("LR", "RL")
    for b in ("PA", "AP")
    for c in ("IS", "SI")
]


def _all_orientations():
    out = []
    for base in _ALL_ORNT:
        for perm in itertools.permutations(range(3)):
            out.append(tuple(base[i] for i in perm))
    return out


def test_to_affine_docstring_example():
    A = to_affine(("SI", "AP", "RL"), spacing=(0.5, 0.5, 1.5), origin=(10, 20, 0))
    expected = np.array(
        [
            [0, 0, -1.5, 10],
            [0, -0.5, 0, 20],
            [-0.5, 0, 0, 0],
            [0, 0, 0, 1],
        ],
        dtype=float,
    )
    assert np.allclose(A, expected)


def test_to_affine_roundtrip_all_orientations():
    for ornt in _all_orientations():
        A = to_affine(ornt, spacing=(0.4, 0.5, 0.6), origin=(1, 2, 3))
        assert orientation_from_affine(A) == ornt


def test_to_affine_scalar_and_partial_args():
    A = to_affine(SAGITTAL, spacing=2)
    sp = tuple(np.sqrt((A[:3, :3] ** 2).sum(0)))
    assert sp == (2.0, 2.0, 2.0)
    A = to_affine(SAGITTAL, spacing=(0.5,))
    sp = tuple(np.sqrt((A[:3, :3] ** 2).sum(0)))
    assert sp == (0.5, 1.0, 1.0)


def test_to_affine_infer_2d():
    A = to_affine(("SI", "AP"))
    assert orientation_from_affine(A) in [("SI", "AP", "LR"), ("SI", "AP", "RL")]


def test_to_affine_invalid():
    with pytest.raises(ValueError):
        to_affine(("SI", "SI", "AP"))
    with pytest.raises(ValueError):
        to_affine(("XX", "AP", "LR"))


def test_transpose_inds():
    assert get_transpose_inds(("SI", "AP", "LR"), ("AP", "SI", "LR")) == (1, 0, 2)
    assert get_transpose_inds(("SI", "AP", "LR"), ("IS", "PA", "RL")) == (0, 1, 2)


def test_flip_inds():
    assert get_flip_inds(("SI", "AP", "LR"), ("IS", "AP", "RL")) == [0, 2]
    with pytest.raises(ValueError):
        get_flip_inds(("SI", "AP", "LR"), ("AP", "SI", "LR"))


def test_nib_conversions():
    assert orientation_nib_to_standard(("R", "A", "S")) == ("LR", "PA", "IS")
    assert orientation_standard_to_nib(("LR", "PA", "IS")) == ("R", "A", "S")
    for ornt in _all_orientations():
        assert orientation_nib_to_standard(orientation_standard_to_nib(ornt)) == ornt


def test_plane_constants():
    assert SAGITTAL == ("SI", "AP", "LR")
    assert CORONAL == ("SI", "LR", "AP")
    assert AXIAL == ("AP", "LR", "SI")
