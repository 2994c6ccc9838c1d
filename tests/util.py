"""Shared test utilities (model: reference ``tests/util.py``).

Synthetic-physics fixtures instead of mocks: monoexponential volumes from the
forward model ``y = a*exp(b*x)`` (ref ``util.py:120-132``) and fake DICOM
headers (ref ``util.py:136-192``).
"""

import os

import numpy as np

from dosma_tpu.core.io.dicom import Dataset
from dosma_tpu.core.io.dicom.writer import generate_uid
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import to_affine, SAGITTAL

# --- Env-gated real-data tier (model: reference ``tests/util.py:25-52``) ----
#
# Point ``DOSMA_UNITTEST_DATA_PATH`` at a directory holding real scans /
# golden outputs / pretrained weights and the skip-gated tests in
# ``tests/test_real_data.py`` light up. Layout mirrors the reference:
#
#   <data>/scans/{qdess,mapss,cubequant,cones}/dicoms/   real DICOM series
#   <data>/datasets/oai/test_001_V00.nii.gz              OAI test volume
#   <data>/datasets/oai/expected/*.npy                   golden masks
#   <data>/weights/<alias>/*.h5                          pretrained weights
UNITTEST_DATA_PATH = os.environ.get(
    "DOSMA_UNITTEST_DATA_PATH", os.path.join(os.path.dirname(__file__), "../unittest-data/")
)
UNITTEST_SCANDATA_PATH = os.path.join(UNITTEST_DATA_PATH, "scans")
UNITTEST_WEIGHTS_PATH = os.environ.get(
    "DOSMA_WEIGHTS_PATH", os.path.join(UNITTEST_DATA_PATH, "weights")
)

SCANS = ["qdess", "mapss", "cubequant", "cones"]
SCANS_INFO = {
    "mapss": {"expected_num_echos": 7},
    "qdess": {"expected_num_echos": 2},
    "cubequant": {"expected_num_echos": 4},
    "cones": {"expected_num_echos": 4},
}


def is_data_available() -> bool:
    """True when the real-data directory exists (and isn't disabled)."""
    disable_data = os.environ.get("DOSMA_UNITTEST_DISABLE_DATA", "").lower() == "true"
    return not disable_data and os.path.isdir(UNITTEST_DATA_PATH)


def are_weights_available(alias: str) -> bool:
    return os.path.isdir(os.path.join(UNITTEST_WEIGHTS_PATH, alias))


def get_scan_dirpath(scan: str) -> str:
    return os.path.join(UNITTEST_SCANDATA_PATH, scan)


def get_dicoms_path(fp: str) -> str:
    return os.path.join(fp, "dicoms")


def build_dummy_headers(shape, fields=None):
    """Build an array of dummy DICOM headers with the given broadcast shape."""
    if isinstance(shape, int):
        shape = (shape,)
    n = int(np.prod(shape))
    headers = []
    for _ in range(n):
        ds = Dataset()
        ds.SOPInstanceUID = generate_uid()
        if fields:
            for k, v in fields.items():
                ds[k] = v
        headers.append(ds)
    arr = np.empty(n, dtype=object)
    for i, h in enumerate(headers):
        arr[i] = h
    return arr.reshape(shape)


def generate_monoexp_data(shape=(10, 10, 20), x=None, a=1.0, b=None, as_med_vol=True, seed=42):
    """Synthetic multi-echo data from ``y = a * exp(b*x)`` with random per-voxel b.

    Returns (ys, x, b) where ys is a list of MedicalVolumes (one per x).
    """
    rs = np.random.RandomState(seed)
    if x is None:
        x = np.asarray([0.5, 1.0, 2.0, 4.0])
    if b is None:
        b = -1 / (rs.rand(*shape) * 70 + 10)  # time constants in (10, 80)
    affine = to_affine(SAGITTAL, (0.4, 0.4, 0.8))
    ys = []
    for t in x:
        arr = a * np.exp(b * t)
        ys.append(MedicalVolume(arr, affine) if as_med_vol else arr)
    return ys, x, b


def build_dicom_dataset(
    arr2d,
    instance_number=1,
    echo_number=1,
    echo_time=10.0,
    position=(0.0, 0.0, 0.0),
    spacing=(0.5, 0.5),
    orientation=(1, 0, 0, 0, 1, 0),
    series_uid=None,
    extra=None,
):
    """Create a writable in-plane DICOM dataset around a 2D uint16 array."""
    ds = Dataset()
    ds.SOPInstanceUID = generate_uid()
    ds.SeriesInstanceUID = series_uid or generate_uid()
    ds.Modality = "MR"
    ds.InstanceNumber = instance_number
    ds.EchoNumbers = echo_number
    ds.EchoTime = echo_time
    ds.RepetitionTime = 20.0
    ds.FlipAngle = 30.0
    ds.Rows, ds.Columns = arr2d.shape
    ds.BitsAllocated = 16
    ds.BitsStored = 16
    ds.HighBit = 15
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelSpacing = list(spacing)
    ds.SliceThickness = 1.0
    ds.ImagePositionPatient = list(position)
    ds.ImageOrientationPatient = list(orientation)
    if extra:
        for k, v in extra.items():
            ds[k] = v
    ds["PixelData"] = np.ascontiguousarray(arr2d.astype(np.uint16)).tobytes()
    return ds


def write_dicom_series(
    dir_path,
    shape=(16, 16, 4),
    n_echos=2,
    spacing=(0.5, 0.5, 1.0),
    origin=(0.0, 0.0, 0.0),
    echo_times=None,
    extra=None,
    seed=7,
    plane="axial",
):
    """Write a synthetic multi-echo DICOM series to ``dir_path``.

    ``plane='axial'``: in-plane identity direction, slices along z.
    ``plane='sagittal'``: in-plane (AP, SI), slices along x (the acquisition
    geometry the segmentation models expect). Returns the raw 4D array
    (rows, cols, slices, echos).
    """
    import os

    from dosma_tpu.core.io.dicom import write_dicom

    rs = np.random.RandomState(seed)
    rows, cols, nslices = shape
    if echo_times is None:
        echo_times = [10.0 * (e + 1) for e in range(n_echos)]
    os.makedirs(dir_path, exist_ok=True)
    arr = (rs.rand(rows, cols, nslices, n_echos) * 1000).astype(np.uint16)
    series_uid = generate_uid()

    if plane == "axial":
        orientation = (1, 0, 0, 0, 1, 0)  # cols→x, rows→y; slices step +z
        step = np.array([0.0, 0.0, spacing[2]])
    elif plane == "sagittal":
        # cols→A-P (+y), rows→S-I (-z); slices step +x (L-R in LPS).
        orientation = (0, 1, 0, 0, 0, -1)
        step = np.array([spacing[2], 0.0, 0.0])
    else:
        raise ValueError(plane)

    i = 0
    for e in range(n_echos):
        for s in range(nslices):
            pos = tuple(np.asarray(origin, float) + s * step)
            ds = build_dicom_dataset(
                arr[:, :, s, e],
                instance_number=i + 1,
                echo_number=e + 1,
                echo_time=echo_times[e],
                position=pos,
                spacing=spacing[:2],
                orientation=orientation,
                series_uid=series_uid,
                extra=extra,
            )
            write_dicom(ds, os.path.join(dir_path, f"I{i + 1:04d}.dcm"))
            i += 1
    return arr
