"""Public API conformance: every top-level export of the reference
(``/root/reference/dosma/__init__.py:12-33``, catalogued in SURVEY.md §1)
must exist on ``dosma_tpu``."""

import pytest

REFERENCE_TOP_LEVEL = [
    "MedicalVolume",
    "read",
    "write",
    "load",
    "save",
    "ImageDataFormat",
    "DicomReader",
    "DicomWriter",
    "NiftiReader",
    "NiftiWriter",
    "Device",
    "get_device",
    "to_device",
    "to_affine",
    "register",
    "apply_warp",
    "symlink_elastix",
    "unlink_elastix",
    "CurveFitter",
    "PolyFitter",
    "MonoExponentialFit",
    "curve_fit",
    "polyfit",
    "numpy_routines",
    "preferences",
    "collect_env_info",
    "debug",
    "setup_logger",
    # star-import closure of the reference's `from dosma.core import *`
    # (core/__init__.py re-exports io/orientation/quant_vals helpers)
    "get_reader",
    "get_writer",
    "generic_load",
    "get_filepath_variations",
    "convert_image_data_format",
    "get_transpose_inds",
    "get_flip_inds",
    "orientation_nib_to_standard",
    "orientation_standard_to_nib",
    "quant_vals",
]

EXTRA_SURFACE = [
    # scans
    "QDess", "CubeQuant", "Mapss", "Cones",
    # tissues
    "Tissue", "FemoralCartilage", "TibialCartilage", "PatellarCartilage", "Meniscus",
    # quantitative values
    "QuantitativeValue", "T1Rho", "T2", "T2Star",
    # fitting model functions
    "monoexponential", "biexponential",
    # orientation constants
    "SAGITTAL", "CORONAL", "AXIAL",
    # TPU-native additions
    "load_to_device", "cpu_device", "get_array_module",
]


@pytest.mark.parametrize("name", REFERENCE_TOP_LEVEL + EXTRA_SURFACE)
def test_top_level_export(name):
    import dosma_tpu

    assert getattr(dosma_tpu, name) is not None


def test_submodule_surface():
    """Key subsystem entry points importable at their documented paths."""
    from dosma_tpu.core.fitting import MonoExponentialFit  # noqa: F401
    from dosma_tpu.core.registration import register  # noqa: F401
    from dosma_tpu.models import get_model, model_from_config  # noqa: F401
    from dosma_tpu.msk.knee import handle_knee, knee_parser  # noqa: F401
    from dosma_tpu.ops.monoexp_pallas import monoexp_lm_pallas  # noqa: F401
    from dosma_tpu.ops.nlls import lm_fit  # noqa: F401
    from dosma_tpu.parallel.sharding import get_mesh, sharded_lm_fit  # noqa: F401
    from dosma_tpu.train import SegTrainer  # noqa: F401
    from dosma_tpu.utils.profiling import StageTimer, trace  # noqa: F401
