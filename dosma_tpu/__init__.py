"""dosma_tpu: a TPU-native quantitative-MRI framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of ad12/DOSMA
(reference mounted at /root/reference). Public API mirrors the reference's
top-level exports (``/root/reference/dosma/__init__.py:12-33``).
"""

__version__ = "0.1.0"

from dosma_tpu.core.device import Device, cpu_device, get_array_module, get_device, to_device  # noqa: F401
from dosma_tpu.core.med_volume import MedicalVolume  # noqa: F401
from dosma_tpu.core.orientation import AXIAL, CORONAL, SAGITTAL, to_affine  # noqa: F401
from dosma_tpu.core import numpy_routines  # noqa: F401
from dosma_tpu.defaults import preferences  # noqa: F401
from dosma_tpu.utils.env import debug  # noqa: F401
from dosma_tpu.utils.logger import setup_logger  # noqa: F401


def __getattr__(name):
    """Lazy attribute access for heavier submodule exports.

    Keeps ``import dosma_tpu`` fast: I/O, fitting, registration, models, and
    scan pipelines are loaded on first use.
    """
    from importlib import import_module

    lazy_map = {
        # I/O
        "read": ("dosma_tpu.core.io.format_io_utils", "read"),
        "write": ("dosma_tpu.core.io.format_io_utils", "write"),
        "load": ("dosma_tpu.core.io.format_io_utils", "read"),
        "save": ("dosma_tpu.core.io.format_io_utils", "write"),
        "ImageDataFormat": ("dosma_tpu.core.io.format_io", "ImageDataFormat"),
        "DicomReader": ("dosma_tpu.core.io.dicom_io", "DicomReader"),
        "DicomWriter": ("dosma_tpu.core.io.dicom_io", "DicomWriter"),
        "NiftiReader": ("dosma_tpu.core.io.nifti_io", "NiftiReader"),
        "NiftiWriter": ("dosma_tpu.core.io.nifti_io", "NiftiWriter"),
        "get_reader": ("dosma_tpu.core.io.format_io_utils", "get_reader"),
        "get_writer": ("dosma_tpu.core.io.format_io_utils", "get_writer"),
        "generic_load": ("dosma_tpu.core.io.format_io_utils", "generic_load"),
        "get_filepath_variations": (
            "dosma_tpu.core.io.format_io_utils",
            "get_filepath_variations",
        ),
        "convert_image_data_format": (
            "dosma_tpu.core.io.format_io_utils",
            "convert_image_data_format",
        ),
        # Fitting
        "CurveFitter": ("dosma_tpu.core.fitting", "CurveFitter"),
        "PolyFitter": ("dosma_tpu.core.fitting", "PolyFitter"),
        "MonoExponentialFit": ("dosma_tpu.core.fitting", "MonoExponentialFit"),
        "curve_fit": ("dosma_tpu.core.fitting", "curve_fit"),
        "polyfit": ("dosma_tpu.core.fitting", "polyfit"),
        "monoexponential": ("dosma_tpu.core.fitting", "monoexponential"),
        "biexponential": ("dosma_tpu.core.fitting", "biexponential"),
        # Registration
        "register": ("dosma_tpu.core.registration", "register"),
        "apply_warp": ("dosma_tpu.core.registration", "apply_warp"),
        "symlink_elastix": ("dosma_tpu.core.registration", "symlink_elastix"),
        "unlink_elastix": ("dosma_tpu.core.registration", "unlink_elastix"),
        # Orientation helpers
        "get_transpose_inds": ("dosma_tpu.core.orientation", "get_transpose_inds"),
        "get_flip_inds": ("dosma_tpu.core.orientation", "get_flip_inds"),
        "orientation_nib_to_standard": (
            "dosma_tpu.core.orientation",
            "orientation_nib_to_standard",
        ),
        "orientation_standard_to_nib": (
            "dosma_tpu.core.orientation",
            "orientation_standard_to_nib",
        ),
        # Quant values
        "T1Rho": ("dosma_tpu.core.quant_vals", "T1Rho"),
        "T2": ("dosma_tpu.core.quant_vals", "T2"),
        "T2Star": ("dosma_tpu.core.quant_vals", "T2Star"),
        "QuantitativeValue": ("dosma_tpu.core.quant_vals", "QuantitativeValue"),
        # Scans
        "QDess": ("dosma_tpu.scan_sequences.mri", "QDess"),
        "CubeQuant": ("dosma_tpu.scan_sequences.mri", "CubeQuant"),
        "Mapss": ("dosma_tpu.scan_sequences.mri", "Mapss"),
        "Cones": ("dosma_tpu.scan_sequences.mri", "Cones"),
        # Tissues
        "Tissue": ("dosma_tpu.tissues.tissue", "Tissue"),
        "FemoralCartilage": ("dosma_tpu.tissues.femoral_cartilage", "FemoralCartilage"),
        "TibialCartilage": ("dosma_tpu.tissues.tibial_cartilage", "TibialCartilage"),
        "PatellarCartilage": ("dosma_tpu.tissues.patellar_cartilage", "PatellarCartilage"),
        "Meniscus": ("dosma_tpu.tissues.meniscus", "Meniscus"),
        # Prefetch / parallel
        "load_to_device": ("dosma_tpu.core.io.prefetch", "load_to_device"),
        # Utils
        "collect_env_info": ("dosma_tpu.utils.collect_env", "collect_env_info"),
    }
    if name in lazy_map:
        module, attr = lazy_map[name]
        return getattr(import_module(module), attr)
    if name == "quant_vals":  # reference exposes the module itself
        return import_module("dosma_tpu.core.quant_vals")
    raise AttributeError(f"module 'dosma_tpu' has no attribute {name!r}")
