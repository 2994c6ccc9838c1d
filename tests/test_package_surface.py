"""Reference package-surface parity: every public name a reference user
imports from `dosma.<pkg>` must exist at the same path in `dosma_tpu`
(ref `__init__` re-exports: dosma/__init__.py, core/__init__.py,
core/io/__init__.py, scan_sequences/__init__.py)."""


def test_top_level_surface():
    import dosma_tpu as dm

    for n in (
        "MedicalVolume", "Device", "DicomReader", "DicomWriter", "NiftiReader",
        "NiftiWriter", "ImageDataFormat", "read", "write", "CurveFitter",
        "PolyFitter", "MonoExponentialFit", "curve_fit", "polyfit", "register",
        "apply_warp", "symlink_elastix", "unlink_elastix", "collect_env_info",
        "preferences", "setup_logger",
    ):
        assert hasattr(dm, n), n


def test_core_surface():
    import dosma_tpu.core as c

    for n in (
        "MedicalVolume", "Device", "cpu_device", "get_array_module", "get_device",
        "to_device", "register", "apply_warp", "curve_fit", "polyfit",
        "DicomReader", "NiftiWriter", "ImageDataFormat", "numpy_routines",
        "quant_vals", "to_affine",
    ):
        assert hasattr(c, n), n


def test_core_io_surface():
    import dosma_tpu.core.io as io

    for n in ("DicomReader", "DicomWriter", "NiftiReader", "NiftiWriter",
              "ImageDataFormat", "read", "write"):
        assert hasattr(io, n), n


def test_scan_sequences_surface():
    import dosma_tpu.scan_sequences as ss

    for n in ("QDess", "CubeQuant", "Mapss", "Cones", "ScanSequence",
              "NonTargetSequence"):
        assert hasattr(ss, n), n


def test_tissues_models_surface():
    import dosma_tpu.models as mo
    import dosma_tpu.tissues as ti

    for n in ("FemoralCartilage", "TibialCartilage", "PatellarCartilage",
              "Meniscus", "Tissue"):
        assert hasattr(ti, n), n
    for n in ("OAIUnet2D", "IWOAIOAIUnet2D", "IWOAIOAIUnet2DNormalized",
              "StanfordQDessUNet2D", "get_model", "SUPPORTED_MODELS"):
        assert hasattr(mo, n), n
