"""Registration parameter presets (analog of
``/root/reference/dosma/file_constants.py:12-28``).

The reference ships elastix DSL parameter files; dosma_tpu ships YAML
presets for its XLA-native registrar with the same roles. The constants
keep the reference's names so downstream code is drop-in compatible.
"""

import os

_REG_DIR = os.path.join(os.path.dirname(__file__), "resources", "registration")

ELASTIX_RIGID_PARAMS_FILE = os.path.join(_REG_DIR, "parameters-rigid.yaml")
ELASTIX_AFFINE_PARAMS_FILE = os.path.join(_REG_DIR, "parameters-affine.yaml")
ELASTIX_BSPLINE_PARAMS_FILE = os.path.join(_REG_DIR, "parameters-bspline.yaml")
ELASTIX_RIGID_INTERREGISTER_PARAMS_FILE = os.path.join(
    _REG_DIR, "parameters-rigid-interregister.yaml"
)
ELASTIX_AFFINE_INTERREGISTER_PARAMS_FILE = os.path.join(
    _REG_DIR, "parameters-affine-interregister.yaml"
)

# Temp folder root (reference ``file_constants.py``).
def _temp_folder_path():
    from dosma_tpu.utils import env

    return env.temp_dir()


TEMP_FOLDER_PATH = property(_temp_folder_path)
