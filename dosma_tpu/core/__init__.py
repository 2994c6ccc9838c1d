"""Core package surface (mirrors the reference's re-exports,
``/root/reference/dosma/core/__init__.py``)."""

from dosma_tpu.core import io  # noqa: F401

from dosma_tpu.core import (  # noqa: F401
    device,
    fitting,
    med_volume,
    numpy_routines,
    orientation,
    quant_vals,
    registration,
)

from dosma_tpu.core.device import *  # noqa: F401,F403
from dosma_tpu.core.fitting import *  # noqa: F401,F403
from dosma_tpu.core.io import *  # noqa: F401,F403
from dosma_tpu.core.med_volume import *  # noqa: F401,F403
from dosma_tpu.core.orientation import *  # noqa: F401,F403
from dosma_tpu.core.registration import *  # noqa: F401,F403

__all__ = ["numpy_routines", "quant_vals"]
__all__.extend(device.__all__)
__all__.extend(fitting.__all__)
__all__.extend(io.__all__)
__all__.extend(med_volume.__all__)
__all__.extend(orientation.__all__)
__all__.extend(registration.__all__)
