from dosma_tpu.models.oaiunet2d import (  # noqa: F401
    IWOAIOAIUnet2D,
    IWOAIOAIUnet2DNormalized,
    OAIUnet2D,
)
from dosma_tpu.models.seg_model import JaxSegModel, KerasSegModel, SegModel, whiten_volume  # noqa: F401
from dosma_tpu.models.stanford_qdess import StanfordQDessUNet2D  # noqa: F401
from dosma_tpu.models.util import SUPPORTED_MODELS, get_model, model_from_config  # noqa: F401
