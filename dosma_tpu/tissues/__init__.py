from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage  # noqa: F401
from dosma_tpu.tissues.meniscus import Meniscus  # noqa: F401
from dosma_tpu.tissues.patellar_cartilage import PatellarCartilage  # noqa: F401
from dosma_tpu.tissues.tibial_cartilage import TibialCartilage  # noqa: F401
from dosma_tpu.tissues.tissue import Tissue, largest_cc  # noqa: F401
