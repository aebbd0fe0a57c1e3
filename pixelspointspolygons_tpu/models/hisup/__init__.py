from .factory import build_hisup
from .model import (
    ECA,
    HiSup,
    encode_targets,
    extract_junctions,
    hisup_losses,
    nms_2d,
    sigmoid_l1_loss,
)

__all__ = [
    "ECA",
    "HiSup",
    "build_hisup",
    "encode_targets",
    "extract_junctions",
    "hisup_losses",
    "nms_2d",
    "sigmoid_l1_loss",
]
