from .losses import (
    crossfield_align_loss,
    crossfield_align90_loss,
    crossfield_smooth_loss,
    dice_loss,
    epoch_weight,
    make_ffl_loss,
    seg_loss,
)
from .model import FFL, build_ffl

__all__ = [
    "FFL",
    "build_ffl",
    "crossfield_align_loss",
    "crossfield_align90_loss",
    "crossfield_smooth_loss",
    "dice_loss",
    "epoch_weight",
    "make_ffl_loss",
    "seg_loss",
]
