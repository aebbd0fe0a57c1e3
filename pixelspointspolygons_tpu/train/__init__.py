from .pix2poly_step import make_train_step, make_val_step, model_inputs
from .state import (
    TrainState,
    cosine_with_warmup,
    create_train_state,
    linear_warmup_decay,
    make_optimizer,
    num_params,
)

__all__ = [
    "TrainState",
    "cosine_with_warmup",
    "create_train_state",
    "linear_warmup_decay",
    "make_optimizer",
    "make_train_step",
    "make_val_step",
    "model_inputs",
    "num_params",
]
