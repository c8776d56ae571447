from image_segmentation_tpu.train.state import TrainState, create_train_state
from image_segmentation_tpu.train.steps import (
    make_eval_forward,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_forward",
]
