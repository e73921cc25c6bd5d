from neurosync_trainer_lite_tpu.training.optim import make_optimizer, lr_factor
from neurosync_trainer_lite_tpu.training.step import (
    TrainState,
    init_train_state,
    make_train_step,
    make_eval_step,
)
from neurosync_trainer_lite_tpu.training.loop import train_model

__all__ = [
    "make_optimizer",
    "lr_factor",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "train_model",
]
