from .optim import get_optimizer, get_lr_schedule
from .trainable import select_trainable
from .train_step import (TrainStepConfig, make_split_train_step,
                         make_train_step, TrainState)

__all__ = [
    "get_optimizer", "get_lr_schedule", "select_trainable",
    "TrainStepConfig", "make_train_step", "make_split_train_step",
    "TrainState",
]
