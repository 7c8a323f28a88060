"""Training environment: functional train states, exact-semantics optimizer,
and the validation-rollback training controller."""

from tfkaldi_tpu.train.trainer import Trainer, TrainerConfig, TrainState
from tfkaldi_tpu.train.controller import TrainingController, NnetTrainOptions

__all__ = [
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "TrainingController",
    "NnetTrainOptions",
]
