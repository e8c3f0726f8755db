from . import checkpoints, lr_schedules, trainer
from .trainer import Experiment, Trainer, TrainState, make_eval_step, make_loss_fn, make_train_step

__all__ = [
    "checkpoints",
    "lr_schedules",
    "trainer",
    "Experiment",
    "Trainer",
    "TrainState",
    "make_eval_step",
    "make_loss_fn",
    "make_train_step",
]
