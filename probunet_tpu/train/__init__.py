from probunet_tpu.train.state import TrainState, create_train_state
from probunet_tpu.train.schedule import beta_schedule
from probunet_tpu.train.early_stop import EarlyStopper
from probunet_tpu.train.loop import (
    make_train_step,
    make_eval_step,
    make_deterministic_train_step,
    train_epoch,
    eval_model,
    Trainer,
)
from probunet_tpu.train.checkpoint import CheckpointManager
from probunet_tpu.train.logging import MetricLogger

__all__ = [
    "TrainState",
    "create_train_state",
    "beta_schedule",
    "EarlyStopper",
    "make_train_step",
    "make_eval_step",
    "make_deterministic_train_step",
    "train_epoch",
    "eval_model",
    "Trainer",
    "CheckpointManager",
    "MetricLogger",
]
