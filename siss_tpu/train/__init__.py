from siss_tpu.train.ema import EMAState, ema_decay, ema_update
from siss_tpu.train.state import TrainState
from siss_tpu.train.step import (
    DeletionStepConfig,
    build_deletion_train_step,
    build_pretrain_step,
    fold_steps,
    global_norm,
    clip_by_global_norm,
)

__all__ = [
    "EMAState",
    "ema_decay",
    "ema_update",
    "TrainState",
    "DeletionStepConfig",
    "build_deletion_train_step",
    "build_pretrain_step",
    "fold_steps",
    "global_norm",
    "clip_by_global_norm",
]
