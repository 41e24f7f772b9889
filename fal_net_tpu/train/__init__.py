"""Training: configs, stage losses, trainer loop, checkpointing."""

from fal_net_tpu.train.config import Stage1Config, Stage2Config, TrainConfig
from fal_net_tpu.train.stages import (
    stage1_loss,
    stage1_slow_loss,
    stage2_loss,
)
from fal_net_tpu.train.state import TrainState, create_train_state, make_lr_schedule
from fal_net_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from fal_net_tpu.train.trainer import Trainer

__all__ = [
    "TrainConfig",
    "Stage1Config",
    "Stage2Config",
    "stage1_loss",
    "stage1_slow_loss",
    "stage2_loss",
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "save_checkpoint",
    "load_checkpoint",
    "Trainer",
]
