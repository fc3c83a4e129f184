from uwudiff_tpu.training.trainer import DMTrainer, TrainState
from uwudiff_tpu.training.optimizers import build_optimizer, adamw_fp16_state
from uwudiff_tpu.training.lr_schedules import (
    warmup_cosine_schedule,
    cosine_annealing,
    gradual_warmup,
)

__all__ = [
    "DMTrainer",
    "TrainState",
    "build_optimizer",
    "adamw_fp16_state",
    "warmup_cosine_schedule",
    "cosine_annealing",
    "gradual_warmup",
]
