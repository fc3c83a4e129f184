from uwudiff_tpu.training.trainer import DMTrainer, TrainState
from uwudiff_tpu.training.controlnet import ControlNetTrainer
from uwudiff_tpu.training.ip_adapter import IPAdapterTrainer
from uwudiff_tpu.training.textual_inversion import TextualInversionTrainer
from uwudiff_tpu.training.distill import (
    ConsistencyDistillLoss,
    LCMDistillTrainer,
    boundary_scalings,
)
from uwudiff_tpu.training.optimizers import build_optimizer, adamw_fp16_state
from uwudiff_tpu.training.lr_schedules import (
    warmup_cosine_schedule,
    cosine_annealing,
    gradual_warmup,
)

__all__ = [
    "DMTrainer",
    "TrainState",
    "ControlNetTrainer",
    "TextualInversionTrainer",
    "IPAdapterTrainer",
    "ConsistencyDistillLoss",
    "LCMDistillTrainer",
    "boundary_scalings",
    "build_optimizer",
    "adamw_fp16_state",
    "warmup_cosine_schedule",
    "cosine_annealing",
    "gradual_warmup",
]
