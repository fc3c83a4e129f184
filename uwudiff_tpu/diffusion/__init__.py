from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.diffusion.losses import (
    DiffusionLoss,
    DiffusionLossAux,
    EDMLoss,
    RectifiedFlowLoss,
    NNWeightedRFLoss,
    NNWeightedRFLossAux,
)

__all__ = [
    "NoiseSchedule",
    "DiffusionLoss",
    "DiffusionLossAux",
    "EDMLoss",
    "RectifiedFlowLoss",
    "NNWeightedRFLoss",
    "NNWeightedRFLossAux",
]
