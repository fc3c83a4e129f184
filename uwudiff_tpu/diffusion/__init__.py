from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.diffusion.losses import (
    DiffusionLoss,
    DiffusionLossAux,
    RectifiedFlowLoss,
    NNWeightedRFLoss,
    NNWeightedRFLossAux,
)

__all__ = [
    "NoiseSchedule",
    "DiffusionLoss",
    "DiffusionLossAux",
    "RectifiedFlowLoss",
    "NNWeightedRFLoss",
    "NNWeightedRFLossAux",
]
