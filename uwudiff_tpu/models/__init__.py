from uwudiff_tpu.models.unet import UNet2DConditionModel, UNET_PRESETS
from uwudiff_tpu.models.ip_adapter import (
    ImageProjection,
    build_ip_unet_fn,
)
from uwudiff_tpu.models.controlnet import (
    build_controlnet_unet_fn,
    controlnet_from_unet,
    controlnet_params_from_unet,
)
from uwudiff_tpu.models.vae import AutoencoderKL
from uwudiff_tpu.models.text_encoders import ConcatTextEncoders, TextModelExtraConfig
from uwudiff_tpu.models.dit import DiT, DIT_PRESETS
from uwudiff_tpu.models.mmdit import MMDiT, MMDIT_PRESETS
from uwudiff_tpu.models.flux import Flux, FLUX_PRESETS

__all__ = [
    "UNet2DConditionModel",
    "build_controlnet_unet_fn",
    "ImageProjection",
    "build_ip_unet_fn",
    "controlnet_from_unet",
    "controlnet_params_from_unet",
    "UNET_PRESETS",
    "AutoencoderKL",
    "ConcatTextEncoders",
    "TextModelExtraConfig",
    "DiT",
    "DIT_PRESETS",
    "MMDiT",
    "MMDIT_PRESETS",
    "Flux",
    "FLUX_PRESETS",
]
