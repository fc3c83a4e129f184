from uwudiff_tpu.models.unet import UNet2DConditionModel, UNET_PRESETS
from uwudiff_tpu.models.vae import AutoencoderKL
from uwudiff_tpu.models.text_encoders import ConcatTextEncoders, TextModelExtraConfig

__all__ = [
    "UNet2DConditionModel",
    "UNET_PRESETS",
    "AutoencoderKL",
    "ConcatTextEncoders",
    "TextModelExtraConfig",
]
