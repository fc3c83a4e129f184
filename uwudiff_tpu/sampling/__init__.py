from uwudiff_tpu.sampling.wrapper import (
    EDMDenoiser,
    KDiffusionDenoiser,
    RFDenoiser,
    VDenoiser,
    denoiser_for_loss,
    append_dims,
)
from uwudiff_tpu.sampling.get_sigmas import (
    get_sigmas_for_rf,
    karras_sigmas,
    uniform_time,
    sigmoid_time,
    sigmoid_time_scale,
    shift_time,
    dynamic_shift_time,
    mu_for_image_seq_len,
    exponential_sigmas,
    polyexponential_sigmas,
    beta_sigmas,
    ays_sigmas,
)
from uwudiff_tpu.sampling.euler import (
    sample_euler_ancestral,
    sample_euler_ancestral_cfgpp,
)
from uwudiff_tpu.sampling.dpm2 import sample_dpm2, sample_dpm2_cfgpp
from uwudiff_tpu.sampling.dpmpp import (
    sample_dpmpp_2m,
    sample_dpmpp_2m_sde,
    sample_dpmpp_2s_ancestral,
    sample_dpmpp_sde,
    sample_dpmpp_3m_sde,
)
from uwudiff_tpu.sampling.heun import sample_heun
from uwudiff_tpu.sampling.lcm import LCMDenoiser, sample_lcm, get_sigmas_lcm
from uwudiff_tpu.sampling.unipc import sample_unipc
from uwudiff_tpu.sampling.cfg import (
    cfg_wrapper,
    cond_text_wrapper,
    build_class_cfg_fn,
)
from uwudiff_tpu.sampling.sampling import (
    diffusion_sampling,
    class_conditional_sampling,
)
from uwudiff_tpu.sampling.euler_latent import euler_latent_sampling
from uwudiff_tpu.sampling.img2img import (
    image_to_image_sampling,
    img2img_sigmas,
    masked_model_wrapper,
)

__all__ = [
    "KDiffusionDenoiser",
    "EDMDenoiser",
    "RFDenoiser",
    "VDenoiser",
    "denoiser_for_loss",
    "append_dims",
    "get_sigmas_for_rf",
    "exponential_sigmas",
    "polyexponential_sigmas",
    "beta_sigmas",
    "ays_sigmas",
    "karras_sigmas",
    "uniform_time",
    "sigmoid_time",
    "sigmoid_time_scale",
    "shift_time",
    "dynamic_shift_time",
    "mu_for_image_seq_len",
    "sample_euler_ancestral",
    "sample_euler_ancestral_cfgpp",
    "sample_dpm2",
    "sample_dpm2_cfgpp",
    "sample_dpmpp_2m",
    "sample_dpmpp_2s_ancestral",
    "sample_dpmpp_sde",
    "sample_dpmpp_3m_sde",
    "sample_dpmpp_2m_sde",
    "sample_heun",
    "LCMDenoiser",
    "sample_lcm",
    "get_sigmas_lcm",
    "sample_unipc",
    "cfg_wrapper",
    "cond_text_wrapper",
    "diffusion_sampling",
    "class_conditional_sampling",
    "build_class_cfg_fn",
    "euler_latent_sampling",
    "image_to_image_sampling",
    "img2img_sigmas",
    "masked_model_wrapper",
]
