"""Image-to-image and mask inpainting on top of the sampler stack.

Beyond-the-reference capability (the reference exposes txt2img and
latent inversion only, ``duwu/sampling/sampling.py``): strength-based
img2img (SDEdit: re-noise the init latent to an intermediate sigma and
denoise from there) and denoised-space mask inpainting, composable with
EVERY sampler in the family (euler/dpm2/heun/dpm++/lcm) because both
are expressed as (a) a truncated sigma schedule and (b) a model-output
blend — no per-sampler code.

Inpainting convention: ``mask`` is 1 where the model repaints and 0
where the init image is kept (any value in between soft-blends). The
blend happens in denoised (x0) space every step — the known region's
prediction is pinned to the init latent, so each sampler step pulls the
state toward it at exactly the schedule's pace (the standard
latent-inpaint trick, equivalent to re-noising the known region each
step for these denoised-anchored samplers).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data.utils import vae_image_postprocess
from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.sampling.euler import sample_euler_ancestral
from uwudiff_tpu.sampling.wrapper import KDiffusionDenoiser
from uwudiff_tpu.utils import truncate_or_pad_to_length

__all__ = [
    "img2img_sigmas",
    "masked_model_wrapper",
    "image_to_image_sampling",
]


def img2img_sigmas(
    schedule: NoiseSchedule,
    num_steps: int,
    strength: float,
    get_sigma_func: Callable | None = None,
) -> jnp.ndarray:
    """Truncate the inference schedule to its last ``strength`` portion.

    ``strength`` in (0, 1]: 1.0 keeps the full schedule (txt2img from
    pure noise); smaller values start lower on the noise ladder, so the
    output stays closer to the init image. At least one step always
    survives. The returned array still ends at sigma=0.
    """
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    if get_sigma_func is None:
        sigmas = schedule.sample_sigmas_descending(num_steps)
    else:
        sigmas = jnp.asarray(np.asarray(get_sigma_func(num_steps), np.float32))
    n = sigmas.shape[0] - 1  # number of steps in the full schedule
    keep = max(1, min(n, int(round(n * strength))))
    return sigmas[n - keep :]


def masked_model_wrapper(
    model: Callable,
    init_latent: jnp.ndarray,
    mask: jnp.ndarray,
) -> Callable:
    """Pin the denoised prediction to ``init_latent`` where mask == 0.

    ``model`` follows the sampler contract ``(x, sigma, sigma_cond=...)
    -> (denoised, uncond)``; both outputs are blended so CFG++ variants
    stay consistent.
    """
    mask = jnp.asarray(mask, init_latent.dtype)

    def blend(d):
        if d is None:
            return None
        return mask * d + (1.0 - mask) * init_latent

    def wrapped(x, sigma, sigma_cond=None, **kwargs):
        denoised, uncond = model(x, sigma, sigma_cond=sigma_cond, **kwargs)
        return blend(denoised), blend(uncond)

    return wrapped


def image_to_image_sampling(
    unet_fn: Callable,  # (params, x, t, ctx, mask, added) (see sampling.py)
    te,  # TextEncodingPipeline
    init_image,  # [N,H,W,3] in [-1,1] float, or None when init_latent given
    prompt,
    neg_prompt,
    vae_encode: Callable | None = None,  # (images, rng) -> raw latents
    vae_decode: Callable | None = None,
    train_schedule: NoiseSchedule | None = None,
    init_latent: jnp.ndarray | None = None,  # pre-encoded, normalized
    strength: float = 0.6,
    num_steps: int = 16,
    get_sigma_func: Callable | None = None,
    inpaint_mask: jnp.ndarray | None = None,  # latent-res; 1 = repaint
    cfg_scale: float = 3.0,
    seed: int = 42,
    vae_std: float | None = None,
    vae_mean: float | None = None,
    vae_downscale: int = 8,  # latent->pixel factor for time_ids sizing
    internal_sampling_func: Callable | None = None,
    return_latents: bool = False,
    jit_compile: bool = True,
    unet_params=None,
    denoiser_cls: type = KDiffusionDenoiser,
    prompt_weighting: bool = False,
    long_prompt: bool = False,
    cfg_interval: tuple[float, float] | None = None,
):
    """SDEdit img2img / inpainting (contract mirrors
    ``sampling.py::diffusion_sampling``; latents work in the unscaled
    k-diffusion space ``x = x0 + sigma * eps``).

    Provide either ``init_image`` (+ ``vae_encode``) or a normalized
    ``init_latent``. ``inpaint_mask`` (broadcastable to the latent,
    e.g. [N,h,w,1]) switches on mask inpainting.
    """
    assert train_schedule is not None, "train_schedule is required"
    rng = jax.random.PRNGKey(seed)
    internal_sampling_func = internal_sampling_func or sample_euler_ancestral
    vae_std = vae_std if vae_std is not None else 1.0
    vae_mean = vae_mean or 0.0

    rng, rng_enc, rng_noise, rng_samp = jax.random.split(rng, 4)
    if init_latent is None:
        assert init_image is not None and vae_encode is not None, (
            "need init_image + vae_encode (or a pre-encoded init_latent)"
        )
        init_latent = (
            vae_encode(jnp.asarray(init_image), rng_enc) - vae_mean
        ) / vae_std
    num_samples = init_latent.shape[0]

    if isinstance(prompt, str):
        prompt = [prompt]
    if isinstance(neg_prompt, str):
        neg_prompt = [neg_prompt]
    prompt = truncate_or_pad_to_length(
        list(prompt), num_samples, padding_mode="cycling"
    )
    neg_prompt = truncate_or_pad_to_length(
        list(neg_prompt), num_samples, padding_mode="cycling"
    )

    from uwudiff_tpu.sampling.cfg import build_cfg_fn, encode_cfg_inputs

    h_lat, w_lat = init_latent.shape[1:3]
    enc = encode_cfg_inputs(
        prompt, neg_prompt, w_lat * vae_downscale, h_lat * vae_downscale, te,
        prompt_weighting=prompt_weighting,
        long_prompt=long_prompt,
    )

    sigmas = img2img_sigmas(
        train_schedule, num_steps, strength, get_sigma_func=get_sigma_func
    )

    def make_model_fn(params):
        def eps_fn(x, t, **kwargs):
            args = (
                x,
                t,
                kwargs.get("encoder_hidden_states"),
                kwargs.get("encoder_attention_mask"),
                kwargs.get("added_cond"),
            )
            return unet_fn(params, *args) if params is not None else unet_fn(*args)

        wrapper = denoiser_cls(
            model_fn=eps_fn, schedule=train_schedule, quantize=False
        )
        model = build_cfg_fn(
            wrapper, enc, cfg_scale, cfg_interval=cfg_interval
        )
        if inpaint_mask is not None:
            model = masked_model_wrapper(model, init_latent, inpaint_mask)
        return model

    def sample_latents(params, init_latent, rng_noise, rng_samp, sigmas):
        model = make_model_fn(params)
        noise = jax.random.normal(rng_noise, init_latent.shape)
        # SDEdit start state in unscaled space: x = x0 + sigma_start*eps
        x = init_latent + noise * sigmas[0]
        latents = internal_sampling_func(model, x, sigmas, rng=rng_samp)
        if inpaint_mask is not None:
            # exact pin of the kept region at sigma=0
            m = jnp.asarray(inpaint_mask, latents.dtype)
            latents = m * latents + (1.0 - m) * init_latent
        return latents * vae_std + vae_mean

    if jit_compile:
        sample_latents = jax.jit(sample_latents)
    latents = sample_latents(unet_params, init_latent, rng_noise, rng_samp, sigmas)
    if return_latents or vae_decode is None:
        return latents
    images = vae_decode(latents)
    return [vae_image_postprocess(img) for img in np.asarray(images)]
