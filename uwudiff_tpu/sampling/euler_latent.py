"""Latent-space Euler sampling with image->noise inversion (parity with
``duwu/sampling/euler_latent.py:17-101``)."""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.sampling.cfg import cfg_wrapper, cond_text_wrapper
from uwudiff_tpu.sampling.euler import (
    sample_euler_ancestral,
    sample_euler_ancestral_cfgpp,
)
from uwudiff_tpu.sampling.wrapper import KDiffusionDenoiser

__all__ = ["euler_latent_sampling"]


def euler_latent_sampling(
    x_init: jnp.ndarray,  # [B, h, w, C] latents (or images to invert)
    unet_fn: Callable,  # (x, t, ctx, mask, added_cond) -> eps
    te,  # TextEncodingPipeline
    schedule: NoiseSchedule,
    prompt,
    neg_prompt,
    image_to_noise: bool = False,
    cfg_scale: float = 3.0,
    use_cfgpp: bool = False,
    num_steps: int = 16,
    time_ids: jnp.ndarray | None = None,
    seed: int = 42,
    vae_downscale: int = 8,
    denoiser_cls: type = KDiffusionDenoiser,  # e.g. RFDenoiser/VDenoiser
):
    if isinstance(prompt, str):
        prompt = [prompt]
    if isinstance(neg_prompt, str):
        neg_prompt = [neg_prompt]
    prompt = list(prompt)
    neg_prompt = list(neg_prompt)
    assert len(prompt) == len(neg_prompt) == x_init.shape[0]

    def eps_fn(x, t, **kwargs):
        return unet_fn(
            x,
            t,
            kwargs.get("encoder_hidden_states"),
            kwargs.get("encoder_attention_mask"),
            kwargs.get("added_cond"),
        )

    model_wrapper = denoiser_cls(model_fn=eps_fn, schedule=schedule)
    height = x_init.shape[1] * vae_downscale
    width = x_init.shape[2] * vae_downscale

    # cfg short-circuits (``euler_latent.py:47-75``)
    if cfg_scale == 0.0:
        cfg_fn = cond_text_wrapper(
            prompt=neg_prompt, width=width, height=height,
            unet=model_wrapper, te=te, time_ids=time_ids,
        )
    elif cfg_scale == 1.0 and not use_cfgpp:
        cfg_fn = cond_text_wrapper(
            prompt=prompt, width=width, height=height,
            unet=model_wrapper, te=te, time_ids=time_ids,
        )
    else:
        cfg_fn = cfg_wrapper(
            prompt=prompt, neg_prompt=neg_prompt, width=width, height=height,
            unet=model_wrapper, te=te, cfg=cfg_scale, time_ids=time_ids,
        )

    # sigma schedule over the training grid (``euler_latent.py:76-86``):
    # ascending-index linspace into the DESCENDING sigma table
    n = schedule.num_train_timesteps
    idx = jnp.linspace(0, n - 1, num_steps).astype(jnp.int32)
    sigmas = schedule.sigmas_descending[:-1][idx]  # descending, no 0
    if image_to_noise:
        sigmas = sigmas[::-1]
        # -1 is zero in the descending table, so use -2 (the true sigma_min)
        sigmas = jnp.concatenate(
            [schedule.sigmas_descending[-2][None], sigmas]
        )
    else:
        sigmas = jnp.concatenate(
            [sigmas, schedule.sigmas_descending[-1][None]]
        )

    rng = jax.random.PRNGKey(seed)
    if image_to_noise:
        rng, sub = jax.random.split(rng)
        x_init = x_init + sigmas[0] * jax.random.normal(
            sub, x_init.shape, x_init.dtype
        )

    if use_cfgpp and cfg_scale != 0.0:
        return sample_euler_ancestral_cfgpp(
            cfg_fn, x_init, sigmas, rng=rng, image_to_noise=image_to_noise, eta=0.0
        )
    return sample_euler_ancestral(
        cfg_fn, x_init, sigmas, rng=rng, image_to_noise=image_to_noise, eta=0.0
    )
