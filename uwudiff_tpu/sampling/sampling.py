"""End-to-end text-to-image sampling (parity with
``duwu/sampling/sampling.py:16-126``).

The sigma loop + VAE decode are jit-compiled; prompt handling and PIL
conversion stay on host.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data.utils import vae_image_postprocess
from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.sampling.cfg import cfg_wrapper
from uwudiff_tpu.sampling.euler import sample_euler_ancestral
from uwudiff_tpu.sampling.wrapper import KDiffusionDenoiser
from uwudiff_tpu.utils import truncate_or_pad_to_length

__all__ = ["diffusion_sampling", "class_conditional_sampling"]


def diffusion_sampling(
    unet_fn: Callable,  # (x, t, ctx, mask, added_cond) -> eps (params bound)
    # OR (params, x, t, ctx, mask, added_cond) when unet_params is given —
    # then params enter the jitted program as an ARGUMENT rather than
    # being baked in as multi-GB HLO constants
    te,  # TextEncodingPipeline
    vae_decode: Callable | None,  # latents -> [-1,1] images (params bound)
    train_schedule: NoiseSchedule,
    prompt,
    neg_prompt,
    num_steps: int = 16,
    sample_schedule: NoiseSchedule | None = None,
    get_sigma_func: Callable | None = None,
    num_samples: int = 1,
    padding_mode: Literal["repeat_last", "cycling", "uniform_expansion"] = "cycling",
    cfg_scale: float = 3.0,
    cfg_rescale: float = 0.0,  # Lin et al. guidance rescale (phi)
    seed: int = 42,
    width: int = 1024,
    height: int = 1024,
    rescale: bool = False,
    vae_std: float | None = None,
    vae_mean: float | None = None,
    latent_channels: int = 4,
    vae_downscale: int = 8,
    internal_sampling_func: Callable | None = None,
    return_latents: bool = False,
    jit_compile: bool = True,
    unet_params=None,
    # the sigma-space model wrapper; pass ``sampling.lcm.LCMDenoiser``
    # (with cfg_scale=1 and internal_sampling_func=sample_lcm) to drive
    # a consistency-distilled student
    denoiser_cls: type = KDiffusionDenoiser,
    # A1111-style (emphasis:1.3) syntax in prompt/neg_prompt
    prompt_weighting: bool = False,
    # chunk prompts beyond the CLIP window (models/long_prompt.py)
    long_prompt: bool = False,
    # guidance only at sigma in [lo, hi] (Kynkaanniemi et al. 2024)
    cfg_interval: tuple[float, float] | None = None,
    # SD3.5 skip-layer guidance: a second params-sharing model with
    # selected blocks bypassed (e.g. trainer.unet.clone(skip_layers=
    # (7,8,9)) bound like unet_fn); adds slg_scale*(cond - cond_skip)
    # (cfg.build_slg_cfg_fn), optionally windowed by slg_interval
    unet_skip_fn: Callable | None = None,
    slg_scale: float = 0.0,
    slg_interval: tuple[float, float] | None = None,
    # multi-chip serving: a NamedSharding for the latent batch (e.g.
    # parallel.mesh.batch_sharding(mesh)) — params keep whatever
    # sharding they carry (FSDP/TP), GSPMD emits the collectives
    latent_sharding=None,
):
    internal_sampling_func = internal_sampling_func or sample_euler_ancestral
    vae_std = vae_std if vae_std is not None else 1.0
    vae_mean = vae_mean or 0.0

    if isinstance(prompt, str):
        prompt = [prompt]
    if isinstance(neg_prompt, str):
        neg_prompt = [neg_prompt]
    prompt = list(prompt)
    neg_prompt = list(neg_prompt)
    assert len(prompt) == len(neg_prompt)
    prompt = truncate_or_pad_to_length(prompt, num_samples, padding_mode=padding_mode)
    neg_prompt = truncate_or_pad_to_length(
        neg_prompt, num_samples, padding_mode=padding_mode
    )

    from uwudiff_tpu.sampling.cfg import (
        build_cfg_fn,
        build_slg_cfg_fn,
        encode_cfg_inputs,
    )

    enc = encode_cfg_inputs(
        prompt, neg_prompt, width, height, te,
        prompt_weighting=prompt_weighting,
        long_prompt=long_prompt,
    )

    def make_cfg_fn(params):
        def bind(fn):
            def eps_fn(x, t, **kwargs):
                args = (
                    x,
                    t,
                    kwargs.get("encoder_hidden_states"),
                    kwargs.get("encoder_attention_mask"),
                    kwargs.get("added_cond"),
                )
                return fn(params, *args) if params is not None else fn(*args)

            return denoiser_cls(
                model_fn=eps_fn, schedule=train_schedule, quantize=False
            )

        model_wrapper = bind(unet_fn)
        if slg_scale and unet_skip_fn is not None:
            return build_slg_cfg_fn(
                model_wrapper, bind(unet_skip_fn), enc, cfg_scale,
                slg_scale, cfg_rescale, slg_interval=slg_interval,
            )
        return build_cfg_fn(
            model_wrapper, enc, cfg_scale, cfg_rescale,
            cfg_interval=cfg_interval,
        )

    sample_schedule = sample_schedule or train_schedule
    if get_sigma_func is None:
        # sigmas_descending[linspace(0, N, steps+1).long()]
        # (``sampling.py:92-96``)
        sigmas = sample_schedule.sample_sigmas_descending(num_steps)
    else:
        sigmas = jnp.asarray(np.asarray(get_sigma_func(num_steps), np.float32))

    # per-sample seed isolation (sampling/noise.py): each lane's init +
    # step noise depend ONLY on its own seed, so a sample reproduces
    # regardless of batch composition — the contract continuous-batching
    # serving needs, and the same scheme the zero-retrace serving path
    # compiles (keeping the two paths numerically identical)
    from uwudiff_tpu.sampling.noise import (
        batch_fallback_rng,
        expand_seeds,
        make_per_sample_noise_sampler,
        per_sample_init_noise,
        per_sample_keys,
        supports_noise_sampler,
    )

    seeds = expand_seeds(seed, num_samples)
    stochastic = supports_noise_sampler(internal_sampling_func)

    def sample_latents(params, seeds, sigmas):
        cfg_fn = make_cfg_fn(params)
        keys = per_sample_keys(seeds)
        init_x = per_sample_init_noise(
            keys,
            (
                height // vae_downscale,
                width // vae_downscale,
                latent_channels,
            ),
        ) * jnp.sqrt(1 + sigmas[0] ** 2)
        if latent_sharding is not None:
            init_x = jax.lax.with_sharding_constraint(
                init_x, latent_sharding
            )
        kw = (
            {"noise_sampler": make_per_sample_noise_sampler(keys)}
            if stochastic
            else {}
        )
        # rng is only consumed by samplers WITHOUT noise_sampler support
        # (user-supplied exotics): seed-derived so the user seed still
        # governs the trajectory (batch-shaped draw, documented fallback)
        latents = internal_sampling_func(
            cfg_fn, init_x, sigmas, rng=batch_fallback_rng(keys), **kw
        )
        if rescale:
            std = latents.reshape(latents.shape[0], -1).std(axis=1)
            latents = latents / std[:, None, None, None]
        return latents * vae_std + vae_mean

    if jit_compile:  # the whole sigma loop is one XLA program
        sample_latents = jax.jit(sample_latents)
    latents = sample_latents(unet_params, jnp.asarray(seeds), sigmas)
    if return_latents or vae_decode is None:
        return latents
    images = vae_decode(latents)
    return [vae_image_postprocess(img) for img in np.asarray(images)]


def class_conditional_sampling(
    unet_fn: Callable,  # (x, t, class_labels) -> eps (params bound)
    # OR (params, x, t, class_labels) when unet_params is given
    train_schedule: NoiseSchedule,
    class_labels,  # [N] ints; one sample per label
    null_label: int,  # the CFG-dropout null class (DiT: num_classes)
    vae_decode: Callable | None = None,
    num_steps: int = 16,
    sample_schedule: NoiseSchedule | None = None,
    get_sigma_func: Callable | None = None,
    cfg_scale: float = 4.0,
    cfg_rescale: float = 0.0,
    seed: int = 42,
    width: int = 256,
    height: int = 256,
    rescale: bool = False,
    vae_std: float | None = None,
    vae_mean: float | None = None,
    latent_channels: int = 4,
    vae_downscale: int = 8,
    internal_sampling_func: Callable | None = None,
    return_latents: bool = False,
    jit_compile: bool = True,
    unet_params=None,
    denoiser_cls: type = KDiffusionDenoiser,
    latent_sharding=None,
):
    """Class-conditional sampling for the DiT family (the reference has
    no class-conditional models; this mirrors ``diffusion_sampling``'s
    contract with labels instead of prompts). The unconditional CFG
    branch is the trained null-class embedding
    (``sampling/cfg.py::build_class_cfg_fn``)."""
    from uwudiff_tpu.sampling.cfg import build_class_cfg_fn

    rng = jax.random.PRNGKey(seed)
    internal_sampling_func = internal_sampling_func or sample_euler_ancestral
    vae_std = vae_std if vae_std is not None else 1.0
    vae_mean = vae_mean or 0.0
    class_labels = jnp.asarray(np.asarray(class_labels, np.int32))
    num_samples = class_labels.shape[0]

    def make_cfg_fn(params):
        def eps_fn(x, t, class_labels=None, **kwargs):
            args = (x, t, class_labels)
            return unet_fn(params, *args) if params is not None else unet_fn(*args)

        model_wrapper = denoiser_cls(
            model_fn=eps_fn, schedule=train_schedule, quantize=False
        )
        return build_class_cfg_fn(
            model_wrapper, class_labels, null_label, cfg_scale, cfg_rescale
        )

    sample_schedule = sample_schedule or train_schedule
    if get_sigma_func is None:
        sigmas = sample_schedule.sample_sigmas_descending(num_steps)
    else:
        sigmas = jnp.asarray(np.asarray(get_sigma_func(num_steps), np.float32))

    rng, rng_init, rng_samp = jax.random.split(rng, 3)

    def sample_latents(params, rng_init, rng_samp, sigmas):
        cfg_fn = make_cfg_fn(params)
        init_x = jax.random.normal(
            rng_init,
            (
                num_samples,
                height // vae_downscale,
                width // vae_downscale,
                latent_channels,
            ),
        ) * jnp.sqrt(1 + sigmas[0] ** 2)
        if latent_sharding is not None:
            init_x = jax.lax.with_sharding_constraint(
                init_x, latent_sharding
            )
        latents = internal_sampling_func(cfg_fn, init_x, sigmas, rng=rng_samp)
        if rescale:
            std = latents.reshape(latents.shape[0], -1).std(axis=1)
            latents = latents / std[:, None, None, None]
        return latents * vae_std + vae_mean

    if jit_compile:
        sample_latents = jax.jit(sample_latents)
    latents = sample_latents(unet_params, rng_init, rng_samp, sigmas)
    if return_latents or vae_decode is None:
        return latents
    images = vae_decode(latents)
    return [vae_image_postprocess(img) for img in np.asarray(images)]
