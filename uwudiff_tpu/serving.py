"""Serving: a pre-compiled text-to-image pipeline.

Production-deployment counterpart of the reference's ad-hoc sampling
scripts (``test_scripts/test_sampling.py``): bind params once, compile
the full prompt->latents->image program per (resolution, batch, steps)
signature, and serve requests against the warm cache. Works with the
persistent compilation cache so process restarts stay hot.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data.utils import vae_image_postprocess
from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.sampling import diffusion_sampling, sample_euler_ancestral

__all__ = ["Txt2ImgPipeline"]


class Txt2ImgPipeline:
    def __init__(
        self,
        unet_fn: Callable,  # (params, x, t, ctx, mask, added) -> eps if
        # unet_params given, else (x, t, ctx, mask, added) with params bound
        te_pipeline,  # TextEncodingPipeline
        vae_decode: Callable | None,  # latents -> [-1,1] images, params bound
        schedule: NoiseSchedule,
        vae_std: float = 1.0,
        vae_mean: float = 0.0,
        vae_downscale: int = 8,
        latent_channels: int = 4,
        sampler: Callable = sample_euler_ancestral,
        unet_params=None,
    ):
        self.unet_fn = unet_fn
        self.unet_params = unet_params
        self.te = te_pipeline
        self.vae_decode = (
            jax.jit(vae_decode) if vae_decode is not None else None
        )
        self.schedule = schedule
        self.vae_std = vae_std
        self.vae_mean = vae_mean
        self.vae_downscale = vae_downscale
        self.latent_channels = latent_channels
        self.sampler = sampler

    @classmethod
    def from_trainer(cls, trainer, **kwargs) -> "Txt2ImgPipeline":
        """Build from a (possibly adapter-)trained DMTrainer."""
        from uwudiff_tpu.models.text_encoders import TextEncodingPipeline

        unet_params = trainer.merged_unet_params()

        def unet_fn(params, x, t, ctx, mask, added):
            return trainer.unet.apply({"params": params}, x, t, ctx, mask, added)

        te_pipe = TextEncodingPipeline(
            trainer.te, trainer.frozen["te"], trainer.tokenizers
        )
        vae_decode = None
        if trainer.vae is not None:
            vae_params = trainer.frozen["vae"]

            def vae_decode(latents):
                return trainer.vae.apply(
                    {"params": vae_params}, latents,
                    method=trainer.vae.decode,
                )

        downs = (
            2 ** (len(trainer.vae.block_out_channels) - 1)
            if trainer.vae is not None
            else 8
        )
        return cls(
            unet_fn,
            te_pipe,
            vae_decode,
            schedule=trainer.loss.schedule,
            vae_std=trainer.vae_std if trainer.vae_std is not None else 1.0,
            vae_mean=trainer.vae_mean,
            vae_downscale=downs,
            unet_params=unet_params,
            **kwargs,
        )

    def __call__(
        self,
        prompt: str | list[str],
        neg_prompt: str | list[str] = "",
        num_steps: int = 16,
        num_samples: int = 1,
        cfg_scale: float = 3.0,
        width: int = 1024,
        height: int = 1024,
        seed: int = 42,
        return_latents: bool = False,
        **kwargs: Any,
    ):
        return diffusion_sampling(
            self.unet_fn,
            self.te,
            self.vae_decode,
            train_schedule=self.schedule,
            prompt=prompt,
            neg_prompt=neg_prompt,
            num_steps=num_steps,
            num_samples=num_samples,
            cfg_scale=cfg_scale,
            width=width,
            height=height,
            seed=seed,
            vae_std=self.vae_std,
            vae_mean=self.vae_mean,
            vae_downscale=self.vae_downscale,
            latent_channels=self.latent_channels,
            internal_sampling_func=self.sampler,
            return_latents=return_latents,
            unet_params=self.unet_params,
            **kwargs,
        )

    def warmup(self, widths_heights_batches: list[tuple[int, int, int]],
               num_steps: int = 16):
        """Pre-compile the serving signatures (cold-start elimination)."""
        for w, h, b in widths_heights_batches:
            self(
                prompt="warmup",
                neg_prompt="",
                num_steps=num_steps,
                num_samples=b,
                width=w,
                height=h,
                return_latents=True,
            )
