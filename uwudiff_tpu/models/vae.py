"""AutoencoderKL — the latent-space VAE, TPU-first (NHWC).

Replaces the diffusers ``AutoencoderKL`` the reference loads
(``duwu/trainer/trainer.py:136``, ``configs/demo_training.yaml`` vae
node): encoder -> diagonal Gaussian latents -> decoder, with the usual
SD scaling-factor convention (the trainer normalizes latents as
``(x - vae_mean) / vae_std`` with ``vae_std = 1/scaling_factor`` —
``duwu/trainer/trainer.py:144-146,241-244``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.models.layers import ResnetBlock2D, Downsample2D, Upsample2D
from uwudiff_tpu.ops import dot_product_attention

__all__ = ["AutoencoderKL", "DiagonalGaussian", "VAE_PRESETS"]


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, rng) -> jnp.ndarray:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        logvar = jnp.clip(self.logvar, -30.0, 20.0)
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(logvar) - 1.0 - logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class _MidAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    block_out_channels: Sequence[int]
    layers_per_block: int
    latent_channels: int
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.block_out_channels[0],
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv_in",
        )(x)
        n = len(self.block_out_channels)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(
                    out_channels=ch,
                    groups=self.norm_num_groups,
                    zero_init_stddev=-1.0,
                    dtype=self.dtype,
                    name=f"down_{i}_res_{j}",
                )(h)
            if i < n - 1:
                h = Downsample2D(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = self.block_out_channels[-1]
        h = ResnetBlock2D(
            out_channels=ch, groups=self.norm_num_groups, zero_init_stddev=-1.0,
            dtype=self.dtype, name="mid_res_0",
        )(h)
        h = _MidAttention(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(
            out_channels=ch, groups=self.norm_num_groups, zero_init_stddev=-1.0,
            dtype=self.dtype, name="mid_res_1",
        )(h)
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, dtype=self.dtype, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        return nn.Conv(
            2 * self.latent_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv_out",
        )(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int]
    layers_per_block: int
    out_channels: int
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        channels = tuple(reversed(self.block_out_channels))
        h = nn.Conv(
            channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_in",
        )(z)
        h = ResnetBlock2D(
            out_channels=channels[0], groups=self.norm_num_groups,
            zero_init_stddev=-1.0, dtype=self.dtype, name="mid_res_0",
        )(h)
        h = _MidAttention(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(
            out_channels=channels[0], groups=self.norm_num_groups,
            zero_init_stddev=-1.0, dtype=self.dtype, name="mid_res_1",
        )(h)
        n = len(channels)
        for i, ch in enumerate(channels):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock2D(
                    out_channels=ch, groups=self.norm_num_groups,
                    zero_init_stddev=-1.0, dtype=self.dtype,
                    name=f"up_{i}_res_{j}",
                )(h)
            if i < n - 1:
                h = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, dtype=self.dtype, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_out",
        )(h)


class AutoencoderKL(nn.Module):
    """KL-regularized image autoencoder. ``method`` selects encode /
    decode / full-call when using ``Module.apply``."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025  # SDXL VAE convention
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "AutoencoderKL":
        if isinstance(config, str):
            config = dict(VAE_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    def setup(self):
        self.encoder = Encoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            latent_channels=self.latent_channels,
            norm_num_groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            out_channels=self.out_channels,
            norm_num_groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(
            2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(
            mean.astype(jnp.float32), logvar.astype(jnp.float32)
        )

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(
            jnp.float32
        )

    def __call__(self, x: jnp.ndarray, rng) -> tuple[jnp.ndarray, DiagonalGaussian]:
        dist = self.encode(x)
        z = dist.sample(rng)
        return self.decode(z), dist


VAE_PRESETS: dict[str, dict] = {
    "sdxl": dict(
        block_out_channels=(128, 256, 512, 512),
        layers_per_block=2,
        latent_channels=4,
        scaling_factor=0.13025,
    ),
    "sd15": dict(
        block_out_channels=(128, 256, 512, 512),
        layers_per_block=2,
        latent_channels=4,
        scaling_factor=0.18215,
    ),
    "tiny": dict(
        block_out_channels=(16, 32),
        layers_per_block=1,
        latent_channels=4,
        norm_num_groups=8,
        scaling_factor=0.18215,
    ),
}
