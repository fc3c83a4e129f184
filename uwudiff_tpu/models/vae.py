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

__all__ = [
    "AutoencoderKL",
    "DiagonalGaussian",
    "VAE_PRESETS",
    "overlap_add",
]


def _tile_starts(size: int, tile: int, stride: int) -> list[int]:
    if size <= tile:
        return [0]
    s = list(range(0, size - tile, stride))
    s.append(size - tile)  # snap the last tile to the border
    return s


def _ramp_window(n: int, ov: int) -> jnp.ndarray:
    """1-D blend weights: linear ramps of width ``ov`` at both ends
    (never reaching 0, so border pixels covered by one tile keep full
    weight after normalization)."""
    w = jnp.ones((n,), jnp.float32)
    if ov > 0:
        r = (jnp.arange(ov, dtype=jnp.float32) + 1.0) / (ov + 1.0)
        w = w.at[:ov].set(r).at[n - ov :].set(r[::-1])
    return w


def overlap_add(
    tiles: jnp.ndarray,  # [n_tiles * B, th, tw, C], row-major tile order
    batch: int,
    positions: list[tuple[int, int]],  # top-left (i, j) per tile
    out_hw: tuple[int, int],
    overlap: int,
) -> jnp.ndarray:
    """Normalized windowed overlap-add: each tile is weighted by a
    separable linear-ramp window and scatter-added; dividing by the
    accumulated window makes the blend exact wherever tiles agree (a
    constant field reassembles exactly constant) and renormalizes
    borders automatically."""
    th, tw = tiles.shape[1], tiles.shape[2]
    win = _ramp_window(th, overlap)[:, None] * _ramp_window(tw, overlap)[None]
    win = win[None, :, :, None]
    out = jnp.zeros(
        (batch, out_hw[0], out_hw[1], tiles.shape[-1]), jnp.float32
    )
    wsum = jnp.zeros((1, out_hw[0], out_hw[1], 1), jnp.float32)
    for idx, (i, j) in enumerate(positions):
        out = out.at[:, i : i + th, j : j + tw].add(
            tiles[idx * batch : (idx + 1) * batch] * win
        )
        wsum = wsum.at[:, i : i + th, j : j + tw].add(win)
    return out / wsum


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

    # -- tiled paths (large-resolution memory relief) -------------------

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    def decode_tiled(
        self, z: jnp.ndarray, tile: int = 64, overlap: int = 16
    ) -> jnp.ndarray:
        """Decode in overlapping spatial tiles (the community "VAE
        tiling" memory staple — at 2048px the full decoder's level-0
        activations alone are ~4GB fp32; tiles bound that to the tile
        footprint).

        TPU-first redesign of the sequential diffusers blend: all tiles
        fold into the BATCH axis of ONE decoder call (same XLA program
        regardless of tile count), then a separable linear-ramp window
        does normalized weighted overlap-add — borders renormalize
        automatically, no per-edge cases. ``tile``/``overlap`` are in
        latent units; seams are approximate by nature (conv halos and
        per-tile GroupNorm statistics), matching the accepted community
        trade-off."""
        b, h, w, _ = z.shape
        if h <= tile and w <= tile:
            return self.decode(z)
        # a small tile with the default overlap would give stride<=0
        # (observed: from_trainer(vae_tiling=16) + overlap 16); cap the
        # overlap at half the tile so the stride stays positive
        overlap = min(overlap, tile // 2)
        stride = tile - overlap
        f = self.downscale
        hs = _tile_starts(h, tile, stride)
        ws = _tile_starts(w, tile, stride)
        crops = [
            z[:, i : i + min(tile, h), j : j + min(tile, w)]
            for i in hs
            for j in ws
        ]
        dec = self.decode(jnp.concatenate(crops, axis=0))  # batch-folded
        return overlap_add(
            dec,
            b,
            [(i * f, j * f) for i in hs for j in ws],
            (h * f, w * f),
            overlap * f,
        )

    def encode_tiled(
        self, x: jnp.ndarray, tile: int = 512, overlap: int = 128
    ) -> DiagonalGaussian:
        """Tiled encode (``tile``/``overlap`` in PIXEL units); the
        Gaussian moments blend with the same normalized window."""
        b, h, w, _ = x.shape
        if h <= tile and w <= tile:
            return self.encode(x)
        overlap = min(overlap, tile // 2)  # keep stride positive
        stride = tile - overlap
        f = self.downscale
        hs = _tile_starts(h, tile, stride)
        ws = _tile_starts(w, tile, stride)
        crops = [
            x[:, i : i + min(tile, h), j : j + min(tile, w)]
            for i in hs
            for j in ws
        ]
        dist = self.encode(jnp.concatenate(crops, axis=0))
        moments = jnp.concatenate([dist.mean, dist.logvar], axis=-1)
        blended = overlap_add(
            moments,
            b,
            [(i // f, j // f) for i in hs for j in ws],
            (h // f, w // f),
            overlap // f,
        )
        mean, logvar = jnp.split(blended, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)


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
