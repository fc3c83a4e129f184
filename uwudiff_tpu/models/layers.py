"""Shared building blocks for the diffusion model zoo.

NHWC layout throughout (TPU-native; XLA tiles NHWC convs onto the MXU
directly). Compute dtype is configurable per module (bf16 by default in
training configs), params stay fp32.

These replace the diffusers internals the reference builds on
(``UNet2DConditionModel`` blocks, reached via
``duwu/trainer/trainer.py:134-136`` and ``duwu/modules/rope_unet.py``).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "get_timestep_embedding",
    "TimestepEmbedding",
    "ResnetBlock2D",
    "Downsample2D",
    "Upsample2D",
    "zero_init",
    "near_zero_init",
    "resolve_remat_policy",
]


def resolve_remat_policy(name: str | None):
    """Remat-policy string -> jax checkpoint policy.

    ``"save_names:attn_out,ffn_out"`` builds
    ``jax.checkpoint_policies.save_only_these_names(...)`` over the
    ``checkpoint_name``-tagged intermediates in ``transformer.py``
    (saving an attention/FF output skips recomputing its whole
    projections+kernel chain in the backward pass, at one [B, S, C]
    residual-sized buffer each — far cheaper than the generic
    dots-saveable policies, which pin every matmul output).  Any other
    string names a ``jax.checkpoint_policies`` attribute."""
    if name is None:
        return None
    if name.startswith("save_names:"):
        names = tuple(n for n in name.split(":", 1)[1].split(",") if n)
        return jax.checkpoint_policies.save_only_these_names(*names)
    return getattr(jax.checkpoint_policies, name)


def zero_init(key, shape, dtype=jnp.float32):
    """Exact-zero init for residual-adjacent layers
    (``duwu/modules/rope_unet.py:562-578`` HDUNet semantics)."""
    return jnp.zeros(shape, dtype)


def near_zero_init(stddev: float = 1e-5) -> Callable:
    """normal(0, 1e-5) init (``duwu/modules/unet_patch.py:34-45``)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev

    return init


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, diffusers ``Timesteps`` convention
    (the SD/SDXL UNets use flip_sin_to_cos=True, freq_shift=0).

    Accepts float timesteps (needed for rectified-flow continuous t).
    Returns [B, embedding_dim] in fp32.
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting sinusoidal features to the time channel."""

    time_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(
            sample
        )
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(
            sample
        )
        return sample


class GroupNormSiLU(nn.Module):
    """GroupNorm+SiLU through the fused Pallas kernel
    (``ops/groupnorm_silu.py``; XLA fallback off-TPU / odd shapes).
    Param names match ``nn.GroupNorm`` (scale/bias) so checkpoints and
    the torch import maps are unchanged."""

    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from uwudiff_tpu.ops.groupnorm_silu import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_silu(
            x.astype(self.dtype), scale, bias, self.groups, self.eps
        )


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv3x3 -> (+time proj) -> GN -> SiLU -> conv3x3,
    residual with optional 1x1 shortcut. conv2 uses zero-family init
    (``unet_patch.py:43-44`` / HDUNet exact-zero). The GN+SiLU pairs run
    through the fused Pallas kernel (SURVEY.md §2.2 row 3)."""

    out_channels: int
    dropout: float = 0.0
    groups: int = 32
    eps: float = 1e-5
    zero_init_stddev: float = 1e-5  # 0.0 -> exact-zero HDUNet init
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        temb: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        residual = hidden_states
        in_channels = hidden_states.shape[-1]

        h = GroupNormSiLU(
            groups=self.groups, eps=self.eps, dtype=self.dtype, name="norm1"
        )(hidden_states)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv1",
        )(h)

        if temb is not None:
            temb_proj = nn.Dense(
                self.out_channels, dtype=self.dtype, name="time_emb_proj"
            )(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]

        h = GroupNormSiLU(
            groups=self.groups, eps=self.eps, dtype=self.dtype, name="norm2"
        )(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        conv2_init = (
            zero_init
            if self.zero_init_stddev == 0.0
            else near_zero_init(self.zero_init_stddev)
        )
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=conv2_init,
            dtype=self.dtype,
            name="conv2",
        )(h)

        if in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels,
                (1, 1),
                dtype=self.dtype,
                name="conv_shortcut",
            )(residual)
        # identity unless a save_names remat policy targets "resnet_out"
        return jax.ad_checkpoint.checkpoint_name(h, "resnet_out") + residual


class Downsample2D(nn.Module):
    """3x3 stride-2 conv downsample."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(hidden_states)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = hidden_states.shape
        hidden_states = jax.image.resize(
            hidden_states, (b, h * 2, w * 2, c), method="nearest"
        )
        return nn.Conv(
            self.out_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(hidden_states)
