"""DiT — class-conditional diffusion transformer (DiT-XL/2 class).

BASELINE.json lists "DiT-XL/2 class-conditional training with
EDM/flow-matching schedule" as a target config; the reference's DiT-ish
machinery is its RoPE transformer blocks (``duwu/modules/rope_unet.py``).
This is a TPU-first DiT: patchify -> adaLN-Zero transformer stack ->
unpatchify, all MXU-shaped matmuls, fixed 2D sin-cos position embedding
(+ optional learned axial RoPE), class-label CFG dropout.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uwudiff_tpu.models.layers import get_timestep_embedding
from uwudiff_tpu.models.rope import AxialRoPE, make_axial_pos
from uwudiff_tpu.ops import dot_product_attention

__all__ = ["DiT", "DIT_PRESETS"]


def _2d_sincos_pos_embed(dim: int, h: int, w: int) -> np.ndarray:
    """Fixed 2D sin-cos position embedding, [h*w, dim]."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(h, dtype=np.float64)
    gw = np.arange(w, dtype=np.float64)
    grid = np.meshgrid(gw, gh)  # (w, h) order
    emb_h = _1d(dim // 2, np.asarray(grid[1]).reshape(-1))
    emb_w = _1d(dim // 2, np.asarray(grid[0]).reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=1)


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, position_map=None):
        # modulation: 6 * hidden from conditioning, zero-init
        mod = nn.Dense(
            6 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN_modulation",
        )(nn.silu(c))
        shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = jnp.split(
            mod[:, None, :], 6, axis=-1
        )

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm1")(x)
        h = h * (1 + scale_a) + shift_a
        b, s, _ = h.shape
        head_dim = self.hidden_size // self.num_heads
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v")(h)
        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)
        if self.use_rope:
            rope = AxialRoPE(dim=head_dim, n_heads=self.num_heads,
                             dtype=self.dtype, name="rope")
            q = rope(q, position_map)
            k = rope(k, position_map)
        attn = dot_product_attention(q, k, v).reshape(b, s, self.hidden_size)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(attn)
        x = x + gate_a * attn

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm2")(x)
        h = h * (1 + scale_m) + shift_m
        inner = int(self.hidden_size * self.mlp_ratio)
        h = nn.Dense(inner, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate_m * h


class DiT(nn.Module):
    """Class-conditional diffusion transformer."""

    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 4
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    learn_sigma: bool = False
    use_rope: bool = False
    gradient_checkpointing: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "DiT":
        if isinstance(config, str):
            config = dict(DIT_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    @property
    def addition_embed_type(self):
        return None

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C]
        timesteps: jnp.ndarray,  # [B]
        class_labels: jnp.ndarray | None = None,  # [B] int
        train: bool = False,
    ) -> jnp.ndarray:
        b, h, w, c = sample.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        out_channels = self.in_channels * (2 if self.learn_sigma else 1)

        # patchify via conv (MXU-shaped)
        x = nn.Conv(
            self.hidden_size, (p, p), strides=(p, p), dtype=self.dtype,
            name="patch_embed",
        )(sample.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.hidden_size)
        pos = jnp.asarray(
            _2d_sincos_pos_embed(self.hidden_size, gh, gw), self.dtype
        )
        x = x + pos[None]

        # conditioning: time + class
        t_emb = get_timestep_embedding(
            jnp.atleast_1d(timesteps), 256
        ).astype(self.dtype)
        t_emb = nn.Dense(self.hidden_size, dtype=self.dtype, name="t_fc1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.hidden_size, dtype=self.dtype, name="t_fc2")(t_emb)
        c_emb = t_emb
        if class_labels is not None:
            # null class at index num_classes (CFG dropout target)
            labels = class_labels
            if train and self.class_dropout_prob > 0:
                drop = jax.random.bernoulli(
                    self.make_rng("dropout"),
                    self.class_dropout_prob,
                    (b,),
                )
                labels = jnp.where(drop, self.num_classes, labels)
            y_emb = nn.Embed(
                self.num_classes + 1, self.hidden_size, dtype=self.dtype,
                name="label_embed",
            )(labels)
            c_emb = c_emb + y_emb

        position_map = make_axial_pos(gh, gw) if self.use_rope else None
        block_cls = nn.remat(DiTBlock) if self.gradient_checkpointing else DiTBlock
        for i in range(self.depth):
            x = block_cls(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_rope=self.use_rope,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, c_emb, position_map)

        # final adaLN + zero-init projection
        mod = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_modulation",
        )(nn.silu(c_emb))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="final_norm")(x)
        x = x * (1 + scale) + shift
        x = nn.Dense(
            p * p * out_channels,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_proj",
        )(x)
        # unpatchify
        x = x.reshape(b, gh, gw, p, p, out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x).reshape(
            b, gh * p, gw * p, out_channels
        )
        return x.astype(jnp.float32)


DIT_PRESETS: dict[str, dict] = {
    "dit_xl_2": dict(patch_size=2, hidden_size=1152, depth=28, num_heads=16),
    "dit_l_2": dict(patch_size=2, hidden_size=1024, depth=24, num_heads=16),
    "dit_b_2": dict(patch_size=2, hidden_size=768, depth=12, num_heads=12),
    "dit_s_2": dict(patch_size=2, hidden_size=384, depth=12, num_heads=6),
    "tiny": dict(
        patch_size=2, hidden_size=32, depth=2, num_heads=2, num_classes=10
    ),
}
