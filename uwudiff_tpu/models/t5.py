"""T5 encoder in flax (TPU-native replacement for
``transformers.T5EncoderModel``, the SD3-style third text encoder the
reference supports — ``duwu/modules/text_encoders.py:290-297``).

RMSNorm, relative position-bucket attention bias, gated-GELU FF, no
biases — the v1.1 architecture.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uwudiff_tpu.ops import dot_product_attention

__all__ = ["T5EncoderModel", "T5EncoderOutput", "T5_PRESETS"]


class T5EncoderOutput(NamedTuple):
    last_hidden_state: jnp.ndarray
    hidden_states: tuple


class RMSNorm(nn.Module):
    dtype: Any = jnp.float32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (x * scale).astype(self.dtype)


def relative_position_bucket(
    relative_position, num_buckets: int = 32, max_distance: int = 128
):
    """Bidirectional T5 relative position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class _T5Layer(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        inner = self.num_heads * self.d_kv
        h = RMSNorm(dtype=self.dtype, name="attn_norm")(x)
        b, s, _ = h.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(h)
        q = q.reshape(b, s, self.num_heads, self.d_kv)
        k = k.reshape(b, s, self.num_heads, self.d_kv)
        v = v.reshape(b, s, self.num_heads, self.d_kv)
        # T5 does not scale by 1/sqrt(d); the relative-position bias is a
        # LEARNED parameter, so the flash path must propagate its gradient
        attn = dot_product_attention(q, k, v, bias=bias, scale=1.0,
                                     bias_grad=True)
        attn = attn.reshape(b, s, inner)
        x = x + nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="o")(
            attn
        )

        h = RMSNorm(dtype=self.dtype, name="ff_norm")(x)
        wi0 = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
        wi1 = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="wo")(
            h
        )
        return x


class T5EncoderModel(nn.Module):
    vocab_size: int = 32128
    d_model: int = 512
    num_layers: int = 8
    num_heads: int = 6
    d_kv: int = 64
    d_ff: int = 1024
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "T5EncoderModel":
        if isinstance(config, str):
            config = dict(T5_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray | None = None,
    ) -> T5EncoderOutput:
        b, s = input_ids.shape
        x = nn.Embed(
            self.vocab_size, self.d_model, dtype=self.dtype, name="token_embedding"
        )(input_ids)

        # relative position bias (first-layer, shared across layers)
        pos = jnp.arange(s)
        rel = pos[None, :] - pos[:, None]  # [Sq, Sk]
        buckets = relative_position_bucket(
            rel,
            self.relative_attention_num_buckets,
            self.relative_attention_max_distance,
        )
        rel_emb = nn.Embed(
            self.relative_attention_num_buckets,
            self.num_heads,
            dtype=jnp.float32,
            name="relative_attention_bias",
        )(buckets)  # [Sq, Sk, H]
        bias = jnp.transpose(rel_emb, (2, 0, 1))[None]  # [1, H, Sq, Sk]
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            pad = jnp.where(attention_mask.astype(bool), 0.0, neg)
            bias = bias + pad[:, None, None, :]

        hidden_states = [x]
        for i in range(self.num_layers):
            x = _T5Layer(
                d_model=self.d_model,
                num_heads=self.num_heads,
                d_kv=self.d_kv,
                d_ff=self.d_ff,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, bias)
            hidden_states.append(x)
        x = RMSNorm(dtype=self.dtype, name="final_norm")(x)
        hidden_states.append(x)
        return T5EncoderOutput(
            last_hidden_state=x, hidden_states=tuple(hidden_states)
        )


T5_PRESETS: dict[str, dict] = {
    # google/t5-v1_1-xxl encoder
    "t5_xxl": dict(
        d_model=4096, num_layers=24, num_heads=64, d_kv=64, d_ff=10240,
    ),
    "tiny": dict(
        vocab_size=1024, d_model=32, num_layers=2, num_heads=2, d_kv=16, d_ff=64,
    ),
}
