"""CLIP text transformer in flax (TPU-native replacement for the
``transformers.CLIPTextModel`` the reference loads in
``duwu/modules/text_encoders.py:167-186``).

Returns all hidden states so callers can pick ``layer_idx`` (SDXL uses
-2) and re-apply the final layer norm, exactly as the reference does.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.ops import dot_product_attention

__all__ = ["CLIPTextModel", "CLIPTextOutput", "CLIP_PRESETS"]


class CLIPTextOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # final-LN applied
    pooler_output: jnp.ndarray | None  # EOS-position hidden
    hidden_states: tuple  # embeddings + each layer (pre-final-LN)
    embedding: jnp.ndarray  # hidden_states[layer_idx]
    normed_embedding: jnp.ndarray  # final-LN re-applied to `embedding`
    text_embeds: jnp.ndarray | None = None  # projected pooled (CLIP score)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


_ACTS = {"quick_gelu": quick_gelu, "gelu": nn.gelu}

# HF CLIP's layer_norm_eps (flax's default is 1e-6 — a measurable
# divergence vs transformers at small hidden sizes; caught by
# tests/test_text_tower_import.py).
_LN_EPS = 1e-5


class _CLIPLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="layer_norm1")(x)
        head_dim = self.hidden_size // self.num_heads
        b, s, _ = h.shape
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)
        attn = dot_product_attention(q, k, v, bias=bias)
        attn = attn.reshape(b, s, self.hidden_size)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        x = x + attn

        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _ACTS[self.hidden_act](h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    eos_token_id: int | None = None  # None -> argmax(input_ids) (CLIP-L style)
    projection_dim: int | None = None  # set for CLIP-score text projection
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "CLIPTextModel":
        if isinstance(config, str):
            config = dict(CLIP_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, L] int
        attention_mask: jnp.ndarray | None = None,  # [B, L]
        layer_idx: int = -1,  # which hidden state is `embedding` (SDXL: -2)
    ) -> CLIPTextOutput:
        b, s = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.hidden_size, dtype=self.dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_position_embeddings, self.hidden_size),
        )
        x = tok + pos[None, :s].astype(self.dtype)

        # causal mask (+ key padding if given), as additive fp32 bias
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))
        bias = jnp.where(causal, 0.0, neg)[None, None, :, :]
        if attention_mask is not None:
            pad = jnp.where(attention_mask.astype(bool), 0.0, neg)
            bias = bias + pad[:, None, None, :]

        hidden_states = [x]
        for i in range(self.num_layers):
            x = _CLIPLayer(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                hidden_act=self.hidden_act,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, bias)
            hidden_states.append(x)

        final_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="final_layer_norm")
        last_hidden = final_ln(x)
        embedding = hidden_states[layer_idx]
        # SD1/2 `normed_embedding` (``text_encoders.py:185-186``): the
        # final LN re-applied to the selected hidden state.
        normed_embedding = final_ln(embedding)

        # pooled: hidden at the EOS position. HF convention
        # (transformers CLIPTextModel.forward): with no explicit eos id the
        # EOS is the highest token id, located by argmax(input_ids); with an
        # explicit id it is the FIRST occurrence (pad tokens may repeat the
        # eos id after it). jnp.argmax returns the first max index in both.
        if self.eos_token_id is None:
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            is_eos = input_ids == self.eos_token_id
            eos_pos = jnp.argmax(is_eos.astype(jnp.int32), axis=-1)
        pooled = last_hidden[jnp.arange(b), eos_pos]
        text_embeds = None
        if self.projection_dim is not None:
            text_embeds = nn.Dense(
                self.projection_dim,
                use_bias=False,
                dtype=self.dtype,
                name="text_projection",
            )(pooled)
        return CLIPTextOutput(
            last_hidden_state=last_hidden,
            pooler_output=pooled,
            hidden_states=tuple(hidden_states),
            embedding=embedding,
            normed_embedding=normed_embedding,
            text_embeds=text_embeds,
        )


class CLIPVisionModel(nn.Module):
    """CLIP ViT vision tower (for CLIP-score evaluation, replacing
    torchmetrics' CLIPScore backbone — ``duwu/metrics/clip.py:8-33``)."""

    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "CLIPVisionModel":
        if isinstance(config, str):
            config = dict(CLIP_VISION_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        return cls(**config)

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: [B, H, W, 3] normalized images -> [B, proj_dim]
        L2-normalizable image embedding."""
        b = pixel_values.shape[0]
        patches = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, self.hidden_size)
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.tile(cls_tok[None, None], (b, 1, 1)).astype(self.dtype), patches],
            axis=1,
        )
        n_pos = x.shape[1]
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_pos, self.hidden_size),
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="pre_layernorm")(x)
        for i in range(self.num_layers):
            x = _CLIPLayer(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                hidden_act=self.hidden_act,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, None)
        pooled = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        return nn.Dense(
            self.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            name="visual_projection",
        )(pooled)


CLIP_VISION_PRESETS: dict[str, dict] = {
    "vit_b32": dict(image_size=224, patch_size=32),
    # apple/DFN5B-CLIP-ViT-H-14-378 (the reference's CLIP-score model)
    "vit_h14_378": dict(
        image_size=378, patch_size=14, hidden_size=1280, num_layers=32,
        num_heads=16, intermediate_size=5120, projection_dim=1024,
        hidden_act="gelu",
    ),
    "tiny": dict(
        image_size=32, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=2, intermediate_size=64, projection_dim=16,
    ),
}


CLIP_PRESETS: dict[str, dict] = {
    # openai/clip-vit-large-patch14 text tower (SD1.x TE, SDXL TE-1)
    "clip_l": dict(
        hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072,
        hidden_act="quick_gelu",
    ),
    # laion CLIP-bigG text tower (SDXL TE-2)
    "clip_bigg": dict(
        hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
        hidden_act="gelu",
    ),
    # OpenCLIP ViT-H text tower as shipped with SD2.x (23 layers — the
    # released text_encoder drops the last block; penultimate
    # conditioning via layer_idx=-2 like SDXL)
    "clip_h": dict(
        hidden_size=1024, num_layers=23, num_heads=16,
        intermediate_size=4096, hidden_act="gelu",
    ),
    "tiny": dict(
        vocab_size=1024, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=77,
    ),
}
