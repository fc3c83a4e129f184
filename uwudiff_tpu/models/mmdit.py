"""MMDiT — multimodal diffusion transformer (SD3-class).

The reference framework's model zoo tops out at the SDXL UNet plus its
RoPE/DiT-style blocks (``duwu/modules/rope_unet.py``); this extends the
zoo with the SD3-family architecture (Esser et al. 2024, "Scaling
Rectified Flow Transformers" — re-derived from the paper's block
diagram, no code taken): dual-stream joint attention where image tokens
and text tokens each keep their own projections/MLPs/adaLN-Zero
modulation but attend over the CONCATENATED sequence every block.

It slots into the existing stack with zero new plumbing:

- conditioning comes from ``ConcatTextEncoders`` exactly like SDXL —
  sequence context = CLIP-L + CLIP-bigG (bucket 0, feature-concat)
  [+ T5 in bucket 1], pooled = the CLIP pooled concat delivered via
  ``added_cond["text_embeds"]`` (``addition_embed_type="pooled_text"``);
- training uses ``RectifiedFlowLoss`` (the SD3 objective) through the
  same ``DMTrainer`` signature as the UNet;
- sampling rides the k-diffusion wrapper + RF sigma schedules.

TPU-first choices: NHWC patchify conv, bf16-friendly LayerNorms, one
``dot_product_attention`` (Pallas flash on TPU) over the joint
sequence, ``scan_blocks`` stacking for compile time + pipeline
parallelism (``parallel/pipeline.py::pipelined_mmdit_apply`` — the
dual-stream ``(x, ctx)`` carry hops stages as one pytree; MoE variants
are pipe-rejected by DMTrainer), and param names chosen to hit the
Megatron TP rules
(``attn1/attn2 to_q|to_k|to_v|to_out``, ``fc1|fc2`` —
``parallel/mesh.py::_TP_RULES``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.models.dit import _2d_sincos_pos_embed
from uwudiff_tpu.models.layers import get_timestep_embedding
from uwudiff_tpu.ops import attention_bias_from_mask, dot_product_attention

__all__ = ["MMDiT", "MMDIT_PRESETS"]


class _StreamAttention(nn.Module):
    """Per-stream q/k/v/out projections (+ optional per-head RMSNorm on
    q and k, the SD3 stabilization). ``pre_only`` drops the output
    projection — the context stream of the LAST SD3 block only feeds
    keys/values into the joint attention (diffusers
    ``Attention(context_pre_only=True)`` has no ``to_add_out``)."""

    hidden_size: int
    num_heads: int
    qk_norm: bool = True
    pre_only: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.to_q = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.to_k = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.to_v = nn.Dense(self.hidden_size, dtype=self.dtype)
        if not self.pre_only:
            self.to_out = nn.Dense(self.hidden_size, dtype=self.dtype)
        if self.qk_norm:
            self.norm_q = nn.RMSNorm(dtype=self.dtype)
            self.norm_k = nn.RMSNorm(dtype=self.dtype)

    def qkv(self, h):
        b, s, _ = h.shape
        d = self.hidden_size // self.num_heads
        q = self.to_q(h).reshape(b, s, self.num_heads, d)
        k = self.to_k(h).reshape(b, s, self.num_heads, d)
        v = self.to_v(h).reshape(b, s, self.num_heads, d)
        if self.qk_norm:
            q = self.norm_q(q)
            k = self.norm_k(k)
        return q, k, v

    def out(self, attn):
        b, s = attn.shape[:2]
        return self.to_out(attn.reshape(b, s, self.hidden_size))


class _MLP(nn.Module):
    hidden_size: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h):
        inner = int(self.hidden_size * self.mlp_ratio)
        h = nn.Dense(inner, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)


def _modulation(c, hidden_size, dtype, name):
    """adaLN-Zero: 6 zero-init modulation vectors from the conditioning."""
    mod = nn.Dense(
        6 * hidden_size,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )(nn.silu(c))
    return jnp.split(mod[:, None, :], 6, axis=-1)


class MMDiTBlock(nn.Module):
    """Dual-stream joint-attention block.

    ``attn1`` = image-stream projections, ``attn2`` = text(context)-
    stream projections; attention runs over the concatenated
    [text; image] sequence, outputs split back per stream, and each
    stream applies its own adaLN-Zero gates and MLP.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = True
    # The LAST block of a real SD3 checkpoint: the context stream is
    # "pre-only" — it contributes keys/values to the joint attention
    # but has no output projection, gates, or MLP, and its conditioning
    # norm is the 2-chunk scale/shift AdaLayerNormContinuous (diffusers
    # ``JointTransformerBlock(context_pre_only=True)``); the ctx output
    # is passed through unchanged (diffusers returns None — discarded
    # either way).
    context_pre_only: bool = False
    # MoE on the IMAGE-stream MLP (the compute-dominant stream; text
    # stream stays dense) — models/moe.py semantics, expert weights
    # shard over the `expert` mesh axis
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_group_size: int | None = None
    moe_router_type: str = "top_k"  # or "expert_choice" (models/moe.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, c, joint_bias=None):
        # x: [B, S, D] image tokens; ctx: [B, T, D] text tokens; c: [B, D]
        sx_a, scx_a, gx_a, sx_m, scx_m, gx_m = _modulation(
            c, self.hidden_size, self.dtype, "adaLN_x"
        )
        if self.context_pre_only:
            # AdaLayerNormContinuous: SCALE-first 2-chunk, no gates
            mod = nn.Dense(
                2 * self.hidden_size,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="adaLN_ctx",
            )(nn.silu(c))
            scc_a, sc_a = jnp.split(mod[:, None, :], 2, axis=-1)
        else:
            sc_a, scc_a, gc_a, sc_m, scc_m, gc_m = _modulation(
                c, self.hidden_size, self.dtype, "adaLN_ctx"
            )

        attn_x = _StreamAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            qk_norm=self.qk_norm,
            dtype=self.dtype,
            name="attn1",
        )
        attn_c = _StreamAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            qk_norm=self.qk_norm,
            pre_only=self.context_pre_only,
            dtype=self.dtype,
            name="attn2",
        )

        hx = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="norm1_x"
        )(x)
        hx = hx * (1 + scx_a) + sx_a
        hc = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="norm1_ctx"
        )(ctx)
        hc = hc * (1 + scc_a) + sc_a

        qx, kx, vx = attn_x.qkv(hx)
        qc, kc, vc = attn_c.qkv(hc)
        # joint sequence: [text; image]
        q = jnp.concatenate([qc, qx], axis=1)
        k = jnp.concatenate([kc, kx], axis=1)
        v = jnp.concatenate([vc, vx], axis=1)
        attn = dot_product_attention(q, k, v, bias=joint_bias)
        t = ctx.shape[1]
        out_x = attn_x.out(attn[:, t:])
        x = x + gx_a * out_x
        if not self.context_pre_only:
            out_c = attn_c.out(attn[:, :t])
            ctx = ctx + gc_a * out_c

        hx = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="norm2_x"
        )(x)
        hx = hx * (1 + scx_m) + sx_m
        if self.num_experts:
            from uwudiff_tpu.models.moe import MoEMlp

            mlp_out = MoEMlp(
                hidden_size=self.hidden_size,
                num_experts=self.num_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                group_size=self.moe_group_size,
                router_type=self.moe_router_type,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name="moe",
            )(hx)
        else:
            mlp_out = _MLP(
                hidden_size=self.hidden_size,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name="mlp_x",
            )(hx)
        x = x + gx_m * mlp_out

        if not self.context_pre_only:
            hc = nn.LayerNorm(
                use_bias=False, use_scale=False, dtype=self.dtype,
                name="norm2_ctx",
            )(ctx)
            hc = hc * (1 + scc_m) + sc_m
            ctx = ctx + gc_m * _MLP(
                hidden_size=self.hidden_size,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name="mlp_ctx",
            )(hc)
        return x, ctx


class _MMDiTScanCell(MMDiTBlock):
    """(carry=(x, ctx), scanned=skip flag, broadcast=(c, joint_bias))
    convention for ``nn.scan``. ``skip`` is the per-layer SLG bypass
    (the block still computes under the scan's single traced body; its
    output is discarded when skipped)."""

    def __call__(self, carry, skip, c, joint_bias):
        x, ctx = carry
        x2, ctx2 = super().__call__(x, ctx, c, joint_bias)
        x = jnp.where(skip, x, x2)
        ctx = ctx if ctx2 is None else jnp.where(skip, ctx, ctx2)
        return (x, ctx), None


class MMDiT(nn.Module):
    """SD3-class multimodal diffusion transformer."""

    patch_size: int = 2
    hidden_size: int = 1536
    depth: int = 24
    num_heads: int = 24
    mlp_ratio: float = 4.0
    in_channels: int = 16
    context_dim: int = 4096
    pooled_dim: int = 2048
    qk_norm: bool = True
    # Real-SD3 checkpoint architecture: the LAST block drops the context
    # output path (diffusers ``context_pre_only`` — see MMDiTBlock).
    context_pre_only: bool = False
    # Real-SD3 positional embedding: diffusers bakes one
    # ``pos_embed_max_size``-sided grid (192 for SD3-medium) whose
    # coordinates are scaled by base_size/max_size, then CENTER-CROPS the
    # [gh, gw] window at runtime — fractional, offset positions, NOT a
    # fresh [0..gh) grid. None keeps the fresh-grid convention.
    pos_embed_max_size: int | None = None
    pos_embed_base_size: int | None = None
    # MoE on the image-stream MLPs (SD3-MoE variant; aux losses sown
    # into "moe_losses" and added by DMTrainer)
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_group_size: int | None = None
    moe_router_type: str = "top_k"
    gradient_checkpointing: bool = False
    scan_blocks: bool = False
    # SD3.5 skip-layer guidance: indices of joint blocks BYPASSED in
    # this instance's forward (the degraded pass; published SD3.5-medium
    # recipe skips layers (7, 8, 9)). Adds no params — build a second
    # module via ``unet.clone(skip_layers=...)`` on trained weights and
    # combine through ``cfg.build_slg_cfg_fn``. The context_pre_only
    # final block is never skippable.
    skip_layers: tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "MMDiT":
        if isinstance(config, str):
            config = dict(MMDIT_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    @property
    def addition_embed_type(self):
        # pooled text delivered via added_cond["text_embeds"]; no
        # SDXL time_ids (extra keys are ignored)
        return "pooled_text"

    def setup(self):
        self.patch_embed = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
        )
        self.context_embedder = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.t_fc1 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.t_fc2 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.pool_fc1 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.pool_fc2 = nn.Dense(self.hidden_size, dtype=self.dtype)

        block_kwargs = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm,
            num_experts=self.num_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_group_size=self.moe_group_size,
            moe_router_type=self.moe_router_type,
            dtype=self.dtype,
        )
        # the final context_pre_only block is heterogeneous, so it lives
        # outside the scan/list under its own name
        n_blocks = self.depth - 1 if self.context_pre_only else self.depth
        if self.scan_blocks and n_blocks > 1:
            cell = _MMDiTScanCell
            if self.gradient_checkpointing:
                cell = nn.remat(cell, prevent_cse=False)
            self.blocks = nn.scan(
                cell,
                variable_axes={"params": 0, "moe_losses": 0},
                split_rngs={"params": True, "dropout": True},
                length=n_blocks,
                in_axes=(0, nn.broadcast, nn.broadcast),
            )(**block_kwargs)
        else:
            block_cls = (
                nn.remat(MMDiTBlock)
                if self.gradient_checkpointing
                else MMDiTBlock
            )
            self.blocks = [
                block_cls(**block_kwargs) for _ in range(n_blocks)
            ]
        if self.context_pre_only:
            self.final_block = MMDiTBlock(
                **{**block_kwargs, "num_experts": 0},
                context_pre_only=True,
            )

        self.final_modulation = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        self.final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype
        )
        self.final_proj = nn.Dense(
            self.patch_size * self.patch_size * self.in_channels,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    # -- stages (mirrors models/dit.py so the pipeline can drive it) ---

    def embed(
        self,
        sample: jnp.ndarray,  # [B, H, W, C]
        timesteps: jnp.ndarray,  # [B]
        encoder_hidden_states: jnp.ndarray,  # [B, T, context_dim]
        pooled: jnp.ndarray | None,  # [B, pooled_dim]
    ):
        b, h, w, _ = sample.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = self.patch_embed(sample.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.hidden_size)
        if self.pos_embed_max_size:
            # center-crop of the baked max-size grid == sincos over
            # offset, base/max-scaled coordinates (diffusers
            # PatchEmbed.cropped_pos_embed semantics)
            import numpy as np

            base = self.pos_embed_base_size or self.pos_embed_max_size
            scale = base / self.pos_embed_max_size
            top = (self.pos_embed_max_size - gh) // 2
            left = (self.pos_embed_max_size - gw) // 2
            pos = jnp.asarray(
                _2d_sincos_pos_embed(
                    self.hidden_size, gh, gw,
                    h_coords=(top + np.arange(gh)) * scale,
                    w_coords=(left + np.arange(gw)) * scale,
                ),
                self.dtype,
            )
        else:
            pos = jnp.asarray(
                _2d_sincos_pos_embed(self.hidden_size, gh, gw), self.dtype
            )
        x = x + pos[None]

        t_emb = get_timestep_embedding(
            jnp.atleast_1d(timesteps), 256
        ).astype(self.dtype)
        c = self.t_fc2(nn.silu(self.t_fc1(t_emb)))
        if pooled is not None:
            c = c + self.pool_fc2(
                nn.silu(self.pool_fc1(pooled.astype(self.dtype)))
            )

        ctx = self.context_embedder(
            encoder_hidden_states.astype(self.dtype)
        )
        return x, ctx, c

    def backbone(self, x, ctx, c, joint_bias=None):
        if isinstance(self.blocks, (list, tuple)):
            assert all(0 <= i < len(self.blocks) for i in self.skip_layers)
            for i, blk in enumerate(self.blocks):
                if i in self.skip_layers:
                    continue
                x, ctx = blk(x, ctx, c, joint_bias)
        else:
            n = self.depth - 1 if self.context_pre_only else self.depth
            assert all(0 <= i < n for i in self.skip_layers)
            skip = jnp.asarray(
                [i in self.skip_layers for i in range(n)], bool
            )
            (x, ctx), _ = self.blocks((x, ctx), skip, c, joint_bias)
        if self.context_pre_only:
            x, ctx = self.final_block(x, ctx, c, joint_bias)
        return x, ctx

    def head(self, x, c, sample_shape) -> jnp.ndarray:
        b, h, w, _ = sample_shape
        p = self.patch_size
        gh, gw = h // p, w // p
        mod = self.final_modulation(nn.silu(c))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = self.final_norm(x)
        x = x * (1 + scale) + shift
        x = self.final_proj(x)
        x = x.reshape(b, gh, gw, p, p, self.in_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x).reshape(
            b, gh * p, gw * p, self.in_channels
        )
        return x.astype(jnp.float32)

    def apply_block(self, block_params, carry, extras, has_bias=False):
        """Apply ONE joint-attention block functionally from its
        (unstacked) param slice — the pipeline-parallel stage body.
        ``carry`` is the dual-stream ``(x, ctx)`` pytree; ``extras`` is
        ``(c,)`` or ``(c, joint_bias)`` (``has_bias`` is static)."""
        if has_bias:
            c_emb, bias = extras
        else:
            (c_emb,), bias = extras, None
        x, ctx = carry
        block = MMDiTBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm,
            num_experts=self.num_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_group_size=self.moe_group_size,
            moe_router_type=self.moe_router_type,
            dtype=self.dtype,
            parent=None,  # detached: not a child of this (unbound) module
        )
        return block.apply({"params": block_params}, x, ctx, c_emb, bias)

    def joint_bias(self, encoder_attention_mask, n_image_tokens: int):
        """Additive attention bias masking padded TEXT keys in the joint
        sequence (image keys always attend)."""
        if encoder_attention_mask is None:
            return None
        b = encoder_attention_mask.shape[0]
        img = jnp.ones((b, n_image_tokens), encoder_attention_mask.dtype)
        joint = jnp.concatenate([encoder_attention_mask, img], axis=1)
        return attention_bias_from_mask(joint, dtype=jnp.float32)

    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C] latents (NHWC)
        timesteps: jnp.ndarray,  # [B]
        encoder_hidden_states: jnp.ndarray,  # [B, T, context_dim]
        encoder_attention_mask: jnp.ndarray | None = None,  # [B, T]
        added_cond: dict | None = None,  # {"text_embeds": pooled, ...}
    ) -> jnp.ndarray:
        pooled = added_cond.get("text_embeds") if added_cond else None
        x, ctx, c = self.embed(
            sample, timesteps, encoder_hidden_states, pooled
        )
        p = self.patch_size
        n_img = (sample.shape[1] // p) * (sample.shape[2] // p)
        bias = self.joint_bias(encoder_attention_mask, n_img)
        x, _ = self.backbone(x, ctx, c, bias)
        return self.head(x, c, sample.shape)


MMDIT_PRESETS: dict[str, dict] = {
    # SD3-medium class: 24 layers x 1536 (~2.0B with the dual streams).
    # context_pre_only + the 192-grid cropped pos embed (base 64) match
    # the released checkpoints' architecture so mmdit_key_map imports
    # them weight- and activation-faithfully.
    "sd3_medium": dict(
        patch_size=2, hidden_size=1536, depth=24, num_heads=24,
        in_channels=16, context_dim=4096, pooled_dim=2048,
        context_pre_only=True, pos_embed_max_size=192,
        pos_embed_base_size=64,
    ),
    # SD3.5-large class: 38 layers x 2432
    "sd3_large": dict(
        patch_size=2, hidden_size=2432, depth=38, num_heads=38,
        in_channels=16, context_dim=4096, pooled_dim=2048,
        context_pre_only=True, pos_embed_max_size=192,
        pos_embed_base_size=64,
    ),
    "tiny": dict(
        patch_size=2, hidden_size=32, depth=2, num_heads=2,
        in_channels=4, context_dim=48, pooled_dim=24,
    ),
    # SD3-MoE class point: top-2 of 8 experts on the image-stream MLPs
    "sd3_medium_8e": dict(
        patch_size=2, hidden_size=1536, depth=24, num_heads=24,
        in_channels=16, context_dim=4096, pooled_dim=2048,
        num_experts=8, moe_top_k=2,
    ),
    "tiny_moe": dict(
        patch_size=2, hidden_size=32, depth=2, num_heads=2,
        in_channels=4, context_dim=48, pooled_dim=24,
        num_experts=4, moe_top_k=2,
    ),
}
