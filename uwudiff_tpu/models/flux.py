"""Flux — rectified-flow transformer (Black Forest Labs family).

The reference framework's model zoo tops out at the SDXL UNet
(``duwu/modules/rope_unet.py``); this extends the zoo with the Flux
architecture (re-derived from the published model card / diffusers
``FluxTransformer2DModel`` architecture description, no code taken):

- latents are PACKED 2x2 (16ch -> 64 features per token, a plain
  reshape — no patchify conv), embedded by one Dense;
- a 3-axis rotary embedding over (id, row, col) token coordinates with
  FIXED theta-10000 frequencies (``axes_dims`` per axis, summing to the
  per-head dim); text tokens sit at the (0,0,0) origin;
- N dual-stream joint-attention blocks (MMDiT-style: per-stream
  projections/MLPs/adaLN-Zero, attention over [text; image]);
- then 2N single-stream blocks over the CONCATENATED sequence where
  attention and the 4x MLP run in PARALLEL from one pre-norm (ViT-22B
  style) and one fused output projection mixes both;
- conditioning c = timestep MLP + (flux-dev) guidance-embedding MLP +
  pooled-CLIP MLP; context = T5 sequence features.

It slots into the existing stack with zero new plumbing: context /
pooled arrive exactly like MMDiT (``ConcatTextEncoders`` with the CLIP
slot marked ``pooled_only``), training uses ``RectifiedFlowLoss``
through the same DMTrainer signature, sampling rides ``RFDenoiser`` +
the dynamic-shift RF sigma grids. The distilled-guidance input rides
``added_cond["guidance"]`` (defaults to ``default_guidance`` when
absent, so the trainer needs no new keys).

TPU-first choices: NHWC in/out with static reshape packing, one
``dot_product_attention`` (Pallas flash on TPU) per block over the
joint sequence, fp32 rotary tables folded in at trace time,
``scan_blocks`` stacking for compile time, and param names chosen to
hit the Megatron TP rules (``attn1/attn2 to_q|to_k|to_v|to_out``,
``fc1|fc2``, ``ff/proj_in|proj_out`` — ``parallel/mesh.py::_TP_RULES``).

Timestep convention: DDPM-scale ``[0, 1000)`` floats like every model
here (diffusers feeds t in [0,1] and scales x1000 internally — the
same numbers land in the sinusoid).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.models.layers import get_timestep_embedding
from uwudiff_tpu.ops import attention_bias_from_mask, dot_product_attention

__all__ = ["Flux", "FLUX_PRESETS", "flux_rope_table", "apply_flux_rope"]


# ---------------------------------------------------------------------
# rotary tables
# ---------------------------------------------------------------------


def flux_rope_table(
    ids: np.ndarray, axes_dims: tuple[int, ...], theta: float = 10000.0
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables ``[S, sum(axes_dims)]`` for integer token
    coordinates ``ids [S, n_axes]``.

    Per axis a: ``freqs = pos * theta**(-2i/d_a)`` for i < d_a/2, then
    cos/sin are repeat-interleaved x2 and the axes concatenated — the
    published Flux convention. Computed in float64 on host (the tables
    are trace-time constants; rotation itself runs in the compute
    dtype).
    """
    ids = np.asarray(ids, np.float64)
    cos_parts, sin_parts = [], []
    for a, dim in enumerate(axes_dims):
        omega = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        freqs = np.outer(ids[:, a], omega)  # [S, dim/2]
        cos_parts.append(np.repeat(np.cos(freqs), 2, axis=-1))
        sin_parts.append(np.repeat(np.sin(freqs), 2, axis=-1))
    return (
        np.concatenate(cos_parts, axis=-1).astype(np.float32),
        np.concatenate(sin_parts, axis=-1).astype(np.float32),
    )


def apply_flux_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate ``x [B, S, H, D]`` by per-position tables ``[S, D]``:
    out = x*cos + interleave(-x_odd, x_even)*sin."""
    rotated = jnp.stack((-x[..., 1::2], x[..., 0::2]), axis=-1)
    rotated = rotated.reshape(x.shape)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def _joint_ids(gh: int, gw: int, n_txt: int) -> np.ndarray:
    """[n_txt + gh*gw, 3] (id, row, col) coordinates: text at the
    origin, image tokens on the (row, col) grid."""
    txt = np.zeros((n_txt, 3), np.float64)
    rows, cols = np.meshgrid(
        np.arange(gh, dtype=np.float64),
        np.arange(gw, dtype=np.float64),
        indexing="ij",
    )
    img = np.stack(
        [np.zeros(gh * gw), rows.reshape(-1), cols.reshape(-1)], axis=-1
    )
    return np.concatenate([txt, img], axis=0)


# ---------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------


class _FluxAttention(nn.Module):
    """Per-stream q/k/v(/out) projections with per-head RMSNorm on q,k
    (names hit the Megatron TP col/row rules)."""

    hidden_size: int
    num_heads: int
    has_out: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.to_q = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.to_k = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.to_v = nn.Dense(self.hidden_size, dtype=self.dtype)
        if self.has_out:
            self.to_out = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.norm_q = nn.RMSNorm(dtype=self.dtype)
        self.norm_k = nn.RMSNorm(dtype=self.dtype)

    def qkv(self, h):
        b, s, _ = h.shape
        d = self.hidden_size // self.num_heads
        q = self.norm_q(self.to_q(h).reshape(b, s, self.num_heads, d))
        k = self.norm_k(self.to_k(h).reshape(b, s, self.num_heads, d))
        v = self.to_v(h).reshape(b, s, self.num_heads, d)
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


def _modulation(c, n: int, hidden_size: int, dtype, name: str):
    """adaLN-Zero: n zero-init modulation vectors from the conditioning
    (order: shift, scale, gate[, shift_mlp, scale_mlp, gate_mlp])."""
    mod = nn.Dense(
        n * hidden_size,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )(nn.silu(c))
    return jnp.split(mod[:, None, :], n, axis=-1)


class FluxDoubleBlock(nn.Module):
    """Dual-stream joint-attention block (MMDiT-style; text and image
    keep their own projections/MLPs/adaLN gates, attention runs over the
    rotary-embedded [text; image] concatenation)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, c, rope, joint_bias=None):
        # x: [B, S, D] image; ctx: [B, T, D] text; c: [B, D];
        # rope = (cos, sin) [T+S, d_head]
        sx_a, scx_a, gx_a, sx_m, scx_m, gx_m = _modulation(
            c, 6, self.hidden_size, self.dtype, "adaLN_x"
        )
        sc_a, scc_a, gc_a, sc_m, scc_m, gc_m = _modulation(
            c, 6, self.hidden_size, self.dtype, "adaLN_ctx"
        )

        attn_x = _FluxAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            dtype=self.dtype, name="attn1",
        )
        attn_c = _FluxAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            dtype=self.dtype, name="attn2",
        )

        hx = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="norm1_x"
        )(x)
        hx = hx * (1 + scx_a) + sx_a
        hc = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype,
            name="norm1_ctx",
        )(ctx)
        hc = hc * (1 + scc_a) + sc_a

        qx, kx, vx = attn_x.qkv(hx)
        qc, kc, vc = attn_c.qkv(hc)
        q = jnp.concatenate([qc, qx], axis=1)  # text first
        k = jnp.concatenate([kc, kx], axis=1)
        v = jnp.concatenate([vc, vx], axis=1)
        cos, sin = rope
        q = apply_flux_rope(q, cos, sin)
        k = apply_flux_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, bias=joint_bias)
        t = ctx.shape[1]
        x = x + gx_a * attn_x.out(attn[:, t:])
        ctx = ctx + gc_a * attn_c.out(attn[:, :t])

        hx = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="norm2_x"
        )(x)
        x = x + gx_m * _MLP(
            hidden_size=self.hidden_size, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, name="mlp_x",
        )(hx * (1 + scx_m) + sx_m)

        hc = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype,
            name="norm2_ctx",
        )(ctx)
        ctx = ctx + gc_m * _MLP(
            hidden_size=self.hidden_size, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, name="mlp_ctx",
        )(hc * (1 + scc_m) + sc_m)
        return x, ctx


class FluxSingleBlock(nn.Module):
    """Single-stream block: attention and the 4x MLP both read ONE
    pre-normed, modulated input in parallel; one fused projection
    (``ff/proj_out``) mixes [attn_out; gelu(mlp)] back to the residual
    (attention has no own output projection)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, c, rope, joint_bias=None):
        shift, scale, gate = _modulation(
            c, 3, self.hidden_size, self.dtype, "adaLN"
        )
        hn = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="norm"
        )(h)
        hn = hn * (1 + scale) + shift

        attn = _FluxAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            has_out=False, dtype=self.dtype, name="attn1",
        )
        q, k, v = attn.qkv(hn)
        cos, sin = rope
        q = apply_flux_rope(q, cos, sin)
        k = apply_flux_rope(k, cos, sin)
        a = dot_product_attention(q, k, v, bias=joint_bias)
        b, s = a.shape[:2]
        a = a.reshape(b, s, self.hidden_size)

        inner = int(self.hidden_size * self.mlp_ratio)
        mlp = nn.Dense(inner, dtype=self.dtype, name="proj_mlp")(hn)
        mlp = nn.gelu(mlp, approximate=True)
        out = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj_out")(
            jnp.concatenate([a, mlp], axis=-1)
        )
        return h + gate * out


class _FluxDoubleScanCell(FluxDoubleBlock):
    def __call__(self, carry, c, rope, joint_bias):
        x, ctx = carry
        return super().__call__(x, ctx, c, rope, joint_bias), None


class _FluxSingleScanCell(FluxSingleBlock):
    def __call__(self, carry, c, rope, joint_bias):
        return super().__call__(carry, c, rope, joint_bias), None


# ---------------------------------------------------------------------
# model
# ---------------------------------------------------------------------


class Flux(nn.Module):
    """Flux-family rectified-flow transformer (NHWC latents in/out)."""

    patch_size: int = 2  # 2x2 latent packing
    hidden_size: int = 3072
    depth: int = 19  # double-stream blocks
    depth_single: int = 38  # single-stream blocks
    num_heads: int = 24
    mlp_ratio: float = 4.0
    in_channels: int = 16
    context_dim: int = 4096  # T5 features
    pooled_dim: int = 768  # CLIP-L pooled
    guidance_embeds: bool = True  # flux-dev; schnell = False
    # embedded when added_cond carries no "guidance" (training
    # fine-tunes at a fixed guidance level by convention)
    default_guidance: float = 3.5
    axes_dims: tuple[int, ...] = (16, 56, 56)  # sums to head dim
    rope_theta: float = 10000.0
    gradient_checkpointing: bool = False
    scan_blocks: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "Flux":
        if isinstance(config, str):
            config = dict(FLUX_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        if "axes_dims" in config:
            config["axes_dims"] = tuple(config["axes_dims"])
        return cls(**config)

    @property
    def addition_embed_type(self):
        return "pooled_text"  # pooled rides added_cond["text_embeds"]

    def setup(self):
        head_dim = self.hidden_size // self.num_heads
        if sum(self.axes_dims) != head_dim:
            raise ValueError(
                f"axes_dims {self.axes_dims} must sum to the per-head "
                f"dim {head_dim}"
            )
        self.x_embedder = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.context_embedder = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.t_fc1 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.t_fc2 = nn.Dense(self.hidden_size, dtype=self.dtype)
        if self.guidance_embeds:
            self.g_fc1 = nn.Dense(self.hidden_size, dtype=self.dtype)
            self.g_fc2 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.pool_fc1 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.pool_fc2 = nn.Dense(self.hidden_size, dtype=self.dtype)

        blk = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
        )
        if self.scan_blocks and self.depth > 1:
            cell = _FluxDoubleScanCell
            if self.gradient_checkpointing:
                cell = nn.remat(cell, prevent_cse=False)
            self.blocks = nn.scan(
                cell,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                in_axes=(nn.broadcast,) * 3,
            )(**blk)
        else:
            dcls = (
                nn.remat(FluxDoubleBlock)
                if self.gradient_checkpointing
                else FluxDoubleBlock
            )
            self.blocks = [dcls(**blk) for _ in range(self.depth)]
        if self.scan_blocks and self.depth_single > 1:
            cell = _FluxSingleScanCell
            if self.gradient_checkpointing:
                cell = nn.remat(cell, prevent_cse=False)
            self.single_blocks = nn.scan(
                cell,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth_single,
                in_axes=(nn.broadcast,) * 3,
            )(**blk)
        else:
            scls = (
                nn.remat(FluxSingleBlock)
                if self.gradient_checkpointing
                else FluxSingleBlock
            )
            self.single_blocks = [scls(**blk) for _ in range(self.depth_single)]

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

    # -- packing -------------------------------------------------------

    def _pack(self, sample: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C] -> [B, (H/p)(W/p), C*p*p], features ordered
        (C, ph, pw) — the published packing convention."""
        b, h, w, cch = sample.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = sample.reshape(b, gh, p, gw, p, cch)
        x = jnp.einsum("bhpwqc->bhwcpq", x)
        return x.reshape(b, gh * gw, cch * p * p)

    def _unpack(self, x: jnp.ndarray, sample_shape) -> jnp.ndarray:
        b, h, w, cch = sample_shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, gw, cch, p, p)
        x = jnp.einsum("bhwcpq->bhpwqc", x)
        return x.reshape(b, gh * p, gw * p, cch)

    # -- forward -------------------------------------------------------

    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C] latents (NHWC)
        timesteps: jnp.ndarray,  # [B], DDPM scale
        encoder_hidden_states: jnp.ndarray,  # [B, T, context_dim]
        encoder_attention_mask: jnp.ndarray | None = None,  # [B, T]
        added_cond: dict | None = None,  # {"text_embeds", "guidance"?}
    ) -> jnp.ndarray:
        b, h, w, _ = sample.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        n_txt = encoder_hidden_states.shape[1]

        x = self.x_embedder(self._pack(sample.astype(self.dtype)))
        ctx = self.context_embedder(
            encoder_hidden_states.astype(self.dtype)
        )

        t_emb = get_timestep_embedding(
            jnp.atleast_1d(timesteps), 256
        ).astype(self.dtype)
        c = self.t_fc2(nn.silu(self.t_fc1(t_emb)))
        if self.guidance_embeds:
            guidance = None
            if added_cond is not None:
                guidance = added_cond.get("guidance")
            if guidance is None:
                guidance = jnp.full((b,), self.default_guidance)
            else:
                # accept a scalar (python float / 0-d array) per batch
                guidance = jnp.broadcast_to(
                    jnp.atleast_1d(jnp.asarray(guidance, jnp.float32)), (b,)
                )
            # published convention embeds guidance x1000 (same
            # sinusoid scale as the [0,1000) timesteps)
            g_emb = get_timestep_embedding(
                jnp.atleast_1d(guidance) * 1000.0, 256
            ).astype(self.dtype)
            c = c + self.g_fc2(nn.silu(self.g_fc1(g_emb)))
        pooled = added_cond.get("text_embeds") if added_cond else None
        if pooled is not None:
            c = c + self.pool_fc2(
                nn.silu(self.pool_fc1(pooled.astype(self.dtype)))
            )

        cos, sin = flux_rope_table(
            _joint_ids(gh, gw, n_txt), self.axes_dims, self.rope_theta
        )
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        bias = None
        if encoder_attention_mask is not None:
            img = jnp.ones((b, gh * gw), encoder_attention_mask.dtype)
            joint = jnp.concatenate([encoder_attention_mask, img], axis=1)
            bias = attention_bias_from_mask(joint, dtype=jnp.float32)

        if isinstance(self.blocks, (list, tuple)):
            for blk in self.blocks:
                x, ctx = blk(x, ctx, c, rope, bias)
        else:
            (x, ctx), _ = self.blocks((x, ctx), c, rope, bias)

        hcat = jnp.concatenate([ctx, x], axis=1)
        if isinstance(self.single_blocks, (list, tuple)):
            for blk in self.single_blocks:
                hcat = blk(hcat, c, rope, bias)
        else:
            hcat, _ = self.single_blocks(hcat, c, rope, bias)
        x = hcat[:, n_txt:]

        mod = self.final_modulation(nn.silu(c))
        # AdaLayerNormContinuous chunk order: SCALE first
        scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
        x = self.final_norm(x) * (1 + scale) + shift
        x = self.final_proj(x)
        return self._unpack(x, sample.shape).astype(jnp.float32)


FLUX_PRESETS: dict[str, dict] = {
    # flux-dev class: 19 double + 38 single, 24 heads x 128 (~12B)
    "flux_dev": dict(
        hidden_size=3072, depth=19, depth_single=38, num_heads=24,
        in_channels=16, context_dim=4096, pooled_dim=768,
        guidance_embeds=True, axes_dims=(16, 56, 56),
    ),
    # flux-schnell class: same trunk, no guidance embedding
    "flux_schnell": dict(
        hidden_size=3072, depth=19, depth_single=38, num_heads=24,
        in_channels=16, context_dim=4096, pooled_dim=768,
        guidance_embeds=False, axes_dims=(16, 56, 56),
    ),
    # single-chip-measurable scale point (~1B): flux block anatomy and
    # 16ch latents at a size one 16GB v5e can train
    "flux_1b": dict(
        hidden_size=1536, depth=6, depth_single=12, num_heads=12,
        in_channels=16, context_dim=4096, pooled_dim=768,
        guidance_embeds=True, axes_dims=(16, 56, 56),
    ),
    "tiny": dict(
        hidden_size=32, depth=2, depth_single=2, num_heads=2,
        in_channels=4, context_dim=48, pooled_dim=24,
        guidance_embeds=True, axes_dims=(4, 6, 6),
    ),
}
FLUX_PRESETS["flux_tiny"] = FLUX_PRESETS["tiny"]  # BENCH_MODEL alias
