"""Transformer blocks for the UNet (and DiT).

Replaces diffusers' ``BasicTransformerBlock`` / ``Transformer2DModel``
and the reference's RoPE-patched variants
(``duwu/modules/rope_unet.py:39-547``): self-attention (optionally with
axial RoPE on Q and K), cross-attention (RoPE on Q only —
``rope_unet.py:143-147``), GEGLU feed-forward, pre-LayerNorm. All
attention funnels through ``uwudiff_tpu.ops.dot_product_attention``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from uwudiff_tpu.models.layers import near_zero_init, zero_init
from uwudiff_tpu.models.rope import AxialRoPE
from uwudiff_tpu.ops import dot_product_attention
from uwudiff_tpu.ops.attention import attention_bias_from_mask

__all__ = ["Attention", "FeedForward", "BasicTransformerBlock", "Transformer2DModel"]

# diffusers BasicTransformerBlock norm_eps (torch nn.LayerNorm default);
# flax's default is 1e-6 — caught by tests/test_block_oracles.py.
_LN_EPS = 1e-5


def _out_init(stddev: float):
    if stddev == 0.0:
        return zero_init
    if stddev < 0:  # negative sentinel -> default lecun init
        return nn.initializers.lecun_normal()
    return near_zero_init(stddev)


class Attention(nn.Module):
    """Multi-head attention with optional axial RoPE.

    RoPE semantics follow ``RoPEAttnProcessor2_0``
    (``rope_unet.py:120-147``): rotate Q always; rotate K only when
    self-attention (no encoder_hidden_states given).
    """

    num_heads: int
    head_dim: int
    out_dim: int | None = None
    use_rope: bool = False
    out_init_stddev: float = -1.0  # -1 -> default init; >=0 -> (near-)zero
    # one [C, 3*inner] matmul for self-attention q/k/v (and [Ck, 2*inner]
    # for cross k/v) instead of separate projections: better MXU tiling,
    # one HBM read of the activations. Param names become to_qkv / to_kv;
    # the torch importer concatenates the separate diffusers tensors.
    fused_qkv: bool = False
    # IP-Adapter (Ye et al. 2023) decoupled cross-attention: when
    # ``ip_hidden_states`` (image-prompt tokens) are passed to a
    # cross-attention call, extra to_k_ip/to_v_ip projections attend the
    # SAME query over them and the result adds (scaled) before to_out.
    # to_v_ip is zero-init so the adapter is an exact no-op at init.
    ip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, Sq, C]
        encoder_hidden_states: jnp.ndarray | None = None,  # [B, Sk, Ck]
        attention_mask: jnp.ndarray | None = None,  # [B, Sk] key mask
        position_map: jnp.ndarray | None = None,  # [Sq, 2] axial positions
        ip_hidden_states: jnp.ndarray | None = None,  # [B, n_ip, C_ip]
    ) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or hidden_states.shape[-1]

        is_self = encoder_hidden_states is None
        kv_source = hidden_states if is_self else encoder_hidden_states

        if self.fused_qkv and is_self:
            qkv = nn.Dense(
                3 * inner, use_bias=False, dtype=self.dtype, name="to_qkv"
            )(hidden_states)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif self.fused_qkv:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
                hidden_states
            )
            kv = nn.Dense(
                2 * inner, use_bias=False, dtype=self.dtype, name="to_kv"
            )(kv_source)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
                hidden_states
            )
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(
                kv_source
            )
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(
                kv_source
            )

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)

        if self.use_rope:
            assert position_map is not None, "RoPE attention needs position_map"
            rope = AxialRoPE(
                dim=self.head_dim,
                n_heads=self.num_heads,
                dtype=self.dtype,
                name="axial_rope",
            )
            q = rope(q, position_map)
            if is_self:
                k = rope(k, position_map)

        bias = attention_bias_from_mask(attention_mask, dtype=jnp.float32)
        out = dot_product_attention(q, k, v, bias=bias)

        if ip_hidden_states is not None and not is_self:
            # decoupled image-prompt attention, shared query
            k_ip = nn.Dense(
                inner, use_bias=False, dtype=self.dtype, name="to_k_ip"
            )(ip_hidden_states)
            v_ip = nn.Dense(
                inner, use_bias=False, kernel_init=zero_init,
                dtype=self.dtype, name="to_v_ip",
            )(ip_hidden_states)
            n_ip = k_ip.shape[1]
            k_ip = k_ip.reshape(b, n_ip, self.num_heads, self.head_dim)
            v_ip = v_ip.reshape(b, n_ip, self.num_heads, self.head_dim)
            out = out + self.ip_scale * dot_product_attention(
                q, k_ip, v_ip
            )

        out = out.reshape(b, sq, inner)
        out = nn.Dense(
            out_dim,
            dtype=self.dtype,
            kernel_init=_out_init(self.out_init_stddev),
            name="to_out",
        )(out)
        return out


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers default for SD UNets)."""

    dim: int
    mult: int = 4
    out_init_stddev: float = -1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        # GEGLU: one projection to 2*inner, gate with gelu
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        x_part, gate = jnp.split(proj, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu, not the tanh approximation
        x = x_part * nn.gelu(gate, approximate=False)
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=_out_init(self.out_init_stddev),
            name="proj_out",
        )(x)
        return x


class BasicTransformerBlock(nn.Module):
    """Pre-LN: self-attn -> cross-attn -> GEGLU FF, all residual
    (diffusers ``BasicTransformerBlock`` semantics; the out-projections
    of attn/FF take the zero-family init per ``unet_patch.py:34-42``)."""

    dim: int
    num_heads: int
    head_dim: int
    cross_attention_dim: int | None = None
    use_rope: bool = False
    only_cross_attention: bool = False
    out_init_stddev: float = -1.0
    fused_qkv: bool = False
    ip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray | None = None,
        encoder_attention_mask: jnp.ndarray | None = None,
        position_map: jnp.ndarray | None = None,
        ip_hidden_states: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        # 1. self-attention
        norm_hidden = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm1")(hidden_states)
        attn1_ctx = (
            encoder_hidden_states if self.only_cross_attention else None
        )
        attn_out = Attention(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            use_rope=self.use_rope,
            out_init_stddev=self.out_init_stddev,
            fused_qkv=self.fused_qkv,
            dtype=self.dtype,
            name="attn1",
        )(norm_hidden, attn1_ctx, position_map=position_map)
        # a no-op identity unless a save_names remat policy targets it
        attn_out = checkpoint_name(attn_out, "attn_out")
        hidden_states = hidden_states + attn_out

        # 2. cross-attention
        if self.cross_attention_dim is not None:
            norm_hidden = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm2")(
                hidden_states
            )
            attn_out = Attention(
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                use_rope=self.use_rope,
                out_init_stddev=self.out_init_stddev,
                fused_qkv=self.fused_qkv,
                ip_scale=self.ip_scale,
                dtype=self.dtype,
                name="attn2",
            )(
                norm_hidden,
                encoder_hidden_states,
                attention_mask=encoder_attention_mask,
                position_map=position_map,
                ip_hidden_states=ip_hidden_states,
            )
            attn_out = checkpoint_name(attn_out, "attn_out")
            hidden_states = hidden_states + attn_out

        # 3. feed-forward
        norm_hidden = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm3")(hidden_states)
        ff_out = FeedForward(
            dim=self.dim,
            out_init_stddev=self.out_init_stddev,
            dtype=self.dtype,
            name="ff",
        )(norm_hidden)
        ff_out = checkpoint_name(ff_out, "ffn_out")
        return hidden_states + ff_out


class _ScanCell(BasicTransformerBlock):
    """BasicTransformerBlock adapted to the (carry, out) calling
    convention ``nn.scan`` expects."""

    def __call__(self, hidden_states, *args):
        return super().__call__(hidden_states, *args), None


class Transformer2DModel(nn.Module):
    """Spatial transformer: GN -> proj_in -> blocks over [B, HW, C] ->
    proj_out -> residual (diffusers semantics; RoPE position map built
    from the latent grid as ``rope_unet.py:474-480``).

    ``scan_blocks=True`` folds the ``num_layers`` identical blocks into
    ONE ``nn.scan`` — the HLO contains a single block body instead of
    ``num_layers`` unrolled copies, cutting trace/compile time for deep
    stacks (SDXL's 10-layer level). Params then live under ``blocks``
    with a leading layer axis; ``models.import_torch.stack_block_params``
    converts between the layouts.

    ``remat_cell=True`` checkpoints each scan iteration (scan-of-remat):
    the backward scan recomputes one block body at a time, so the live
    residual set is O(1) blocks instead of O(num_layers). This is the
    memory-correct way to combine scanning with gradient checkpointing —
    an OUTER ``nn.remat`` around a scanned transformer still stores
    per-iteration residuals for the whole stack when its backward
    recomputes the forward scan (measured: SDXL bs=8 OOMs at 17.9GB
    outer-rematted vs fitting with cell remat)."""

    num_heads: int
    head_dim: int
    num_layers: int = 1
    cross_attention_dim: int | None = None
    use_linear_projection: bool = False
    use_rope: bool = False
    out_init_stddev: float = -1.0
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scan_blocks: bool = False
    remat_cell: bool = False
    remat_policy: str | None = None
    fused_qkv: bool = False
    ip_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, H, W, C]
        encoder_hidden_states: jnp.ndarray | None = None,
        encoder_attention_mask: jnp.ndarray | None = None,
        position_map: jnp.ndarray | None = None,
        ip_hidden_states: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        b, h, w, c = hidden_states.shape
        inner = self.num_heads * self.head_dim
        residual = hidden_states

        x = nn.GroupNorm(
            num_groups=self.norm_num_groups,
            epsilon=self.norm_eps,
            dtype=self.dtype,
            name="norm",
        )(hidden_states)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)

        if self.use_rope and position_map is None:
            from uwudiff_tpu.models.rope import make_axial_pos

            position_map = make_axial_pos(h, w)

        block_kwargs = dict(
            dim=inner,
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            cross_attention_dim=self.cross_attention_dim,
            use_rope=self.use_rope,
            out_init_stddev=self.out_init_stddev,
            fused_qkv=self.fused_qkv,
            ip_scale=self.ip_scale,
            dtype=self.dtype,
        )
        if self.scan_blocks and self.num_layers > 1:
            cell_cls = _ScanCell
            if self.remat_cell:
                from uwudiff_tpu.models.layers import resolve_remat_policy

                policy = resolve_remat_policy(self.remat_policy)
                # prevent_cse=False is safe (and faster) under lax.scan
                cell_cls = nn.remat(
                    _ScanCell, policy=policy, prevent_cse=False
                )
            scanned = nn.scan(
                cell_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(
                    nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                ),
            )(**block_kwargs, name="blocks")
            x, _ = scanned(
                x,
                encoder_hidden_states,
                encoder_attention_mask,
                position_map,
                ip_hidden_states,
            )
        else:
            block_cls = BasicTransformerBlock
            if self.remat_cell:
                # scan_blocks models keep 1-layer stacks unrolled (no
                # scan to checkpoint per iteration), so checkpoint the
                # block itself — otherwise gradient_checkpointing would
                # silently not apply to these levels (SD1.5 has ONLY
                # 1-layer stacks)
                from uwudiff_tpu.models.layers import resolve_remat_policy

                policy = resolve_remat_policy(self.remat_policy)
                block_cls = nn.remat(BasicTransformerBlock, policy=policy)
            for i in range(self.num_layers):
                x = block_cls(
                    **block_kwargs,
                    name=f"blocks_{i}",
                )(
                    x,
                    encoder_hidden_states,
                    encoder_attention_mask,
                    position_map=position_map,
                    ip_hidden_states=ip_hidden_states,
                )

        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual
