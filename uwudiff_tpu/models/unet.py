"""Config-driven conditional UNet (SD1.x / SDXL class), TPU-first.

Capability parity with diffusers' ``UNet2DConditionModel`` as used by the
reference (``duwu/trainer/trainer.py:134``, ``duwu/modules/unet_patch.py``,
``duwu/modules/rope_unet.py:562-607``), re-designed for TPU:

- NHWC layout; params fp32, compute dtype configurable (bf16 in training)
- static shapes; all control flow unrolled at trace time
- optional axial RoPE in every transformer block (``use_rope=True`` ==
  the reference's ``RoPEUNet2DConditionModel``)
- from-scratch init zeroes residual-adjacent layers
  (``UNet2DFromScratch.init_weight``, ``unet_patch.py:34-45``) via
  ``zero_init_stddev`` (1e-5 default; 0.0 == HDUNet exact-zero)
- ``gradient_checkpointing=True`` remats each down/mid/up block
  (parity with ``test_scripts/test_train.py:38-39``)
- SDXL micro-conditioning: ``added_cond = {"time_ids", "text_embeds"}``
  through the ``text_time`` addition embedding
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    get_timestep_embedding,
    near_zero_init,
    zero_init,
)
from uwudiff_tpu.models.transformer import Transformer2DModel

__all__ = ["UNet2DConditionModel", "UNET_PRESETS"]


def _fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """FreeU's skip-connection filter: scale the central
    ``2*threshold``-square of (fftshifted) spatial-frequency bins by
    ``scale`` — i.e. attenuate the skip's low-frequency content. NHWC;
    computed in fp32 (complex bf16 FFTs are unsupported)."""
    orig_dtype = x.dtype
    xf = jnp.fft.fftshift(
        jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2)), axes=(1, 2)
    )
    _, h, w, _ = x.shape
    ch, cw = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[
        :, ch - threshold:ch + threshold, cw - threshold:cw + threshold, :
    ].set(scale)
    out = jnp.fft.ifftn(
        jnp.fft.ifftshift(xf * mask, axes=(1, 2)), axes=(1, 2)
    ).real
    return out.astype(orig_dtype)


def _per_block(value, n_blocks: int) -> tuple:
    if isinstance(value, (list, tuple)):
        assert len(value) == n_blocks
        return tuple(value)
    return (value,) * n_blocks


class UNet2DConditionModel(nn.Module):
    """A conditional 2D UNet for latent/pixel diffusion."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: int | Sequence[int] = 1
    num_attention_heads: int | Sequence[int] = 8
    cross_attention_dim: int | None = 768
    addition_embed_type: str | None = None  # None | "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int | None = None
    use_linear_projection: bool = False
    use_rope: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    norm_num_groups: int = 32
    zero_init_stddev: float = 1e-5
    gradient_checkpointing: bool = False
    # selective remat: None saves nothing (min memory); a name from
    # jax.checkpoint_policies (e.g. "dots_with_no_batch_dims_saveable")
    # keeps matmul outputs and only recomputes the cheap elementwise work
    remat_policy: str | None = None
    # fused q/k/v (and cross k/v) projections in every attention — the
    # MFU lever; importer concatenates separate diffusers tensors
    fused_qkv: bool = False
    # nn.scan over repeated transformer layers inside each
    # Transformer2DModel: one traced block body instead of N unrolled
    # copies (cuts SDXL cold-compile; params gain a leading layer axis,
    # see models.import_torch.stack_block_params)
    scan_transformer_blocks: bool = False
    # ControlNet mode (Zhang et al. 2023; beyond the reference): run
    # ONLY conv_in + down path + mid block — module names identical to
    # the full UNet so a trained UNet's params initialize it directly
    # (models/controlnet.py) — add a zero-init hint-encoder after
    # conv_in, and return one zero-init 1x1-conv residual per skip plus
    # the mid residual instead of a denoised prediction.
    controlnet_mode: bool = False
    # hint-encoder channel ramp (pixel-space hint -> conv_in width)
    conditioning_embedding_channels: Sequence[int] = (16, 32, 96, 256)
    # FreeU (Si et al. 2023): training-free sampling-quality knob on
    # the two deepest decoder stages — (b1, b2, s1, s2): backbone
    # features' first half channels scaled by b_i, skip connections'
    # low-frequency (central 2x2 FFT bin) content scaled by s_i.
    # Published defaults: SD1.5 (1.5, 1.6, 0.9, 0.2), SDXL
    # (1.3, 1.4, 0.9, 0.2). Adds no params: enable at sampling time on
    # trained weights (e.g. ``from_config("sdxl", freeu=(1.3,1.4,0.9,0.2))``).
    freeu: tuple[float, float, float, float] | None = None
    # IP-Adapter residual scale on every cross-attention (the decoupled
    # image-prompt attention only activates when ip_hidden_states are
    # passed at call time; see models/transformer.py::Attention)
    ip_adapter_scale: float = 1.0
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "UNet2DConditionModel":
        """Build from a preset name or a config dict (the reference's
        ``UNet2DFromScratch.from_config`` entry, ``unet_patch.py:47-57``)."""
        if isinstance(config, str):
            config = dict(UNET_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C]
        timesteps: jnp.ndarray,  # [B] int or float
        encoder_hidden_states: jnp.ndarray | None = None,  # [B, S, D]
        encoder_attention_mask: jnp.ndarray | None = None,  # [B, S]
        added_cond: dict[str, jnp.ndarray] | None = None,
        position_map: jnp.ndarray | None = None,
        # ControlNet integration: pixel-space hint (controlnet_mode) or
        # residuals produced by a controlnet (full-UNet mode)
        controlnet_cond: jnp.ndarray | None = None,  # [B, H*f, W*f, 3]
        down_block_additional_residuals: Sequence[jnp.ndarray] | None = None,
        mid_block_additional_residual: jnp.ndarray | None = None,
        ip_hidden_states: jnp.ndarray | None = None,  # [B, n_ip, C_ctx]
    ) -> jnp.ndarray:
        n_blocks = len(self.block_out_channels)
        tf_layers = _per_block(self.transformer_layers_per_block, n_blocks)
        n_heads = _per_block(self.num_attention_heads, n_blocks)

        block_cls = {
            "resnet": ResnetBlock2D,
            "transformer": Transformer2DModel,
        }
        remat_cell = self.gradient_checkpointing and self.scan_transformer_blocks
        if self.gradient_checkpointing:
            from uwudiff_tpu.models.layers import resolve_remat_policy

            policy = resolve_remat_policy(self.remat_policy)
            block_cls = {
                "resnet": nn.remat(ResnetBlock2D, policy=policy),
                # scanned stacks checkpoint per scan iteration instead
                # (scan-of-remat): an outer remat around an nn.scan still
                # materializes per-iteration residuals for the whole
                # stack during its backward recompute
                "transformer": Transformer2DModel
                if remat_cell
                else nn.remat(
                    Transformer2DModel, policy=policy, static_argnums=()
                ),
            }

        # --- time embedding ---
        time_embed_dim = self.block_out_channels[0] * 4
        t_emb = get_timestep_embedding(
            jnp.atleast_1d(timesteps),
            self.block_out_channels[0],
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.freq_shift,
        ).astype(self.dtype)
        emb = TimestepEmbedding(
            time_embed_dim, dtype=self.dtype, name="time_embedding"
        )(t_emb)

        # --- SDXL micro-conditioning (text_time addition embedding) ---
        if self.addition_embed_type == "text_time":
            assert added_cond is not None, (
                "addition_embed_type='text_time' needs added_cond with "
                "'time_ids' and 'text_embeds'"
            )
            time_ids = added_cond["time_ids"]  # [B, 6]
            text_embeds = added_cond["text_embeds"]  # [B, P]
            time_ids_emb = get_timestep_embedding(
                time_ids.reshape(-1),
                self.addition_time_embed_dim,
                flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.freq_shift,
            ).reshape(time_ids.shape[0], -1)
            add_embeds = jnp.concatenate(
                [text_embeds, time_ids_emb.astype(text_embeds.dtype)], axis=-1
            ).astype(self.dtype)
            aug_emb = TimestepEmbedding(
                time_embed_dim, dtype=self.dtype, name="add_embedding"
            )(add_embeds)
            emb = emb + aug_emb

        sample = sample.astype(self.dtype)
        if encoder_hidden_states is not None:
            encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        # --- input conv ---
        h = nn.Conv(
            self.block_out_channels[0],
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv_in",
        )(sample)

        if self.controlnet_mode:
            assert controlnet_cond is not None, (
                "controlnet_mode=True needs controlnet_cond (the "
                "pixel-space hint image)"
            )
            # hint encoder: stride-2 conv ramp down to latent resolution,
            # zero-init final conv (the controlnet starts as a no-op)
            c = controlnet_cond.astype(self.dtype)
            chans = tuple(self.conditioning_embedding_channels)
            c = nn.Conv(
                chans[0], (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name="cond_embed_in",
            )(c)
            c = nn.silu(c)
            for k in range(len(chans) - 1):
                c = nn.Conv(
                    chans[k], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"cond_embed_{k}a",
                )(c)
                c = nn.silu(c)
                c = nn.Conv(
                    chans[k + 1], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"cond_embed_{k}b",
                )(c)
                c = nn.silu(c)
            c = nn.Conv(
                self.block_out_channels[0], (3, 3),
                padding=((1, 1), (1, 1)), kernel_init=zero_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="cond_embed_out",
            )(c)
            assert c.shape == h.shape, (
                f"hint embedding {c.shape} must match conv_in output "
                f"{h.shape}: the hint must be the latent resolution x "
                f"2^(len(conditioning_embedding_channels)-1)"
            )
            h = h + c

        # --- down path ---
        skips = [h]
        for i, (block_type, out_ch) in enumerate(
            zip(self.down_block_types, self.block_out_channels)
        ):
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(self.layers_per_block):
                h = block_cls["resnet"](
                    out_channels=out_ch,
                    groups=self.norm_num_groups,
                    zero_init_stddev=self.zero_init_stddev,
                    dtype=self.dtype,
                    name=f"down_{i}_res_{j}",
                )(h, emb)
                if has_attn:
                    h = block_cls["transformer"](
                        num_heads=n_heads[i],
                        head_dim=out_ch // n_heads[i],
                        num_layers=tf_layers[i],
                        cross_attention_dim=self.cross_attention_dim,
                        use_linear_projection=self.use_linear_projection,
                        norm_num_groups=self.norm_num_groups,
                        use_rope=self.use_rope,
                        out_init_stddev=self.zero_init_stddev,
                        scan_blocks=self.scan_transformer_blocks,
                        remat_cell=remat_cell,
                        remat_policy=self.remat_policy,
                        fused_qkv=self.fused_qkv,
                        ip_scale=self.ip_adapter_scale,
                        dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(
                        h,
                        encoder_hidden_states,
                        encoder_attention_mask,
                        position_map,
                        ip_hidden_states,
                    )
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(
                    h
                )
                skips.append(h)

        if down_block_additional_residuals is not None:
            # controlnet residuals ride the SKIP copies only (the
            # running activation into the mid block is untouched;
            # the mid residual covers it) — diffusers semantics
            assert len(down_block_additional_residuals) == len(skips), (
                f"expected {len(skips)} down residuals, got "
                f"{len(down_block_additional_residuals)}"
            )
            skips = [
                s + r.astype(s.dtype)
                for s, r in zip(skips, down_block_additional_residuals)
            ]

        # --- mid block ---
        mid_ch = self.block_out_channels[-1]
        h = block_cls["resnet"](
            out_channels=mid_ch,
            groups=self.norm_num_groups,
            zero_init_stddev=self.zero_init_stddev,
            dtype=self.dtype,
            name="mid_res_0",
        )(h, emb)
        if self.cross_attention_dim is not None:
            h = block_cls["transformer"](
                num_heads=n_heads[-1],
                head_dim=mid_ch // n_heads[-1],
                num_layers=tf_layers[-1],
                cross_attention_dim=self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                        norm_num_groups=self.norm_num_groups,
                use_rope=self.use_rope,
                out_init_stddev=self.zero_init_stddev,
                scan_blocks=self.scan_transformer_blocks,
                remat_cell=remat_cell,
                remat_policy=self.remat_policy,
                fused_qkv=self.fused_qkv,
                ip_scale=self.ip_adapter_scale,
                dtype=self.dtype,
                name="mid_attn",
            )(
                h,
                encoder_hidden_states,
                encoder_attention_mask,
                position_map,
                ip_hidden_states,
            )
        h = block_cls["resnet"](
            out_channels=mid_ch,
            groups=self.norm_num_groups,
            zero_init_stddev=self.zero_init_stddev,
            dtype=self.dtype,
            name="mid_res_1",
        )(h, emb)

        if self.controlnet_mode:
            # zero-init 1x1 heads: the controlnet is an exact no-op at
            # init, so plugging it into a trained UNet changes nothing
            # until the zero convs learn
            down_res = tuple(
                nn.Conv(
                    s.shape[-1], (1, 1), kernel_init=zero_init,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name=f"controlnet_down_{k}",
                )(s).astype(jnp.float32)
                for k, s in enumerate(skips)
            )
            mid_res = nn.Conv(
                h.shape[-1], (1, 1), kernel_init=zero_init,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="controlnet_mid",
            )(h).astype(jnp.float32)
            return down_res, mid_res

        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual.astype(h.dtype)

        # --- up path (mirrors down, +1 resnet per block, skip concat) ---
        up_block_types = tuple(reversed(self.down_block_types))
        up_channels = tuple(reversed(self.block_out_channels))
        up_tf_layers = tuple(reversed(tf_layers))
        up_heads = tuple(reversed(n_heads))
        for i, (block_type, out_ch) in enumerate(zip(up_block_types, up_channels)):
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                if self.freeu is not None and i < 2:
                    b1, b2, s1, s2 = self.freeu
                    b, s = (b1, s1) if i == 0 else (b2, s2)
                    half = h.shape[-1] // 2
                    h = jnp.concatenate(
                        [h[..., :half] * b, h[..., half:]], axis=-1
                    )
                    skip = _fourier_filter(skip, threshold=1, scale=s)
                h = jnp.concatenate([h, skip], axis=-1)
                h = block_cls["resnet"](
                    out_channels=out_ch,
                    groups=self.norm_num_groups,
                    zero_init_stddev=self.zero_init_stddev,
                    dtype=self.dtype,
                    name=f"up_{i}_res_{j}",
                )(h, emb)
                if has_attn:
                    h = block_cls["transformer"](
                        num_heads=up_heads[i],
                        head_dim=out_ch // up_heads[i],
                        num_layers=up_tf_layers[i],
                        cross_attention_dim=self.cross_attention_dim,
                        use_linear_projection=self.use_linear_projection,
                        norm_num_groups=self.norm_num_groups,
                        use_rope=self.use_rope,
                        out_init_stddev=self.zero_init_stddev,
                        scan_blocks=self.scan_transformer_blocks,
                        remat_cell=remat_cell,
                        remat_policy=self.remat_policy,
                        fused_qkv=self.fused_qkv,
                        ip_scale=self.ip_adapter_scale,
                        dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(
                        h,
                        encoder_hidden_states,
                        encoder_attention_mask,
                        position_map,
                        ip_hidden_states,
                    )
            if i < n_blocks - 1:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        # --- output ---
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, dtype=self.dtype, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        out_init = (
            zero_init
            if self.zero_init_stddev == 0.0
            else near_zero_init(self.zero_init_stddev)
        )
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=out_init,
            dtype=self.dtype,
            name="conv_out",
        )(h)
        return h.astype(jnp.float32)


UNET_PRESETS: dict[str, dict] = {
    # SD1.5-class UNet (768-dim CLIP context)
    "sd15": dict(
        in_channels=4,
        out_channels=4,
        block_out_channels=(320, 640, 1280, 1280),
        down_block_types=(
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        layers_per_block=2,
        transformer_layers_per_block=1,
        num_attention_heads=8,
        cross_attention_dim=768,
        use_linear_projection=False,
    ),
    # SD2.1-class UNet (1024-dim OpenCLIP-H context, v-prediction
    # training convention; head count follows the 64-dim-per-head rule)
    "sd21": dict(
        in_channels=4,
        out_channels=4,
        block_out_channels=(320, 640, 1280, 1280),
        down_block_types=(
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        layers_per_block=2,
        transformer_layers_per_block=1,
        num_attention_heads=(5, 10, 20, 20),
        cross_attention_dim=1024,
        use_linear_projection=True,
    ),
    # SDXL-base-class UNet (2048-dim dual-CLIP context + micro-conditioning)
    "sdxl": dict(
        in_channels=4,
        out_channels=4,
        block_out_channels=(320, 640, 1280),
        down_block_types=(
            "DownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
        ),
        layers_per_block=2,
        transformer_layers_per_block=(1, 2, 10),
        num_attention_heads=(5, 10, 20),
        cross_attention_dim=2048,
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=2816,
        use_linear_projection=True,
    ),
    # Tiny UNet for tests / fast_dev_run-style smoke training
    "tiny": dict(
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        layers_per_block=1,
        transformer_layers_per_block=1,
        num_attention_heads=2,
        cross_attention_dim=32,
        use_linear_projection=False,
        norm_num_groups=8,
    ),
    # Tiny SDXL-like (exercises the text_time addition embedding)
    "tiny_sdxl": dict(
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        layers_per_block=1,
        transformer_layers_per_block=1,
        num_attention_heads=2,
        cross_attention_dim=32,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=64,  # pooled 16 + 6*8
        use_linear_projection=True,
        norm_num_groups=8,
    ),
}
