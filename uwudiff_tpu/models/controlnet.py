"""ControlNet (Zhang et al. 2023) on top of the house UNet.

Beyond-the-reference capability (the reference has no ControlNet). The
model itself is :class:`~uwudiff_tpu.models.unet.UNet2DConditionModel`
with ``controlnet_mode=True`` — the conv_in / down path / mid block run
with IDENTICAL module names to the full UNet, so a trained UNet's
parameters initialize the controlnet trunk by plain tree-merge (no key
mapping), plus a zero-init hint encoder and one zero-init 1x1 conv per
skip — the canonical "starts as an exact no-op" construction.

Pieces:
- :func:`controlnet_from_unet` — build the controlnet module from a
  UNet module/preset (copies the architecture fields).
- :func:`controlnet_params_from_unet` — initialize the trunk from
  trained UNet params (zero convs / hint encoder keep their init).
- :func:`build_controlnet_unet_fn` — a drop-in ``unet_fn`` for
  ``sampling.diffusion_sampling`` that threads the hint and residuals;
  the params argument is the pytree ``{"unet", "controlnet",
  "control_cond"}`` so everything stays a jit argument.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from uwudiff_tpu.models.unet import UNET_PRESETS, UNet2DConditionModel

__all__ = [
    "controlnet_from_unet",
    "controlnet_params_from_unet",
    "build_controlnet_unet_fn",
]

# architecture fields the controlnet trunk must share with its UNet
_SHARED_FIELDS = (
    "in_channels",
    "out_channels",
    "block_out_channels",
    "down_block_types",
    "layers_per_block",
    "transformer_layers_per_block",
    "num_attention_heads",
    "cross_attention_dim",
    "addition_embed_type",
    "addition_time_embed_dim",
    "projection_class_embeddings_input_dim",
    "use_linear_projection",
    "use_rope",
    "flip_sin_to_cos",
    "freq_shift",
    "norm_num_groups",
    "zero_init_stddev",
    "gradient_checkpointing",
    "remat_policy",
    "fused_qkv",
    "scan_transformer_blocks",
    "dtype",
)


def controlnet_from_unet(
    unet: UNet2DConditionModel | str | dict, **overrides: Any
) -> UNet2DConditionModel:
    """ControlNet module matching a UNet's architecture.

    ``unet`` may be a module instance, a preset name, or a config dict;
    ``overrides`` (e.g. ``conditioning_embedding_channels``) win.
    """
    if isinstance(unet, UNet2DConditionModel):
        cfg = {f: getattr(unet, f) for f in _SHARED_FIELDS}
    elif isinstance(unet, str):
        cfg = dict(UNET_PRESETS[unet])
    else:
        cfg = dict(unet)
    cfg.update(overrides)
    cfg["controlnet_mode"] = True
    return UNet2DConditionModel(**cfg)


def controlnet_params_from_unet(controlnet_params, unet_params):
    """Initialize the controlnet trunk from trained UNet params.

    Every leaf of ``controlnet_params`` whose path exists in
    ``unet_params`` (conv_in, time/add embeddings, down_*, mid_*) takes
    the UNet's value; the controlnet-only leaves (``cond_embed_*``,
    ``controlnet_down_*``, ``controlnet_mid``) keep their (zero) init.
    """

    def merge(cn: dict, un: dict) -> dict:
        out = {}
        for k, v in cn.items():
            if k in un:
                if isinstance(v, dict):
                    out[k] = merge(v, un[k])
                else:
                    assert un[k].shape == v.shape, (
                        f"shape mismatch for shared param {k}: "
                        f"unet {un[k].shape} vs controlnet {v.shape}"
                    )
                    # fresh buffer: the controlnet tree is the DONATED
                    # trainable state while the UNet tree stays frozen —
                    # sharing buffers trips XLA's donation check
                    # (`f(donate(a), a)`)
                    out[k] = jnp.array(un[k])
            else:
                out[k] = v
        return out

    return merge(controlnet_params, unet_params)


def build_controlnet_unet_fn(
    unet: UNet2DConditionModel,
    controlnet: UNet2DConditionModel,
    conditioning_scale: float = 1.0,
) -> Callable:
    """A ``unet_fn(params, x, t, ctx, mask, added)`` for the sampling
    entry points; ``params = {"unet", "controlnet", "control_cond"}``.

    The hint is tiled to the incoming batch (CFG doubles it), the
    controlnet produces the per-skip residuals, and the frozen UNet
    consumes them — one fused XLA program under the sampler's jit.
    """

    def unet_fn(params, x, t, ctx, mask, added):
        cond = params["control_cond"]
        if cond.shape[0] != x.shape[0]:
            assert x.shape[0] % cond.shape[0] == 0, (
                f"hint batch {cond.shape[0]} does not divide model "
                f"batch {x.shape[0]}"
            )
            cond = jnp.tile(
                cond, (x.shape[0] // cond.shape[0], 1, 1, 1)
            )
        down_res, mid_res = controlnet.apply(
            {"params": params["controlnet"]},
            x, t, ctx, mask, added,
            controlnet_cond=cond,
        )
        if conditioning_scale != 1.0:
            down_res = tuple(conditioning_scale * r for r in down_res)
            mid_res = conditioning_scale * mid_res
        return unet.apply(
            {"params": params["unet"]},
            x, t, ctx, mask, added,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
        )

    return unet_fn
