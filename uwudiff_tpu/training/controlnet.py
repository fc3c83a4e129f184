"""ControlNet training: frozen UNet, trainable control side-network.

Beyond-the-reference capability (see ``models/controlnet.py`` for the
model construction). One jitted step: the controlnet forward, the
frozen UNet forward consuming its residuals, backward through the
controlnet only, optimizer update — all one XLA program, same as every
other trainer here.

Batches must carry ``control_cond`` — the pixel-space hint image
[B, H*f, W*f, 3] (f = 2^(len(conditioning_embedding_channels)-1), 8 for
the SD-class presets). ``DummyDataset(control_size=...)`` provides the
smoke-test fixture; real datasets attach their own hint channel
(canny/depth/pose extraction is preprocessing, not the trainer's job).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from uwudiff_tpu.models.controlnet import (
    controlnet_from_unet,
    controlnet_params_from_unet,
)
from uwudiff_tpu.training.trainer import DMTrainer

__all__ = ["ControlNetTrainer"]


@dataclasses.dataclass
class ControlNetTrainer(DMTrainer):
    """Trains a ControlNet against a frozen (usually pretrained) UNet.

    ``model_config`` may carry a ``controlnet`` node (module or config
    dict for :func:`controlnet_from_unet` overrides); by default the
    controlnet architecture is derived from the UNet. With
    ``controlnet_init_from_unet=True`` (the paper's recipe) the trunk
    starts as a copy of the UNet's encoder — load real weights into the
    UNet via ``model_config.unet._load_config_`` and the controlnet
    inherits them.
    """

    controlnet_init_from_unet: bool = True
    conditioning_scale: float = 1.0

    def __post_init__(self):
        cn_cfg = self.model_config.get("controlnet")
        super().__post_init__()
        if self.lycoris_config is not None:
            raise ValueError(
                "ControlNetTrainer trains the controlnet itself; "
                "lycoris adapters are for UNet fine-tunes — drop one"
            )
        if cn_cfg is None:
            self.controlnet = controlnet_from_unet(self.unet)
        elif isinstance(cn_cfg, dict) and not cn_cfg.get("_target_"):
            self.controlnet = controlnet_from_unet(self.unet, **cn_cfg)
        else:
            from uwudiff_tpu.config import instantiate_any

            self.controlnet = instantiate_any(cn_cfg)
        assert getattr(self.controlnet, "controlnet_mode", False), (
            "the controlnet module must have controlnet_mode=True"
        )

    def _setup_on_host(self, example_batch: dict):
        if "class_labels" in example_batch:
            raise ValueError(
                "ControlNetTrainer supports the text/unconditional UNet "
                "families (the DiT class-conditional path has no skip "
                "connections to inject into)"
            )
        super()._setup_on_host(example_batch)

    def _select_trainable_params(
        self, unet_params, frozen, batch, init_args, rng
    ):
        assert "control_cond" in batch, (
            "ControlNet training needs batches with 'control_cond' "
            "hint images (DummyDataset(control_size=...) for smoke "
            "tests)"
        )
        lat, t0, emb, mask, added = init_args
        hint = jnp.asarray(batch["control_cond"][:1])
        cn_params = self.controlnet.init(
            rng, lat, t0, emb, mask, added, controlnet_cond=hint
        )["params"]
        if self.controlnet_init_from_unet:
            cn_params = controlnet_params_from_unet(cn_params, unet_params)
        frozen["unet"] = unet_params
        return cn_params, frozen

    def _loss_for_batch(self, params, frozen, batch, rng):
        if self._has_pipe():
            raise ValueError(
                "ControlNetTrainer does not support mesh_axes['pipe'] "
                "(UNets do not pipeline); use data/fsdp/tensor axes"
            )
        rng_enc, rng_loss = jax.random.split(rng)
        x, ctx, mask, added_cond = self._encode_batch(frozen, batch, rng_enc)
        hint = batch["control_cond"]

        def model_fn(noisy, t):
            down_res, mid_res = self.controlnet.apply(
                {"params": params},
                noisy, t, ctx, mask, added_cond,
                controlnet_cond=hint,
            )
            if self.conditioning_scale != 1.0:
                down_res = tuple(
                    self.conditioning_scale * r for r in down_res
                )
                mid_res = self.conditioning_scale * mid_res
            return self.unet.apply(
                {"params": frozen["unet"]},
                noisy, t, ctx, mask, added_cond,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
            )

        return self.loss(
            rng_loss, x, model_fn,
            sample_weight=batch.get("loss_weight"),
        )

    def export_controlnet(self, path: str):
        """Flat .npz export of the trained controlnet params."""
        self.export_params(path)
