"""NN-weighted loss trainer — two optimizer groups
(parity with ``duwu/trainer/nn_weighted_loss_trainer.py``).

The loss-predictor params form a second param group with their own
optimizer config (lr 1e-3, no weight decay by default) — implemented as
``optax.multi_transform`` over the ``{"model", "loss_pred"}`` subtrees,
the JAX equivalent of torch param groups
(``nn_weighted_loss_trainer.py:64-71``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from uwudiff_tpu.config import instantiate_any
from uwudiff_tpu.models.loss_pred import SigmaLossPredictor
from uwudiff_tpu.training.lr_schedules import warmup_cosine_schedule
from uwudiff_tpu.training.optimizers import build_optimizer
from uwudiff_tpu.training.trainer import DMTrainer

__all__ = ["NNWeightedLossTrainer"]


@dataclasses.dataclass
class NNWeightedLossTrainer(DMTrainer):
    loss_pred_config: dict | Any | None = None
    loss_opt_config: dict = dataclasses.field(
        default_factory=lambda: {
            "lr": 1e-3,
            "weight_decay": 0.0,
            "betas": (0.9, 0.999),
        }
    )

    def __post_init__(self):
        super().__post_init__()
        if self.loss_pred_config is None:
            self.loss_pred = SigmaLossPredictor()
        elif isinstance(self.loss_pred_config, dict):
            self.loss_pred = instantiate_any(self.loss_pred_config)
        else:
            self.loss_pred = self.loss_pred_config

        # two-group optimizer: same schedule shape, per-group lr/config
        loss_cfg = dict(self.loss_opt_config)
        loss_lr = loss_cfg.pop("lr", 1e-3)
        loss_schedule = warmup_cosine_schedule(
            loss_lr,
            warm_up_period=self.warm_up_period,
            use_warm_up=self.use_warm_up,
            **self.lr_scheduler_config,
        )
        loss_tx = build_optimizer(
            self.optimizer, learning_rate=loss_schedule, **loss_cfg
        )
        model_tx = self.tx
        def label_fn(params):
            # during the base-class setup the tree isn't split yet; label
            # everything "model" in that transitional init
            if not (isinstance(params, dict) and set(params) == {"model", "loss_pred"}):
                return jax.tree_util.tree_map(lambda _: "model", params)
            return {
                "model": jax.tree_util.tree_map(lambda _: "model", params["model"]),
                "loss_pred": jax.tree_util.tree_map(
                    lambda _: "loss_pred", params["loss_pred"]
                ),
            }

        self.tx = optax.multi_transform(
            {"model": model_tx, "loss_pred": loss_tx}, param_labels=label_fn
        )

    def setup(self, example_batch: dict):
        if self._built:
            return
        super().setup(example_batch)
        # extend the trainable tree with the loss predictor group; re-init
        # optimizer state for the combined tree
        rng = jax.random.PRNGKey(self.seed + 7)
        lat_shape = self._latent_shape(
            jnp.asarray(example_batch["sample"][:1]).shape
        )
        lp_params = self.loss_pred.init(
            rng, jnp.zeros(lat_shape), jnp.ones((lat_shape[0],))
        )["params"]
        params = {"model": self.state.params, "loss_pred": lp_params}
        from uwudiff_tpu.parallel import fsdp_param_sharding

        params = jax.device_put(params, fsdp_param_sharding(params, self.mesh))
        opt_state = self.tx.init(params)
        opt_state = jax.device_put(
            opt_state, fsdp_param_sharding(opt_state, self.mesh)
        )
        state = self.state.replace(params=params, opt_state=opt_state)
        self.state_sharding = fsdp_param_sharding(state, self.mesh)
        self.state = jax.device_put(state, self.state_sharding)
        # re-jit with the new pytree structure
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._val_step = jax.jit(self._val_step_impl)

    def _loss_for_batch(self, params, frozen, batch, rng):
        rng_enc, rng_loss = jax.random.split(rng)
        x, ctx, mask, added_cond = self._encode_batch(frozen, batch, rng_enc)
        moe_cell: list = []
        unet_fn = self._unet_apply_fn(
            params["model"], frozen, moe_cell=moe_cell
        )

        def model_fn(noisy, t):
            return unet_fn(noisy, t, ctx, mask, added_cond)

        def loss_pred_fn(noisy, sigmas):
            return self.loss_pred.apply(
                {"params": params["loss_pred"]}, noisy, sigmas
            )

        loss, aux = self.loss(
            rng_loss, x, model_fn, loss_pred_fn=loss_pred_fn,
            sample_weight=batch.get("loss_weight"),
        )
        if moe_cell:  # MoE routing regularizers (scaled in MoEMlp)
            loss = loss + moe_cell[0]
        return loss, aux
