"""DMTrainer — the training orchestrator.

Capability parity with ``duwu/trainer/trainer.py`` (model assembly from
config, optimizer/LR wiring, EMA-loss tracking, train/val steps,
checkpoint/resume, adapter training) re-designed TPU-first:

- ONE jit-compiled ``train_step(state, frozen, batch, rng)`` containing
  the frozen VAE/TE encodes, the loss (timestep sampling, noising, UNet
  forward), backward, optimizer update and EMA — the whole hot loop is a
  single XLA program with donated state.
- GSPMD sharding over a ``Mesh`` with ``data``+``fsdp`` axes: batch
  sharded over both, params/optimizer state FSDP-sharded; the gradient
  psum and all param gathers are emitted by the compiler (SURVEY.md §2.4).
- Explicit PRNG threading: bitwise-reproducible by construction.
- Optional latent/embedding caching: if the batch already carries
  ``latent`` (and/or ``ctx``) the VAE/TE encodes are skipped — removing
  the per-step frozen-encoder cost baked into the reference hot loop
  (``trainer.py:238-259``).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from uwudiff_tpu.config import instantiate_any
from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.models.tokenizers import SimpleTokenizer
from uwudiff_tpu.parallel import (
    batch_sharding,
    fsdp_param_sharding,
    make_mesh,
)
from uwudiff_tpu.training.checkpoint import CheckpointManager
from uwudiff_tpu.training.logging import build_logger
from uwudiff_tpu.training.lr_schedules import warmup_cosine_schedule
from uwudiff_tpu.training.optimizers import build_optimizer

__all__ = ["TrainState", "DMTrainer"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    params: Any  # trainable params
    opt_state: Any
    ema_loss: jnp.ndarray  # f32 scalar
    # exponential moving average of the trainable params (None unless
    # DMTrainer(ema_weights_decay=...) — the weight-EMA users expect
    # from diffusion trainers; the reference only EMAs the loss scalar)
    ema_params: Any = None


def _maybe_instantiate_module(node):
    if node is None:
        return None, None
    if isinstance(node, dict):
        from uwudiff_tpu.loader import load_any

        return load_any(node)
    return node, None


def _pool_mask_to(mask, hw):
    """[B, H, W] or [B, H, W, 1] loss mask -> [B, h, w] at the latent
    grid. Pixel-sized masks average-pool (exact when H, W are integer
    multiples — the VAE-downscale case); anything else resizes
    bilinearly. Latent-sized masks pass through."""
    m = mask[..., 0] if mask.ndim == 4 else mask
    b, mh, mw = m.shape
    h, w = int(hw[0]), int(hw[1])
    if (mh, mw) == (h, w):
        return m
    if mh % h == 0 and mw % w == 0:
        return m.reshape(b, h, mh // h, w, mw // w).mean(axis=(2, 4))
    return jax.image.resize(m, (b, h, w), method="bilinear")


def _strip_non_arrays(batch: dict) -> dict:
    """Drop host-only fields (captions etc.) before device_put."""
    out = {}
    for k, v in batch.items():
        if k in ("captions", "cross_attention_kwargs"):
            continue
        out[k] = v
    return out


@dataclasses.dataclass
class DMTrainer:
    """Diffusion-model trainer (``duwu/trainer/trainer.py:95-318``)."""

    model_config: dict
    te_use_normed_ctx: bool = False
    vae_std: float | None = None
    vae_mean: float = 0.0
    name: str = ""
    lr: float = 1e-5
    optimizer: str = "adamw"
    opt_config: dict = dataclasses.field(
        default_factory=lambda: {"weight_decay": 0.01, "betas": (0.9, 0.999)}
    )
    lr_scheduler_config: dict = dataclasses.field(
        default_factory=lambda: {"T_max": 100_000, "eta_min": 1e-7}
    )
    use_warm_up: bool = True
    warm_up_period: int = 1000
    loss_config: dict | Any | None = None
    lycoris_config: dict | str | None = None
    grad_clip: float | None = 1.0
    grad_accum: int = 1
    mesh_axes: dict | None = None  # e.g. {"data": 2, "fsdp": 4}
    # `seq`-axis strategy: "ring" (K/V rotate over ICI; no head
    # constraint, composes with TP) or "ulysses" (head all-to-all;
    # needs heads % seq == 0, fewer/larger transfers)
    sequence_parallel_method: str = "ring"
    # `pipe`-axis microbatch count (GPipe over a scan_blocks DiT body,
    # ``parallel/pipeline.py``). None = one microbatch per stage —
    # the minimum; raise to shrink the (P-1)/(M+P-1) bubble.
    pipeline_microbatches: int | None = None
    ema_decay: float = 0.99
    seed: int = 42
    # "bfloat16" stores trainable params in bf16 and applies optimizer
    # updates with stochastic rounding (halves param memory; the
    # single-chip recipe for SDXL-scale full fine-tunes). None = fp32.
    param_dtype: str | None = None
    # weight EMA: decay factor (e.g. 0.9999) or None (off). Costs one
    # extra params copy in HBM; EMA params ride the checkpoint and are
    # exported via export_params(ema=True).
    ema_weights_decay: float | None = None
    # CFG-enabling caption dropout: with this per-sample probability
    # the text conditioning is swapped for the EMPTY-prompt encoding
    # (precached-ctx batches without a TE fall back to zeroed rows) —
    # the standard recipe for training the unconditional branch that
    # classifier-free guidance samples against. Device-side (branchless
    # where over the encoded rows) so the step stays one program.
    caption_dropout: float = 0.0
    # log train/grad_norm (a full-grad-tree global norm) every step.
    # Off, XLA can schedule per-leaf grad freeing without keeping the
    # whole tree live for the reduction — the same memory effect round
    # 2 measured for global-norm *clipping* (README); flip off to probe
    # batch-size headroom on memory-bound configs.
    log_grad_norm: bool = True

    def __post_init__(self):
        mc = dict(self.model_config)
        self.unet, self._unet_load = _maybe_instantiate_module(mc.get("unet"))
        self.te, self._te_load = _maybe_instantiate_module(mc.get("te"))
        self.vae, self._vae_load = _maybe_instantiate_module(mc.get("vae"))
        assert self.unet is not None, "model_config must provide a unet"

        # tokenizers: explicit config node, else simple hash tokenizers
        tok_cfg = mc.get("tokenizers")
        if tok_cfg is None:
            n_tok = len(self.te.text_models) if self.te is not None else 0
            self.tokenizers = [SimpleTokenizer() for _ in range(n_tok)]
        else:
            self.tokenizers = [instantiate_any(t) for t in tok_cfg]

        if self.vae is not None and self.vae_std is None:
            self.vae_std = 1.0 / self.vae.scaling_factor

        # loss: config node, ready-made object, or the reference default
        if self.loss_config is None:
            self.loss = DiffusionLoss(schedule=NoiseSchedule.sdxl())
        elif isinstance(self.loss_config, (dict,)):
            self.loss = instantiate_any(self.loss_config)
        else:
            self.loss = self.loss_config
        self.n_diffusion_time_steps = self.loss.n_diffusion_time_steps

        # LoRA/LoKr adapters (wired in setup once params exist)
        self.adapter = None
        if self.lycoris_config is not None:
            from uwudiff_tpu.training.adapters import build_adapter_config

            self.adapter_config = build_adapter_config(self.lycoris_config)
        else:
            self.adapter_config = None

        # mesh is created in setup() (batch-divisibility-aware default)
        self.mesh = None
        schedule = warmup_cosine_schedule(
            self.lr,
            warm_up_period=self.warm_up_period,
            use_warm_up=self.use_warm_up,
            **self.lr_scheduler_config,
        )
        self.lr_schedule = schedule
        tx = build_optimizer(self.optimizer, learning_rate=schedule, **self.opt_config)
        if self.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        if self.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.grad_accum)
        self.tx = tx

        self._built = False
        self.state: TrainState | None = None
        self.frozen: dict[str, Any] = {}
        self._train_step = None
        self._val_step = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _latent_shape(self, sample_shape):
        if self.vae is None:
            return sample_shape
        downs = 2 ** (len(self.vae.block_out_channels) - 1)
        b, h, w, _ = sample_shape
        return (b, h // downs, w // downs, self.vae.latent_channels)

    def setup(self, example_batch: dict):
        """Initialize params/optimizer/jitted steps from batch shapes."""
        if self._built:
            return
        if self.mesh is None:
            if self.mesh_axes is not None:
                self.mesh = make_mesh(self.mesh_axes)
            else:
                # default: pure data-parallel over as many devices as the
                # global batch divides into
                n_dev = len(jax.devices())
                bs = int(np.shape(example_batch["sample"])[0])
                while n_dev > 1 and bs % n_dev != 0:
                    n_dev //= 2
                self.mesh = make_mesh(
                    {"data": n_dev}, devices=jax.devices()[:n_dev]
                )
        # Parameter init runs on host CPU (fast, local) and transfers to
        # the mesh once — avoids hundreds of tiny init dispatches to a
        # (possibly remote) accelerator.
        from uwudiff_tpu.ops.attention import flash_disabled

        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = jax.devices()[0]
        with jax.default_device(cpu), flash_disabled():
            self._setup_on_host(example_batch)
        self._batch_sh = batch_sharding(self.mesh)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._val_step = jax.jit(self._val_step_impl)
        self._built = True

    def _setup_on_host(self, example_batch: dict):
        rng = jax.random.PRNGKey(self.seed)
        r_unet, r_te, r_vae, r_lat = jax.random.split(rng, 4)

        batch = _strip_non_arrays(example_batch)
        sample = jnp.asarray(batch["sample"][:1])

        from uwudiff_tpu.loader import apply_load_config

        frozen = {}
        if self.vae is not None:
            frozen["vae"] = apply_load_config(
                self.vae.init(r_vae, sample, r_vae)["params"],
                self._vae_load,
                self.vae,
            )
        if self.te is not None:
            tok_outs = [
                {k: jnp.asarray(v[:1]) for k, v in t.items()}
                for t in batch["tokenizer_outputs"]
            ]
            frozen["te"] = apply_load_config(
                self.te.init(r_te, tok_outs)["params"], self._te_load, self.te
            )
            emb, normed, pooled, mask = self.te.apply(
                {"params": frozen["te"]}, tok_outs
            )
        else:
            emb = pooled = mask = None
        if emb is None and "ctx" in batch:  # cached-embedding batches
            emb = jnp.asarray(batch["ctx"][:1])
            mask = (
                jnp.asarray(batch["ctx_mask"][:1])
                if "ctx_mask" in batch
                else None
            )
            pooled = (
                jnp.asarray(batch["pooled"][:1]) if "pooled" in batch else None
            )

        if "latent" in batch:
            lat_shape = tuple(jnp.asarray(batch["latent"][:1]).shape)
        else:
            lat_shape = self._latent_shape(sample.shape)
        lat = jnp.zeros(lat_shape, jnp.float32)
        t0 = jnp.zeros((lat_shape[0],), jnp.float32)
        added = self._added_cond(batch, pooled, n=1)
        if "class_labels" in batch:  # class-conditional models (DiT)
            labels = jnp.asarray(batch["class_labels"][:1])
            unet_params = self.unet.init(
                {"params": r_unet, "dropout": r_unet},
                lat, t0, labels, train=True,
            )["params"]
        else:
            unet_params = self.unet.init(
                r_unet, lat, t0, emb, mask, added,
                **self._extra_unet_inputs(lat, emb),
            )["params"]
        unet_params = apply_load_config(
            unet_params, self._unet_load, self.unet
        )

        train_params, frozen = self._select_trainable_params(
            unet_params, frozen, batch, (lat, t0, emb, mask, added), r_lat
        )

        if self.param_dtype is not None:
            store_dtype = jnp.dtype(self.param_dtype)
            train_params = jax.tree_util.tree_map(
                lambda p: p.astype(store_dtype), train_params
            )

        # shard + place
        params_sh = fsdp_param_sharding(train_params, self.mesh)
        train_params = jax.device_put(train_params, params_sh)
        frozen_sh = fsdp_param_sharding(frozen, self.mesh)
        self.frozen = jax.device_put(frozen, frozen_sh)

        opt_state = self.tx.init(train_params)
        opt_sh = fsdp_param_sharding(opt_state, self.mesh)
        opt_state = jax.device_put(opt_state, opt_sh)

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=train_params,
            opt_state=opt_state,
            ema_loss=jnp.zeros((), jnp.float32),
            ema_params=(
                jax.tree_util.tree_map(jnp.copy, train_params)
                if self.ema_weights_decay is not None
                else None
            ),
        )
        # commit every leaf (incl. scalars, replicated) to the mesh so
        # restore/resume sees consistent shardings
        self.state_sharding = fsdp_param_sharding(state, self.mesh)
        self.state = jax.device_put(state, self.state_sharding)

    def _extra_unet_inputs(self, lat, emb) -> dict:
        """Extra kwargs for the UNet init (hook: IPAdapterTrainer adds
        ip_hidden_states so the adapter params get created)."""
        return {}

    def _select_trainable_params(
        self, unet_params, frozen, batch, init_args, rng
    ):
        """Choose the trainable tree from the initialized UNet params
        (hook for subclasses — e.g. ControlNetTrainer trains a side
        network and freezes the UNet). Default: adapters if configured,
        else the UNet params themselves. ``init_args`` is the
        ``(lat, t0, emb, mask, added)`` tuple the UNet was initialized
        with, for subclasses that must init additional modules."""
        if self.adapter_config is not None:
            from uwudiff_tpu.training.adapters import LycorisAdapter

            self.adapter = LycorisAdapter.create(
                self.unet, unet_params, self.adapter_config, rng=rng
            )
            frozen["unet_base"] = unet_params
            return self.adapter.params, frozen
        return unet_params, frozen

    def _added_cond(self, batch, pooled, n=None):
        kind = getattr(self.unet, "addition_embed_type", None)
        if kind == "pooled_text":  # MMDiT: pooled text only, no time_ids
            if pooled is None:  # precached-conditioning batches (te=None)
                added = batch.get("added_cond") or {}
                if "text_embeds" in added:
                    pooled = jnp.asarray(added["text_embeds"])
            assert pooled is not None, (
                "pooled_text addition embedding needs pooled text "
                "embeddings (a use_pooled=True CLIP encoder, or a "
                "precached added_cond['text_embeds'] batch key)"
            )
            return {"text_embeds": pooled if n is None else pooled[:n]}
        if kind != "text_time":
            return None
        time_ids = jnp.asarray(batch["added_cond"]["time_ids"])
        if n is not None:
            time_ids = time_ids[:n]
        assert pooled is not None, "text_time addition embedding needs pooled"
        return {"time_ids": time_ids, "text_embeds": pooled}

    def _apply_caption_dropout(self, frozen, rng, batch_size, ctx, mask,
                               pooled):
        """Per-sample swap of the conditioning for the empty-prompt
        encoding (or zeros when the batch carries precached ctx with no
        TE) — trains the unconditional branch CFG samples against.
        Branchless where, traced into the one train-step program."""
        drop = jax.random.bernoulli(
            rng, self.caption_dropout, (batch_size,)
        )
        empty = None
        if self.te is not None and self.tokenizers:
            if not hasattr(self, "_empty_tok"):
                self._empty_tok = [
                    {k: jnp.asarray(v) for k, v in tok(
                        [""], padding="max_length", truncation=True
                    ).items()}
                    for tok in self.tokenizers
                ]
            e_emb, e_normed, e_pooled, e_mask = self.te.apply(
                {"params": frozen["te"]}, self._empty_tok
            )
            e_ctx = e_normed if self.te_use_normed_ctx else e_emb
            if (
                e_ctx.shape[1] != ctx.shape[1]
                and ctx.shape[1] % e_ctx.shape[1] == 0
            ):
                # long-prompt batches ([B, n*L] windows): the empty
                # encoding of n A1111 windows is n identical copies of
                # the single empty window — tile instead of re-encoding
                reps = ctx.shape[1] // e_ctx.shape[1]
                e_ctx = jnp.tile(e_ctx, (1, reps, 1))
                if e_mask is not None:
                    e_mask = jnp.tile(e_mask, (1, reps))
            if e_ctx.shape[1:] == ctx.shape[1:]:
                empty = (e_ctx, e_mask, e_pooled)
        if empty is not None:
            e_ctx, e_mask, e_pooled = empty
            ctx = jnp.where(drop[:, None, None], e_ctx, ctx)
            if mask is not None and e_mask is not None:
                mask = jnp.where(drop[:, None], e_mask, mask)
            if pooled is not None and e_pooled is not None:
                pooled = jnp.where(drop[:, None], e_pooled, pooled)
        else:  # precached ctx without a TE: zero the dropped rows
            ctx = jnp.where(drop[:, None, None], 0.0, ctx)
            if pooled is not None:
                pooled = jnp.where(drop[:, None], 0.0, pooled)
        return ctx, mask, pooled

    # ------------------------------------------------------------------
    # the hot loop
    # ------------------------------------------------------------------

    def _encode_batch(self, frozen, batch, rng):
        """Frozen VAE/TE encodes (``trainer.py:233-261``), skipped for
        cached inputs."""
        rng, rng_cdrop = jax.random.split(rng)
        if "latent" in batch:
            x = batch["latent"]
        else:
            x = batch["sample"]
            if self.vae is not None:
                dist = self.vae.apply(
                    {"params": frozen["vae"]}, x, method=self.vae.encode
                )
                x = dist.sample(rng)
                x = (x - self.vae_mean) / self.vae_std

        ctx = mask = pooled = None
        if "ctx" in batch:
            ctx = batch["ctx"]
            mask = batch.get("ctx_mask")
            pooled = batch.get("pooled")
        elif self.te is not None:
            emb, normed, pooled, mask = self.te.apply(
                {"params": frozen["te"]}, batch["tokenizer_outputs"]
            )
            ctx = normed if self.te_use_normed_ctx else emb
        if self.caption_dropout and ctx is not None:
            ctx, mask, pooled = self._apply_caption_dropout(
                frozen, rng_cdrop, x.shape[0], ctx, mask, pooled
            )
        added_cond = self._added_cond(batch, pooled)
        x = jax.lax.stop_gradient(x)
        if ctx is not None:
            ctx = jax.lax.stop_gradient(ctx)
        return x, ctx, mask, added_cond

    def _is_moe(self) -> bool:
        return bool(getattr(self.unet, "num_experts", 0))

    def _merged_unet_params(self, params, frozen):
        """The full UNet param tree for a forward pass: the trainable
        tree itself, or adapters merged into the frozen base — the ONE
        place the adapter-merge convention lives (both the plain and
        the pipelined apply paths call this)."""
        if self.adapter is not None:
            return self.adapter.merge(frozen["unet_base"], params)
        return params

    def _unet_apply_fn(self, params, frozen, rngs=None, moe_cell=None):
        """Trainable-forward closure; adapters merge into the base here.

        For MoE models (``unet.num_experts > 0``) the apply runs with
        ``mutable=["moe_losses"]`` and appends the summed sown aux
        losses (load-balance + router z, already coefficient-scaled by
        ``MoEMlp``) to ``moe_cell`` for the caller to add to the loss.
        """
        base = self._merged_unet_params(params, frozen)
        if self._is_moe() and moe_cell is not None:

            def apply_fn(*a, **kw):
                out, mut = self.unet.apply(
                    {"params": base}, *a, rngs=rngs,
                    mutable=["moe_losses"], **kw,
                )
                moe_cell.append(
                    sum(
                        jnp.sum(leaf)
                        for leaf in jax.tree_util.tree_leaves(mut)
                    )
                )
                return out

            return apply_fn
        return lambda *a, **kw: self.unet.apply(
            {"params": base}, *a, rngs=rngs, **kw
        )

    def _has_pipe(self) -> bool:
        return (
            self.mesh is not None
            and "pipe" in self.mesh.axis_names
            and self.mesh.shape["pipe"] > 1
        )

    def _loss_for_batch(self, params, frozen, batch, rng):
        rng_enc, rng_loss, rng_drop = jax.random.split(rng, 3)
        x, ctx, mask, added_cond = self._encode_batch(frozen, batch, rng_enc)
        moe_cell: list = []
        unet_fn = self._unet_apply_fn(
            params, frozen, rngs={"dropout": rng_drop}, moe_cell=moe_cell
        )

        if "class_labels" in batch:  # class-conditional models (DiT)
            labels = batch["class_labels"]

            if self._has_pipe():
                if self._is_moe():
                    raise ValueError(
                        "mesh_axes['pipe'] > 1 with a MoE model is not "
                        "supported: the pipelined block apply cannot "
                        "collect the sown MoE aux losses — use the "
                        "expert/data/fsdp axes for MoE models"
                    )
                # pipeline parallelism: GPipe over the stage-sharded
                # block stack (parallel/pipeline.py)
                from uwudiff_tpu.parallel.pipeline import pipelined_dit_apply

                base = self._merged_unet_params(params, frozen)

                def model_fn(noisy, t):
                    return pipelined_dit_apply(
                        self.unet,
                        base,
                        noisy,
                        t,
                        labels,
                        self.mesh,
                        n_microbatches=self.pipeline_microbatches,
                        train=True,
                        rngs={"dropout": rng_drop},
                    )

            else:

                def model_fn(noisy, t):
                    return unet_fn(noisy, t, labels, train=True)

        else:
            if self._has_pipe():
                from uwudiff_tpu.models.mmdit import MMDiT

                if not isinstance(self.unet, MMDiT):
                    raise ValueError(
                        "mesh_axes['pipe'] > 1 is only supported for "
                        "the transformer families (DiT / MMDiT with "
                        "scan_blocks=True): UNet models pipeline "
                        "poorly (conv down/up stages) — use data/fsdp/"
                        "tensor/seq axes instead"
                    )
                if self._is_moe():
                    raise ValueError(
                        "mesh_axes['pipe'] > 1 with a MoE model is not "
                        "supported: the pipelined block apply cannot "
                        "collect the sown MoE aux losses — use the "
                        "expert/data/fsdp axes for MoE models"
                    )
                from uwudiff_tpu.parallel.pipeline import (
                    pipelined_mmdit_apply,
                )

                base = self._merged_unet_params(params, frozen)

                def model_fn(noisy, t):
                    return pipelined_mmdit_apply(
                        self.unet,
                        base,
                        noisy,
                        t,
                        ctx,
                        mask,
                        added_cond,
                        self.mesh,
                        n_microbatches=self.pipeline_microbatches,
                    )

            else:

                def model_fn(noisy, t):
                    return unet_fn(noisy, t, ctx, mask, added_cond)

        # masked loss (community staple): a [B, H, W(, 1)] pixel- or
        # latent-space mask restricts the loss to the masked region;
        # pixel-sized masks are average-pooled to the latent grid here
        # so the loss sees mask fractions, not a hard resample
        loss_mask = batch.get("loss_mask")
        if loss_mask is not None:
            loss_mask = _pool_mask_to(
                jnp.asarray(loss_mask), x.shape[1:3]
            )
        loss, aux = self.loss(
            rng_loss, x, model_fn,
            # DreamBooth prior preservation: per-sample weights emitted
            # by PriorPreservationDataset (1 on instance rows, w on
            # class-prior rows) — weighted mean inside the loss
            sample_weight=batch.get("loss_weight"),
            loss_mask=loss_mask,
        )
        if moe_cell:
            # MoE routing regularizers (coefficient-scaled in MoEMlp)
            loss = loss + moe_cell[0]
        return loss, aux

    def _seq_parallel_ctx(self):
        """Mesh-aware attention contexts:

        - ``seq`` axis > 1: ring attention — self-attention runs
          sequence-parallel (SURVEY.md §5.7);
        - ``tensor`` axis > 1: head-parallel shard_map — the Pallas
          flash kernel runs per head-shard instead of forcing GSPMD to
          all-gather activations around an unpartitionable custom call.
        """
        import contextlib

        stack = contextlib.ExitStack()
        if self.mesh is None:
            return stack
        if "seq" in self.mesh.axis_names and self.mesh.shape["seq"] > 1:
            from uwudiff_tpu.ops.attention import sequence_parallel

            stack.enter_context(
                sequence_parallel(
                    self.mesh, axis="seq",
                    method=self.sequence_parallel_method,
                )
            )
        if (
            "expert" in self.mesh.axis_names
            and self.mesh.shape["expert"] > 1
        ):
            from uwudiff_tpu.parallel.expert import expert_parallel

            stack.enter_context(expert_parallel(self.mesh, axis="expert"))
        if (
            "tensor" in self.mesh.axis_names
            and self.mesh.shape["tensor"] > 1
        ):
            from uwudiff_tpu.ops.attention import head_parallel

            if getattr(self.unet, "fused_qkv", False):
                import logging

                # the column split of a fused [C, 3*inner] kernel puts
                # q|k|v boundaries inside shards, so splitting back into
                # q,k,v forces GSPMD resharding around every attention —
                # the separate projections are head-contiguous and free
                logging.getLogger("uwudiff_tpu").warning(
                    "fused_qkv=True under tensor parallelism adds "
                    "per-attention resharding collectives; prefer the "
                    "default separate q/k/v projections with tensor>1"
                )
            stack.enter_context(head_parallel(self.mesh, axis="tensor"))
        return stack

    def _train_step_impl(self, state, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            with self._seq_parallel_ctx():
                return self._loss_for_batch(params, frozen, batch, rng)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        if self.param_dtype == "bfloat16":
            # bf16 param storage: unbiased stochastic-rounding updates
            from uwudiff_tpu.training.optimizers import stochastic_round_add

            rng_sr = jax.random.fold_in(rng, 0x5757)
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            upd_leaves = treedef.flatten_up_to(updates)
            keys = jax.random.split(rng_sr, max(len(leaves), 1))
            new_params = treedef.unflatten(
                [
                    stochastic_round_add(p, u, k)
                    for p, u, k in zip(leaves, upd_leaves, keys)
                ]
            )
        else:
            new_params = optax.apply_updates(state.params, updates)

        # EMA with warmup-aware decay (``trainer.py:276-278``)
        step_f = state.step.astype(jnp.float32)
        decay = jnp.minimum(step_f / (10.0 + step_f), self.ema_decay)
        ema = decay * state.ema_loss + (1.0 - decay) * loss

        ema_params = state.ema_params
        if self.ema_weights_decay is not None and ema_params is not None:
            # warmup-aware weight EMA (same ramp shape as the loss EMA)
            d_w = jnp.minimum(
                (1.0 + step_f) / (10.0 + step_f), self.ema_weights_decay
            )

            if self.param_dtype == "bfloat16":
                # bf16 EMA storage: the per-step increment is sub-ulp
                # once ema~params, so round stochastically (same reason
                # params do) or the EMA silently freezes
                from uwudiff_tpu.training.optimizers import (
                    stochastic_round_add,
                )

                rng_ema = jax.random.fold_in(rng, 0x5858)
                leaves, treedef = jax.tree_util.tree_flatten(ema_params)
                p_leaves = treedef.flatten_up_to(new_params)
                keys = jax.random.split(rng_ema, max(len(leaves), 1))
                ema_params = treedef.unflatten(
                    [
                        stochastic_round_add(
                            e,
                            (1.0 - d_w)
                            * (p.astype(jnp.float32) - e.astype(jnp.float32)),
                            k,
                        )
                        for e, p, k in zip(leaves, p_leaves, keys)
                    ]
                )
            else:
                ema_params = jax.tree_util.tree_map(
                    lambda e, p: (
                        d_w * e.astype(jnp.float32)
                        + (1.0 - d_w) * p.astype(jnp.float32)
                    ).astype(e.dtype),
                    ema_params,
                    new_params,
                )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_loss=ema,
            ema_params=ema_params,
        )
        metrics = {
            "train/loss": loss,
            "train/ema_loss": ema,
            "train/lr": self.lr_schedule(state.step),
        }
        if self.log_grad_norm:
            metrics["train/grad_norm"] = optax.global_norm(grads)
        return new_state, metrics, aux

    def _val_step_impl(self, state, frozen, batch, rng):
        with self._seq_parallel_ctx():
            loss, aux = self._loss_for_batch(state.params, frozen, batch, rng)
        return loss, aux

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _put_batch(self, batch):
        batch = _strip_non_arrays(batch)
        if jax.process_count() > 1:
            return self._put_batch_multihost(batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self._batch_sh), batch
        )

    def _put_batch_multihost(self, batch):
        """Assemble the global batch from per-host local batches: each
        host contributes its loader shard (``DataLoader(shard_id=...)``)
        and the global array is built without cross-host gathers
        (``jax.make_array_from_process_local_data``). Global batch =
        local batch x process_count. Degenerates to device_put at one
        process (exercised directly by tests)."""
        n_proc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                self._batch_sh, x, global_shape
            )

        return jax.tree_util.tree_map(put, batch)

    def train_step(self, batch, rng=None):
        self.setup(batch)
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        dev_batch = self._put_batch(batch)
        self.state, metrics, aux = self._train_step(
            self.state, self.frozen, dev_batch, rng
        )
        return metrics, aux

    def validation_step(self, batch, rng=None):
        self.setup(batch)
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed + 1)
        dev_batch = self._put_batch(batch)
        return self._val_step(self.state, self.frozen, dev_batch, rng)

    def fit(
        self,
        data_module,
        max_steps: int = 1000,
        max_epochs: int | None = None,
        log_dir: str | None = None,
        log_every: int = 10,
        ckpt_dir: str | None = None,
        ckpt_every: int | None = None,
        ckpt_keep: int = 2,
        resume_from: str | bool | None = None,
        val_every: int | None = None,
        callbacks: list | None = None,
        fast_dev_run: bool = False,
        logger=None,
        profile_dir: str | None = None,
        profile_steps: tuple[int, int] = (5, 10),
    ):
        """The fit loop (``test_scripts/test_train.py:43-77`` +
        Lightning's loop, condensed)."""
        if fast_dev_run:
            max_steps = 1

        data_module.set_tokenizers(self.tokenizers)
        loader = data_module.train_dataloader()
        val_loader = data_module.val_dataloader()
        logger = logger or build_logger(log_dir, stdout_every=log_every)
        callbacks = callbacks or []

        ckpt_mgr = None
        if ckpt_dir is not None:
            ckpt_mgr = CheckpointManager(
                ckpt_dir, keep=ckpt_keep, save_every_steps=ckpt_every
            )

        rng = jax.random.PRNGKey(self.seed)
        data_iter = iter(loader)

        # peek one batch to build everything (and resume if asked)
        first_batch = next(data_iter)
        self.setup(first_batch)
        if resume_from and ckpt_mgr is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                self.state,
            )
            try:
                restored, data_state = ckpt_mgr.restore(abstract)
                expected_sh = jax.tree_util.tree_map(
                    lambda x: x.sharding, self.state
                )
                self.state = jax.device_put(restored, expected_sh)
                if data_state:
                    loader.load_state_dict(data_state)
                    data_iter = iter(loader)
                    first_batch = next(data_iter)
            except FileNotFoundError:
                pass

        from uwudiff_tpu.training.profiling import StepTimer

        timer = StepTimer()
        step = int(self.state.step)
        batch = first_batch
        last_epoch = loader.epoch
        while step < max_steps:
            if max_epochs is not None and loader.epoch >= max_epochs:
                break
            if profile_dir is not None and step == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
            metrics, aux = self.train_step(batch, rng)
            step = int(self.state.step)
            if profile_dir is not None and step == profile_steps[1]:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
            host_metrics = {k: float(v) for k, v in metrics.items()}
            host_metrics.update(timer.tick())
            logger.log_scalars(step, host_metrics)
            for cb in callbacks:
                if hasattr(cb, "on_train_batch_end"):
                    cb.on_train_batch_end(self, step, host_metrics, aux, logger)
            if ckpt_mgr is not None and ckpt_mgr.should_save(step):
                ckpt_mgr.save(step, self.state, loader.state_dict())
            if val_every and step % val_every == 0 and val_loader is not None:
                self._run_validation(val_loader, logger, callbacks, rng)
            if loader.epoch != last_epoch:
                last_epoch = loader.epoch
                # per-epoch adapter-only export (``trainer.py:189-215``)
                if self.adapter is not None and log_dir is not None:
                    self.export_adapter(
                        os.path.join(
                            log_dir, "adapter_weights",
                            f"epoch={last_epoch - 1}.npz",
                        )
                    )
            if step >= max_steps:
                break
            batch = next(data_iter)

        if ckpt_mgr is not None:
            ckpt_mgr.save(step, self.state, loader.state_dict())
            ckpt_mgr.wait()
            ckpt_mgr.close()
        for cb in callbacks:
            if hasattr(cb, "on_fit_end"):
                cb.on_fit_end(self, step, logger)
        logger.close()
        return self.state

    def _model_params(self, ema: bool = False):
        params = self.state.params
        if ema:
            assert self.state.ema_params is not None, (
                "EMA weights not enabled (set ema_weights_decay)"
            )
            params = self.state.ema_params
        if isinstance(params, dict) and set(params) == {"model", "loss_pred"}:
            params = params["model"]
        return params

    def export_params(self, path: str, ema: bool = False):
        """Flat .npz export of the trainable (or EMA) params."""
        from uwudiff_tpu.training.checkpoint import save_params_npz

        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        save_params_npz(path, self._model_params(ema=ema))

    def export_adapter(self, path: str):
        """Adapter-only export (LyCORIS ``lycoris_weight`` parity)."""
        assert self.adapter is not None, "no adapter configured"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        adapter = type(self.adapter)(
            self.adapter.specs,
            jax.tree_util.tree_map(np.asarray, self._model_params()),
            self.adapter.multiplier,
        )
        adapter.save(path)

    def merged_unet_params(self):
        """Adapter merged into the base for inference
        (``merge_lycoris`` parity, ``trainer.py:184-187``)."""
        if self.adapter is None:
            return self._model_params()
        return self.adapter.merge(
            self.frozen["unet_base"], self._model_params()
        )

    def _run_validation(self, val_loader, logger, callbacks, rng):
        losses = []
        for cb in callbacks:
            if hasattr(cb, "on_validation_start"):
                cb.on_validation_start(self)
        for i, batch in enumerate(val_loader.epoch_iter()):
            loss, aux = self.validation_step(batch, jax.random.fold_in(rng, i))
            losses.append(float(loss))
            for cb in callbacks:
                if hasattr(cb, "on_validation_batch_end"):
                    cb.on_validation_batch_end(self, aux)
        step = int(self.state.step)
        if losses:
            logger.log_scalars(step, {"val/loss": float(np.mean(losses))})
        for cb in callbacks:
            if hasattr(cb, "on_validation_end"):
                cb.on_validation_end(self, step, logger)
