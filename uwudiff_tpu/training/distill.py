"""Latent-consistency distillation (LCM / LCM-LoRA style).

Beyond-the-reference capability: distill a trained diffusion model into
a few-step consistency student (Luo et al. 2023, "Latent Consistency
Models"; LCM-LoRA, arXiv:2311.05556 — see PAPERS.md). The reference
(`/root/reference`) has no distillation trainer; this composes the
repo's existing pieces the TPU way:

- ONE jitted step containing the teacher's CFG-guided DDIM solve, the
  target-network forward and the student forward/backward — three
  model applications batched/fused into a single XLA program (the
  teacher cond|uncond pair runs as one doubled-batch call, exactly like
  ``sampling/cfg.py::build_cfg_fn``).
- LCM-LoRA mode falls out of the existing adapter machinery: configure
  ``lycoris_config`` and the frozen base (``frozen["unet_base"]``) IS
  the teacher; the student is base+LoRA via the same pure-tree merge
  the fine-tune path uses (``training/adapters.py``).
- Any prediction parameterization (epsilon / v / sample / rectified
  flow) works: the solver and boundary mix operate in (x0, eps) space
  through ``DiffusionLoss.get_x0_eps_from_pred_with_sigmas``.

Math conventions (diffusers' LCM training recipe, independently
re-derived in this repo's sigma parameterization): the scaled latent is
``z_t = (x0 + sigma_t * eps) / sqrt(1 + sigma_t^2)`` and the DDIM step
to timestep ``s`` is ``z_s = (x0_pred + sigma_s * eps_pred) /
sqrt(1 + sigma_s^2)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from uwudiff_tpu.diffusion.losses import DiffusionLoss, DiffusionLossAux
from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.training.trainer import DMTrainer
from uwudiff_tpu.utils import append_dims

__all__ = [
    "boundary_scalings",
    "ConsistencyDistillLoss",
    "LCMDistillTrainer",
]


def boundary_scalings(
    timesteps: jnp.ndarray,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
):
    """Consistency-function boundary coefficients ``(c_skip, c_out)``.

    ``f(z, t) = c_skip(t) * z + c_out(t) * x0_pred(z, t)`` with the
    boundary condition ``c_skip(0) = 1, c_out(0) = 0`` (so f is the
    identity at t=0). The scaled-timestep form is the LCM choice: away
    from t=0 the skip term decays ~ (sigma_data / (s*t))^2, leaving the
    student's own x0 prediction dominant.
    """
    st = timestep_scaling * timesteps.astype(jnp.float32)
    c_skip = sigma_data**2 / (st**2 + sigma_data**2)
    c_out = st / jnp.sqrt(st**2 + sigma_data**2)
    return c_skip, c_out


@dataclasses.dataclass(frozen=True)
class ConsistencyDistillLoss:
    """Pure jittable LCM distillation loss.

    ``__call__(rng, x, student_fn, teacher_fn, target_fn)`` where
    - ``student_fn(z, t) -> model_output`` (grads flow through it),
    - ``teacher_fn(z, t) -> (out_cond, out_uncond)`` (caller batches the
      CFG pair; treated as constant — stop-gradded here),
    - ``target_fn(z, t) -> model_output`` (the target network
      f_theta^-; caller passes stop-gradded params — the LCM-LoRA
      recipe uses the student itself, EMA weights also work).

    The loss is the pseudo-Huber distance between the student's
    consistency output at ``t_n+k`` and the target's at ``t_n``, where
    ``t_n`` is one teacher DDIM step (with CFG scale w) below.
    """

    schedule: NoiseSchedule
    prediction_type: str | None = None
    num_ddim_timesteps: int = 50
    # CFG scale applied inside the teacher solve. A float trains a
    # fixed-guidance student (the LCM-LoRA deployment mode); a
    # (w_min, w_max) pair samples w ~ U[w_min, w_max] per sample.
    # Convention: x0_cfg = x0_c + w * (x0_c - x0_u) (so w=0 is the
    # plain conditional teacher).
    cfg_scale: float | tuple[float, float] = 7.5
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    huber_c: float = 0.001

    def __post_init__(self):
        if self.prediction_type is None:
            object.__setattr__(
                self, "prediction_type", self.schedule.prediction_type
            )
        # (x0, eps) <-> model-output conversions live on DiffusionLoss
        object.__setattr__(
            self,
            "_conv",
            DiffusionLoss(
                schedule=self.schedule,
                prediction_type=self.prediction_type,
                target_type=self.prediction_type,
            ),
        )

    @property
    def n_diffusion_time_steps(self) -> int:
        return self.schedule.num_train_timesteps

    def ddim_timesteps(self) -> jnp.ndarray:
        """The teacher solver grid: ``(i+1)*k - 1`` for i in [0, n)."""
        n = self.schedule.num_train_timesteps
        k = n // self.num_ddim_timesteps
        return jnp.arange(1, self.num_ddim_timesteps + 1) * k - 1

    def _sample_w(self, rng, batch_size: int) -> jnp.ndarray:
        if isinstance(self.cfg_scale, (tuple, list)):
            w_min, w_max = self.cfg_scale
            return jax.random.uniform(
                rng, (batch_size,), minval=w_min, maxval=w_max
            )
        return jnp.full((batch_size,), float(self.cfg_scale))

    def __call__(
        self,
        rng,
        x: jnp.ndarray,
        student_fn: Callable,
        teacher_fn: Callable,
        target_fn: Callable,
        **_: Any,
    ) -> tuple[jnp.ndarray, DiffusionLossAux]:
        rng_t, rng_n, rng_w = jax.random.split(rng, 3)
        bsz = x.shape[0]
        n = self.schedule.num_train_timesteps
        k = n // self.num_ddim_timesteps

        idx = jax.random.randint(rng_t, (bsz,), 0, self.num_ddim_timesteps)
        t = self.ddim_timesteps()[idx]  # start timestep t_{n+k}
        s = jnp.maximum(t - k, 0)  # solver target timestep t_n
        sigma_t = self.schedule.sigma_for_timestep(t)
        sigma_s = self.schedule.sigma_for_timestep(s)

        noise = jax.random.normal(rng_n, x.shape, x.dtype)
        z_t = self._conv.noise_latents(x, noise, sigma_t)

        # --- student at t ---
        out_student = student_fn(z_t, t)
        x0_student, _ = self._conv.get_x0_eps_from_pred_with_sigmas(
            z_t, out_student, sigma_t
        )
        c_skip_t, c_out_t = boundary_scalings(
            t, self.sigma_data, self.timestep_scaling
        )
        f_student = (
            append_dims(c_skip_t, x.ndim) * z_t
            + append_dims(c_out_t, x.ndim) * x0_student
        )

        # --- teacher CFG DDIM step t -> s (all constant w.r.t. params) ---
        out_c, out_u = teacher_fn(z_t, t)
        x0_c, eps_c = self._conv.get_x0_eps_from_pred_with_sigmas(
            z_t, out_c, sigma_t
        )
        x0_u, eps_u = self._conv.get_x0_eps_from_pred_with_sigmas(
            z_t, out_u, sigma_t
        )
        w = append_dims(self._sample_w(rng_w, bsz), x.ndim)
        x0_cfg = x0_c + w * (x0_c - x0_u)
        eps_cfg = eps_c + w * (eps_c - eps_u)
        z_s = jax.lax.stop_gradient(
            self._conv.noise_latents(x0_cfg, eps_cfg, sigma_s)
        )

        # --- target network at s ---
        out_target = target_fn(z_s, s)
        x0_target, _ = self._conv.get_x0_eps_from_pred_with_sigmas(
            z_s, out_target, sigma_s
        )
        c_skip_s, c_out_s = boundary_scalings(
            s, self.sigma_data, self.timestep_scaling
        )
        f_target = jax.lax.stop_gradient(
            append_dims(c_skip_s, x.ndim) * z_s
            + append_dims(c_out_s, x.ndim) * x0_target
        )

        # pseudo-Huber: sqrt(d^2 + c^2) - c (smooth L1, stable at 0)
        d2 = (f_student - f_target) ** 2
        per_elem = jnp.sqrt(d2 + self.huber_c**2) - self.huber_c
        losses = per_elem.reshape(bsz, -1).mean(axis=1)

        aux = DiffusionLossAux(
            losses=losses,
            timesteps=t,
            pred=f_student,
            target=f_target,
            noisy_latent=z_t,
        )
        return losses.mean(), aux


@dataclasses.dataclass
class LCMDistillTrainer(DMTrainer):
    """Consistency-distillation trainer.

    Teacher selection:
    - with ``lycoris_config`` (LCM-LoRA): the frozen base
      (``frozen["unet_base"]``) is the teacher; only adapter params
      train — the target network is the stop-gradded student.
    - without adapters (full distillation): a frozen copy of the
      initial params becomes the teacher (``frozen["teacher"]``); load
      the trained model via ``model_config.unet._load_config_`` as
      usual.

    The unconditional branch of the teacher's CFG:
    - text models: the empty prompt, encoded once at setup and stored
      in ``frozen["uncond"]``;
    - class-conditional models (DiT family): the trained null-class
      embedding (index ``num_classes``), matching
      ``sampling/cfg.py::build_class_cfg_fn``.
    """

    distill_num_ddim_timesteps: int = 50
    distill_cfg_scale: float | tuple[float, float] = 7.5
    distill_sigma_data: float = 0.5
    distill_timestep_scaling: float = 10.0
    distill_huber_c: float = 0.001

    def __post_init__(self):
        super().__post_init__()
        if not isinstance(self.loss, DiffusionLoss):
            raise ValueError(
                "LCMDistillTrainer needs a DiffusionLoss-family loss "
                "(its schedule and prediction_type define the teacher "
                f"solve); got {type(self.loss).__name__}"
            )
        self.distill_loss = ConsistencyDistillLoss(
            schedule=self.loss.schedule,
            prediction_type=self.loss.prediction_type,
            num_ddim_timesteps=self.distill_num_ddim_timesteps,
            cfg_scale=(
                tuple(self.distill_cfg_scale)
                if isinstance(self.distill_cfg_scale, (tuple, list))
                else self.distill_cfg_scale
            ),
            sigma_data=self.distill_sigma_data,
            timestep_scaling=self.distill_timestep_scaling,
            huber_c=self.distill_huber_c,
        )

    def _setup_on_host(self, example_batch: dict):
        super()._setup_on_host(example_batch)
        from uwudiff_tpu.parallel import fsdp_param_sharding

        extra: dict[str, Any] = {}
        if self.adapter is None:
            # full distillation: the initial params (the loaded teacher
            # checkpoint) freeze as the teacher
            extra["teacher"] = jax.tree_util.tree_map(
                jnp.copy, self.state.params
            )
        if self.te is not None:
            # empty-prompt conditioning for the teacher's uncond branch
            tok_outs = [
                {k: jnp.asarray(v) for k, v in tok([""]).items()}
                for tok in self.tokenizers
            ]
            emb, normed, pooled, mask = self.te.apply(
                {"params": self.frozen["te"]}, tok_outs
            )
            extra["uncond"] = {
                "ctx": normed if self.te_use_normed_ctx else emb,
                "mask": mask,
                "pooled": pooled,
            }
        if extra:
            extra_sh = fsdp_param_sharding(extra, self.mesh)
            extra = jax.device_put(extra, extra_sh)
            self.frozen = {**self.frozen, **extra}

    def _uncond_inputs(self, frozen, bsz, ctx, mask, added_cond):
        """Broadcast the frozen empty-prompt encodings to the batch and
        align sequence lengths with the conditional context (cached-ctx
        batches may carry a different padded length)."""
        unc = frozen["uncond"]
        u_ctx = jnp.broadcast_to(
            unc["ctx"], (bsz,) + tuple(unc["ctx"].shape[1:])
        )
        u_mask = None
        if unc["mask"] is not None:
            u_mask = jnp.broadcast_to(
                unc["mask"], (bsz,) + tuple(unc["mask"].shape[1:])
            )

        def pad_to(emb, m, target):
            cur = emb.shape[1]
            if cur >= target:
                return emb[:, :target], (m[:, :target] if m is not None else None)
            emb = jnp.pad(emb, [(0, 0), (0, target - cur), (0, 0)])
            if m is not None:
                m = jnp.pad(m, [(0, 0), (0, target - cur)])
            return emb, m

        target = max(ctx.shape[1], u_ctx.shape[1])
        c_ctx, c_mask = pad_to(ctx, mask, target)
        u_ctx, u_mask = pad_to(u_ctx, u_mask, target)

        u_added = None
        if added_cond is not None:
            u_added = dict(added_cond)
            if unc["pooled"] is not None and "text_embeds" in u_added:
                u_added["text_embeds"] = jnp.broadcast_to(
                    unc["pooled"], (bsz,) + tuple(unc["pooled"].shape[1:])
                )
        return (c_ctx, c_mask), (u_ctx, u_mask), u_added

    def _loss_for_batch(self, params, frozen, batch, rng):
        if self._has_pipe():
            raise ValueError(
                "LCMDistillTrainer does not support mesh_axes['pipe']: "
                "the distill step applies the model three ways (student/"
                "teacher/target) — use data/fsdp/tensor/seq axes"
            )
        if self._is_moe():
            raise ValueError(
                "LCMDistillTrainer does not support MoE models yet "
                "(sown aux-loss collection across the three applies is "
                "untested) — distill a dense model"
            )
        rng_enc, rng_loss = jax.random.split(rng)
        x, ctx, mask, added_cond = self._encode_batch(frozen, batch, rng_enc)

        student_tree = self._merged_unet_params(params, frozen)
        target_tree = self._merged_unet_params(
            jax.tree_util.tree_map(jax.lax.stop_gradient, params), frozen
        )
        teacher_tree = (
            frozen["unet_base"] if self.adapter is not None
            else frozen["teacher"]
        )

        if "class_labels" in batch:  # DiT family
            labels = batch["class_labels"]
            null = jnp.full_like(labels, self.unet.num_classes)
            labels2 = jnp.concatenate([labels, null])

            def student_fn(z, t):
                return self.unet.apply(
                    {"params": student_tree}, z, t, labels, train=False
                )

            def target_fn(z, t):
                return self.unet.apply(
                    {"params": target_tree}, z, t, labels, train=False
                )

            def teacher_fn(z, t):
                out = self.unet.apply(
                    {"params": teacher_tree},
                    jnp.concatenate([z, z]),
                    jnp.concatenate([t, t]),
                    labels2,
                    train=False,
                )
                cond, uncond = jnp.split(out, 2)
                return cond, uncond

        elif ctx is None:  # unconditional models: no CFG pair needed
            def student_fn(z, t):
                return self.unet.apply(
                    {"params": student_tree}, z, t, None, None, None
                )

            def target_fn(z, t):
                return self.unet.apply(
                    {"params": target_tree}, z, t, None, None, None
                )

            def teacher_fn(z, t):
                out = self.unet.apply(
                    {"params": teacher_tree}, z, t, None, None, None
                )
                # cond == uncond makes the w-guidance term vanish
                return out, out

        else:  # text-conditional (UNet / MMDiT)
            if "uncond" not in frozen:
                raise ValueError(
                    "text-conditional distillation with cached embeddings "
                    "(batch 'ctx', te=None) has no way to build the "
                    "teacher's unconditional branch — configure a text "
                    "encoder (model_config.te) so the empty prompt can be "
                    "encoded at setup"
                )
            bsz = x.shape[0]
            (c_ctx, c_mask), (u_ctx, u_mask), u_added = self._uncond_inputs(
                frozen, bsz, ctx, mask, added_cond
            )
            ctx2 = jnp.concatenate([c_ctx, u_ctx])
            mask2 = (
                jnp.concatenate([c_mask, u_mask])
                if c_mask is not None and u_mask is not None
                else None
            )
            added2 = None
            if added_cond is not None:
                added2 = {
                    k: jnp.concatenate([added_cond[k], u_added[k]])
                    for k in added_cond
                }

            def student_fn(z, t):
                return self.unet.apply(
                    {"params": student_tree}, z, t, c_ctx, c_mask, added_cond
                )

            def target_fn(z, t):
                return self.unet.apply(
                    {"params": target_tree}, z, t, c_ctx, c_mask, added_cond
                )

            def teacher_fn(z, t):
                out = self.unet.apply(
                    {"params": teacher_tree},
                    jnp.concatenate([z, z]),
                    jnp.concatenate([t, t]),
                    ctx2,
                    mask2,
                    added2,
                )
                cond, uncond = jnp.split(out, 2)
                return cond, uncond

        return self.distill_loss(
            rng_loss, x, student_fn, teacher_fn, target_fn
        )
