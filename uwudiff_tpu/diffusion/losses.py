"""Composable diffusion training losses as pure jittable functions.

Capability parity with ``duwu/loss/diffusion.py`` (DDPM/EDM-sigma loss
with epsilon/v/sample/rectified-flow targets, min-SNR and debiased
weighting) and ``duwu/loss/rectified_flow.py`` (uniform-time RF loss,
NN-weighted RF loss).

TPU-first design: each loss is a frozen dataclass whose ``__call__`` is a
pure function ``(rng, x, model_fn, **model_kwargs) -> (loss, aux)`` that
traces cleanly into the jitted train step. The model is passed as a
closure ``model_fn(x_t, timesteps, **kwargs) -> model_output`` so
gradients flow through whatever parameters the closure captures.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.utils import append_dims

__all__ = [
    "DiffusionLossAux",
    "DiffusionLoss",
    "RectifiedFlowLoss",
    "NNWeightedRFLossAux",
    "NNWeightedRFLoss",
    "EDMLoss",
]

ModelFn = Callable[..., jnp.ndarray]


class DiffusionLossAux(NamedTuple):
    """Per-batch auxiliary outputs (``loss/diffusion.py:9-15``)."""

    losses: jnp.ndarray  # [B] per-sample loss
    timesteps: jnp.ndarray  # [B]
    pred: jnp.ndarray
    target: jnp.ndarray
    noisy_latent: jnp.ndarray


def _mse(pred, target):
    return (pred - target) ** 2


def _l1(pred, target):
    return jnp.abs(pred - target)


def _huber(pred, target, delta: float = 1.0):
    err = pred - target
    abs_err = jnp.abs(err)
    return jnp.where(
        abs_err <= delta, 0.5 * err**2, delta * (abs_err - 0.5 * delta)
    )


_LOSS_FNS = {"mse": _mse, "l2": _mse, "l1": _l1, "huber": _huber}


def _weighted_mean(losses, sample_weight):
    """Reduce per-sample losses, optionally weighted: ``(Σ wₛ·lₛ)/B``.

    With instance rows at weight 1 and class-prior rows at weight w
    this is the DreamBooth prior-preservation objective
    (Ruiz et al. 2023, L = E_inst + w·E_prior) up to the constant 1/2
    from the doubled batch; weights are relative, not normalized."""
    if sample_weight is None:
        return losses.mean()
    return (losses * sample_weight.astype(losses.dtype)).mean()


@dataclasses.dataclass(frozen=True)
class DiffusionLoss:
    """DDPM/EDM-sigma diffusion loss (``loss/diffusion.py:18-193``).

    ``prediction_type`` is what the network outputs, ``target_type`` is
    what the loss regresses to; conversion goes through (x0, eps) space
    exactly as ``get_x0_eps_from_pred_with_sigmas``
    (``loss/diffusion.py:100-125``).
    """

    schedule: NoiseSchedule
    use_snr_weight: bool = False
    min_snr_gamma: float = 5.0
    use_debiased_estimation: bool = False
    prediction_type: str | None = None
    target_type: str | None = None
    loss_type: str = "mse"
    # noise offset (community fine-tune staple): shift the noise by a
    # per-(sample, channel) constant so the model learns to move image
    # MEANS — fixes washed-out very-dark/bright generations
    noise_offset: float = 0.0
    # multires ("pyramid") noise (community fine-tune staple; Hua 2023):
    # add bilinearly-upsampled low-frequency noise octaves with
    # discount^i weights, renormalized per sample — improves very dark/
    # bright image reproduction like noise_offset but frequency-shaped.
    # XLA needs static shapes, so octave i is the fixed h>>i, w>>i grid
    # (the popular impl jitters the factor per call; the fixed-2 ladder
    # is that recipe's expectation).
    multires_noise_iterations: int = 0
    multires_noise_discount: float = 0.25
    # input perturbation (kohya-style): the model INPUT is noised with
    # noise + gamma * fresh_noise while the target keeps the original
    # noise — a regularizer against sampler-step error accumulation
    input_perturbation: float = 0.0
    # timestep range restriction (kohya-style min/max timestep):
    # uniform over [min_timestep, max_timestep) instead of [0, N) —
    # specialize a model to a noise band (refiner-style splits,
    # high-noise structure training). max_timestep=None means N.
    min_timestep: int = 0
    max_timestep: int | None = None

    def __post_init__(self):
        if self.prediction_type is None:
            object.__setattr__(
                self, "prediction_type", self.schedule.prediction_type
            )
        if self.target_type is None:
            object.__setattr__(self, "target_type", self.schedule.prediction_type)

    @property
    def n_diffusion_time_steps(self) -> int:
        return self.schedule.num_train_timesteps

    @property
    def loss_fn(self):
        return _LOSS_FNS[self.loss_type]

    # --- timestep/sigma sampling (``loss/diffusion.py:64-72``) ---

    def sample_timesteps_and_sigmas(self, rng, batch_size: int):
        lo = self.min_timestep
        hi = (
            self.schedule.num_train_timesteps
            if self.max_timestep is None
            else self.max_timestep
        )
        assert 0 <= lo < hi <= self.schedule.num_train_timesteps, (
            f"bad timestep range [{lo}, {hi})"
        )
        timesteps = jax.random.randint(rng, (batch_size,), lo, hi)
        sigmas = self.schedule.sigma_for_timestep(timesteps)
        return timesteps, sigmas

    # --- forward noising (``loss/diffusion.py:74-82``) ---

    def noise_latents(self, x, noise, sigmas):
        sigmas = append_dims(sigmas, x.ndim)
        scales = 1.0 / jnp.sqrt(sigmas**2 + 1.0)
        return (x + noise * sigmas) * scales

    # --- target / prediction conversion ---

    def get_target(self, x0, noise, timesteps):
        """``loss/diffusion.py:84-98``."""
        if self.target_type == "epsilon":
            return noise
        if self.target_type == "v_prediction":
            return self.schedule.velocity(x0, noise, timesteps)
        if self.target_type == "sample":
            return x0
        if self.target_type == "rectified_flow":
            return noise - x0
        raise ValueError(f"Unsupported target type {self.target_type}")

    def get_x0_eps_from_pred_with_sigmas(self, xt, model_output, sigmas):
        """``loss/diffusion.py:100-125``. ``xt`` is the scaled noisy latent."""
        sigmas = append_dims(sigmas, xt.ndim)
        scales = 1.0 / jnp.sqrt(sigmas**2 + 1.0)
        if self.prediction_type == "sample":
            x0 = model_output
            eps = (xt / scales - x0) / sigmas
        elif self.prediction_type == "epsilon":
            eps = model_output
            x0 = xt / scales - sigmas * eps
        elif self.prediction_type == "v_prediction":
            x0 = scales * (xt - sigmas * model_output)
            eps = (xt / scales - x0) / sigmas
        elif self.prediction_type == "rectified_flow":
            x0 = (xt / scales - sigmas * model_output) / (1 + sigmas)
            eps = (xt / scales + model_output) / (1 + sigmas)
        else:
            raise ValueError(
                f"Unsupported prediction type {self.prediction_type}"
            )
        return x0, eps

    def get_prediction_for_training(self, xt, model_output, timesteps, sigmas):
        """``loss/diffusion.py:133-139``."""
        if self.prediction_type == self.target_type:
            return model_output
        x0, eps = self.get_x0_eps_from_pred_with_sigmas(xt, model_output, sigmas)
        return self.get_target(x0, eps, timesteps)

    # --- loss weights ---

    def apply_snr_weight(self, losses, sigmas):
        """Min-SNR weighting (``loss/diffusion.py:141-153``), computed from
        sigma (snr = sigma^-2) so it extends to continuous timesteps."""
        assert self.prediction_type == self.target_type
        assert self.prediction_type in ("epsilon", "v_prediction")
        snr = self.schedule.snr_for_sigma(sigmas)
        min_snr_gamma = jnp.minimum(snr, self.min_snr_gamma)
        if self.prediction_type == "v_prediction":
            snr_weight = min_snr_gamma / (snr + 1)
        else:
            snr_weight = min_snr_gamma / snr
        return losses * snr_weight

    def apply_debiased_estimation(self, losses, sigmas):
        """1/sqrt(SNR) weighting capped at SNR=1000
        (``loss/diffusion.py:155-167``)."""
        assert self.prediction_type == self.target_type == "epsilon"
        snr_t = jnp.minimum(self.schedule.snr_for_sigma(sigmas), 1000.0)
        return losses / jnp.sqrt(snr_t)

    def _reduce_per_sample(self, losses, loss_mask=None):
        """Per-sample mean; with ``loss_mask`` ([B, h, w] or
        [B, h, w, 1], latent-sized, values in [0, 1]) the masked mean
        ``Σ m·l / Σ m`` — the community "masked loss" staple (train
        only where the subject is): a mask value scales the
        contribution of its pixel, and the normalization keeps the
        per-sample loss scale independent of mask area."""
        b = losses.shape[0]
        if loss_mask is None:
            return losses.reshape(b, -1).mean(axis=1)
        m = loss_mask.astype(losses.dtype)
        while m.ndim < losses.ndim:
            m = m[..., None]
        m = jnp.broadcast_to(m, losses.shape)
        num = (losses * m).reshape(b, -1).sum(axis=1)
        den = jnp.maximum(m.reshape(b, -1).sum(axis=1), 1e-6)
        return num / den

    # --- main entry (``loss/diffusion.py:169-193``) ---

    def sample_noise(self, rng, x):
        """Gaussian noise, optionally mean-shifted per (sample, channel)
        by ``noise_offset`` (NHWC: the offset broadcasts over H, W).
        Bitwise-identical to plain normal sampling when the offset is 0
        (the extra key is derived by fold_in, not by changing splits)."""
        noise = jax.random.normal(rng, x.shape, x.dtype)
        if self.multires_noise_iterations and x.ndim == 4:
            b, h, w, c = x.shape
            for i in range(1, self.multires_noise_iterations):
                hn, wn = max(1, h >> i), max(1, w >> i)
                low = jax.random.normal(
                    jax.random.fold_in(rng, 100 + i), (b, hn, wn, c), x.dtype
                )
                noise = noise + (
                    self.multires_noise_discount ** i
                ) * jax.image.resize(low, (b, h, w, c), "bilinear")
                if hn == 1 and wn == 1:
                    break
            std = noise.reshape(b, -1).std(axis=1)
            noise = noise / jnp.maximum(
                append_dims(std, noise.ndim), 1e-8
            )
        if self.noise_offset:
            off_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
            noise = noise + self.noise_offset * jax.random.normal(
                jax.random.fold_in(rng, 1), off_shape, x.dtype
            )
        return noise

    def __call__(
        self,
        rng,
        x: jnp.ndarray,
        model_fn: ModelFn,
        sample_weight: jnp.ndarray | None = None,
        loss_mask: jnp.ndarray | None = None,
        **model_kwargs: Any,
    ) -> tuple[jnp.ndarray, DiffusionLossAux]:
        rng_t, rng_n = jax.random.split(rng)
        noise = self.sample_noise(rng_n, x)
        timesteps, sigmas = self.sample_timesteps_and_sigmas(rng_t, x.shape[0])
        if self.input_perturbation:
            input_noise = noise + self.input_perturbation * jax.random.normal(
                jax.random.fold_in(rng_n, 2), x.shape, x.dtype
            )
        else:
            input_noise = noise
        noisy_latent = self.noise_latents(x, input_noise, sigmas)

        model_output = model_fn(noisy_latent, timesteps, **model_kwargs)

        pred = self.get_prediction_for_training(
            noisy_latent, model_output, timesteps, sigmas
        )
        target = self.get_target(x, noise, timesteps)
        losses = self._reduce_per_sample(self.loss_fn(pred, target), loss_mask)
        if self.use_snr_weight:
            losses = self.apply_snr_weight(losses, sigmas)
        if self.use_debiased_estimation:
            losses = self.apply_debiased_estimation(losses, sigmas)
        aux = DiffusionLossAux(
            losses=losses,
            timesteps=timesteps,
            pred=pred,
            target=target,
            noisy_latent=noisy_latent,
        )
        return _weighted_mean(losses, sample_weight), aux


@dataclasses.dataclass(frozen=True)
class RectifiedFlowLoss(DiffusionLoss):
    """Rectified-flow loss (``loss/rectified_flow.py:9-129``).

    Target is ``noise - x0``; predictions in other parameterizations are
    converted via (x0, eps). Continuous ``uniform_time`` sampling maps
    t ~ U(0, max_time) -> sigma = t/(1-t) -> fractional timestep.
    """

    time_sampling_type: str = "uniform_time"
    rescale_image: bool = False
    rescale_noise: bool = False
    # logit_normal params (SD3, Esser et al. 2024 "ln(0, 1)" default):
    # t = sigmoid(m + s·z) concentrates training on mid-noise levels
    logit_normal_mean: float = 0.0
    logit_normal_std: float = 1.0

    def __post_init__(self):
        super().__post_init__()
        object.__setattr__(self, "target_type", "rectified_flow")

    def sample_timesteps_and_sigmas(self, rng, batch_size: int):
        """``loss/rectified_flow.py:26-47`` (+ SD3 logit-normal — no
        reference counterpart; Esser et al. 2024 report it beats
        uniform for MMDiT-class rectified flow)."""
        if self.time_sampling_type == "uniform_timestep":
            return super().sample_timesteps_and_sigmas(rng, batch_size)
        sigma_max = self.schedule.sigma_max
        max_time = sigma_max / (1 + sigma_max)
        if self.time_sampling_type == "uniform_time":
            time = jax.random.uniform(rng, (batch_size,)) * max_time
        elif self.time_sampling_type == "logit_normal":
            z = jax.random.normal(rng, (batch_size,))
            time = jax.nn.sigmoid(
                self.logit_normal_mean + self.logit_normal_std * z
            )
            # clamp into the schedule's representable range (sigmoid is
            # (0,1)-open so only the top end needs the cap)
            time = jnp.minimum(time, max_time)
        else:
            raise ValueError(
                f"Unsupported time sampling type: "
                f"{self.time_sampling_type}"
            )
        sigmas = time / (1 - time)
        timesteps = self.schedule.sigma_to_t(sigmas)
        return timesteps, sigmas

    def get_x0_and_noises(self, rng, x):
        """``loss/rectified_flow.py:49-61``. A 5D input ``[B, 2, C, H, W]``
        carries a paired (sample, noise); otherwise noise is sampled."""
        if x.ndim == 5:
            noise = x[:, 1]
            x = x[:, 0]
        else:
            noise = jax.random.normal(rng, x.shape, x.dtype)
        if self.rescale_image:
            std = x.reshape(x.shape[0], -1).std(axis=1)
            x = x / append_dims(std, x.ndim) * 0.937
        if self.rescale_noise:
            std = noise.reshape(noise.shape[0], -1).std(axis=1)
            noise = noise / append_dims(std, noise.ndim)
        return x, noise

    def __call__(
        self,
        rng,
        x: jnp.ndarray,
        model_fn: ModelFn,
        sample_weight: jnp.ndarray | None = None,
        loss_mask: jnp.ndarray | None = None,
        **model_kwargs: Any,
    ) -> tuple[jnp.ndarray, DiffusionLossAux]:
        rng_t, rng_n = jax.random.split(rng)
        x, noise = self.get_x0_and_noises(rng_n, x)
        timesteps, sigmas = self.sample_timesteps_and_sigmas(rng_t, x.shape[0])
        noisy_latent = self.noise_latents(x, noise, sigmas)

        model_output = model_fn(noisy_latent, timesteps, **model_kwargs)

        target = noise - x
        pred_x0, pred_eps = self.get_x0_eps_from_pred_with_sigmas(
            noisy_latent, model_output, sigmas
        )
        pred = pred_eps - pred_x0
        losses = self._reduce_per_sample(self.loss_fn(pred, target), loss_mask)
        aux = DiffusionLossAux(
            losses=losses,
            timesteps=timesteps,
            pred=pred,
            target=target,
            noisy_latent=noisy_latent,
        )
        return _weighted_mean(losses, sample_weight), aux


class NNWeightedRFLossAux(NamedTuple):
    """``loss/rectified_flow.py:132-141``."""

    losses: jnp.ndarray
    rescaled_losses: jnp.ndarray
    pred_losses: jnp.ndarray
    loss_pred_losses: jnp.ndarray
    timesteps: jnp.ndarray
    pred: jnp.ndarray
    target: jnp.ndarray
    noisy_latent: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class NNWeightedRFLoss(RectifiedFlowLoss):
    """RF loss reweighted by a learned log-loss predictor
    (``loss/rectified_flow.py:144-203``).

    ``loss_pred_fn(noisy_latent, sigmas, **model_kwargs) -> log_ls_pred``
    must be supplied at call time (it closes over its own params, which
    typically live in a second optimizer group — see
    ``training/nn_weighted.py``).
    """

    def __call__(  # type: ignore[override]
        self,
        rng,
        x: jnp.ndarray,
        model_fn: ModelFn,
        loss_pred_fn: ModelFn | None = None,
        sample_weight: jnp.ndarray | None = None,
        loss_mask: jnp.ndarray | None = None,
        **model_kwargs: Any,
    ) -> tuple[jnp.ndarray, NNWeightedRFLossAux]:
        assert loss_pred_fn is not None, "NNWeightedRFLoss needs loss_pred_fn"
        rng_t, rng_n = jax.random.split(rng)
        x, noise = self.get_x0_and_noises(rng_n, x)
        timesteps, sigmas = self.sample_timesteps_and_sigmas(rng_t, x.shape[0])
        noisy_latent = self.noise_latents(x, noise, sigmas)

        model_output = model_fn(noisy_latent, timesteps, **model_kwargs)

        target = noise - x
        pred_x0, pred_eps = self.get_x0_eps_from_pred_with_sigmas(
            noisy_latent, model_output, sigmas
        )
        pred = pred_eps - pred_x0
        rf_losses = self._reduce_per_sample(
            self.loss_fn(pred, target), loss_mask
        )

        # Loss predictor regresses log of the (detached) per-sample loss.
        log_ls_pred = loss_pred_fn(noisy_latent, sigmas, **model_kwargs).reshape(
            -1
        )
        log_ls = jnp.log(jax.lax.stop_gradient(rf_losses))
        ls_pred_loss = (log_ls - log_ls_pred) ** 2

        pred_loss = jnp.maximum(
            jnp.exp(jax.lax.stop_gradient(log_ls_pred)), 1e-4
        )
        rescaled_losses = rf_losses / pred_loss
        losses = rescaled_losses + ls_pred_loss

        aux = NNWeightedRFLossAux(
            losses=rf_losses,
            rescaled_losses=rescaled_losses,
            pred_losses=pred_loss,
            loss_pred_losses=ls_pred_loss,
            timesteps=timesteps,
            pred=pred,
            target=target,
            noisy_latent=noisy_latent,
        )
        return _weighted_mean(losses, sample_weight), aux


@dataclasses.dataclass(frozen=True)
class EDMLoss:
    """Karras et al. 2022 ("EDM") training objective — no reference
    counterpart (UwUDiff trains DDPM/RF only); modern continuous-sigma
    recipe, drop-in for ``DMTrainer(loss_config=...)``.

    sigma ~ exp(N(p_mean, p_std)); the raw network F is conditioned as
    ``F(c_in * (x + sigma n), c_noise)`` and the denoised prediction is
    ``D = c_skip * x_noisy + c_out * F`` with

        c_skip = sd^2/(sigma^2+sd^2)      c_out = sigma sd/sqrt(sigma^2+sd^2)
        c_in   = 1/sqrt(sigma^2+sd^2)     c_noise = ln(sigma)/4

    loss = lambda(sigma) ||D - x0||^2, lambda = (sigma^2+sd^2)/(sigma sd)^2
    (so lambda c_out^2 == 1: unit effective weight per sigma). Sampling
    uses ``sampling.wrapper.EDMDenoiser`` + ``karras_sigmas``.

    ``aux.timesteps`` reports 1000*Phi((ln sigma - p_mean)/p_std) — the
    lognormal CDF mapped onto the usual [0, 1000) axis so the
    per-timestep validation-loss plot bins uniformly.
    """

    sigma_data: float = 0.5
    p_mean: float = -1.2
    p_std: float = 1.2
    loss_type: str = "mse"
    # trainer-compat nominal axis (callbacks bin aux.timesteps over it)
    num_train_timesteps: int = 1000
    schedule: Any = None  # serving pulls trainer.loss.schedule; EDM has none

    @property
    def n_diffusion_time_steps(self) -> int:
        return self.num_train_timesteps

    @property
    def loss_fn(self):
        return _LOSS_FNS[self.loss_type]

    def scalings(self, sigma):
        sd = self.sigma_data
        denom = sigma**2 + sd**2
        c_skip = sd**2 / denom
        c_out = sigma * sd / jnp.sqrt(denom)
        c_in = 1.0 / jnp.sqrt(denom)
        c_noise = jnp.log(sigma) / 4.0
        return c_skip, c_out, c_in, c_noise

    def sample_sigmas(self, rng, batch_size: int):
        z = jax.random.normal(rng, (batch_size,))
        return jnp.exp(self.p_mean + self.p_std * z)

    def __call__(
        self,
        rng,
        x: jnp.ndarray,
        model_fn: ModelFn,
        sample_weight: jnp.ndarray | None = None,
        loss_mask: jnp.ndarray | None = None,
        **model_kwargs: Any,
    ) -> tuple[jnp.ndarray, DiffusionLossAux]:
        rng_t, rng_n = jax.random.split(rng)
        noise = jax.random.normal(rng_n, x.shape, x.dtype)
        sigmas = self.sample_sigmas(rng_t, x.shape[0])
        sig = append_dims(sigmas, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scalings(sig)

        x_noisy = x + sig * noise
        f_out = model_fn(c_in * x_noisy, c_noise.reshape(-1), **model_kwargs)
        denoised = c_skip * x_noisy + c_out * f_out

        weight = (sig**2 + self.sigma_data**2) / (sig * self.sigma_data) ** 2
        losses = DiffusionLoss._reduce_per_sample(
            self, weight * self.loss_fn(denoised, x), loss_mask
        )
        # lognormal CDF -> uniform [0, 1000) axis for the val-loss plot
        z = (jnp.log(sigmas) - self.p_mean) / self.p_std
        timesteps = self.num_train_timesteps * jax.scipy.stats.norm.cdf(z)
        aux = DiffusionLossAux(
            losses=losses,
            timesteps=timesteps,
            pred=denoised,
            target=x,
            noisy_latent=x_noisy,
        )
        return _weighted_mean(losses, sample_weight), aux
