"""k-diffusion sigma-parameterization wrapper, as pure functions.

Parity with ``duwu/sampling/k_diffusion_wrapper.py``: an eps-predicting
discrete-schedule model is driven in continuous sigma space via
``c_in = 1/sqrt(sigma^2+1)``, ``c_out = -sigma`` and the log-linear
sigma<->t interpolation (which lives on :class:`NoiseSchedule`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.utils import append_dims

__all__ = [
    "KDiffusionDenoiser",
    "RFDenoiser",
    "VDenoiser",
    "denoiser_for_loss",
    "append_dims",
    "to_d",
    "get_ancestral_step",
]


def denoiser_for_loss(loss) -> type:
    """The sampling wrapper matching a training loss's parameterization.

    Keeps train/sample conventions in lock-step without configs having
    to name both: ``RectifiedFlowLoss`` (incl. NN-weighted) ->
    :class:`RFDenoiser`; ``prediction_type="v_prediction"`` ->
    :class:`VDenoiser`; eps/sample -> :class:`KDiffusionDenoiser`.
    ``EDMLoss`` models pair with :class:`EDMDenoiser`, whose
    construction (sigma_data, no schedule) doesn't fit the shared
    ``denoiser_cls(model_fn, schedule, quantize)`` contract — build it
    explicitly."""
    from uwudiff_tpu.diffusion.losses import EDMLoss, RectifiedFlowLoss

    if isinstance(loss, RectifiedFlowLoss):
        return RFDenoiser
    if isinstance(loss, EDMLoss):
        raise ValueError(
            "EDM-trained models sample via EDMDenoiser(model_fn, "
            "sigma_data=...) + karras_sigmas — it takes no DDPM "
            "schedule, so it can't be auto-dispatched here"
        )
    pred = getattr(loss, "prediction_type", None)
    if pred == "v_prediction":
        return VDenoiser
    return KDiffusionDenoiser


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """Karras ODE derivative (k-diffusion ``to_d``)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma, sigma_next, eta: float = 1.0):
    """Ancestral split of a step into (sigma_down, sigma_up); safe at
    ``sigma_next == 0`` (k-diffusion ``get_ancestral_step``)."""
    sigma_up = jnp.minimum(
        sigma_next,
        eta
        * jnp.sqrt(
            jnp.maximum(
                sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2, 1e-20),
                0.0,
            )
        ),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


@dataclasses.dataclass(frozen=True)
class KDiffusionDenoiser:
    """``DiscreteEpsDDPMDenoiser`` equivalent
    (``k_diffusion_wrapper.py:75-108``).

    ``model_fn(x_scaled, t, **kwargs) -> eps``; ``__call__`` returns the
    denoised sample ``x + eps * c_out``. ``sigma_cond`` lets inversion
    condition the model on the *next* step's sigma
    (``k_diffusion_wrapper.py:98-108``).
    """

    model_fn: Callable[..., jnp.ndarray]
    schedule: NoiseSchedule
    quantize: bool = False
    sigma_data: float = 1.0

    @property
    def sigma_min(self):
        return self.schedule.sigma_min

    @property
    def sigma_max(self):
        return self.schedule.sigma_max

    def get_scalings(self, sigma):
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)
        return c_out, c_in

    def sigma_to_t(self, sigma):
        return self.schedule.sigma_to_t(sigma, quantize=self.quantize)

    def t_to_sigma(self, t):
        return self.schedule.t_to_sigma(t)

    def get_eps(self, x, t, **kwargs):
        return self.model_fn(x, t, **kwargs)

    def loss(self, x, noise, sigma, **kwargs):
        """Simple eps-matching loss in sigma space
        (``k_diffusion_wrapper.py:92-96``)."""
        c_out, c_in = self.get_scalings(sigma)
        noised = x + noise * append_dims(sigma, x.ndim)
        eps = self.get_eps(
            noised * append_dims(c_in, x.ndim), self.sigma_to_t(sigma), **kwargs
        )
        return jnp.mean(
            (eps - noise).reshape(x.shape[0], -1) ** 2, axis=1
        )

    def __call__(self, x, sigma, sigma_cond=None, **kwargs):
        c_out, c_in = self.get_scalings(sigma)
        sigma_cond = sigma_cond if sigma_cond is not None else sigma
        t = self.sigma_to_t(sigma_cond)
        eps = self.get_eps(x * append_dims(c_in, x.ndim), t, **kwargs)
        return x + eps * append_dims(c_out, x.ndim)


@dataclasses.dataclass(frozen=True)
class VDenoiser(KDiffusionDenoiser):
    """Sigma-space wrapper for v-prediction networks (SD2.x-class;
    k-diffusion's ``DiscreteVDDPMDenoiser`` counterpart — the reference
    wraps only eps models).  Training convention
    (``losses.DiffusionLoss(prediction_type="v_prediction")``): the
    model sees the VP-scaled latent and predicts
    ``v = sqrt(abar)*n - sqrt(1-abar)*x0``; in k-diffusion space

        x0 = x/(1+sigma^2) - sigma/sqrt(1+sigma^2) * v

    i.e. ``c_skip = 1/(1+sigma^2)``, ``c_out = -sigma/sqrt(1+sigma^2)``.
    """

    def __call__(self, x, sigma, sigma_cond=None, **kwargs):
        _, c_in = self.get_scalings(sigma)
        sigma_cond = sigma_cond if sigma_cond is not None else sigma
        t = self.sigma_to_t(sigma_cond)
        v = self.get_eps(x * append_dims(c_in, x.ndim), t, **kwargs)
        sig = append_dims(sigma, x.ndim)
        c_skip = 1.0 / (sig**2 + 1.0)
        c_out = -sig / jnp.sqrt(sig**2 + 1.0)
        return c_skip * x + c_out * v

    def loss(self, x, noise, sigma, **kwargs):
        """v-matching loss in sigma space (target
        ``sqrt(abar)*n - sqrt(1-abar)*x0`` expressed via sigma)."""
        _, c_in = self.get_scalings(sigma)
        noised = x + noise * append_dims(sigma, x.ndim)
        v = self.get_eps(
            noised * append_dims(c_in, x.ndim), self.sigma_to_t(sigma), **kwargs
        )
        sig = append_dims(sigma, x.ndim)
        scales = 1.0 / jnp.sqrt(sig**2 + 1.0)
        target = scales * noise - sig * scales * x
        return jnp.mean((v - target).reshape(x.shape[0], -1) ** 2, axis=1)


@dataclasses.dataclass(frozen=True)
class RFDenoiser(KDiffusionDenoiser):
    """Sigma-space wrapper for rectified-flow-trained networks — the
    sampling-side counterpart of :class:`diffusion.RectifiedFlowLoss`
    (the reference trains RF, ``loss/rectified_flow.py``, but ships no
    sampling wrapper for it; this closes that loop so every sampler in
    this package drives RF models unchanged).

    Training convention (``losses.RectifiedFlowLoss``): the model sees
    the VP-scaled interpolant ``x_t = (x0 + sigma*n)/sqrt(1+sigma^2)``
    at fractional DDPM timesteps and predicts the velocity
    ``v = n - x0``.  In k-diffusion space (``x = x0 + sigma*n``) the
    denoised estimate therefore is

        x0 = (x - sigma * v) / (1 + sigma)

    with the same ``c_in = 1/sqrt(sigma^2+1)`` input scaling and
    ``sigma_to_t`` conditioning as the eps wrapper.  Pair with
    :func:`get_sigmas.get_sigmas_for_rf` ladders (optionally
    ``shift_time`` / ``dynamic_shift_time`` warped, SD3-style).
    """

    def __call__(self, x, sigma, sigma_cond=None, **kwargs):
        _, c_in = self.get_scalings(sigma)
        sigma_cond = sigma_cond if sigma_cond is not None else sigma
        t = self.sigma_to_t(sigma_cond)
        v = self.get_eps(x * append_dims(c_in, x.ndim), t, **kwargs)
        sig = append_dims(sigma, x.ndim)
        return (x - sig * v) / (1.0 + sig)

    def loss(self, x, noise, sigma, **kwargs):
        """Velocity-matching loss in sigma space (mirrors
        :meth:`KDiffusionDenoiser.loss` for the RF parameterization)."""
        _, c_in = self.get_scalings(sigma)
        noised = x + noise * append_dims(sigma, x.ndim)
        v = self.get_eps(
            noised * append_dims(c_in, x.ndim), self.sigma_to_t(sigma), **kwargs
        )
        target = noise - x
        return jnp.mean((v - target).reshape(x.shape[0], -1) ** 2, axis=1)


@dataclasses.dataclass(frozen=True)
class EDMDenoiser:
    """Sigma-space wrapper for EDM-trained networks (Karras et al.
    2022) — the sampling-side counterpart of ``diffusion.EDMLoss`` (no
    reference counterpart). ``model_fn(x_scaled, c_noise, **kw) -> F``;
    ``__call__`` returns the denoised prediction
    ``c_skip x + c_out F(c_in x, ln(sigma)/4)`` directly, so every
    sampler in this package drives it unchanged (they consume
    ``denoiser(x, sigma)`` = denoised).
    """

    model_fn: Callable[..., jnp.ndarray]
    sigma_data: float = 0.5
    sigma_min: float = 0.002
    sigma_max: float = 80.0

    def get_scalings(self, sigma):
        sd = self.sigma_data
        denom = sigma**2 + sd**2
        c_skip = sd**2 / denom
        c_out = sigma * sd / jnp.sqrt(denom)
        c_in = 1.0 / jnp.sqrt(denom)
        return c_skip, c_out, c_in

    def __call__(self, x, sigma, sigma_cond=None, **kwargs):
        sigma = jnp.asarray(sigma)
        if sigma.ndim == 0:
            sigma = jnp.full((x.shape[0],), sigma)
        c_skip, c_out, c_in = self.get_scalings(sigma)
        c_noise = jnp.log(sigma) / 4.0
        f_out = self.model_fn(
            x * append_dims(c_in, x.ndim), c_noise, **kwargs
        )
        return append_dims(c_skip, x.ndim) * x + append_dims(
            c_out, x.ndim
        ) * f_out
