"""Noise schedules: the sigma/timestep machinery, as pure JAX arrays.

Replaces the reference's dependency on diffusers'
``EulerDiscreteScheduler`` (used in ``duwu/loss/diffusion.py``,
``duwu/sampling/k_diffusion_wrapper.py``) and the custom Laplace/cosine
logSNR schedules derived in
``test_scripts/test_diffusion_scheduler.ipynb``. All arrays live on
device and every method is jittable (static shapes, no data-dependent
Python control flow).

Conventions (exactly matching the reference mix of diffusers +
k-diffusion, see SURVEY.md §7.3):

- ``alphas_cumprod[t]`` for integer timestep ``t in [0, N)``; noise level
  grows with ``t``.
- ``sigmas`` (ascending, length N): ``sqrt((1-acp)/acp)`` — k-diffusion's
  sigma parameterization; index == timestep.
- ``sigmas_descending`` (length N+1): flipped with 0 appended — diffusers'
  ``scheduler.sigmas`` layout used by the samplers
  (``duwu/sampling/sampling.py:92-96``).
- ``sigma_to_t`` / ``t_to_sigma``: log-linear interpolation over the
  ascending sigma array (k-diffusion ``DiscreteSchedule`` semantics,
  ``k_diffusion_wrapper.py:47-72``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax.numpy as jnp
import numpy as np

__all__ = ["NoiseSchedule"]


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Immutable container for a discrete diffusion noise schedule."""

    alphas_cumprod: jnp.ndarray  # [N], decreasing
    betas: jnp.ndarray  # [N]
    prediction_type: str = "epsilon"

    # --- constructors ---

    @classmethod
    def from_betas(
        cls, betas: np.ndarray | jnp.ndarray, prediction_type: str = "epsilon"
    ) -> "NoiseSchedule":
        betas = jnp.asarray(betas, dtype=jnp.float32)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return cls(
            alphas_cumprod=alphas_cumprod,
            betas=betas,
            prediction_type=prediction_type,
        )

    def rescale_zero_terminal_snr(self) -> "NoiseSchedule":
        """Zero-terminal-SNR rescale (Lin et al. 2023, "Common Diffusion
        Noise Schedules and Sample Steps are Flawed"): shift+scale
        sqrt(alphas_cumprod) so the FIRST value is preserved and the
        LAST becomes 0 — the model then actually sees pure noise at
        t=T. Meant for v-prediction (the epsilon target is undefined at
        SNR 0). The terminal alphas_cumprod is clamped to 2^-24 instead
        of exact 0 so the sigma machinery (log-sigmas, k-diffusion
        wrappers) stays finite: sigma_max ~ 4096 instead of inf.
        """
        sqrt_acp = np.sqrt(np.asarray(self.alphas_cumprod, np.float64))
        s0, sT = sqrt_acp[0], sqrt_acp[-1]
        sqrt_acp = (sqrt_acp - sT) * s0 / (s0 - sT)
        acp = np.maximum(sqrt_acp**2, 2.0**-24)
        alphas = np.empty_like(acp)
        alphas[0] = acp[0]
        alphas[1:] = acp[1:] / acp[:-1]
        betas = 1.0 - alphas
        return type(self)(
            alphas_cumprod=jnp.asarray(acp, jnp.float32),
            betas=jnp.asarray(betas, jnp.float32),
            prediction_type=self.prediction_type,
        )

    @classmethod
    def ddpm(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        rescale_zero_terminal_snr: bool = False,
    ) -> "NoiseSchedule":
        """DDPM beta schedules with diffusers' conventions.

        Defaults are the SD1.x/SDXL ``scaled_linear`` schedule (the one the
        reference loads from the SDXL repo, ``duwu/trainer/trainer.py:175-177``).
        """
        if beta_schedule == "linear":
            betas = np.linspace(
                beta_start, beta_end, num_train_timesteps, dtype=np.float64
            )
        elif beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    beta_start**0.5,
                    beta_end**0.5,
                    num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        elif beta_schedule == "squaredcos_cap_v2":
            # Glide cosine schedule
            def alpha_bar(t):
                return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

            betas = np.array(
                [
                    min(
                        1
                        - alpha_bar((i + 1) / num_train_timesteps)
                        / alpha_bar(i / num_train_timesteps),
                        0.999,
                    )
                    for i in range(num_train_timesteps)
                ],
                dtype=np.float64,
            )
        else:
            raise ValueError(f"Unknown beta schedule {beta_schedule!r}")
        sched = cls.from_betas(betas, prediction_type=prediction_type)
        if rescale_zero_terminal_snr:
            sched = sched.rescale_zero_terminal_snr()
        return sched

    @classmethod
    def from_logsnr(
        cls,
        t_to_logsnr: Callable[[np.ndarray], np.ndarray],
        num_train_timesteps: int = 1000,
        cut_endpoints: bool = True,
        prediction_type: str = "epsilon",
    ) -> "NoiseSchedule":
        """Build a schedule from a logSNR(t) curve, t in (0, 1).

        Mirrors ``test_scripts/test_diffusion_scheduler.ipynb`` cells 1-2:
        sample t on a uniform grid (endpoints cut to avoid inf logSNR),
        convert logSNR -> alphas_cumprod -> betas.
        """
        if cut_endpoints:
            all_t = np.linspace(0, 1, num_train_timesteps + 2)[1:-1]
        else:
            all_t = np.linspace(0, 1, num_train_timesteps)
        logsnr = np.float64(t_to_logsnr(all_t))
        snr = np.exp(logsnr)
        alpha_cumprod = snr / (1 + snr)
        alphas = alpha_cumprod.copy()
        alphas[1:] = alpha_cumprod[1:] / alpha_cumprod[:-1]
        betas = 1 - alphas
        return cls.from_betas(betas, prediction_type=prediction_type)

    @classmethod
    def laplace(
        cls,
        num_train_timesteps: int = 1000,
        mu: float = 0.0,
        b: float = 1.0,
        prediction_type: str = "epsilon",
    ) -> "NoiseSchedule":
        """Laplace logSNR schedule (notebook ``t_to_logsnr_laplace``)."""
        eps = np.finfo(np.float32).eps

        def t_to_logsnr(t):
            t = np.float64(t)
            return mu - b * np.sign(0.5 - t) * np.log(
                1 - 2 * np.abs(t - 0.5) + eps
            )

        return cls.from_logsnr(
            t_to_logsnr, num_train_timesteps, prediction_type=prediction_type
        )

    @classmethod
    def cosine_logsnr(
        cls,
        num_train_timesteps: int = 1000,
        mu: float = 0.0,
        s: float = 1.0,
        prediction_type: str = "epsilon",
    ) -> "NoiseSchedule":
        """Cosine logSNR schedule (notebook ``t_to_logsnr_cosine``)."""
        eps = np.finfo(np.float32).eps

        def t_to_logsnr(t):
            t = np.float64(t)
            return mu + 2.0 / s * np.log(
                1.0 / np.tan(np.pi * (t + eps * np.sign(0.5 - t)) / 2)
            )

        return cls.from_logsnr(
            t_to_logsnr, num_train_timesteps, prediction_type=prediction_type
        )

    @classmethod
    def sdxl(cls, prediction_type: str = "epsilon") -> "NoiseSchedule":
        """The SDXL training schedule (scaled_linear 0.00085..0.012, N=1000)."""
        return cls.ddpm(prediction_type=prediction_type)

    sd15 = sdxl  # SD1.5 uses the same beta schedule

    # --- derived arrays ---

    @property
    def num_train_timesteps(self) -> int:
        return self.alphas_cumprod.shape[0]

    @property
    def sigmas(self) -> jnp.ndarray:
        """Ascending sigmas, index == integer timestep. [N]"""
        acp = self.alphas_cumprod
        return jnp.sqrt((1.0 - acp) / acp)

    @property
    def log_sigmas(self) -> jnp.ndarray:
        return jnp.log(self.sigmas)

    @property
    def sigmas_descending(self) -> jnp.ndarray:
        """Diffusers layout: flipped, 0-appended. [N+1]"""
        return jnp.concatenate([self.sigmas[::-1], jnp.zeros((1,))])

    @property
    def all_snr(self) -> jnp.ndarray:
        """SNR per integer timestep (``loss/diffusion.py:42-51``). [N]"""
        acp = self.alphas_cumprod
        return acp / (1.0 - acp)

    @property
    def sigma_min(self) -> jnp.ndarray:
        return self.sigmas[0]

    @property
    def sigma_max(self) -> jnp.ndarray:
        return self.sigmas[-1]

    # --- sigma <-> t ---

    def sigma_for_timestep(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        """sigma for integer timesteps (``loss/diffusion.py:53-62``)."""
        return self.sigmas[timesteps]

    def sigma_to_t(self, sigma: jnp.ndarray, quantize: bool = False) -> jnp.ndarray:
        """Continuous fractional timestep for a sigma, by log-linear
        interpolation over the ascending sigma grid
        (k-diffusion ``DiscreteSchedule.sigma_to_t``,
        ``k_diffusion_wrapper.py:47-66``; identical math to the RF loss's
        ``sigma_to_timestep``, ``loss/rectified_flow.py:98-129``)."""
        log_sigma = jnp.log(jnp.maximum(sigma, 1e-10))
        log_sigmas = self.log_sigmas
        if quantize:
            dists = jnp.abs(log_sigma[..., None] - log_sigmas)
            return jnp.argmin(dists, axis=-1).reshape(jnp.shape(sigma))
        # low_idx: last grid point with log_sigma >= grid (matching the
        # reference's ge(0).cumsum().argmax() trick), clamped to N-2.
        dists = log_sigma[..., None] - log_sigmas  # [..., N]
        low_idx = jnp.clip(
            jnp.sum(dists >= 0, axis=-1) - 1, 0, log_sigmas.shape[0] - 2
        )
        high_idx = low_idx + 1
        low = log_sigmas[low_idx]
        high = log_sigmas[high_idx]
        w = jnp.clip((low - log_sigma) / (low - high), 0.0, 1.0)
        t = (1 - w) * low_idx + w * high_idx
        return t.reshape(jnp.shape(sigma))

    def t_to_sigma(self, t: jnp.ndarray) -> jnp.ndarray:
        """Continuous t -> sigma (k-diffusion ``t_to_sigma``,
        ``k_diffusion_wrapper.py:68-72``)."""
        t = t.astype(jnp.float32)
        low_idx = jnp.floor(t).astype(jnp.int32)
        high_idx = jnp.ceil(t).astype(jnp.int32)
        w = t - jnp.floor(t)
        log_sigma = (1 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[
            high_idx
        ]
        return jnp.exp(log_sigma)

    def snr_for_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """SNR from sigma directly: snr = sigma^-2. Equals
        ``all_snr[t]`` at integer grid points and extends continuously."""
        return sigma**-2

    # --- forward process / targets ---

    def velocity(
        self, x0: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """v-prediction target, diffusers ``scheduler.get_velocity``
        (used by ``loss/diffusion.py:89-90``)."""
        acp = self.alphas_cumprod[timesteps]
        sqrt_acp = jnp.sqrt(acp).reshape(
            acp.shape + (1,) * (x0.ndim - acp.ndim)
        )
        sqrt_1m = jnp.sqrt(1.0 - acp).reshape(
            acp.shape + (1,) * (x0.ndim - acp.ndim)
        )
        return sqrt_acp * noise - sqrt_1m * x0

    def sample_sigmas_descending(self, num_steps: int) -> jnp.ndarray:
        """Inference sigma schedule: ``sigmas_descending`` indexed at
        ``linspace(0, N, steps+1).long()`` — exactly
        ``duwu/sampling/sampling.py:92-96`` (ends at sigma=0)."""
        n = self.num_train_timesteps
        idx = jnp.linspace(0, n, num_steps + 1).astype(jnp.int32)
        return self.sigmas_descending[idx]
