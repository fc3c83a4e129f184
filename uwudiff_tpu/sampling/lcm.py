"""LCM few-step sampling (Latent Consistency Models, Luo et al. 2023).

Beyond-the-reference capability (the reference has no distilled
samplers; see PAPERS.md LCM-LoRA). Pairs with
``training/distill.py::LCMDistillTrainer``:

- :class:`LCMDenoiser` wraps the eps-predicting model exactly like
  ``KDiffusionDenoiser`` but returns the *consistency* output
  ``f(z, t) = c_skip(t) z + c_out(t) x0_pred`` (in unscaled k-diffusion
  space: ``z = x / sqrt(1 + sigma^2)``).
- :func:`sample_lcm` is the LCM multistep loop: at each step the
  consistency output is the clean-image estimate and the next state is
  a full re-noising ``x = x0_hat + sigma_next * eps`` (the final step,
  sigma=0, returns x0_hat) — a ``lax.scan`` like every other sampler
  here.
- :func:`get_sigmas_lcm` spaces inference steps on the distillation
  DDIM grid (``(i+1)*k - 1``) instead of the full linspace, matching
  the timesteps the student was trained on.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.diffusion.schedules import NoiseSchedule
from uwudiff_tpu.sampling.wrapper import KDiffusionDenoiser
from uwudiff_tpu.training.distill import boundary_scalings
from uwudiff_tpu.utils import append_dims

__all__ = ["LCMDenoiser", "sample_lcm", "get_sigmas_lcm"]


@dataclasses.dataclass(frozen=True)
class LCMDenoiser(KDiffusionDenoiser):
    """Consistency-function wrapper over an eps-predicting model.

    ``__call__`` returns ``c_skip(t) * z + c_out(t) * x0_pred`` — at
    large t this is ~the model's x0 prediction, at t=0 the identity.
    Use the same ``sigma_data_boundary`` / ``timestep_scaling`` the
    student was distilled with.
    """

    sigma_data_boundary: float = 0.5
    timestep_scaling: float = 10.0

    def __call__(self, x, sigma, sigma_cond=None, **kwargs):
        x0_pred = super().__call__(x, sigma, sigma_cond=sigma_cond, **kwargs)
        sigma_cond = sigma_cond if sigma_cond is not None else sigma
        t = self.sigma_to_t(sigma_cond)
        c_skip, c_out = boundary_scalings(
            t, self.sigma_data_boundary, self.timestep_scaling
        )
        z = x / jnp.sqrt(append_dims(sigma, x.ndim) ** 2 + 1.0)
        return (
            append_dims(c_skip, x.ndim) * z
            + append_dims(c_out, x.ndim) * x0_pred
        )


def sample_lcm(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    noise_sampler: Callable | None = None,
    callback=None,  # accepted for API parity; ignored under jit
) -> jnp.ndarray:
    """LCM multistep loop over a descending sigma schedule ending at 0.

    ``model`` follows the sampler contract: ``model(x, sigma,
    sigma_cond=...) -> (denoised, uncond)`` where ``denoised`` is the
    consistency output (wrap with :class:`LCMDenoiser`; CFG is baked
    into the distilled student, so sample with ``cfg_scale=1``).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    sig, sig_next = sigmas[:-1], sigmas[1:]

    def step(carry, inputs):
        x, rng = carry
        sigma, sigma_next = inputs
        denoised, _ = model(x, sigma * s_in, sigma_cond=sigma * s_in, **extra_args)
        rng, sub = jax.random.split(rng)
        if noise_sampler is not None:
            noise = noise_sampler(sub, x.shape, sigma, sigma_next)
        else:
            noise = jax.random.normal(sub, x.shape, x.dtype)
        # full re-noise to sigma_next; sigma_next == 0 at the final step
        # so the scan output is the last consistency estimate itself
        x = denoised + noise * sigma_next
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), (sig, sig_next))
    return x


def get_sigmas_lcm(
    num_steps: int,
    schedule: NoiseSchedule | None = None,
    num_ddim_timesteps: int = 50,
) -> jnp.ndarray:
    """Descending inference sigmas on the distillation DDIM grid.

    Picks ``num_steps`` timesteps evenly from the ``(i+1)*k - 1`` grid
    (highest first, always including the top timestep) and appends the
    terminal sigma=0, mirroring how LCM schedulers skip along the
    origin-solver steps rather than the raw trainer grid.

    ``num_steps`` leads so the function satisfies the samplers'
    ``get_sigma_func(num_steps)`` contract directly. ``schedule``
    defaults to the SDXL training schedule as a convenience — a student
    distilled on any OTHER schedule must bind its own (e.g. a config
    ``_partial_`` with a ``schedule:`` node), or the inference steps
    silently leave the grid it was trained on.
    """
    schedule = schedule if schedule is not None else NoiseSchedule.sdxl()
    n = schedule.num_train_timesteps
    k = n // num_ddim_timesteps
    grid = np.arange(1, num_ddim_timesteps + 1) * k - 1  # ascending
    num_steps = min(num_steps, num_ddim_timesteps)
    # evenly spaced indices over the grid, descending from the top
    idx = np.linspace(num_ddim_timesteps - 1, 0, num_steps).round().astype(int)
    t = grid[idx]
    sigmas = np.asarray(schedule.sigma_for_timestep(jnp.asarray(t)))
    return jnp.concatenate(
        [jnp.asarray(sigmas, jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
