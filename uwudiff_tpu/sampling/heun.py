"""Heun (improved Euler) sampler as a jit-compiled ``lax.scan`` loop.

Beyond the reference's sampler set: k-diffusion's ``sample_heun`` —
deterministic second-order with an Euler predictor and trapezoidal
corrector (two model calls per step except the final sigma->0 step,
which stays first-order), plus Karras churn. The EDM paper's
recommended deterministic sampler.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from uwudiff_tpu.sampling.dpm2 import _churn
from uwudiff_tpu.sampling.wrapper import to_d

__all__ = ["sample_heun"]


def sample_heun(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, API parity
    callback=None,
) -> jnp.ndarray:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n_steps = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]

    def step(carry, inputs):
        x, rng = carry
        sigma, sigma_next = inputs
        rng, sub = jax.random.split(rng)
        sigma_hat = _churn(sigma, n_steps, s_churn, s_tmin, s_tmax)
        eps = (
            noise_sampler(sub, x.shape, sigma, sigma_hat)
            if noise_sampler is not None
            else jax.random.normal(sub, x.shape, x.dtype)
        ) * s_noise
        x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        denoised, _u = model(x, sigma_hat * s_in, **extra_args)
        d = to_d(x, sigma_hat, denoised)
        dt = sigma_next - sigma_hat
        x_euler = x + d * dt

        def heun_branch(_):
            denoised_2, _u2 = model(x_euler, sigma_next * s_in, **extra_args)
            d_2 = to_d(x_euler, sigma_next, denoised_2)
            return x + (d + d_2) / 2 * dt

        x = jax.lax.cond(
            sigma_next == 0, lambda _: x_euler, heun_branch, operand=None
        )
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), (sig, sig_next))
    return x
