"""Euler-ancestral samplers as jit-compiled ``lax.scan`` loops.

Parity with ``duwu/sampling/k_diffusion_euler.py`` including the
``image_to_noise`` inversion mode (sigma_cond = next step's sigma) and
the CFG++ variant (https://arxiv.org/pdf/2406.08070v1). The model is a
``model(x, sigma, sigma_cond=...) -> (denoised, uncond_denoised)``
callable (CFG wrappers in ``sampling/cfg.py``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from uwudiff_tpu.sampling.wrapper import get_ancestral_step, to_d
from uwudiff_tpu.utils import append_dims

__all__ = ["sample_euler_ancestral", "sample_euler_ancestral_cfgpp"]


def _sigma_pairs(sigmas: jnp.ndarray):
    return sigmas[:-1], sigmas[1:]


def sample_euler_ancestral(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_sampler: Callable | None = None,  # (rng, shape, s, s_next) -> noise
    image_to_noise: bool = False,
    callback=None,  # accepted for API parity; ignored under jit
) -> jnp.ndarray:
    """``k_diffusion_euler.py:10-48``."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    sig, sig_next = _sigma_pairs(sigmas)

    def step(carry, inputs):
        x, rng = carry
        sigma, sigma_next = inputs
        sigma_cond = sigma_next if image_to_noise else sigma
        denoised, _ = model(
            x, sigma * s_in, sigma_cond=sigma_cond * s_in, **extra_args
        )
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        d = to_d(x, sigma, denoised)
        x = x + d * (sigma_down - sigma)
        rng, sub = jax.random.split(rng)
        if noise_sampler is not None:
            noise = noise_sampler(sub, x.shape, sigma, sigma_next)
        else:
            noise = jax.random.normal(sub, x.shape, x.dtype)
        # sigma_up == 0 at the final step, so unconditional add matches the
        # reference's `if sigmas[i+1] > 0` gate
        x = x + noise * (s_noise * sigma_up)
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), (sig, sig_next))
    return x


def sample_euler_ancestral_cfgpp(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,
    callback=None,
) -> jnp.ndarray:
    """CFG++ Euler-ancestral (``k_diffusion_euler.py:53-106``): the Euler
    extrapolation uses the *uncond* denoised as the anchor."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    sig, sig_next = _sigma_pairs(sigmas)

    def step(carry, inputs):
        x, rng = carry
        sigma, sigma_next = inputs
        sigma_cond = sigma_next if image_to_noise else sigma
        cfg_denoised, uncond_denoised = model(
            x, sigma * s_in, sigma_cond=sigma_cond * s_in, **extra_args
        )
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        if image_to_noise:
            d = to_d(x, sigma, cfg_denoised)
            x = uncond_denoised + d * sigma_down
        else:
            d = to_d(x, sigma, uncond_denoised)
            x = cfg_denoised + d * sigma_down
        rng, sub = jax.random.split(rng)
        if noise_sampler is not None:
            noise = noise_sampler(sub, x.shape, sigma, sigma_next)
        else:
            noise = jax.random.normal(sub, x.shape, x.dtype)
        x = x + noise * (s_noise * sigma_up)
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), (sig, sig_next))
    return x
