"""DPM-Solver-2 samplers as jit-compiled ``lax.scan`` loops.

Parity with ``duwu/sampling/k_diffusion_dpm2.py``: log-space sigma
midpoint, Karras churn (s_churn/s_tmin/s_tmax/s_noise), the
``single_call`` d-caching optimization (reuse the previous step's
second-stage derivative instead of a fresh first-stage model call), and
the CFG++ variant.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from uwudiff_tpu.sampling.wrapper import to_d

__all__ = ["sample_dpm2", "sample_dpm2_cfgpp"]


def _churn(sigma, n_steps, s_churn, s_tmin, s_tmax):
    gamma = jnp.where(
        (s_tmin <= sigma) & (sigma <= s_tmax),
        jnp.minimum(s_churn / n_steps, 2**0.5 - 1),
        0.0,
    )
    return sigma * (gamma + 1)


def sample_dpm2(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    single_call: bool = False,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, parity (``dpm2.py:21``)
) -> jnp.ndarray:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n_steps = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]

    def first_stage_d(x, sigma_hat, d_cached, have_cache):
        def fresh(_):
            denoised, _u = model(x, sigma_hat * s_in, **extra_args)
            return to_d(x, sigma_hat, denoised)

        if not single_call:
            return fresh(None)
        return jax.lax.cond(
            have_cache, lambda _: d_cached, fresh, operand=None
        )

    def step(carry, inputs):
        x, rng, d_cached, have_cache = carry
        sigma, sigma_next = inputs
        rng, sub = jax.random.split(rng)
        sigma_hat = _churn(sigma, n_steps, s_churn, s_tmin, s_tmax)
        # churn noise over the (sigma, sigma_hat) "up" interval — keyed
        # per-sample when a noise_sampler is provided (seed isolation)
        eps = (
            noise_sampler(sub, x.shape, sigma, sigma_hat)
            if noise_sampler is not None
            else jax.random.normal(sub, x.shape, x.dtype)
        ) * s_noise
        x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))

        def euler_branch(_):
            denoised, _u = model(x, sigma_hat * s_in, **extra_args)
            d = to_d(x, sigma_hat, denoised)
            return x + d * (sigma_next - sigma_hat), d_cached, have_cache

        def dpm2_branch(_):
            d = first_stage_d(x, sigma_hat, d_cached, have_cache)
            sigma_mid = jnp.exp(
                (jnp.log(sigma_hat) + jnp.log(jnp.maximum(sigma_next, 1e-20)))
                / 2
            )
            dt_1 = sigma_mid - sigma_hat
            dt_2 = sigma_next - sigma_hat
            x_2 = x + d * dt_1
            denoised_2, _u = model(x_2, sigma_mid * s_in, **extra_args)
            d_2 = to_d(x_2, sigma_mid, denoised_2)
            return x + d_2 * dt_2, d_2, jnp.asarray(True)

        x, d_cached, have_cache = jax.lax.cond(
            sigma_next == 0, euler_branch, dpm2_branch, operand=None
        )
        return (x, rng, d_cached, have_cache), None

    carry = (x, rng, jnp.zeros_like(x), jnp.asarray(False))
    (x, _, _, _), _ = jax.lax.scan(step, carry, (sig, sig_next))
    return x


def sample_dpm2_cfgpp(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    single_call: bool = False,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, parity
) -> jnp.ndarray:
    """``k_diffusion_dpm2.py:62-111`` — anchors on the CFG output, steps
    with the uncond derivative."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n_steps = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]

    def step(carry, inputs):
        x, rng, cfg_cached, d_cached, have_cache = carry
        sigma, sigma_next = inputs
        rng, sub = jax.random.split(rng)
        sigma_hat = _churn(sigma, n_steps, s_churn, s_tmin, s_tmax)
        eps = (
            noise_sampler(sub, x.shape, sigma, sigma_hat)
            if noise_sampler is not None
            else jax.random.normal(sub, x.shape, x.dtype)
        ) * s_noise
        x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))

        def euler_branch(_):
            cfg_denoised, _u = model(x, sigma_hat * s_in, **extra_args)
            return cfg_denoised, cfg_cached, d_cached, have_cache

        def dpm2_branch(_):
            def fresh(_):
                cfg_denoised, uncond_denoised = model(x, sigma_hat * s_in, **extra_args)
                return cfg_denoised, to_d(x, sigma_hat, uncond_denoised)

            if single_call:
                cfg_denoised, uncond_d = jax.lax.cond(
                    have_cache,
                    lambda _: (cfg_cached, d_cached),
                    fresh,
                    operand=None,
                )
            else:
                cfg_denoised, uncond_d = fresh(None)
            sigma_mid = jnp.exp(
                (jnp.log(sigma_hat) + jnp.log(jnp.maximum(sigma_next, 1e-20)))
                / 2
            )
            x_2 = cfg_denoised + uncond_d * sigma_mid
            cfg_denoised_2, uncond_denoised_2 = model(x_2, sigma_mid * s_in, **extra_args)
            uncond_d_2 = to_d(x_2, sigma_mid, uncond_denoised_2)
            new_x = cfg_denoised_2 + uncond_d_2 * sigma_next
            return new_x, cfg_denoised_2, uncond_d_2, jnp.asarray(True)

        x, cfg_cached, d_cached, have_cache = jax.lax.cond(
            sigma_next == 0, euler_branch, dpm2_branch, operand=None
        )
        return (x, rng, cfg_cached, d_cached, have_cache), None

    carry = (x, rng, jnp.zeros_like(x), jnp.zeros_like(x), jnp.asarray(False))
    (x, _, _, _, _), _ = jax.lax.scan(step, carry, (sig, sig_next))
    return x
