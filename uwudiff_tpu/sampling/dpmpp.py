"""DPM-Solver++(2M) as a jit-compiled ``lax.scan`` loop.

Beyond the reference's sampler set (it ships Euler-ancestral and DPM-2,
``duwu/sampling/k_diffusion_*.py``): DPM++ 2M (Lu et al. 2022,
multistep second-order in log-sigma time) is the de-facto community
default for SD-family checkpoints — ONE model call per step with
second-order accuracy from the previous step's denoised estimate.
Update rule (k-diffusion convention, sigma = exp(-t)):

    h   = t_{i+1} - t_i
    r   = h_{i-1} / h
    D   = (1 + 1/2r) * denoised_i - (1/2r) * denoised_{i-1}
    x   = (sigma_{i+1}/sigma_i) * x - expm1(-h) * D

First step (no history) and final step (sigma -> 0) fall back to the
first-order update (D = denoised), matching k-diffusion exactly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["sample_dpmpp_2m"]


def sample_dpmpp_2m(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,  # unused (deterministic); API parity
    extra_args: dict | None = None,
    image_to_noise: bool = False,  # unused, API parity
    callback=None,
) -> jnp.ndarray:
    extra_args = extra_args or {}
    s_in = jnp.ones((x.shape[0],), x.dtype)
    sig, sig_next = sigmas[:-1], sigmas[1:]
    sig_prev = jnp.concatenate([sigmas[:1], sigmas[:-2]])  # [0] unused
    is_first = jnp.arange(sig.shape[0]) == 0

    def t_of(sigma):  # log-sigma time; guard the sigma=0 endpoint
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def step(carry, inputs):
        x, old_denoised = carry
        sigma_prev, sigma, sigma_next, first = inputs
        denoised, _u = model(x, sigma * s_in, **extra_args)
        t, t_next = t_of(sigma), t_of(sigma_next)
        h = t_next - t
        h_last = t - t_of(sigma_prev)
        use_first_order = first | (sigma_next == 0)
        # first step has h_last = 0; keep r finite under the mask
        r = jnp.where(use_first_order, 1.0, h_last / h)
        d_second = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        d = jnp.where(use_first_order, denoised, d_second)
        x = (sigma_next / sigma) * x - jnp.expm1(-h) * d
        return (x, denoised), None

    carry = (x, jnp.zeros_like(x))
    (x, _), _ = jax.lax.scan(
        step, carry, (sig_prev, sig, sig_next, is_first)
    )
    return x
