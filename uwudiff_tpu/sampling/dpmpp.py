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

from uwudiff_tpu.sampling.wrapper import get_ancestral_step, to_d

__all__ = [
    "sample_dpmpp_2m",
    "sample_dpmpp_2m_sde",
    "sample_dpmpp_2s_ancestral",
    "sample_dpmpp_sde",
    "sample_dpmpp_3m_sde",
]


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


def sample_dpmpp_2m_sde(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    solver_type: str = "midpoint",
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, API parity
    callback=None,
) -> jnp.ndarray:
    """DPM++ 2M SDE (the community's "dpmpp_2m_sde" default): the 2M
    multistep update with an exponentially-decayed SDE noise injection —
    ONE model call per step.  k-diffusion convention (t = -ln sigma):

        h     = t_{i+1} - t_i,   eta_h = eta * h
        x     = (sig_{i+1}/sig_i) e^{-eta_h} x - expm1(-h - eta_h) d_i
              [+ 2nd-order correction from d_{i-1}]
              + sig_{i+1} sqrt(-expm1(-2 eta_h)) s_noise * noise

    ``solver_type``: "midpoint" (default; at ``eta=0`` identical to
    :func:`sample_dpmpp_2m`, tested) or "heun".  ``eta=0`` is the
    deterministic ODE; the terminal sigma=0 step collapses to the
    denoised estimate exactly.
    """
    assert solver_type in ("midpoint", "heun")
    extra_args = extra_args or {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]
    sig_prev = jnp.concatenate([sigmas[:1], sigmas[:-2]])  # [0] unused
    is_first = jnp.arange(n) == 0
    keys = jax.random.split(rng, n)

    def t_of(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def step(carry, inputs):
        x, old_denoised = carry
        sigma_prev, sigma, sigma_next, first, key = inputs
        denoised, _u = model(x, sigma * s_in, **extra_args)
        t, t_next = t_of(sigma), t_of(sigma_next)
        h = t_next - t
        eta_h = eta * h
        x_new = (
            (sigma_next / sigma) * jnp.exp(-eta_h) * x
            - jnp.expm1(-h - eta_h) * denoised
        )
        h_last = t - t_of(sigma_prev)
        r = jnp.where(first, 1.0, h_last / h)
        if solver_type == "midpoint":
            corr = 0.5 * -jnp.expm1(-h - eta_h) / r * (denoised - old_denoised)
        else:  # heun
            corr = (
                (jnp.expm1(-h - eta_h) / (-h - eta_h) + 1.0)
                / r
                * (denoised - old_denoised)
            )
        x_new = x_new + jnp.where(first, 0.0, 1.0) * corr
        if eta:
            noise = (
                noise_sampler(key, x.shape, sigma, sigma_next)
                if noise_sampler is not None
                else jax.random.normal(key, x.shape, x.dtype)
            )
            x_new = x_new + (
                noise
                * sigma_next
                * jnp.sqrt(-jnp.expm1(-2.0 * eta_h))
                * s_noise
            )
        # terminal step: k-diffusion returns the denoised estimate
        x_new = jnp.where(sigma_next == 0.0, denoised, x_new)
        return (x_new, denoised), None

    carry = (x, jnp.zeros_like(x))
    (x, _), _ = jax.lax.scan(
        step, carry, (sig_prev, sig, sig_next, is_first, keys)
    )
    return x


def sample_dpmpp_2s_ancestral(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, API parity
    callback=None,
) -> jnp.ndarray:
    """DPM++ 2S ancestral (A1111 "DPM++ 2S a"): singlestep second-order
    solve to the ancestral ``sigma_down``, then noise back up by
    ``sigma_up`` — TWO model calls per step.  In log-sigma time
    (t = -ln sigma, r = 1/2):

        h   = t(sigma_down) - t(sigma)
        x_m = (sigma_mid/sigma) x - expm1(-h/2) * denoised       (midpoint)
        x   = (sigma_down/sigma) x - expm1(-h) * model(x_m, sigma_mid)
        x  += noise * s_noise * sigma_up

    The ``sigma_down == 0`` terminal step falls back to the first-order
    Euler update, matching k-diffusion's gate exactly (selected
    branchlessly inside the scan).
    """
    extra_args = extra_args or {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]
    keys = jax.random.split(rng, n)

    def t_of(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def step(carry, inputs):
        x = carry
        sigma, sigma_next, key = inputs
        denoised, _u = model(x, sigma * s_in, **extra_args)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)

        # first-order branch (terminal: sigma_down == 0)
        x_euler = x + to_d(x, sigma, denoised) * (sigma_down - sigma)

        # 2S branch: midpoint at r = 1/2 in log-sigma time
        t = t_of(sigma)
        h = t_of(sigma_down) - t  # guarded: huge but finite at sigma_down=0
        sigma_mid = jnp.exp(-(t + 0.5 * h))
        x_mid = (sigma_mid / sigma) * x - jnp.expm1(-0.5 * h) * denoised
        denoised_mid, _u = model(x_mid, sigma_mid * s_in, **extra_args)
        x_2s = (sigma_down / sigma) * x - jnp.expm1(-h) * denoised_mid

        x = jnp.where(sigma_down == 0.0, x_euler, x_2s)
        if noise_sampler is not None:
            noise = noise_sampler(key, x.shape, sigma, sigma_next)
        else:
            noise = jax.random.normal(key, x.shape, x.dtype)
        # sigma_up == 0 at the terminal step -> unconditional add is exact
        x = x + noise * (s_noise * sigma_up)
        return x, None

    x, _ = jax.lax.scan(step, x, (sig, sig_next, keys))
    return x


def sample_dpmpp_sde(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    r: float = 1.0 / 2.0,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, API parity
    callback=None,
) -> jnp.ndarray:
    """DPM++ SDE (A1111 "DPM++ SDE"): the singlestep 2S solver with an
    ancestral-style noise split applied at BOTH the internal midpoint and
    the full step — two model calls and two noise draws per step.  Each
    substep targets the deterministic part ``sigma_down`` of its
    ancestral split, then injects ``sigma_up`` noise:

        s        = t + r*h                     (midpoint time)
        sd1, su1 = ancestral(sigma, sigma_mid)
        x_m      = (sd1/sigma) x - expm1(t - t(sd1)) denoised + n1*su1
        sd2, su2 = ancestral(sigma, sigma_next)
        D        = (1-fac) denoised + fac * model(x_m, sigma_mid),
                   fac = 1/(2r)
        x        = (sd2/sigma) x - expm1(t - t(sd2)) D + n2*su2

    Terminal ``sigma_next == 0`` steps return the denoised estimate
    (the k-diffusion Euler branch evaluates to exactly that).  Default
    noise is plain Gaussian (k-diffusion defaults to a Brownian-tree
    sampler, which only changes the noise correlation structure, not
    the per-step law).
    """
    extra_args = extra_args or {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]
    keys = jax.random.split(rng, n)
    fac = 1.0 / (2.0 * r)

    def t_of(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def draw(key, shape, dtype, sigma, sigma_next):
        if noise_sampler is not None:
            return noise_sampler(key, shape, sigma, sigma_next)
        return jax.random.normal(key, shape, dtype)

    def step(carry, inputs):
        x = carry
        sigma, sigma_next, key = inputs
        k1, k2 = jax.random.split(key)
        denoised, _u = model(x, sigma * s_in, **extra_args)

        sigma_next_g = jnp.maximum(sigma_next, 1e-20)
        t = t_of(sigma)
        h = t_of(sigma_next_g) - t
        sigma_mid = jnp.exp(-(t + r * h))

        # substep 1: to the midpoint's ancestral sigma_down, noise by su1
        sd1, su1 = get_ancestral_step(sigma, sigma_mid, eta=eta)
        x_mid = (sd1 / sigma) * x - jnp.expm1(t - t_of(sd1)) * denoised
        x_mid = x_mid + draw(k1, x.shape, x.dtype, sigma, sigma_mid) * (
            s_noise * su1
        )
        denoised_mid, _u = model(x_mid, sigma_mid * s_in, **extra_args)

        # substep 2: full step to sigma_next's ancestral sigma_down
        sd2, su2 = get_ancestral_step(sigma, sigma_next, eta=eta)
        denoised_d = (1.0 - fac) * denoised + fac * denoised_mid
        x_new = (sd2 / sigma) * x - jnp.expm1(t - t_of(sd2)) * denoised_d
        x_new = x_new + draw(k2, x.shape, x.dtype, sigma, sigma_next) * (
            s_noise * su2
        )

        # terminal step: k-diffusion's Euler branch == denoised exactly
        x = jnp.where(sigma_next == 0.0, denoised, x_new)
        return x, None

    x, _ = jax.lax.scan(step, x, (sig, sig_next, keys))
    return x


def sample_dpmpp_3m_sde(
    model: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    rng: jax.Array | None = None,
    extra_args: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_sampler: Callable | None = None,
    image_to_noise: bool = False,  # unused, API parity
    callback=None,
) -> jnp.ndarray:
    """DPM++ 3M SDE (A1111 "DPM++ 3M SDE"): third-order multistep SDE
    solver — ONE model call per step, using the two previous denoised
    estimates as history.  In log-sigma time with h_eta = h*(eta+1):

        x   = e^{-h_eta} x - expm1(-h_eta) denoised
            + phi_2 d1 - phi_3 d2          (3rd order, >=2 history)
        d1_0 = (den - den_1)/r0,  d1_1 = (den_1 - den_2)/r1
        d1   = d1_0 + (d1_0 - d1_1) r0/(r0+r1),  d2 = (d1_0 - d1_1)/(r0+r1)
        phi_2 = expm1(-h_eta)/h_eta + 1,   phi_3 = phi_2/h_eta - 1/2
        x  += noise * sigma_next * sqrt(-expm1(-2 h eta)) * s_noise

    First step is first-order, second step second-order (phi_2 d1_0) —
    the history gates are branchless masks inside the scan.  Terminal
    ``sigma_next == 0`` returns the denoised estimate.
    """
    extra_args = extra_args or {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    s_in = jnp.ones((x.shape[0],), x.dtype)
    n = sigmas.shape[0] - 1
    sig, sig_next = sigmas[:-1], sigmas[1:]
    steps = jnp.arange(n)
    keys = jax.random.split(rng, n)

    def t_of(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def step(carry, inputs):
        x, den_1, den_2, h_1, h_2 = carry
        sigma, sigma_next, i, key = inputs
        denoised, _u = model(x, sigma * s_in, **extra_args)

        sigma_next_g = jnp.maximum(sigma_next, 1e-20)
        h = t_of(sigma_next_g) - t_of(sigma)
        h_eta = h * (eta + 1.0)

        x_new = jnp.exp(-h_eta) * x - jnp.expm1(-h_eta) * denoised

        # history corrections (h_1/h_2 carried as 1.0 until valid; the
        # masks keep the invalid terms out of the update)
        r0 = h_1 / h
        r1 = h_2 / h
        d1_0 = (denoised - den_1) / r0
        d1_1 = (den_1 - den_2) / r1
        d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        phi_2 = jnp.expm1(-h_eta) / h_eta + 1.0
        phi_3 = phi_2 / h_eta - 0.5
        corr3 = phi_2 * d1 - phi_3 * d2
        corr2 = phi_2 * d1_0
        x_new = x_new + jnp.where(
            i >= 2, corr3, jnp.where(i == 1, corr2, jnp.zeros_like(corr2))
        )

        if eta:
            noise = (
                noise_sampler(key, x.shape, sigma, sigma_next)
                if noise_sampler is not None
                else jax.random.normal(key, x.shape, x.dtype)
            )
            x_new = x_new + noise * sigma_next * jnp.sqrt(
                jnp.maximum(-jnp.expm1(-2.0 * h * eta), 0.0)
            ) * s_noise

        x_new = jnp.where(sigma_next == 0.0, denoised, x_new)
        return (x_new, denoised, den_1, h, h_1), None

    carry = (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones(()), jnp.ones(()))
    (x, *_), _ = jax.lax.scan(step, carry, (sig, sig_next, steps, keys))
    return x
