"""UniPC sampler (Zhao et al. 2023) as a jit-compiled ``lax.scan``.

Beyond the reference's sampler set: a unified predictor-corrector
multistep solver — ONE model call per step, where each call doubles as
(a) the corrector input for the previous step (UniC raises its
effective order by one) and (b) the predictor base for the next (UniP).
This is the order-2 ``bh2`` variant (B(h) = expm1(h)), the practical
default: UniP-2 with rho = 1/2 is algebraically identical to
DPM-Solver++(2M) (verified against ``sampling/dpmpp.py`` in tests), so
all improvement over 2M comes from the corrector.

Convention matches the rest of the family (k-diffusion space,
``x = x0 + sigma * eps``, lambda = -log sigma, data prediction):

    predictor (to sigma_next, h = lambda_next - lambda_cur):
        x_next = (s_n/s_c) x - expm1(-h) m0 - expm1(-h) * 1/2 * D1
        D1 = (m_prev - m0) / rk,   rk = (lambda_prev - lambda_cur)/h
    corrector (applied on arrival at sigma_cur using the NEW eval m0,
    which was taken at the *uncorrected* x — one call per step):
        solve [[1, 1], [rk_c, 1]] rhos = [b1, b2]   (order 2)
        x_cur = (s_c/s_l) x_last - phi1 m_last
                - B_h (rhos[0] * D1s + rhos[1] * (m0 - m_last))
    with b1 = (phi1/hh - 1)/B_h, b2 = ((phi1/hh - 1)/hh - 1/2) * 2/B_h,
    hh = -h_c, phi1 = B_h = expm1(hh).

First step: order-1 predictor, no corrector. Second step: order-1
corrector (rho = 1/2 on the new difference). Final step (sigma -> 0):
order-1 predictor (the multistep difference quotient diverges as
h -> inf), matching diffusers' ``lower_order_final`` behavior.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["sample_unipc"]


def _lam(sigma):
    return -jnp.log(jnp.maximum(sigma, 1e-20))


def sample_unipc(
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
    n = sig.shape[0]
    idx = jnp.arange(n)
    is_first = idx == 0
    is_second = idx == 1

    def step(carry, inputs):
        # x: predictor output now sitting at sigma_cur (uncorrected)
        # x_last/m_last/lam_last: state at the previous grid point
        # m_last2/lam_last2: one older (for the order-2 corrector)
        x, x_last, m_last, m_last2, lam_last, lam_last2 = carry
        sigma, sigma_next, first, second = inputs
        lam_cur = _lam(sigma)

        m0, _u = model(x, sigma * s_in, **extra_args)

        # ---- UniC: correct the arrival at sigma_cur (skip at step 0)
        h_c = jnp.where(first, 1.0, lam_cur - lam_last)
        hh_c = -h_c
        phi1_c = jnp.expm1(hh_c)
        b_h_c = phi1_c  # bh2
        b1 = (phi1_c / hh_c - 1.0) / b_h_c
        b2 = ((phi1_c / hh_c - 1.0) / hh_c - 0.5) * 2.0 / b_h_c
        d1_t = m0 - m_last
        # order-2 corrector terms (valid from step 2 on)
        rk_c = jnp.where(first | second, -1.0, (lam_last2 - lam_last) / h_c)
        d1s_c = (m_last2 - m_last) / rk_c
        rho0 = (b1 - b2) / (1.0 - rk_c)
        rho1 = b1 - rho0
        corr2 = rho0 * d1s_c + rho1 * d1_t
        corr1 = 0.5 * d1_t  # order-1 corrector (step 1)
        corr = jnp.where(second, corr1, corr2)
        x_corr = (
            (sigma / jnp.exp(-lam_last)) * x_last
            - phi1_c * m_last
            - b_h_c * corr
        )
        x_cur = jnp.where(first, x, x_corr)

        # ---- UniP: predict sigma_cur -> sigma_next
        lam_next = _lam(sigma_next)
        h = lam_next - lam_cur
        phi1 = jnp.expm1(-h)
        first_order = first | (sigma_next == 0)
        rk = jnp.where(first_order, -1.0, (lam_last - lam_cur) / h)
        d1s = (m_last - m0) / rk
        x1 = (sigma_next / sigma) * x_cur - phi1 * m0
        x2 = x1 - phi1 * 0.5 * d1s
        x_next = jnp.where(first_order, x1, x2)

        carry = (x_next, x_cur, m0, m_last, lam_cur, lam_last)
        return carry, None

    zeros = jnp.zeros_like(x)
    lam0 = _lam(sig[0])
    carry = (x, zeros, zeros, zeros, lam0, lam0)
    (x, *_), _ = jax.lax.scan(
        step, carry, (sig, sig_next, is_first, is_second)
    )
    return x
