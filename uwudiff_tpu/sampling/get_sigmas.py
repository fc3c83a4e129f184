"""Inference sigma ladders for rectified-flow sampling.

Behavioral parity with the reference RF schedules
(``duwu/sampling/get_sigmas.py:6-41``), re-derived from the rectified-flow
time<->sigma bijection ``t = sigma / (1 + sigma)`` rather than transcribed:
each schedule is a warp of a uniform grid on the *time* axis, mapped back to
sigma space and flipped to descending order. Everything runs host-side in
numpy; the resulting ladder is baked into the jitted sampler as a constant.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

__all__ = [
    "get_sigmas_for_rf",
    "uniform_time",
    "sigmoid_time",
    "sigmoid_time_scale",
    "shift_time",
    "dynamic_shift_time",
    "mu_for_image_seq_len",
    "karras_sigmas",
    "exponential_sigmas",
    "polyexponential_sigmas",
    "beta_sigmas",
    "ays_sigmas",
]

# The RF forward process x_t = (1 - t) x0 + t n identifies t with the
# EDM-style sigma via sigma = t / (1 - t); its inverse is t = sigma / (1 + sigma).


def _sigma_to_time(sigma):
    return sigma / (1.0 + sigma)


def _time_to_sigma(time):
    return time / (1.0 - time)


def _expit(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _logit(p: float) -> float:
    return float(np.log(p) - np.log1p(-p))


def get_sigmas_for_rf(
    num_steps: int,
    max_sigma: float,
    min_sigma: float = 0.0,
    time_disc_func: Callable | None = None,
) -> np.ndarray:
    """Descending ladder of ``num_steps + 1`` sigmas for RF sampling.

    ``time_disc_func(min_time, max_time, num_steps)`` produces an ascending
    grid of ``num_steps + 1`` times in [0, 1); the ladder is that grid mapped
    through ``t -> t / (1 - t)`` and reversed so sampling walks high->low noise.
    """
    disc = uniform_time if time_disc_func is None else time_disc_func
    times = disc(_sigma_to_time(min_sigma), _sigma_to_time(max_sigma), num_steps)
    return _time_to_sigma(np.asarray(times)[::-1]).copy()


def uniform_time(min_time: float, max_time: float, num_steps: int) -> np.ndarray:
    """Evenly spaced times — the plain RF discretization."""
    return np.linspace(min_time, max_time, num_steps + 1)


def sigmoid_time(
    min_time: float, max_time: float, num_steps: int, rho: float = 10
) -> np.ndarray:
    """Times uniform in (1/rho)-scaled logit space: steps cluster near the
    extremes of [0, 1]. ``min_time`` is floored at 1e-5 so the logit is finite,
    and the first grid point is pinned back to that floor exactly."""
    floor = max(min_time, 1e-5)
    grid = np.linspace(_logit(floor) / rho, _logit(max_time) / rho, num_steps + 1)
    times = _expit(rho * grid)
    times[0] = floor
    return times


def sigmoid_time_scale(
    min_time: float, max_time: float, num_steps: int, rho: float = 10
) -> np.ndarray:
    """An S-shaped ramp: a sigmoid evaluated over a unit window centred at 0,
    renormalized to [0, 1] and affinely mapped onto [min_time, max_time].
    Unlike :func:`sigmoid_time` the endpoints are hit exactly and ``rho`` only
    shapes the interior curvature."""
    ramp = _expit(rho * np.linspace(-0.5, 0.5, num_steps + 1))
    ramp = (ramp - ramp[0]) / (ramp[-1] - ramp[0])
    return min_time + (max_time - min_time) * ramp


def _warped_ramp(
    min_time: float, max_time: float, num_steps: int, warp
) -> np.ndarray:
    """A uniform unit ramp passed through ``warp`` (fixing 0 and 1),
    mapped affinely onto [min_time, max_time].  Warping the *normalized*
    grid keeps the endpoints pinned to the schedule's trained time range
    — on (0, 1) this is exactly the published rule, and bounded
    schedules (e.g. the SDXL table's t_max ~= 0.936) never get asked for
    sigmas beyond their trained maximum."""
    u = warp(np.linspace(0.0, 1.0, num_steps + 1))
    return min_time + (max_time - min_time) * u


def shift_time(
    min_time: float, max_time: float, num_steps: int, shift: float = 3.0
) -> np.ndarray:
    """SD3 static timestep shift (Esser et al. 2024, eq. 23): the
    uniform grid warped by ``u' = shift*u / (1 + (shift-1)*u)`` —
    ``shift > 1`` pushes sampling time toward the high-noise end, where
    large-resolution rectified-flow models need more steps.
    ``shift=3.0`` is the published SD3-medium inference default;
    ``shift=1`` reduces to :func:`uniform_time` exactly."""
    return _warped_ramp(
        min_time,
        max_time,
        num_steps,
        lambda u: shift * u / (1.0 + (shift - 1.0) * u),
    )


def dynamic_shift_time(
    min_time: float, max_time: float, num_steps: int, mu: float = 1.0
) -> np.ndarray:
    """Resolution-dependent ("dynamic") timestep shift: the exponential
    form ``u' = e^mu / (e^mu + (1/u - 1))`` used by SD3.5/Flux-class RF
    samplers, with ``mu`` from :func:`mu_for_image_seq_len`.  At
    ``mu = ln(shift)`` this equals :func:`shift_time`'s Moebius warp, so
    the static rule is the fixed-resolution special case."""

    def warp(u: np.ndarray) -> np.ndarray:
        out = np.zeros_like(u)
        nz = u > 0.0
        out[nz] = np.exp(mu) / (np.exp(mu) + (1.0 / u[nz] - 1.0))
        return out

    return _warped_ramp(min_time, max_time, num_steps, warp)


def mu_for_image_seq_len(
    seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Linear interpolation of the dynamic-shift exponent ``mu`` in the
    image token count (latent patches), anchored at the published
    (256 tokens, 0.5) -> (4096 tokens, 1.15) endpoints: longer image
    sequences get a larger high-noise shift."""
    slope = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    return float(base_shift + slope * (seq_len - base_seq_len))


def karras_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> np.ndarray:
    """Karras et al. 2022 sampling grid: sigma_i^(1/rho) linear between
    the endpoints, descending, terminal 0 appended — the canonical
    schedule for EDM-trained models (pairs with ``EDMDenoiser``)."""
    ramp = np.linspace(0, 1, num_steps)
    inv_rho_min = sigma_min ** (1 / rho)
    inv_rho_max = sigma_max ** (1 / rho)
    sigmas = (inv_rho_max + ramp * (inv_rho_min - inv_rho_max)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def exponential_sigmas(
    num_steps: int, sigma_min: float = 0.002, sigma_max: float = 80.0
) -> np.ndarray:
    """Log-linear (k-diffusion ``get_sigmas_exponential``) grid:
    ``num_steps`` sigmas evenly spaced in log-sigma, descending,
    terminal 0 appended."""
    sigmas = np.exp(
        np.linspace(np.log(sigma_max), np.log(sigma_min), num_steps)
    )
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def polyexponential_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 1.0,
) -> np.ndarray:
    """Polynomial-in-log-sigma (k-diffusion ``get_sigmas_
    polyexponential``): the unit ramp raised to ``rho`` before the
    log-space interpolation — ``rho > 1`` spends more steps at low
    noise, ``rho = 1`` is :func:`exponential_sigmas` exactly."""
    ramp = np.linspace(1.0, 0.0, num_steps) ** rho
    sigmas = np.exp(
        ramp * (np.log(sigma_max) - np.log(sigma_min)) + np.log(sigma_min)
    )
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def beta_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    alpha: float = 0.6,
    beta: float = 0.6,
    schedule=None,
) -> np.ndarray:
    """Beta-distribution timestep schedule ("Beta Sampling is All You
    Need", Lee et al. 2024; the ComfyUI ``beta`` scheduler): timestep
    fractions are Beta(alpha, beta) quantiles of a uniform grid, which
    clusters steps at BOTH ends of the noise range.  With ``schedule``
    (a ``NoiseSchedule``) the fractions index its discrete trained
    sigma table exactly like the community implementation; without one
    they interpolate log-linearly between ``sigma_min``/``sigma_max``.
    Descending, terminal 0 appended."""
    from scipy.stats import beta as _beta_dist

    ts = 1.0 - np.linspace(0.0, 1.0, num_steps, endpoint=False)
    frac = _beta_dist.ppf(ts, alpha, beta)
    if schedule is not None:
        n = int(schedule.num_train_timesteps)
        idx = np.rint(frac * (n - 1)).astype(np.int64)
        table = np.asarray(schedule.sigmas)  # ascending, t=0..N-1
        sigmas = table[idx]
    else:
        sigmas = np.exp(
            frac * (np.log(sigma_max) - np.log(sigma_min))
            + np.log(sigma_min)
        )
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


# Align Your Steps (Sabour et al. 2024, NVIDIA) published 10-step
# optimized ladders. Other step counts follow the community rule:
# log-linear interpolation of the table over a unit ramp.
_AYS_TABLES = {
    "sd15": [
        14.615, 6.475, 3.861, 2.697, 1.886, 1.396, 0.963, 0.652,
        0.399, 0.152, 0.029,
    ],
    "sdxl": [
        14.615, 6.315, 3.771, 2.181, 1.342, 0.862, 0.555, 0.380,
        0.234, 0.113, 0.029,
    ],
}


def ays_sigmas(num_steps: int = 10, model: str = "sdxl") -> np.ndarray:
    """Align-Your-Steps ladder: the published KL-optimized 10-step
    table for ``model`` in {"sd15", "sdxl"}, log-linearly resampled to
    ``num_steps`` when it differs, descending, terminal 0 appended."""
    table = np.asarray(_AYS_TABLES[model], np.float64)
    if num_steps + 1 != len(table):
        xp = np.linspace(0.0, 1.0, len(table))
        xq = np.linspace(0.0, 1.0, num_steps + 1)
        table = np.exp(np.interp(xq, xp, np.log(table)))
    return np.concatenate([table, [0.0]]).astype(np.float32)
