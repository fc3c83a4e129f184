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
    "karras_sigmas",
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
