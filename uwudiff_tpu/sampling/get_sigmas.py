"""Rectified-flow inference sigma schedules (parity with
``duwu/sampling/get_sigmas.py``). Host-side numpy; the resulting array
is baked into the jitted sampler."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

__all__ = [
    "get_sigmas_for_rf",
    "uniform_time",
    "sigmoid_time",
    "sigmoid_time_scale",
]


def get_sigmas_for_rf(
    num_steps: int,
    max_sigma: float,
    min_sigma: float = 0.0,
    time_disc_func: Callable | None = None,
) -> np.ndarray:
    max_time = max_sigma / (1 + max_sigma)
    min_time = min_sigma / (1 + min_sigma)
    time_disc_func = time_disc_func or uniform_time
    time = np.flip(time_disc_func(min_time, max_time, num_steps))
    return time / (1 - time)


def uniform_time(min_time: float, max_time: float, num_steps: int) -> np.ndarray:
    return np.linspace(min_time, max_time, num_steps + 1)


def sigmoid_time(
    min_time: float, max_time: float, num_steps: int, rho: float = 10
) -> np.ndarray:
    min_time = max(min_time, 1e-5)
    min_time_logit = np.log(min_time / (1 - min_time))
    max_time_logit = np.log(max_time / (1 - max_time))
    min_time_rt = min_time_logit / rho + 0.5
    max_time_rt = max_time_logit / rho + 0.5
    time_rt = np.linspace(min_time_rt, max_time_rt, num_steps + 1)
    time = 1 / (1 + np.exp(-rho * (time_rt - 0.5)))
    time[0] = min_time
    return time


def sigmoid_time_scale(
    min_time: float, max_time: float, num_steps: int, rho: float = 10
) -> np.ndarray:
    time_rt = np.linspace(-0.5, 0.5, num_steps + 1)
    time = 1 / (1 + np.exp(-rho * time_rt))
    time = (time - time[0]) / (time[-1] - time[0])
    return time * (max_time - min_time) + min_time
