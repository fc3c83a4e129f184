"""LR schedules with the reference's exact semantics.

The reference composes ``GradualWarmupScheduler(multiplier=1,
total_epoch=warm_up_period, after_scheduler=CosineAnnealingLR(T_max,
eta_min))`` stepped per-batch (``duwu/trainer/trainer.py:52-74``).
These are optax-style ``step -> lr`` callables.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cosine_annealing", "gradual_warmup", "warmup_cosine_schedule"]


def cosine_annealing(base_lr: float, T_max: int, eta_min: float = 0.0):
    """torch ``CosineAnnealingLR``: eta_min + (base-eta_min) *
    (1+cos(pi*t/T_max))/2."""

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        return eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * t / T_max)
        ) / 2

    return schedule


def gradual_warmup(base_lr: float, warm_up_period: int, after=None):
    """GradualWarmupScheduler with multiplier=1: linear 0 -> base_lr over
    ``warm_up_period`` steps, then hand off to ``after`` (shifted so the
    after-schedule starts at 0)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * jnp.minimum(step, warm_up_period) / warm_up_period
        if after is None:
            return jnp.where(step <= warm_up_period, warm, base_lr)
        return jnp.where(
            step <= warm_up_period,
            warm,
            after(step - warm_up_period),
        )

    return schedule


def warmup_cosine_schedule(
    base_lr: float,
    warm_up_period: int = 1000,
    T_max: int = 100_000,
    eta_min: float = 1e-7,
    use_warm_up: bool = True,
):
    """The trainer default: warmup into cosine annealing
    (``trainer.py:32-36,61-66``)."""
    after = cosine_annealing(base_lr, T_max, eta_min)
    if not use_warm_up:
        return after
    return gradual_warmup(base_lr, warm_up_period, after)
