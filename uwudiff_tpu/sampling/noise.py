"""Per-sample seed isolation for batched sampling.

Production serving batches unrelated requests into one compiled
program (``serving.BatchingServer``). For a request's image to be
reproducible, its noise trajectory must depend ONLY on its own seed —
never on which other requests happened to share the batch, or on its
position inside it. These helpers derive every random draw (init
latent + each ancestral/SDE step's noise) from a per-sample PRNG key:

- sample ``j``'s init noise = ``normal(fold_in(PRNGKey(seed_j), 0))``
- step noise at sigma ``s``  = ``normal(fold_in(fold_in(PRNGKey(
  seed_j), 1), bitcast(s)))`` — keyed by the sigma VALUE, so the draw
  is a pure function of (seed, sigma ladder), not of step order or
  batch shape. Re-querying the same interval returns the same noise,
  matching the deterministic-per-interval contract of k-diffusion's
  BrownianTreeNoiseSampler (the reference samplers' noise source,
  ``k_diffusion_euler.py:10-48`` usage).

``diffusion_sampling`` (sampling/sampling.py) and the zero-retrace
serving path (serving.py) both build their randomness from here, which
is what keeps the two paths numerically identical. A scalar user seed
``n`` with ``k`` samples expands to per-sample seeds ``[n, n+1, ...,
n+k-1]`` (``expand_seeds``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "expand_seeds",
    "per_sample_keys",
    "per_sample_init_noise",
    "make_per_sample_noise_sampler",
    "supports_noise_sampler",
]


def expand_seeds(seed, num_samples: int) -> np.ndarray:
    """Host-side: scalar seed -> ``[seed, seed+1, ...]``; a sequence is
    validated/truncated-padded to ``num_samples`` (pad repeats the last
    seed — padded lanes are discarded by the caller)."""
    if np.ndim(seed) == 0:
        return (np.int64(seed) + np.arange(num_samples)).astype(np.uint32)
    seeds = list(np.asarray(seed).reshape(-1))
    if not seeds:
        raise ValueError("empty seed sequence")
    seeds = seeds[:num_samples] + [seeds[-1]] * (num_samples - len(seeds))
    return np.asarray(seeds, np.int64).astype(np.uint32)


def per_sample_keys(seeds: jnp.ndarray) -> jnp.ndarray:
    """uint32[B] seeds -> stacked PRNG keys (traceable)."""
    return jax.vmap(jax.random.PRNGKey)(seeds)


def per_sample_init_noise(
    keys: jnp.ndarray, sample_shape: tuple, dtype=jnp.float32
) -> jnp.ndarray:
    """[B, *sample_shape] init noise; lane j depends on keys[j] only."""
    return jax.vmap(
        lambda k: jax.random.normal(
            jax.random.fold_in(k, 0), sample_shape, dtype
        )
    )(keys)


def make_per_sample_noise_sampler(keys: jnp.ndarray):
    """A sampler-API ``noise_sampler(rng, shape, sigma, sigma_next)``
    that ignores the batch-level ``rng`` chain and draws lane ``j``'s
    noise from ``keys[j]`` keyed by the sigma value."""

    def noise_sampler(rng, shape, sigma, sigma_next):
        del rng, sigma_next
        bits = jax.lax.bitcast_convert_type(
            jnp.asarray(sigma, jnp.float32), jnp.uint32
        )

        def one(k):
            return jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(k, 1), bits),
                shape[1:],
                jnp.float32,
            )

        return jax.vmap(one)(keys)

    return noise_sampler


def supports_noise_sampler(sampler) -> bool:
    """Host-side: does this sampler accept the ``noise_sampler`` kwarg?
    (Deterministic samplers — dpm2/heun/dpmpp_2m/unipc — don't draw
    noise, so per-sample init alone makes them seed-isolated.)"""
    import inspect

    try:
        return "noise_sampler" in inspect.signature(sampler).parameters
    except (TypeError, ValueError):
        return False
