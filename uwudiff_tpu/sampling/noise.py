"""Per-sample seed isolation for batched sampling.

Production serving batches unrelated requests into one compiled
program (``serving.BatchingServer``). For a request's image to be
reproducible, its noise trajectory must depend ONLY on its own seed —
never on which other requests happened to share the batch, or on its
position inside it. These helpers derive every random draw (init
latent + each ancestral/SDE step's noise) from a per-sample PRNG key:

- sample ``j``'s init noise = ``normal(fold_in(PRNGKey(seed_j), 0))``
- step noise over the interval ``(s, s_next)`` = ``normal(fold_in(
  fold_in(fold_in(PRNGKey(seed_j), 1), bitcast(s)), bitcast(s_next)))``
  — keyed by BOTH interval endpoints, so the draw is a pure function
  of (seed, interval), not of step order or batch shape, and samplers
  that draw twice per step over different intervals sharing a left
  edge (``sample_dpmpp_sde``: (s, s_mid) then (s, s_next)) get
  independent noise per interval. Re-querying the same interval
  returns the same noise, matching the deterministic-per-interval
  contract of k-diffusion's BrownianTreeNoiseSampler (the reference
  samplers' noise source, ``k_diffusion_euler.py:10-48`` usage).

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
    "batch_fallback_rng",
    "supports_noise_sampler",
]


def expand_seeds(seed, num_samples: int) -> np.ndarray:
    """Host-side: scalar seed -> ``[seed, seed+1, ...]``; a sequence is
    validated and padded to ``num_samples`` (pad repeats the last seed
    — the server's pad lanes are discarded by the caller). A sequence
    LONGER than ``num_samples`` is a caller mismatch and raises rather
    than silently dropping seeds."""
    if np.ndim(seed) == 0:
        return (np.int64(seed) + np.arange(num_samples)).astype(np.uint32)
    seeds = list(np.asarray(seed).reshape(-1))
    if not seeds:
        raise ValueError("empty seed sequence")
    if len(seeds) > num_samples:
        raise ValueError(
            f"got {len(seeds)} explicit seeds for {num_samples} samples"
        )
    seeds = seeds + [seeds[-1]] * (num_samples - len(seeds))
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
    noise from ``keys[j]`` keyed by BOTH interval endpoints (so two
    draws over different intervals with the same left edge — e.g.
    ``sample_dpmpp_sde``'s (s, s_mid) and (s, s_next) — decorrelate,
    like BrownianTree keying by the interval)."""

    def noise_sampler(rng, shape, sigma, sigma_next):
        del rng
        bits = jax.lax.bitcast_convert_type(
            jnp.asarray(sigma, jnp.float32), jnp.uint32
        )
        bits_next = jax.lax.bitcast_convert_type(
            jnp.asarray(sigma_next, jnp.float32), jnp.uint32
        )

        def one(k):
            k = jax.random.fold_in(jax.random.fold_in(k, 1), bits)
            return jax.random.normal(
                jax.random.fold_in(k, bits_next), shape[1:], jnp.float32
            )

        return jax.vmap(one)(keys)

    return noise_sampler


def batch_fallback_rng(keys: jnp.ndarray) -> jax.Array:
    """Seed-derived batch rng for samplers that draw noise but do NOT
    accept ``noise_sampler`` (user-supplied exotics). The draw is then
    batch-shaped — lanes depend on batch composition — but at least the
    trajectory is a function of the user's seed rather than a hardcoded
    PRNGKey(0). Domain tag 2 keeps it disjoint from init (0) and
    per-step (1) noise."""
    return jax.random.fold_in(keys[0], 2)


def supports_noise_sampler(sampler) -> bool:
    """Host-side: does this sampler accept the ``noise_sampler`` kwarg?
    (Deterministic samplers — dpm2/heun/dpmpp_2m/unipc — don't draw
    noise, so per-sample init alone makes them seed-isolated.)"""
    import inspect

    try:
        return "noise_sampler" in inspect.signature(sampler).parameters
    except (TypeError, ValueError):
        return False
