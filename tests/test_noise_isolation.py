"""Per-sample seed isolation (sampling/noise.py) — round-5 advisor
fixes pinned:

- every built-in stochastic sampler accepts ``noise_sampler`` (2m_sde
  and the churn samplers were running off a hardcoded batch rng);
- interval keying uses BOTH endpoints, so two draws sharing a left
  edge (dpmpp_sde's (s, s_mid) / (s, s_next)) decorrelate;
- ``expand_seeds`` rejects an over-long explicit seed sequence instead
  of silently truncating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.diffusion import NoiseSchedule
from uwudiff_tpu.sampling import (
    sample_dpm2,
    sample_dpmpp_2m_sde,
    sample_heun,
)
from uwudiff_tpu.sampling.noise import (
    batch_fallback_rng,
    expand_seeds,
    make_per_sample_noise_sampler,
    per_sample_init_noise,
    per_sample_keys,
    supports_noise_sampler,
)


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.sdxl()


def _model(x, sigma, sigma_cond=None):
    d = 0.9 * x - 0.1
    return d, d


# ---------------------------------------------------------------- seeds


def test_expand_seeds_scalar_and_pad():
    np.testing.assert_array_equal(expand_seeds(5, 3), [5, 6, 7])
    np.testing.assert_array_equal(expand_seeds([5, 9], 4), [5, 9, 9, 9])


def test_expand_seeds_rejects_overlong_sequence():
    with pytest.raises(ValueError, match="4 explicit seeds for 2"):
        expand_seeds([1, 2, 3, 4], 2)
    with pytest.raises(ValueError):
        expand_seeds([], 2)


def test_builtin_stochastic_samplers_support_noise_sampler():
    from uwudiff_tpu.sampling import (
        sample_dpm2_cfgpp,
        sample_dpmpp_2s_ancestral,
        sample_dpmpp_3m_sde,
        sample_dpmpp_sde,
        sample_euler_ancestral,
    )

    for s in (
        sample_euler_ancestral,
        sample_dpm2,
        sample_dpm2_cfgpp,
        sample_heun,
        sample_dpmpp_2m_sde,
        sample_dpmpp_2s_ancestral,
        sample_dpmpp_sde,
        sample_dpmpp_3m_sde,
    ):
        assert supports_noise_sampler(s), s.__name__


# ------------------------------------------------- interval decorrelation


def test_noise_keyed_by_both_interval_endpoints():
    keys = per_sample_keys(expand_seeds(0, 2))
    ns = make_per_sample_noise_sampler(keys)
    shape = (2, 4, 4, 1)
    s = jnp.float32(1.0)
    full = np.asarray(ns(None, shape, s, jnp.float32(0.5)))
    mid = np.asarray(ns(None, shape, s, jnp.float32(0.75)))
    again = np.asarray(ns(None, shape, s, jnp.float32(0.5)))
    # same interval -> same draw; same left edge, different right edge
    # -> independent draw (the advisor's dpmpp_sde substep correlation)
    np.testing.assert_array_equal(full, again)
    assert np.abs(full - mid).max() > 1e-3


def test_batch_fallback_rng_is_seed_derived():
    k1 = batch_fallback_rng(per_sample_keys(expand_seeds(1, 2)))
    k1b = batch_fallback_rng(per_sample_keys(expand_seeds(1, 2)))
    k2 = batch_fallback_rng(per_sample_keys(expand_seeds(2, 2)))
    assert np.array_equal(
        jax.random.key_data(k1), jax.random.key_data(k1b)
    )
    assert not np.array_equal(
        jax.random.key_data(k1), jax.random.key_data(k2)
    )


# ------------------------------------------------------- lane isolation


def _run_isolated(sampler, sched, seeds, **kw):
    """Run ``sampler`` with per-sample init + step noise for ``seeds``."""
    sigmas = sched.sample_sigmas_descending(6)
    keys = per_sample_keys(expand_seeds(seeds, len(seeds)))
    x = per_sample_init_noise(keys, (4, 4, 1)) * jnp.sqrt(
        1 + sigmas[0] ** 2
    )
    return np.asarray(
        sampler(
            _model,
            x,
            sigmas,
            rng=batch_fallback_rng(keys),
            noise_sampler=make_per_sample_noise_sampler(keys),
            **kw,
        )
    )


@pytest.mark.parametrize(
    "sampler,kw",
    [
        (sample_dpmpp_2m_sde, {"eta": 1.0}),
        (sample_dpm2, {"s_churn": 4.0}),
        (sample_heun, {"s_churn": 4.0}),
    ],
    ids=["dpmpp_2m_sde", "dpm2_churn", "heun_churn"],
)
def test_lane_isolation_across_batch_composition(sched, sampler, kw):
    """A lane's output depends only on its own seed — identical whether
    it runs solo, first in a pair, or last in a pair (the serving
    batching contract the round-4 advisor found broken for these
    samplers)."""
    solo = _run_isolated(sampler, sched, [7], **kw)
    pair = _run_isolated(sampler, sched, [7, 11], **kw)
    swapped = _run_isolated(sampler, sched, [11, 7], **kw)
    np.testing.assert_allclose(pair[0], solo[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(swapped[1], solo[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pair[1], swapped[0], rtol=1e-5, atol=1e-6)
    # different seeds genuinely differ
    assert np.abs(pair[0] - pair[1]).max() > 1e-4


def test_churn_noise_actually_stochastic(sched):
    """s_churn>0 draws reach the trajectory (different seeds diverge
    BEFORE the terminal step; dpm2's oracle-model output still lands on
    x0 so compare heun, whose churn perturbs the path)."""
    a = _run_isolated(sample_heun, sched, [1], s_churn=4.0)
    b = _run_isolated(sample_heun, sched, [2], s_churn=4.0)
    assert np.abs(a - b).max() > 1e-4


def test_2m_sde_seed_governs_output(sched):
    a = _run_isolated(sample_dpmpp_2m_sde, sched, [1], eta=1.0)
    a2 = _run_isolated(sample_dpmpp_2m_sde, sched, [1], eta=1.0)
    b = _run_isolated(sample_dpmpp_2m_sde, sched, [2], eta=1.0)
    np.testing.assert_array_equal(a, a2)
    assert np.abs(a - b).max() > 1e-4
