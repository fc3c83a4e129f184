"""EDM (Karras 2022) training + sampling: preconditioning identities,
loss oracle, trainer integration, denoiser/sampler composition."""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.diffusion import EDMLoss
from uwudiff_tpu.sampling import (
    EDMDenoiser,
    karras_sigmas,
    sample_euler_ancestral,
)


def test_scaling_identities():
    loss = EDMLoss(sigma_data=0.5)
    sig = jnp.asarray([0.01, 0.5, 5.0, 80.0])
    c_skip, c_out, c_in, c_noise = loss.scalings(sig)
    # c_skip^2 + (c_out/sd)^2 * sd^2 ... the defining identities:
    np.testing.assert_allclose(
        np.asarray(c_skip), 0.25 / (np.asarray(sig) ** 2 + 0.25), rtol=1e-6
    )
    # at sigma == sigma_data: c_skip = 1/2, c_in = 1/(sd*sqrt(2))
    np.testing.assert_allclose(float(c_skip[1]), 0.5, rtol=1e-6)
    # lambda * c_out^2 == 1 exactly (unit effective weight)
    lam = (sig**2 + 0.25) / (sig * 0.5) ** 2
    np.testing.assert_allclose(np.asarray(lam * c_out**2), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c_noise), np.log(np.asarray(sig)) / 4, rtol=1e-6
    )


def test_loss_oracle_zero_model():
    """With F == 0: D = c_skip * x_noisy; per-sample loss equals the
    hand-computed weighted MSE."""
    loss = EDMLoss(sigma_data=0.5)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 6, 2))

    val, aux = loss(rng, x, lambda z, t: jnp.zeros_like(z))
    rng_t, rng_n = jax.random.split(rng)
    noise = jax.random.normal(rng_n, x.shape, x.dtype)
    sigmas = np.asarray(loss.sample_sigmas(rng_t, 4))
    xn = np.asarray(x) + sigmas[:, None, None, None] * np.asarray(noise)
    c_skip = 0.25 / (sigmas**2 + 0.25)
    lam = (sigmas**2 + 0.25) / (sigmas * 0.5) ** 2
    expect = lam[:, None, None, None] * (
        c_skip[:, None, None, None] * xn - np.asarray(x)
    ) ** 2
    expect = expect.reshape(4, -1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(aux.losses), expect, rtol=1e-5)
    np.testing.assert_allclose(float(val), expect.mean(), rtol=1e-5)
    # timesteps live on the [0, 1000) plot axis
    t = np.asarray(aux.timesteps)
    assert (t >= 0).all() and (t <= 1000).all()


def test_perfect_denoiser_zero_loss():
    """If F returns exactly (x0 - c_skip x_noisy)/c_out the loss is 0."""
    loss = EDMLoss(sigma_data=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 2))
    rng = jax.random.PRNGKey(0)
    rng_t, rng_n = jax.random.split(rng)
    noise = jax.random.normal(rng_n, x.shape, x.dtype)
    sigmas = loss.sample_sigmas(rng_t, 3)
    sig = sigmas[:, None, None, None]
    c_skip, c_out, c_in, _ = loss.scalings(sig)
    xn = x + sig * noise

    def oracle(z, t):
        # z == c_in * xn; recover xn and emit the exact residual
        return (x - c_skip * xn) / c_out

    val, _ = loss(rng, x, oracle)
    assert float(val) < 1e-10


def test_edm_denoiser_sampling_runs():
    """EDMDenoiser(model) through the stock euler-ancestral sampler on
    the Karras grid; a perfect-denoiser model reaches x0 ~ 0 exactly."""
    den = EDMDenoiser(
        model_fn=lambda z, t: -z / 0.5 * 0.0,  # F == 0
        sigma_data=0.5,
    )
    sigmas = jnp.asarray(karras_sigmas(8, 0.01, 10.0))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 2)) * sigmas[0]

    def model(xx, sigma, sigma_cond=None):
        d = den(xx, sigma)
        return d, d

    out = sample_euler_ancestral(model, x, sigmas, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()
    # with F == 0, D -> c_skip x which contracts toward 0 each step
    assert np.abs(np.asarray(out)).mean() < np.abs(np.asarray(x)).mean()


def test_edm_trainer_integration_loss_decreases():
    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.training import DMTrainer

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": te,
            "vae": None,
        },
        loss_config=EDMLoss(sigma_data=0.5),
        lr=1e-3,
        use_warm_up=False,
        seed=0,
    )
    ds = DummyDataset(sample_size=(16, 16, 4), n_samples=4)
    ds.set_tokenizers(trainer.tokenizers)
    batch = ds.collate([ds[i] for i in range(2)])
    losses = []
    for _ in range(25):
        metrics, aux = trainer.train_step(batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    # sample_weight composes (DreamBooth x EDM)
    batch["loss_weight"] = np.asarray([1.0, 0.0], np.float32)
    m0, aux0 = trainer.validation_step(batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(m0), float(np.asarray(aux0.losses)[0]) / 2, rtol=1e-5
    )


def test_karras_grid():
    s = karras_sigmas(12, 0.002, 80.0, rho=7.0)
    assert s[0] == np.float32(80.0)
    np.testing.assert_allclose(s[-2], 0.002, rtol=1e-5)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)
