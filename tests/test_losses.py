import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.diffusion import (
    DiffusionLoss,
    NNWeightedRFLoss,
    NoiseSchedule,
    RectifiedFlowLoss,
)


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.sdxl()


def _zero_model(noisy, t, **kw):
    return jnp.zeros_like(noisy)


def test_diffusion_loss_epsilon_zero_model(sched):
    """With a zero-output eps model, loss == mean(noise^2) per sample."""
    loss_obj = DiffusionLoss(schedule=sched)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 4, 8, 8))
    loss, aux = loss_obj(rng, x, _zero_model)
    # target is the sampled noise; pred is 0
    want = np.mean(np.asarray(aux.target) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(aux.losses), want, rtol=1e-5)
    np.testing.assert_allclose(float(loss), want.mean(), rtol=1e-5)


def test_noising_formula(sched):
    loss_obj = DiffusionLoss(schedule=sched)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    sigmas = jnp.array([0.5, 2.0])
    noisy = loss_obj.noise_latents(x, noise, sigmas)
    s = np.asarray(sigmas)[:, None, None, None]
    want = (np.asarray(x) + np.asarray(noise) * s) / np.sqrt(s**2 + 1)
    np.testing.assert_allclose(np.asarray(noisy), want, rtol=1e-5)


@pytest.mark.parametrize(
    "pred_type", ["epsilon", "v_prediction", "sample", "rectified_flow"]
)
def test_x0_eps_inversion_consistency(sched, pred_type):
    """Build xt from known (x0, eps); parameterize the model output in each
    prediction space; recover (x0, eps) through
    get_x0_eps_from_pred_with_sigmas (loss/diffusion.py:100-125)."""
    loss_obj = DiffusionLoss(schedule=sched, prediction_type=pred_type)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    sigmas = jnp.array([0.7, 3.0])
    s = sigmas[:, None, None, None]
    scales = 1 / jnp.sqrt(s**2 + 1)
    xt = (x0 + eps * s) * scales

    if pred_type == "epsilon":
        model_out = eps
    elif pred_type == "sample":
        model_out = x0
    elif pred_type == "v_prediction":
        # v = alpha * eps - sigma_vp * x0 with alpha=scales, sigma_vp=s*scales
        model_out = scales * eps - s * scales * x0
    else:  # rectified_flow
        model_out = eps - x0

    got_x0, got_eps = loss_obj.get_x0_eps_from_pred_with_sigmas(
        xt, model_out, sigmas
    )
    np.testing.assert_allclose(np.asarray(got_x0), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_eps), np.asarray(eps), atol=1e-4)


def test_min_snr_weight(sched):
    loss_obj = DiffusionLoss(schedule=sched, use_snr_weight=True)
    losses = jnp.ones((3,))
    sigmas = jnp.array([0.1, 1.0, 10.0])
    got = loss_obj.apply_snr_weight(losses, sigmas)
    snr = np.asarray(sigmas) ** -2.0
    want = np.minimum(snr, 5.0) / snr
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_debiased_estimation(sched):
    loss_obj = DiffusionLoss(schedule=sched, use_debiased_estimation=True)
    losses = jnp.ones((3,))
    sigmas = jnp.array([0.01, 1.0, 10.0])
    got = loss_obj.apply_debiased_estimation(losses, sigmas)
    snr = np.minimum(np.asarray(sigmas) ** -2.0, 1000.0)
    np.testing.assert_allclose(np.asarray(got), 1 / np.sqrt(snr), rtol=1e-5)


def test_rf_loss_target_and_uniform_time(sched):
    loss_obj = RectifiedFlowLoss(schedule=sched)
    rng = jax.random.PRNGKey(42)
    x = jnp.ones((8, 4, 8, 8)) * 0.1
    loss, aux = loss_obj(rng, x, _zero_model)
    assert np.isfinite(float(loss))
    # timesteps are continuous in [0, 1000)
    t = np.asarray(aux.timesteps)
    assert t.dtype.kind == "f"
    assert (t >= 0).all() and (t <= 999).all()
    # with a zero model: pred = eps_hat - x0_hat where both derive from xt
    # target must be exactly noise - x
    sig = np.asarray(sched.sigma_for_timestep(jnp.round(aux.timesteps).astype(int)))
    assert sig.shape == (8,)


def test_rf_logit_normal_time_sampling(sched):
    """SD3 logit-normal t-sampling: t = sigmoid(m + s*z), concentrated
    mid-schedule, statistics match the analytic distribution."""
    loss_obj = RectifiedFlowLoss(
        schedule=sched, time_sampling_type="logit_normal"
    )
    rng = jax.random.PRNGKey(7)
    t, sig = loss_obj.sample_timesteps_and_sigmas(rng, 4096)
    time = np.asarray(sig) / (1 + np.asarray(sig))
    assert (time > 0).all() and (time < 1).all()
    # sigmoid(z), z~N(0,1): median 0.5, P(0.27<t<0.73) ~= 68%
    assert abs(np.median(time) - 0.5) < 0.03
    frac_mid = ((time > 0.269) & (time < 0.731)).mean()
    assert 0.62 < frac_mid < 0.74, frac_mid
    # shifted mean moves the mass (m=1 -> median sigmoid(1)=0.731)
    shifted = RectifiedFlowLoss(
        schedule=sched,
        time_sampling_type="logit_normal",
        logit_normal_mean=1.0,
    )
    _, sig_s = shifted.sample_timesteps_and_sigmas(rng, 4096)
    time_s = np.asarray(sig_s) / (1 + np.asarray(sig_s))
    assert abs(np.median(time_s) - 0.731) < 0.03
    # the full loss path runs with it
    loss, aux = loss_obj(
        jax.random.PRNGKey(0), jnp.ones((4, 4, 8, 8)) * 0.1, _zero_model
    )
    assert np.isfinite(float(loss))


def test_rf_paired_noise_input(sched):
    """5D input [B, 2, C, H, W] carries (sample, noise) pairs."""
    loss_obj = RectifiedFlowLoss(schedule=sched)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.zeros((2, 4, 4, 4))
    paired = jnp.stack([x0, noise], axis=1)
    _, aux = loss_obj(rng, paired, _zero_model)
    np.testing.assert_allclose(np.asarray(aux.target), -np.ones((2, 4, 4, 4)))


def test_nn_weighted_rf_loss(sched):
    loss_obj = NNWeightedRFLoss(schedule=sched)
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((4, 4, 8, 8)) * 0.3

    def loss_pred_fn(noisy, sigmas, **kw):
        return jnp.zeros((noisy.shape[0],))  # predicts log-loss 0 -> weight 1

    loss, aux = loss_obj(rng, x, _zero_model, loss_pred_fn=loss_pred_fn)
    # pred_loss = exp(0) = 1 -> rescaled == raw losses
    np.testing.assert_allclose(
        np.asarray(aux.rescaled_losses), np.asarray(aux.losses), rtol=1e-5
    )
    # loss = mean(raw + (log raw - 0)^2)
    want = np.mean(
        np.asarray(aux.losses) + np.log(np.asarray(aux.losses)) ** 2
    )
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_loss_is_jittable_and_differentiable(sched):
    loss_obj = DiffusionLoss(schedule=sched)
    w = jnp.ones((1,))

    @jax.jit
    def step(w, rng, x):
        def model(noisy, t):
            return noisy * w[0]

        loss, _ = loss_obj(rng, x, model)
        return loss

    g = jax.grad(step)(w, jax.random.PRNGKey(0), jnp.ones((2, 4, 4, 4)))
    assert np.isfinite(np.asarray(g)).all()


def test_multires_noise():
    """Pyramid noise: unit per-sample std by construction, adds low-
    frequency energy (coarse-grid means move away from 0), and the
    iterations=0 default is bitwise-identical to plain sampling."""
    import jax

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule

    sched = NoiseSchedule.sdxl()
    x = jnp.zeros((2, 32, 32, 4))
    rng = jax.random.PRNGKey(0)

    plain = DiffusionLoss(schedule=sched)
    multi = DiffusionLoss(
        schedule=sched, multires_noise_iterations=4,
        multires_noise_discount=0.5,
    )
    n_plain = np.asarray(plain.sample_noise(rng, x))
    n_plain2 = np.asarray(
        DiffusionLoss(
            schedule=sched, multires_noise_iterations=0
        ).sample_noise(rng, x)
    )
    np.testing.assert_array_equal(n_plain, n_plain2)

    n_multi = np.asarray(multi.sample_noise(rng, x))
    assert n_multi.shape == x.shape
    # renormalized per sample
    np.testing.assert_allclose(
        n_multi.reshape(2, -1).std(axis=1), 1.0, atol=1e-3
    )
    # low-frequency content: 8x8-block means have larger variance than
    # white noise's (which shrinks like 1/sqrt(block_size))
    def block_mean_std(n):
        b = n.reshape(2, 4, 8, 4, 8, 4).mean(axis=(2, 4))
        return float(b.std())

    assert block_mean_std(n_multi) > 1.4 * block_mean_std(n_plain)
