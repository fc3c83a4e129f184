"""Community fine-tune staples: noise offset, input perturbation,
zero-terminal-SNR schedule, CFG rescale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.sampling.cfg import apply_cfg_rescale


def _identity_model(noisy, t, **kw):
    return jnp.zeros_like(noisy)


def test_noise_offset_shifts_channel_means():
    schedule = NoiseSchedule.sdxl()
    x = jnp.zeros((8, 16, 16, 4))
    rng = jax.random.PRNGKey(0)

    base = DiffusionLoss(schedule=schedule)
    _, aux0 = base(rng, x, _identity_model)
    off = DiffusionLoss(schedule=schedule, noise_offset=1.0)
    _, aux1 = off(rng, x, _identity_model)

    # target IS the noise for epsilon target_type
    m0 = np.asarray(aux0.target).mean(axis=(1, 2))  # [B, C] channel means
    m1 = np.asarray(aux1.target).mean(axis=(1, 2))
    # plain noise: channel means ~ N(0, 1/sqrt(HW)=0.0625); offset 1.0
    # adds a fresh unit normal per (sample, channel)
    assert np.abs(m0).max() < 0.3
    assert m1.std() > 0.5, m1.std()
    # bitwise identical when the option is off (same rng)
    _, aux0b = DiffusionLoss(schedule=schedule)(rng, x, _identity_model)
    np.testing.assert_array_equal(
        np.asarray(aux0.noisy_latent), np.asarray(aux0b.noisy_latent)
    )


def test_input_perturbation_only_touches_model_input():
    schedule = NoiseSchedule.sdxl()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4)) * 0.2
    rng = jax.random.PRNGKey(0)

    seen = {}

    def capture_model(noisy, t, **kw):
        seen["noisy"] = noisy
        return jnp.zeros_like(noisy)

    base = DiffusionLoss(schedule=schedule)
    _, aux0 = base(rng, x, capture_model)
    noisy0 = seen["noisy"]
    pert = DiffusionLoss(schedule=schedule, input_perturbation=0.1)
    _, aux1 = pert(rng, x, capture_model)
    noisy1 = seen["noisy"]

    # the target (original noise) is unchanged; the model input is not
    np.testing.assert_array_equal(
        np.asarray(aux0.target), np.asarray(aux1.target)
    )
    assert float(jnp.abs(noisy1 - noisy0).max()) > 1e-4
    # aux records what the model actually saw
    np.testing.assert_array_equal(
        np.asarray(aux1.noisy_latent), np.asarray(noisy1)
    )


def test_zero_terminal_snr_rescale():
    base = NoiseSchedule.sdxl(prediction_type="v_prediction")
    z = base.rescale_zero_terminal_snr()
    acp_b = np.asarray(base.alphas_cumprod)
    acp_z = np.asarray(z.alphas_cumprod)
    # first preserved, terminal clamped to the documented epsilon
    np.testing.assert_allclose(acp_z[0], acp_b[0], rtol=1e-5)
    np.testing.assert_allclose(acp_z[-1], 2.0**-24, rtol=1e-6)
    # terminal SNR ~ 0 (sigma_max huge but finite)
    assert float(z.all_snr[-1]) < 1e-6
    assert np.isfinite(np.asarray(z.sigmas)).all()
    assert float(z.sigma_max) > 1000
    # alphas_cumprod still monotone decreasing
    assert np.all(np.diff(acp_z) < 0)
    # v target at t=T is ~the noise (sqrt(acp)*noise - sqrt(1-acp)*x0)
    x0 = jnp.ones((1, 2, 2, 1))
    noise = jnp.full((1, 2, 2, 1), 2.0)
    v = z.velocity(x0, noise, jnp.asarray([z.num_train_timesteps - 1]))
    np.testing.assert_allclose(np.asarray(v), -1.0, atol=2e-3)
    # ddpm(rescale_zero_terminal_snr=True) == explicit rescale
    z2 = NoiseSchedule.ddpm(
        prediction_type="v_prediction", rescale_zero_terminal_snr=True
    )
    np.testing.assert_array_equal(acp_z, np.asarray(z2.alphas_cumprod))


def test_cfg_rescale_properties():
    rng = jax.random.PRNGKey(0)
    cond = jax.random.normal(rng, (3, 8, 8, 4))
    cfg_out = cond * 3.0 + 0.5  # over-amplified guided output

    # phi = 0: identity
    np.testing.assert_array_equal(
        np.asarray(apply_cfg_rescale(cfg_out, cond, 0.0)),
        np.asarray(cfg_out),
    )
    # phi = 1: per-sample std matches the conditional prediction
    out = apply_cfg_rescale(cfg_out, cond, 1.0)
    s_out = np.asarray(out).reshape(3, -1).std(axis=1)
    s_cond = np.asarray(cond).reshape(3, -1).std(axis=1)
    np.testing.assert_allclose(s_out, s_cond, rtol=1e-4)
    # phi = 0.5: linear blend
    half = apply_cfg_rescale(cfg_out, cond, 0.5)
    np.testing.assert_allclose(
        np.asarray(half), 0.5 * np.asarray(out) + 0.5 * np.asarray(cfg_out),
        rtol=1e-5,
    )


def test_cfg_rescale_through_sampling():
    """cfg_rescale threads through diffusion_sampling and changes the
    output at phi > 0 while phi = 0 matches the old behavior."""
    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.sampling import diffusion_sampling

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    rng = jax.random.PRNGKey(0)
    tok = SimpleTokenizer()
    tok_out = [{k: jnp.asarray(v) for k, v in tok(["x"]).items()}]
    te_params = te.init(rng, tok_out)["params"]
    te_pipe = TextEncodingPipeline(te, te_params, [tok])

    # ctx-sensitive eps model: cond/uncond prompts scale eps
    # MULTIPLICATIVELY, so the guided output's std genuinely differs
    # from the conditional one (a tiny random UNet's cond/uncond stds
    # are float-identical, hiding the rescale)
    def unet_fn(params, x, t, ctx, m, added):
        scale = 0.05 + jnp.abs(ctx).mean(axis=(1, 2))
        return x * scale[:, None, None, None]

    unet_params = None

    def run(phi):
        def bound_fn(x, t, ctx, m, added):
            return unet_fn(None, x, t, ctx, m, added)

        return diffusion_sampling(
            bound_fn, te_pipe, None,
            train_schedule=NoiseSchedule.sdxl(),
            prompt="a", neg_prompt="b", num_steps=3, cfg_scale=4.0,
            cfg_rescale=phi, width=64, height=64, return_latents=True,
        )

    out0 = run(0.0)
    out7 = run(0.7)
    assert np.isfinite(np.asarray(out7)).all()
    assert float(jnp.abs(out7 - out0).max()) > 1e-6


def test_timestep_range_restriction():
    """kohya-style min/max timestep: sampled timesteps stay inside
    [min, max) and the loss still runs end to end."""
    import jax
    import jax.numpy as jnp

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule

    loss = DiffusionLoss(
        schedule=NoiseSchedule.ddpm(num_train_timesteps=100),
        min_timestep=20,
        max_timestep=60,
    )
    ts, sig = loss.sample_timesteps_and_sigmas(jax.random.PRNGKey(0), 512)
    ts = np.asarray(ts)
    assert ts.min() >= 20 and ts.max() < 60
    sched = loss.schedule
    np.testing.assert_allclose(
        np.asarray(sig), np.asarray(sched.sigma_for_timestep(jnp.asarray(ts)))
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    val, aux = loss(jax.random.PRNGKey(2), x, lambda z, t, **kw: z * 0.1)
    assert np.isfinite(float(val))
    t_used = np.asarray(aux.timesteps)
    assert t_used.min() >= 20 and t_used.max() < 60

    with pytest.raises(AssertionError):
        DiffusionLoss(
            schedule=NoiseSchedule.ddpm(num_train_timesteps=100),
            min_timestep=80,
            max_timestep=70,
        ).sample_timesteps_and_sigmas(jax.random.PRNGKey(0), 4)
