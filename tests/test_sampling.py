import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.diffusion import NoiseSchedule
from uwudiff_tpu.sampling import (
    KDiffusionDenoiser,
    diffusion_sampling,
    euler_latent_sampling,
    get_sigmas_for_rf,
    sample_dpm2,
    sample_dpm2_cfgpp,
    sample_euler_ancestral,
    sample_euler_ancestral_cfgpp,
)
from uwudiff_tpu.sampling.wrapper import get_ancestral_step, to_d


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.sdxl()


X0 = 0.7  # the "dataset": a single constant image


def _perfect_model(x, sigma, sigma_cond=None):
    """A denoiser that always returns the true x0 (and itself as uncond)."""
    d = jnp.full_like(x, X0)
    return d, d


def test_get_ancestral_step_last_step_zero():
    down, up = get_ancestral_step(jnp.float32(1.0), jnp.float32(0.0))
    assert float(up) == 0.0 and float(down) == 0.0


def test_euler_ancestral_converges_to_x0(sched):
    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out = sample_euler_ancestral(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=0.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_euler_ancestral_eta_still_converges(sched):
    """With ancestral noise, the final step has sigma=0 so x == x0."""
    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_euler_ancestral(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_euler_cfgpp_converges(sched):
    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_euler_ancestral_cfgpp(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=0.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


@pytest.mark.parametrize("single_call", [False, True])
def test_dpm2_converges(sched, single_call):
    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_dpm2(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1),
        single_call=single_call,
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_dpm2_cfgpp_converges(sched):
    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_dpm2_cfgpp(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_samplers_jit_compile(sched):
    sigmas = sched.sample_sigmas_descending(4)

    @jax.jit
    def run(x):
        return sample_euler_ancestral(
            _perfect_model, x, sigmas, rng=jax.random.PRNGKey(0)
        )

    out = run(jnp.ones((1, 4, 4, 1)))
    assert np.isfinite(np.asarray(out)).all()


def test_kdiffusion_denoiser_scalings(sched):
    """If the model predicts the exact eps, the wrapper recovers x0."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    sigma = jnp.array([0.5, 3.0])

    captured = {}

    def eps_model(x_in, t, **kw):
        captured["t"] = t
        return eps  # the true eps

    den = KDiffusionDenoiser(model_fn=eps_model, schedule=sched)
    # noised input in sigma space (unscaled): x = x0 + eps*sigma
    x = x0 + eps * sigma[:, None, None, None]
    # wrapper scales by c_in internally and returns x + eps*(-sigma) = x0
    out = den(x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)
    # t passed to the model is sigma_to_t of sigma
    np.testing.assert_allclose(
        np.asarray(captured["t"]), np.asarray(sched.sigma_to_t(sigma)), atol=1e-3
    )


def test_sigma_cond_threads_through(sched):
    captured = {}

    def eps_model(x_in, t, **kw):
        captured["t"] = t
        return jnp.zeros_like(x_in)

    den = KDiffusionDenoiser(model_fn=eps_model, schedule=sched)
    sigma = jnp.array([1.0])
    sigma_cond = jnp.array([2.0])
    den(jnp.ones((1, 2, 2, 1)), sigma, sigma_cond=sigma_cond)
    np.testing.assert_allclose(
        np.asarray(captured["t"]),
        np.asarray(sched.sigma_to_t(sigma_cond)),
        atol=1e-3,
    )


def test_rf_sigma_schedule():
    sig = get_sigmas_for_rf(8, max_sigma=100.0)
    assert sig.shape == (9,)
    assert sig[-1] == 0.0 or sig[-1] < 1e-6
    assert np.all(np.diff(sig) <= 0)
    np.testing.assert_allclose(sig[0], 100.0, rtol=1e-5)


def test_rf_sigma_schedule_golden_values():
    """Pin the RF schedule arithmetic to golden values so the logit-space
    reformulation stays value-equal to the reference's time-space math."""
    from uwudiff_tpu.sampling.get_sigmas import sigmoid_time, sigmoid_time_scale

    np.testing.assert_allclose(
        get_sigmas_for_rf(8, 14.6, 0.02),
        [14.600000000000001, 4.597889182058046, 2.4109324758842448,
         1.4527167630057805, 0.9148014440433212, 0.5703923019985196,
         0.33099121706399, 0.15492651061513335, 0.02],
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        get_sigmas_for_rf(6, 10.0, 0.0, time_disc_func=sigmoid_time),
        [9.9999999999999964e+00, 1.0000016666763891e+00,
         1.0000033333555559e-01, 1.0000050000375002e-02,
         1.0000066667222236e-03, 1.0000083334097235e-04,
         1.0000100001000010e-05],
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        get_sigmas_for_rf(6, 10.0, 0.05, time_disc_func=sigmoid_time_scale),
        [10.00000000000001, 7.6849794373184475, 3.4686093778365272,
         0.9170124481327799, 0.2202461619902123, 0.0774135387255854, 0.05],
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        sigmoid_time(0.0, 0.9, 5),
        [1.0000000000000001e-05, 1.5516171998369727e-04,
         2.4024534523211195e-03, 3.6025721610807589e-02,
         3.6707089094604695e-01, 9.0000000000000013e-01],
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        sigmoid_time_scale(0.1, 0.9, 5, rho=4),
        [0.1, 0.21793398738777706, 0.3963356960231885,
         0.6036643039768117, 0.7820660126122233, 0.9],
        rtol=1e-12,
    )


def _tiny_pipeline():
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": True, "layer_idx": -2})]
    )
    toks = [SimpleTokenizer(model_max_length=8)]
    dummy = [{k: jnp.asarray(v) for k, v in toks[0](["x"]).items()}]
    params = te.init(jax.random.PRNGKey(0), dummy)["params"]
    return TextEncodingPipeline(te, params, toks)


def test_end_to_end_diffusion_sampling(sched):
    from uwudiff_tpu.models.unet import UNet2DConditionModel

    unet = UNet2DConditionModel.from_config("tiny")
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx)["params"]

    def unet_fn(x, t, ctx, mask, added):
        return unet.apply({"params": params}, x, t, ctx, mask, None)

    te = _tiny_pipeline()
    latents = diffusion_sampling(
        unet_fn,
        te,
        vae_decode=None,
        train_schedule=sched,
        prompt="a cat",
        neg_prompt="",
        num_steps=4,
        num_samples=2,
        cfg_scale=3.0,
        width=64,
        height=64,
        seed=0,
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_end_to_end_mmdit_sampling(sched):
    """MMDiT rides the same text-conditional CFG path as the UNet:
    pooled CLIP lands in added_cond['text_embeds'], time_ids are
    ignored (configs/sampling/demo_sampling_mmdit.yaml)."""
    from uwudiff_tpu.models.mmdit import MMDiT

    mmdit = MMDiT.from_config(
        "tiny", context_dim=32, pooled_dim=32, in_channels=4
    )
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = mmdit.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx, None,
        {"text_embeds": jnp.zeros((1, 32))},
    )["params"]

    def unet_fn(x, t, ctx, mask, added):
        return mmdit.apply({"params": params}, x, t, ctx, mask, added)

    te = _tiny_pipeline()
    latents = diffusion_sampling(
        unet_fn,
        te,
        vae_decode=None,
        train_schedule=sched,
        prompt="a cat",
        neg_prompt="",
        num_steps=4,
        num_samples=2,
        cfg_scale=3.0,
        width=64,
        height=64,
        seed=0,
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_euler_latent_inversion_api(sched):
    from uwudiff_tpu.models.unet import UNet2DConditionModel

    unet = UNet2DConditionModel.from_config("tiny")
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx)["params"]

    def unet_fn(x, t, ctx, mask, added):
        return unet.apply({"params": params}, x, t, ctx, mask, None)

    te = _tiny_pipeline()
    lat = jnp.ones((1, 8, 8, 4)) * 0.1
    noise = euler_latent_sampling(
        lat, unet_fn, te, sched, ["p"], ["n"],
        image_to_noise=True, cfg_scale=1.0, num_steps=4,
    )
    assert noise.shape == lat.shape
    assert np.isfinite(np.asarray(noise)).all()
    # cfg++ path
    out = euler_latent_sampling(
        lat, unet_fn, te, sched, ["p"], ["n"],
        cfg_scale=2.0, use_cfgpp=True, num_steps=4,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_dpmpp_2m_converges(sched):
    from uwudiff_tpu.sampling import sample_dpmpp_2m

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_dpmpp_2m(_perfect_model, x, sigmas)
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_dpmpp_2m_matches_kdiffusion_recurrence(sched):
    """Step-for-step against a plain-python transcription of the
    k-diffusion DPM++(2M) update, with a model whose output depends on
    x so every multistep term matters."""
    from uwudiff_tpu.sampling import sample_dpmpp_2m

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    sigmas = np.asarray(sched.sample_sigmas_descending(7), np.float64)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * sigmas[0]

    # reference recurrence (k-diffusion sample_dpmpp_2m)
    xr = np.asarray(x, np.float64)
    old = None
    t_of = lambda s: -np.log(max(s, 1e-20))
    for i in range(len(sigmas) - 1):
        den = 0.9 * xr - 0.1
        t, t_next = t_of(sigmas[i]), t_of(sigmas[i + 1])
        h = t_next - t
        if old is None or sigmas[i + 1] == 0:
            d = den
        else:
            h_last = t - t_of(sigmas[i - 1])
            r = h_last / h
            d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old
        xr = (sigmas[i + 1] / sigmas[i]) * xr - np.expm1(-h) * d
        old = den

    out = sample_dpmpp_2m(model, jnp.asarray(x), jnp.asarray(sigmas, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), xr, rtol=2e-4, atol=2e-5)


def test_heun_converges(sched):
    from uwudiff_tpu.sampling import sample_heun

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_heun(_perfect_model, x, sigmas, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_heun_matches_kdiffusion_recurrence(sched):
    """No churn: step-for-step vs a plain-python Heun transcription with
    an x-dependent model."""
    from uwudiff_tpu.sampling import sample_heun

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    sigmas = np.asarray(sched.sample_sigmas_descending(6), np.float64)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * sigmas[0]

    xr = np.asarray(x, np.float64)
    for i in range(len(sigmas) - 1):
        den = 0.9 * xr - 0.1
        d = (xr - den) / sigmas[i]
        dt = sigmas[i + 1] - sigmas[i]
        if sigmas[i + 1] == 0:
            xr = xr + d * dt
        else:
            x2 = xr + d * dt
            den2 = 0.9 * x2 - 0.1
            d2 = (x2 - den2) / sigmas[i + 1]
            xr = xr + (d + d2) / 2 * dt

    out = sample_heun(
        model, jnp.asarray(x), jnp.asarray(sigmas, jnp.float32),
        rng=jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(np.asarray(out), xr, rtol=2e-4, atol=2e-5)


class TestClassConditionalSampling:
    """Class-label CFG + end-to-end DiT sampling."""

    def test_class_cfg_math(self):
        # a linear mock "denoiser" where cond/uncond outputs are known:
        # model(x, labels) = x + labels (broadcast); cfg must combine as
        # uncond + (cond - uncond) * scale
        from uwudiff_tpu.sampling.cfg import build_class_cfg_fn

        labels = jnp.asarray([1, 2], jnp.int32)
        null = 0

        def mock_denoiser(x, sigma, sigma_cond=None, class_labels=None):
            return x + class_labels[:, None, None, None].astype(jnp.float32)

        cfg_fn = build_class_cfg_fn(mock_denoiser, labels, null, cfg=3.0)
        x = jnp.ones((2, 4, 4, 1))
        sigma = jnp.ones((2,))
        out, uncond = cfg_fn(x, sigma)
        # cond = x + label, uncond = x + 0 -> out = x + 3*label
        expected = np.asarray(x) + 3.0 * np.asarray(labels, np.float32)[
            :, None, None, None
        ]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)
        np.testing.assert_allclose(np.asarray(uncond), np.asarray(x), atol=1e-6)

    def test_class_cfg_scale_one_single_pass(self):
        from uwudiff_tpu.sampling.cfg import build_class_cfg_fn

        calls = []

        def mock_denoiser(x, sigma, sigma_cond=None, class_labels=None):
            calls.append(x.shape[0])
            return x

        labels = jnp.asarray([3, 4], jnp.int32)
        cfg_fn = build_class_cfg_fn(mock_denoiser, labels, 0, cfg=1.0)
        cfg_fn(jnp.ones((2, 4, 4, 1)), jnp.ones((2,)))
        assert calls == [2]  # no doubled batch at cfg == 1

    def test_dit_sampling_end_to_end(self):
        from uwudiff_tpu.models.dit import DiT
        from uwudiff_tpu.sampling import class_conditional_sampling

        model = DiT.from_config("tiny")
        x0 = jnp.zeros((1, 8, 8, 4))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x0, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32), train=True,
        )["params"]

        def unet_fn(p, x, t, labels):
            return model.apply({"params": p}, x, t, labels)

        latents = class_conditional_sampling(
            unet_fn,
            train_schedule=NoiseSchedule.sdxl(),
            class_labels=[0, 1, 2],
            null_label=model.num_classes,
            num_steps=4,
            cfg_scale=4.0,
            width=64,
            height=64,
            latent_channels=4,
            vae_downscale=8,
            unet_params=params,
        )
        assert latents.shape == (3, 8, 8, 4)
        assert np.all(np.isfinite(np.asarray(latents)))
        # different labels must produce different samples (shared rng)
        assert not np.allclose(
            np.asarray(latents[0]), np.asarray(latents[1])
        )


def test_unipc_converges(sched):
    from uwudiff_tpu.sampling import sample_unipc

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * sigmas[0]
    out = sample_unipc(_perfect_model, x, sigmas)
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_unipc_corrector_beats_dpmpp_2m_order():
    """Analytic-ODE convergence study. Model denoised = (1 - sigma) x
    gives dx/dsigma = x, exact solution x(s) = x(s0) e^(s - s0).
    Integrating sigma 1.0 -> 0.1 (no sigma=0 endpoint, so no order-1
    fallback), UniPC's corrector must (a) beat DPM++(2M) and Euler at
    equal steps and (b) show a higher empirical convergence order."""
    from uwudiff_tpu.sampling import (
        sample_dpmpp_2m,
        sample_euler_ancestral,
        sample_unipc,
    )
    from uwudiff_tpu.utils import append_dims

    def model(x, sigma, sigma_cond=None):
        d = (1.0 - append_dims(sigma, x.ndim)) * x
        return d, d

    s_hi, s_lo = 1.0, 0.1
    x0 = jnp.full((1, 2, 2, 1), 0.8)
    exact = float(x0[0, 0, 0, 0]) * np.exp(s_lo - s_hi)

    def err(sampler, n, **kw):
        sigmas = jnp.linspace(s_hi, s_lo, n + 1)
        out = sampler(model, x0, sigmas, rng=jax.random.PRNGKey(0), **kw)
        return abs(float(out[0, 0, 0, 0]) - exact)

    e_euler = err(sample_euler_ancestral, 8, eta=0.0)
    e_dpmpp = err(sample_dpmpp_2m, 8)
    e_unipc = err(sample_unipc, 8)
    assert e_unipc < e_dpmpp < e_euler, (e_unipc, e_dpmpp, e_euler)

    # empirical order: halving h should cut UniPC's error by more than
    # DPM++(2M)'s (3rd vs 2nd order asymptotics)
    r_dpmpp = err(sample_dpmpp_2m, 8) / err(sample_dpmpp_2m, 16)
    r_unipc = err(sample_unipc, 8) / err(sample_unipc, 16)
    assert r_unipc > r_dpmpp > 2.5, (r_unipc, r_dpmpp)


def test_unipc_jits_and_accepts_extra_args(sched):
    from uwudiff_tpu.sampling import sample_unipc

    calls = {}

    def model(x, sigma, sigma_cond=None, tag=None):
        calls["tag"] = tag
        return jnp.full_like(x, X0), None

    sigmas = sched.sample_sigmas_descending(6)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 1)) * sigmas[0]
    f = jax.jit(lambda x: sample_unipc(model, x, sigmas, extra_args={"tag": 7}))
    out = f(x)
    assert calls["tag"] == 7
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_text_cfg_scale_one_single_pass(sched):
    """build_cfg_fn at cfg=1 must run a single conditional pass (no
    doubled batch) — the few-step consistency-student serving path."""
    from uwudiff_tpu.sampling.cfg import build_cfg_fn

    seen = {}

    def unet(x, sigma, sigma_cond=None, encoder_hidden_states=None,
             encoder_attention_mask=None, added_cond=None):
        seen["bs"] = x.shape[0]
        seen["ctx_bs"] = encoder_hidden_states.shape[0]
        seen["added"] = (
            added_cond["text_embeds"].shape[0] if added_cond else None
        )
        return jnp.full_like(x, X0)

    enc = {
        "ctx": jnp.ones((4, 7, 8)),  # cond|uncond stacked (2 each)
        "mask": jnp.ones((4, 7)),
        "added_cond": {"text_embeds": jnp.ones((4, 8))},
    }
    fn = build_cfg_fn(unet, enc, cfg=1.0)
    x = jnp.zeros((2, 4, 4, 1))
    out, uncond = fn(x, jnp.ones((2,)))
    assert seen["bs"] == 2 and seen["ctx_bs"] == 2 and seen["added"] == 2
    np.testing.assert_allclose(np.asarray(out), X0)
    np.testing.assert_allclose(np.asarray(uncond), X0)

    fn2 = build_cfg_fn(unet, enc, cfg=3.0)
    fn2(x, jnp.ones((2,)))
    assert seen["bs"] == 4  # doubled batch when cfg != 1


def test_cfg_interval_limits_guidance_window(sched):
    """cfg_interval=(lo, hi): guided inside the window, plain
    conditional outside (Kynkaanniemi et al. 2024) — branchless."""
    from uwudiff_tpu.sampling.cfg import build_cfg_fn

    def unet(x, sigma, sigma_cond=None, encoder_hidden_states=None,
             encoder_attention_mask=None, added_cond=None):
        # cond half -> 2.0, uncond half -> 1.0 (split on batch)
        n = x.shape[0] // 2
        return jnp.concatenate(
            [jnp.full_like(x[:n], 2.0), jnp.full_like(x[n:], 1.0)]
        )

    enc = {"ctx": jnp.ones((4, 7, 8)), "mask": None, "added_cond": None}
    fn = build_cfg_fn(unet, enc, cfg=5.0, cfg_interval=(0.5, 2.0))
    x = jnp.zeros((2, 4, 4, 1))

    # inside the window: uncond + (cond - uncond) * 5 = 1 + 1*5 = 6
    out, _ = fn(x, jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out), 6.0)
    # outside: plain conditional (scale 1) = 2
    out, _ = fn(x, jnp.asarray([10.0, 10.0]))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    # mixed batch: per-sample windowing
    out, _ = fn(x, jnp.asarray([1.0, 10.0]))
    np.testing.assert_allclose(np.asarray(out[0]), 6.0)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0)
    # no interval: uniform guidance everywhere
    fn_all = build_cfg_fn(unet, enc, cfg=5.0)
    out, _ = fn_all(x, jnp.asarray([10.0, 10.0]))
    np.testing.assert_allclose(np.asarray(out), 6.0)


# ---------------------------------------------------------------------------
# Rectified-flow sampling: RFDenoiser + SD3 shifted time grids
# ---------------------------------------------------------------------------


def test_rf_denoiser_recovers_x0(sched):
    """If the model predicts the exact velocity n - x0, the wrapper
    recovers x0 — and it must see the VP-scaled input at sigma_to_t."""
    from uwudiff_tpu.sampling import RFDenoiser

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    sigma = jnp.array([0.5, 3.0])
    v_true = noise - x0

    captured = {}

    def v_model(x_in, t, **kw):
        captured["x_in"] = x_in
        captured["t"] = t
        return v_true

    den = RFDenoiser(model_fn=v_model, schedule=sched)
    x = x0 + noise * sigma[:, None, None, None]  # k-diffusion space
    out = den(x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)
    # conditioning convention matches training: fractional timesteps
    np.testing.assert_allclose(
        np.asarray(captured["t"]), np.asarray(sched.sigma_to_t(sigma)), atol=1e-3
    )
    # input scaling matches training: the VP interpolant
    c_in = 1.0 / np.sqrt(np.asarray(sigma)[:, None, None, None] ** 2 + 1.0)
    np.testing.assert_allclose(
        np.asarray(captured["x_in"]), np.asarray(x) * c_in, atol=1e-6
    )


def test_rf_denoiser_matches_training_conversion(sched):
    """RFDenoiser's denoised output equals RectifiedFlowLoss's own
    (x0 from prediction) conversion — sampler and trainer share one
    parameterization contract."""
    from uwudiff_tpu.diffusion import RectifiedFlowLoss
    from uwudiff_tpu.sampling import RFDenoiser
    from uwudiff_tpu.utils import append_dims

    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    # an arbitrary (wrong) velocity prediction: conversions must agree
    v_pred = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    sigma = jnp.array([0.25, 5.0])

    rf_loss = RectifiedFlowLoss(
        schedule=sched, prediction_type="rectified_flow"
    )
    xt_scaled = rf_loss.noise_latents(x0, noise, sigma)
    x0_hat, _ = rf_loss.get_x0_eps_from_pred_with_sigmas(
        xt_scaled, v_pred, sigma
    )

    den = RFDenoiser(model_fn=lambda x, t, **kw: v_pred, schedule=sched)
    x_k = x0 + noise * append_dims(sigma, x0.ndim)  # unscaled sigma space
    np.testing.assert_allclose(
        np.asarray(den(x_k, sigma)), np.asarray(x0_hat), atol=1e-5
    )


def test_rf_euler_sampling_converges(sched):
    """Euler over a shifted RF ladder with an oracle velocity model
    lands on x0 exactly (denoised is x0 at every step)."""
    from uwudiff_tpu.sampling import RFDenoiser, shift_time

    def v_oracle(z, t, **kw):
        sig = append_dims_np(sched.t_to_sigma(t), z.ndim)
        x_k = z * jnp.sqrt(sig**2 + 1.0)
        n = (x_k - X0) / jnp.maximum(sig, 1e-8)
        return n - X0

    def append_dims_np(a, nd):
        return a.reshape(a.shape + (1,) * (nd - a.ndim))

    den = RFDenoiser(model_fn=v_oracle, schedule=sched)

    def cfg_fn(x, s, **kw):
        d = den(x, s)
        return d, d

    sigmas = jnp.asarray(
        get_sigmas_for_rf(
            8, max_sigma=float(sched.sigma_max), time_disc_func=shift_time
        ).astype(np.float32)
    )
    assert float(sigmas[-1]) == 0.0 and float(sigmas[0]) <= float(sched.sigma_max) + 1e-3
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out = sample_euler_ancestral(cfg_fn, x, sigmas, rng=jax.random.PRNGKey(1), eta=0.0)
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_shift_time_grids():
    from uwudiff_tpu.sampling import (
        dynamic_shift_time,
        mu_for_image_seq_len,
        shift_time,
        uniform_time,
    )

    # shift=1 is exactly uniform
    np.testing.assert_allclose(
        shift_time(0.0, 0.9, 8, shift=1.0), uniform_time(0.0, 0.9, 8), atol=1e-12
    )
    # published rule on (0, 1): t' = 3t/(1+2t); midpoint 0.5 -> 0.75
    g = shift_time(0.0, 1.0, 2, shift=3.0)
    np.testing.assert_allclose(g, [0.0, 0.75, 1.0], atol=1e-12)
    # endpoints pinned to the schedule's trained range
    g = shift_time(0.0, 0.936, 16, shift=3.0)
    assert g[0] == 0.0 and abs(g[-1] - 0.936) < 1e-12
    assert np.all(np.diff(g) > 0)
    # dynamic shift at mu = ln(shift) equals the static rule
    np.testing.assert_allclose(
        dynamic_shift_time(0.0, 0.936, 8, mu=float(np.log(3.0))),
        shift_time(0.0, 0.936, 8, shift=3.0),
        atol=1e-9,
    )
    # mu interpolation hits the published anchors
    assert abs(mu_for_image_seq_len(256) - 0.5) < 1e-9
    assert abs(mu_for_image_seq_len(4096) - 1.15) < 1e-9


def test_end_to_end_rf_mmdit_sampling(sched):
    """The demo_sampling_mmdit.yaml recipe in-code: RFDenoiser + SD3
    shift grid through the standard text-conditional CFG path."""
    from functools import partial

    from uwudiff_tpu.models.mmdit import MMDiT
    from uwudiff_tpu.sampling import RFDenoiser, shift_time

    mmdit = MMDiT.from_config(
        "tiny", context_dim=32, pooled_dim=32, in_channels=4
    )
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = mmdit.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx, None,
        {"text_embeds": jnp.zeros((1, 32))},
    )["params"]

    def unet_fn(x, t, ctx, mask, added):
        return mmdit.apply({"params": params}, x, t, ctx, mask, added)

    te = _tiny_pipeline()
    latents = diffusion_sampling(
        unet_fn,
        te,
        vae_decode=None,
        train_schedule=sched,
        prompt="a cat",
        neg_prompt="",
        num_steps=4,
        num_samples=2,
        cfg_scale=3.0,
        width=64,
        height=64,
        seed=0,
        denoiser_cls=RFDenoiser,
        get_sigma_func=partial(
            get_sigmas_for_rf,
            max_sigma=14.6146,
            time_disc_func=partial(shift_time, shift=3.0),
        ),
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_v_denoiser_recovers_x0(sched):
    """If the model predicts the exact v = sqrt(abar)n - sqrt(1-abar)x0,
    the wrapper recovers x0."""
    from uwudiff_tpu.sampling import VDenoiser

    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    sigma = jnp.array([0.5, 3.0])
    sig = sigma[:, None, None, None]
    scales = 1.0 / jnp.sqrt(sig**2 + 1.0)
    v_true = scales * noise - sig * scales * x0

    den = VDenoiser(model_fn=lambda x, t, **kw: v_true, schedule=sched)
    x = x0 + noise * sig
    np.testing.assert_allclose(np.asarray(den(x, sigma)), np.asarray(x0), atol=1e-5)


def test_v_denoiser_matches_training_conversion(sched):
    """VDenoiser's denoised output equals DiffusionLoss's v_prediction
    (x0 from prediction) conversion for an arbitrary model output."""
    from uwudiff_tpu.diffusion import DiffusionLoss
    from uwudiff_tpu.sampling import VDenoiser
    from uwudiff_tpu.utils import append_dims

    rng = np.random.default_rng(13)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    v_pred = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    sigma = jnp.array([0.25, 5.0])

    loss = DiffusionLoss(schedule=sched, prediction_type="v_prediction")
    xt_scaled = loss.noise_latents(x0, noise, sigma)
    x0_hat, _ = loss.get_x0_eps_from_pred_with_sigmas(xt_scaled, v_pred, sigma)

    den = VDenoiser(model_fn=lambda x, t, **kw: v_pred, schedule=sched)
    x_k = x0 + noise * append_dims(sigma, x0.ndim)
    np.testing.assert_allclose(
        np.asarray(den(x_k, sigma)), np.asarray(x0_hat), atol=1e-5
    )


def test_denoiser_losses_zero_at_oracle(sched):
    """Each wrapper's .loss() is ~0 when the model predicts its own
    target exactly, and positive otherwise (RF and v)."""
    from uwudiff_tpu.sampling import RFDenoiser, VDenoiser

    rng = np.random.default_rng(17)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    sigma = jnp.array([0.5, 2.0])
    sig = sigma[:, None, None, None]
    scales = 1.0 / jnp.sqrt(sig**2 + 1.0)

    rf = RFDenoiser(model_fn=lambda x, t, **kw: noise - x0, schedule=sched)
    assert float(jnp.max(rf.loss(x0, noise, sigma))) < 1e-10
    v_true = scales * noise - sig * scales * x0
    vd = VDenoiser(model_fn=lambda x, t, **kw: v_true, schedule=sched)
    assert float(jnp.max(vd.loss(x0, noise, sigma))) < 1e-10
    wrong = VDenoiser(model_fn=lambda x, t, **kw: noise, schedule=sched)
    assert float(jnp.min(wrong.loss(x0, noise, sigma))) > 1e-3


def test_denoiser_for_loss_dispatch(sched):
    from uwudiff_tpu.diffusion import (
        DiffusionLoss,
        NNWeightedRFLoss,
        RectifiedFlowLoss,
    )
    from uwudiff_tpu.diffusion.losses import EDMLoss
    from uwudiff_tpu.sampling import (
        KDiffusionDenoiser,
        RFDenoiser,
        VDenoiser,
        denoiser_for_loss,
    )

    assert denoiser_for_loss(DiffusionLoss(schedule=sched)) is KDiffusionDenoiser
    assert denoiser_for_loss(
        DiffusionLoss(schedule=sched, prediction_type="v_prediction")
    ) is VDenoiser
    assert denoiser_for_loss(RectifiedFlowLoss(schedule=sched)) is RFDenoiser
    assert denoiser_for_loss(NNWeightedRFLoss(schedule=sched)) is RFDenoiser
    with pytest.raises(ValueError):
        denoiser_for_loss(EDMLoss())


def test_dpmpp_2m_sde_eta0_equals_2m(sched):
    """eta=0 midpoint SDE is algebraically the deterministic DPM++(2M)."""
    from uwudiff_tpu.sampling import sample_dpmpp_2m, sample_dpmpp_2m_sde

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    sigmas = sched.sample_sigmas_descending(7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out_2m = sample_dpmpp_2m(model, x, sigmas)
    out_sde = sample_dpmpp_2m_sde(
        model, x, sigmas, rng=jax.random.PRNGKey(1), eta=0.0
    )
    np.testing.assert_allclose(
        np.asarray(out_2m), np.asarray(out_sde), rtol=1e-5, atol=1e-5
    )


def test_dpmpp_2m_sde_converges(sched):
    """With an oracle denoiser the terminal sigma=0 step returns x0
    exactly, noise injection notwithstanding."""
    from uwudiff_tpu.sampling import sample_dpmpp_2m_sde

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out = sample_dpmpp_2m_sde(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


@pytest.mark.parametrize("solver_type", ["midpoint", "heun"])
def test_dpmpp_2m_sde_matches_kdiffusion_recurrence(sched, solver_type):
    """Step-for-step against a plain-python transcription of
    k-diffusion's sample_dpmpp_2m_sde with identical per-step noise."""
    from uwudiff_tpu.sampling import sample_dpmpp_2m_sde

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    eta, s_noise = 0.7, 1.1
    sigmas = np.asarray(sched.sample_sigmas_descending(7), np.float64)
    rng = jax.random.PRNGKey(5)
    xr0 = np.random.default_rng(3).standard_normal((2, 4, 4, 1)).astype(
        np.float32
    ) * sigmas[0]

    # identical per-step noises (same key schedule as the scan)
    keys = jax.random.split(rng, len(sigmas) - 1)
    noises = [
        np.asarray(jax.random.normal(k, xr0.shape, jnp.float32), np.float64)
        for k in keys
    ]

    xr = np.asarray(xr0, np.float64)
    old = None
    t_of = lambda s: -np.log(max(s, 1e-20))
    for i in range(len(sigmas) - 1):
        den = 0.9 * xr - 0.1
        if sigmas[i + 1] == 0:
            xr = den
            break
        t, t_next = t_of(sigmas[i]), t_of(sigmas[i + 1])
        h = t_next - t
        eta_h = eta * h
        x_new = (
            (sigmas[i + 1] / sigmas[i]) * np.exp(-eta_h) * xr
            - np.expm1(-h - eta_h) * den
        )
        if old is not None:
            r = (t - t_of(sigmas[i - 1])) / h
            if solver_type == "midpoint":
                x_new = x_new + 0.5 * -np.expm1(-h - eta_h) / r * (den - old)
            else:
                x_new = x_new + (
                    np.expm1(-h - eta_h) / (-h - eta_h) + 1.0
                ) / r * (den - old)
        x_new = x_new + (
            noises[i] * sigmas[i + 1] * np.sqrt(-np.expm1(-2 * eta_h)) * s_noise
        )
        xr, old = x_new, den

    out = sample_dpmpp_2m_sde(
        model, jnp.asarray(xr0), jnp.asarray(sigmas, jnp.float32),
        rng=rng, eta=eta, s_noise=s_noise, solver_type=solver_type,
    )
    np.testing.assert_allclose(np.asarray(out), xr, rtol=2e-4, atol=2e-5)


def test_slg_cfg_math():
    """out = uncond + cfg*(cond-uncond) + slg*(cond-cond_skip), with the
    window zeroing only the slg term."""
    from uwudiff_tpu.sampling.cfg import build_slg_cfg_fn

    def unet(x, sigma, sigma_cond=None, **kw):
        n = x.shape[0] // 2
        return jnp.concatenate(
            [jnp.full_like(x[:n], 2.0), jnp.full_like(x[n:], 1.0)]
        )  # cond=2, uncond=1

    def unet_skip(x, sigma, sigma_cond=None, **kw):
        return jnp.full_like(x, 1.5)  # degraded cond

    enc = {"ctx": jnp.ones((4, 7, 8)), "mask": None, "added_cond": None}
    fn = build_slg_cfg_fn(unet, unet_skip, enc, cfg=4.0, slg_scale=2.0)
    x = jnp.zeros((2, 4, 4, 1))
    out, uncond = fn(x, jnp.asarray([1.0, 1.0]))
    # 1 + (2-1)*4 + (2-1.5)*2 = 6
    np.testing.assert_allclose(np.asarray(out), 6.0)
    np.testing.assert_allclose(np.asarray(uncond), 1.0)

    fn_w = build_slg_cfg_fn(
        unet, unet_skip, enc, cfg=4.0, slg_scale=2.0,
        slg_interval=(0.5, 2.0),
    )
    out, _ = fn_w(x, jnp.asarray([1.0, 10.0]))
    np.testing.assert_allclose(np.asarray(out[0]), 6.0)  # in window
    np.testing.assert_allclose(np.asarray(out[1]), 5.0)  # slg off: plain CFG


def test_slg_end_to_end_mmdit(sched):
    """diffusion_sampling with unet_skip_fn: SLG changes the samples,
    slg_scale=0 is exactly the plain CFG result."""
    from uwudiff_tpu.models.mmdit import MMDiT

    mmdit = MMDiT.from_config(
        "tiny", depth=3, context_dim=32, pooled_dim=32, in_channels=4
    )
    skip_mmdit = mmdit.clone(skip_layers=(1,))
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = mmdit.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx, None,
        {"text_embeds": jnp.zeros((1, 32))},
    )["params"]
    params = jax.tree_util.tree_map(
        lambda leaf: leaf + 0.02 * jax.random.normal(
            jax.random.PRNGKey(9), leaf.shape, leaf.dtype
        ),
        params,
    )

    def unet_fn(x, t, ctx, mask, added):
        return mmdit.apply({"params": params}, x, t, ctx, mask, added)

    def unet_skip_fn(x, t, ctx, mask, added):
        return skip_mmdit.apply({"params": params}, x, t, ctx, mask, added)

    te = _tiny_pipeline()
    common = dict(
        te=te, vae_decode=None, train_schedule=sched, prompt="a cat",
        neg_prompt="", num_steps=3, num_samples=1, cfg_scale=3.0,
        width=64, height=64, seed=0,
    )
    plain = diffusion_sampling(unet_fn, **common)
    slg_zero = diffusion_sampling(
        unet_fn, unet_skip_fn=unet_skip_fn, slg_scale=0.0, **common
    )
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(slg_zero), atol=1e-6
    )
    slg = diffusion_sampling(
        unet_fn, unet_skip_fn=unet_skip_fn, slg_scale=2.8, **common
    )
    assert np.isfinite(np.asarray(slg)).all()
    assert not np.allclose(np.asarray(plain), np.asarray(slg), atol=1e-4)


# --------------------------------------------------------------------------
# DPM++ 2S ancestral / SDE / 3M SDE
# --------------------------------------------------------------------------


def _np_ancestral(sigma, sigma_next, eta):
    up = min(
        sigma_next,
        eta * np.sqrt(max(sigma_next**2 * (sigma**2 - sigma_next**2) / max(sigma**2, 1e-20), 0.0)),
    )
    down = np.sqrt(max(sigma_next**2 - up**2, 0.0))
    return down, up


def test_dpmpp_2s_ancestral_converges(sched):
    from uwudiff_tpu.sampling import sample_dpmpp_2s_ancestral

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out = sample_dpmpp_2s_ancestral(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_dpmpp_2s_ancestral_matches_kdiffusion_recurrence(sched):
    """Step-for-step vs a plain-python transcription of k-diffusion's
    sample_dpmpp_2s_ancestral with identical per-step noise."""
    from uwudiff_tpu.sampling import sample_dpmpp_2s_ancestral

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    eta, s_noise = 0.8, 1.05
    sigmas = np.asarray(sched.sample_sigmas_descending(7), np.float64)
    rng = jax.random.PRNGKey(7)
    xr0 = np.random.default_rng(4).standard_normal((2, 4, 4, 1)).astype(
        np.float32
    ) * sigmas[0]

    keys = jax.random.split(rng, len(sigmas) - 1)
    noises = [
        np.asarray(jax.random.normal(k, xr0.shape, jnp.float32), np.float64)
        for k in keys
    ]

    t_of = lambda s: -np.log(max(s, 1e-20))
    xr = np.asarray(xr0, np.float64)
    for i in range(len(sigmas) - 1):
        den = 0.9 * xr - 0.1
        sd, su = _np_ancestral(sigmas[i], sigmas[i + 1], eta)
        if sd == 0:
            d = (xr - den) / sigmas[i]
            xr = xr + d * (sd - sigmas[i])
        else:
            t, t_next = t_of(sigmas[i]), t_of(sd)
            h = t_next - t
            s_mid = t + 0.5 * h
            x_mid = np.exp(-(s_mid - t)) * xr - np.expm1(-0.5 * h) * den
            den_mid = 0.9 * x_mid - 0.1
            xr = (sd / sigmas[i]) * xr - np.expm1(-h) * den_mid
        if sigmas[i + 1] > 0:
            xr = xr + noises[i] * s_noise * su

    out = sample_dpmpp_2s_ancestral(
        model, jnp.asarray(xr0), jnp.asarray(sigmas, jnp.float32),
        rng=rng, eta=eta, s_noise=s_noise,
    )
    np.testing.assert_allclose(np.asarray(out), xr, rtol=2e-4, atol=2e-5)


def test_dpmpp_sde_converges(sched):
    from uwudiff_tpu.sampling import sample_dpmpp_sde

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out = sample_dpmpp_sde(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


def test_dpmpp_sde_matches_kdiffusion_recurrence(sched):
    """Step-for-step vs a plain-python transcription of k-diffusion's
    sample_dpmpp_sde (r=1/2, gaussian noise) with identical noise."""
    from uwudiff_tpu.sampling import sample_dpmpp_sde

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    eta, s_noise, r = 0.6, 1.1, 0.5
    sigmas = np.asarray(sched.sample_sigmas_descending(6), np.float64)
    rng = jax.random.PRNGKey(11)
    xr0 = np.random.default_rng(6).standard_normal((2, 4, 4, 1)).astype(
        np.float32
    ) * sigmas[0]

    keys = jax.random.split(rng, len(sigmas) - 1)
    noises = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        noises.append(
            (
                np.asarray(jax.random.normal(k1, xr0.shape, jnp.float32), np.float64),
                np.asarray(jax.random.normal(k2, xr0.shape, jnp.float32), np.float64),
            )
        )

    t_of = lambda s: -np.log(max(s, 1e-20))
    fac = 1.0 / (2.0 * r)
    xr = np.asarray(xr0, np.float64)
    for i in range(len(sigmas) - 1):
        den = 0.9 * xr - 0.1
        if sigmas[i + 1] == 0:
            d = (xr - den) / sigmas[i]
            xr = xr + d * (sigmas[i + 1] - sigmas[i])
        else:
            t, t_next = t_of(sigmas[i]), t_of(sigmas[i + 1])
            h = t_next - t
            s_mid = t + r * h
            sig_mid = np.exp(-s_mid)

            sd1, su1 = _np_ancestral(sigmas[i], sig_mid, eta)
            x_mid = (sd1 / sigmas[i]) * xr - np.expm1(t - t_of(sd1)) * den
            x_mid = x_mid + noises[i][0] * s_noise * su1
            den_mid = 0.9 * x_mid - 0.1

            sd2, su2 = _np_ancestral(sigmas[i], sigmas[i + 1], eta)
            den_d = (1 - fac) * den + fac * den_mid
            xr = (sd2 / sigmas[i]) * xr - np.expm1(t - t_of(sd2)) * den_d
            xr = xr + noises[i][1] * s_noise * su2

    out = sample_dpmpp_sde(
        model, jnp.asarray(xr0), jnp.asarray(sigmas, jnp.float32),
        rng=rng, eta=eta, s_noise=s_noise, r=r,
    )
    np.testing.assert_allclose(np.asarray(out), xr, rtol=2e-4, atol=2e-5)


def test_dpmpp_3m_sde_converges(sched):
    from uwudiff_tpu.sampling import sample_dpmpp_3m_sde

    sigmas = sched.sample_sigmas_descending(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * sigmas[0]
    out = sample_dpmpp_3m_sde(
        _perfect_model, x, sigmas, rng=jax.random.PRNGKey(1), eta=1.0
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=1e-4)


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_dpmpp_3m_sde_matches_kdiffusion_recurrence(sched, eta):
    """Step-for-step vs a plain-python transcription of k-diffusion's
    sample_dpmpp_3m_sde with identical per-step noise, covering the
    1st/2nd/3rd-order history ramp and both eta regimes."""
    from uwudiff_tpu.sampling import sample_dpmpp_3m_sde

    def model(x, sigma, sigma_cond=None):
        d = 0.9 * x - 0.1
        return d, d

    s_noise = 1.07
    sigmas = np.asarray(sched.sample_sigmas_descending(8), np.float64)
    rng = jax.random.PRNGKey(13)
    xr0 = np.random.default_rng(8).standard_normal((2, 4, 4, 1)).astype(
        np.float32
    ) * sigmas[0]

    keys = jax.random.split(rng, len(sigmas) - 1)
    noises = [
        np.asarray(jax.random.normal(k, xr0.shape, jnp.float32), np.float64)
        for k in keys
    ]

    t_of = lambda s: -np.log(max(s, 1e-20))
    xr = np.asarray(xr0, np.float64)
    den_1 = den_2 = None
    h_1 = h_2 = None
    for i in range(len(sigmas) - 1):
        den = 0.9 * xr - 0.1
        if sigmas[i + 1] == 0:
            xr = den
            break
        h = t_of(sigmas[i + 1]) - t_of(sigmas[i])
        h_eta = h * (eta + 1.0)
        x_new = np.exp(-h_eta) * xr - np.expm1(-h_eta) * den
        if den_2 is not None:
            r0, r1 = h_1 / h, h_2 / h
            d1_0 = (den - den_1) / r0
            d1_1 = (den_1 - den_2) / r1
            d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
            d2 = (d1_0 - d1_1) / (r0 + r1)
            phi_2 = np.expm1(-h_eta) / h_eta + 1.0
            phi_3 = phi_2 / h_eta - 0.5
            x_new = x_new + phi_2 * d1 - phi_3 * d2
        elif den_1 is not None:
            r0 = h_1 / h
            d = (den - den_1) / r0
            phi_2 = np.expm1(-h_eta) / h_eta + 1.0
            x_new = x_new + phi_2 * d
        if eta:
            x_new = x_new + (
                noises[i] * sigmas[i + 1]
                * np.sqrt(-np.expm1(-2.0 * h * eta)) * s_noise
            )
        den_2, den_1 = den_1, den
        h_2, h_1 = h_1, h
        xr = x_new

    out = sample_dpmpp_3m_sde(
        model, jnp.asarray(xr0), jnp.asarray(sigmas, jnp.float32),
        rng=rng, eta=eta, s_noise=s_noise,
    )
    np.testing.assert_allclose(np.asarray(out), xr, rtol=2e-4, atol=2e-5)


def test_exponential_and_polyexponential_sigmas():
    from uwudiff_tpu.sampling import exponential_sigmas, polyexponential_sigmas

    sig = exponential_sigmas(10, 0.03, 14.6)
    assert sig.shape == (11,)
    assert sig[-1] == 0.0
    np.testing.assert_allclose(sig[0], 14.6, rtol=1e-6)
    np.testing.assert_allclose(sig[-2], 0.03, rtol=1e-6)
    # evenly spaced in log-sigma
    logs = np.log(sig[:-1])
    np.testing.assert_allclose(np.diff(logs), np.diff(logs)[0], rtol=1e-5)
    # rho=1 polyexponential IS exponential
    np.testing.assert_allclose(
        polyexponential_sigmas(10, 0.03, 14.6, rho=1.0), sig, rtol=1e-6
    )
    # rho>1 spends more of the ladder at low noise: every interior
    # sigma is below the exponential grid's at the same index
    poly = polyexponential_sigmas(10, 0.03, 14.6, rho=2.0)
    assert (poly[1:-2] < sig[1:-2]).all()
    assert (np.diff(poly[:-1]) < 0).all()


def test_beta_sigmas():
    from scipy.stats import beta as beta_dist

    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.sampling import beta_sigmas

    sig = beta_sigmas(10, 0.03, 14.6)
    assert sig.shape == (11,)
    assert sig[-1] == 0.0
    np.testing.assert_allclose(sig[0], 14.6, rtol=1e-5)  # ppf(1) = 1
    assert (np.diff(sig[:-1]) < 0).all()
    assert (sig[:-1] >= 0.03 - 1e-6).all() and (sig[:-1] <= 14.6 + 1e-4).all()
    # the quantiles really are Beta(0.6, 0.6) quantiles: invert one
    frac = np.log(sig[3] / 0.03) / np.log(14.6 / 0.03)
    ts = 1.0 - np.linspace(0.0, 1.0, 10, endpoint=False)
    np.testing.assert_allclose(
        beta_dist.cdf(frac, 0.6, 0.6), ts[3], atol=1e-5
    )
    # schedule-indexed form picks from the discrete trained table
    sched = NoiseSchedule.sd15()
    sig_d = beta_sigmas(10, schedule=sched)
    table = np.asarray(sched.sigmas)
    assert all(s in table for s in sig_d[:-1])
    np.testing.assert_allclose(sig_d[0], table[-1], rtol=1e-6)


def test_ays_sigmas():
    from uwudiff_tpu.sampling import ays_sigmas
    from uwudiff_tpu.sampling.get_sigmas import _AYS_TABLES

    for model in ("sd15", "sdxl"):
        sig = ays_sigmas(10, model)
        assert sig.shape == (12,)
        assert sig[-1] == 0.0
        np.testing.assert_allclose(
            sig[:-1], np.asarray(_AYS_TABLES[model], np.float32), rtol=1e-6
        )
    # resampled count keeps the endpoints and monotonicity
    sig20 = ays_sigmas(20, "sdxl")
    assert sig20.shape == (22,)
    np.testing.assert_allclose(sig20[0], 14.615, rtol=1e-5)
    np.testing.assert_allclose(sig20[-2], 0.029, rtol=1e-4)
    assert (np.diff(sig20[:-1]) < 0).all()
    with pytest.raises(KeyError):
        ays_sigmas(10, "nope")
