import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.models.dit import DiT


def test_dit_forward_shape():
    dit = DiT.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([0.0, 500.0])
    y = jnp.array([1, 2])
    params = dit.init({"params": rng, "dropout": rng}, x, t, y, train=True)[
        "params"
    ]
    out = dit.apply({"params": params}, x, t, y)
    assert out.shape == (2, 16, 16, 4)
    # zero-init final projection -> output exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dit_learn_sigma_channels():
    dit = DiT.from_config("tiny", learn_sigma=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([10.0])
    params = dit.init({"params": rng, "dropout": rng}, x, t, None)["params"]
    out = dit.apply({"params": params}, x, t, None)
    assert out.shape == (1, 8, 8, 8)


def test_dit_class_dropout_uses_null_class():
    dit = DiT.from_config("tiny", class_dropout_prob=1.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    t = jnp.array([10.0, 20.0])
    y = jnp.array([1, 2])
    params = dit.init({"params": rng, "dropout": rng}, x, t, y, train=True)[
        "params"
    ]
    # with dropout prob 1, train output is label-independent
    out_a = dit.apply(
        {"params": params}, x, t, jnp.array([1, 2]), train=True,
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    out_b = dit.apply(
        {"params": params}, x, t, jnp.array([7, 8]), train=True,
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_dit_rope_variant():
    dit = DiT.from_config("tiny", use_rope=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([10.0])
    params = dit.init({"params": rng, "dropout": rng}, x, t, None)["params"]
    out = dit.apply({"params": params}, x, t, None)
    assert out.shape == (1, 8, 8, 4)


def test_dit_training_with_trainer():
    """Class-conditional DiT + RF loss through the full jitted step."""
    from uwudiff_tpu.diffusion import RectifiedFlowLoss, NoiseSchedule
    from uwudiff_tpu.training import DMTrainer

    trainer = DMTrainer(
        model_config={"unet": DiT.from_config("tiny"), "te": None, "vae": None},
        lr=1e-3,
        use_warm_up=False,
        loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.laplace(1000)),
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((4, 16, 16, 4)).astype(np.float32) * 0.2,
        "class_labels": np.asarray([0, 1, 2, 3], np.int32),
        "tokenizer_outputs": [],
    }
    losses = [float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(15)]
    assert losses[-1] < losses[0], losses
