import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.loader import ModelLoadConfig, apply_load_config, load_any
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training.checkpoint import load_params_npz, save_params_npz


def test_load_any_splits_load_config():
    module, cfg = load_any(
        {
            "_target_": "uwudiff_tpu.models.UNet2DConditionModel.from_config",
            "config": "tiny",
            "_load_config_": {"param_dtype": "bfloat16", "to_freeze": True},
        }
    )
    assert isinstance(module, UNet2DConditionModel)
    assert cfg.to_freeze and cfg.param_dtype == "bfloat16"


def test_apply_load_config_npz_restore_and_cast(tmp_path):
    unet = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    params = unet.init(rng, x, jnp.zeros((1,)), jnp.zeros((1, 8, 32)))["params"]
    path = str(tmp_path / "w.npz")
    save_params_npz(path, params)

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    cfg = ModelLoadConfig(ckpt_path=path, importer="npz", param_dtype="bfloat16")
    restored = apply_load_config(zeros, cfg, unet)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        assert b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-2, atol=1e-2,
        )


def test_trainer_restores_unet_from_load_config(tmp_path):
    """A _load_config_ ckpt_path on the unet node restores params at
    trainer setup (``duwu/loader.py:36-46`` capability)."""
    from uwudiff_tpu.training import DMTrainer

    unet = UNet2DConditionModel.from_config(
        "tiny", cross_attention_dim=None, zero_init_stddev=-1.0
    )
    rng = jax.random.PRNGKey(3)
    x = jnp.zeros((1, 16, 16, 4))
    source_params = unet.init(rng, x, jnp.zeros((1,)))["params"]
    path = str(tmp_path / "unet.npz")
    save_params_npz(path, source_params)

    trainer = DMTrainer(
        model_config={
            "unet": {
                "_target_": "uwudiff_tpu.models.UNet2DConditionModel.from_config",
                "config": "tiny",
                "cross_attention_dim": None,
                "zero_init_stddev": -1.0,
                "_load_config_": {"ckpt_path": path, "importer": "npz"},
            },
            "te": None,
            "vae": None,
        },
        lr=1e-4,
        use_warm_up=False,
        seed=99,  # different init seed -> restore must override it
    )
    batch = {
        "sample": np.zeros((2, 16, 16, 4), np.float32),
        "tokenizer_outputs": [],
    }
    trainer.setup(batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(source_params),
        jax.tree_util.tree_leaves(trainer.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
