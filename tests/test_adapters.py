import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training.adapters import (
    AdapterConfig,
    AdapterTarget,
    LycorisAdapter,
    build_adapter_config,
)


def _unet_and_params():
    unet = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = unet.init(rng, x, jnp.zeros((1,)), ctx)["params"]
    return unet, params, (x, jnp.zeros((1,)), ctx)


def test_lycoris_toml_config_parsing(tmp_path):
    toml = tmp_path / "preset.toml"
    toml.write_text(
        """
[config]
    linear_dim=4
    linear_alpha=1
    algo="lora"

[preset]
    enable_conv = false
    target_module = ["Transformer2DModel"]

    [preset.module_algo_map.Attention]
        algo = "lokr"
        factor = 64

    [preset.module_algo_map.FeedForward]
        algo = "lokr"
        factor = 6
"""
    )
    cfg = build_adapter_config(str(toml))
    assert not cfg.enable_conv
    algos = {t.algo for t in cfg.targets}
    assert algos == {"lora", "lokr"}


def test_adapter_create_and_zero_at_init():
    unet, params, (x, t, ctx) = _unet_and_params()
    cfg = AdapterConfig(
        targets=(
            AdapterTarget(pattern=r".*attn\d/(to_q|to_k|to_v|to_out)/kernel$",
                          algo="lokr", factor=4),
            AdapterTarget(pattern=r".*/ff/(proj_in|proj_out)/kernel$",
                          algo="lora", dim=4),
        )
    )
    adapter = LycorisAdapter.create(unet, params, cfg, jax.random.PRNGKey(1))
    assert len(adapter.specs) > 0
    assert adapter.n_params() > 0
    # fresh adapter must be a no-op merge (zero-init second factor)
    merged = adapter.merge(params)
    out_base = unet.apply({"params": params}, x, t, ctx)
    out_merged = unet.apply({"params": merged}, x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_merged), atol=1e-6
    )


def test_adapter_merge_changes_output_after_update():
    unet, params, (x, t, ctx) = _unet_and_params()
    cfg = AdapterConfig(
        targets=(AdapterTarget(pattern=r".*attn\d/to_q/kernel$", algo="lora"),)
    )
    adapter = LycorisAdapter.create(unet, params, cfg, jax.random.PRNGKey(1))
    # bump lora_up away from zero
    new_ap = jax.tree_util.tree_map(lambda v: v + 0.1, adapter.params)
    merged = adapter.merge(params, new_ap)
    out_base = unet.apply({"params": params}, x, t, ctx)
    out_merged = unet.apply({"params": merged}, x, t, ctx)
    assert float(jnp.abs(out_base - out_merged).max()) > 1e-6


def test_adapter_save_load_roundtrip(tmp_path):
    unet, params, _ = _unet_and_params()
    cfg = AdapterConfig(
        targets=(AdapterTarget(pattern=r".*attn\d/to_q/kernel$", algo="lokr"),)
    )
    adapter = LycorisAdapter.create(unet, params, cfg, jax.random.PRNGKey(1))
    adapter.params = jax.tree_util.tree_map(lambda v: v + 0.5, adapter.params)
    path = str(tmp_path / "adapter.npz")
    adapter.save(path)
    loaded = adapter.load(path)
    for name in adapter.params:
        for k in adapter.params[name]:
            np.testing.assert_allclose(
                np.asarray(loaded.params[name][k]),
                np.asarray(adapter.params[name][k]),
            )


def test_lora_training_through_trainer():
    """Train only adapter params; base params stay frozen."""
    from uwudiff_tpu.training import DMTrainer
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule

    trainer = DMTrainer(
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
        seed=0,
    )
    rng_np = np.random.default_rng(0)
    batch = {
        "sample": rng_np.standard_normal((2, 16, 16, 4)).astype(np.float32) * 0.1,
        "tokenizer_outputs": [],
        "added_cond": {"time_ids": np.zeros((2, 6), np.float32)},
    }
    base_before = jax.tree_util.tree_map(
        np.asarray, trainer_frozen_base(trainer, batch)
    )
    losses = [float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(10)]
    assert losses[-1] < losses[0], losses
    # base unet params untouched
    base_after = jax.tree_util.tree_map(np.asarray, trainer.frozen["unet_base"])
    for a, b in zip(
        jax.tree_util.tree_leaves(base_before),
        jax.tree_util.tree_leaves(base_after),
    ):
        np.testing.assert_array_equal(a, b)


def trainer_frozen_base(trainer, batch):
    trainer.setup(batch)
    return trainer.frozen["unet_base"]


def test_nn_weighted_trainer():
    from uwudiff_tpu.diffusion import NNWeightedRFLoss, NoiseSchedule
    from uwudiff_tpu.training.nn_weighted import NNWeightedLossTrainer

    trainer = NNWeightedLossTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=NNWeightedRFLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    rng_np = np.random.default_rng(0)
    batch = {
        "sample": rng_np.standard_normal((2, 16, 16, 4)).astype(np.float32) * 0.1,
        "tokenizer_outputs": [],
        "added_cond": {"time_ids": np.zeros((2, 6), np.float32)},
    }
    m1, aux = trainer.train_step(batch)
    assert np.isfinite(m1["train/loss"])
    assert hasattr(aux, "loss_pred_losses")
    assert "loss_pred" in trainer.state.params


def test_adapter_on_scanned_and_fused_model():
    """scan_transformer_blocks stacks kernels [L, in, out]; fused_qkv
    renames to to_qkv/to_kv. Adapters must cover both layouts (round-3:
    they previously skipped ndim-3 leaves silently)."""
    from uwudiff_tpu.models.transformer import Transformer2DModel

    unet = Transformer2DModel(
        num_heads=2,
        head_dim=8,
        num_layers=3,
        cross_attention_dim=32,
        use_linear_projection=True,
        norm_num_groups=4,
        scan_blocks=True,
        fused_qkv=True,
    )
    rng = jax.random.PRNGKey(0)
    kx, kc, ki = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (1, 8, 8, 16))
    ctx = jax.random.normal(kc, (1, 8, 32))
    params = unet.init(ki, x, ctx)["params"]
    cfg = build_adapter_config(
        {
            "config": {"linear_dim": 4, "linear_alpha": 1, "algo": "lora"},
            "preset": {
                "enable_conv": False,
                "target_module": ["Attention", "FeedForward"],
                "module_algo_map": {
                    "FeedForward": {"algo": "lokr", "factor": 4}
                },
            },
        }
    )
    adapter = LycorisAdapter.create(unet, params, cfg, jax.random.PRNGKey(1))
    names = list(adapter.specs)
    assert any("to_qkv" in n for n in names), names
    stacked = [n for n in names if adapter.specs[n]["stack"]]
    assert stacked, "no stacked kernels adapted"
    assert any(adapter.specs[n]["algo"] == "lokr" for n in stacked)

    # zero at init
    merged = adapter.merge(params)
    out_base = unet.apply({"params": params}, x, ctx)
    out_merged = unet.apply({"params": merged}, x, ctx)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_merged), atol=1e-6
    )

    # non-zero after an update, and every layer of a stacked kernel
    # receives its own delta
    new_ap = jax.tree_util.tree_map(lambda v: v + 0.1, adapter.params)
    merged2 = adapter.merge(params, new_ap)
    out2 = unet.apply({"params": merged2}, x, ctx)
    assert float(jnp.abs(out_base - out2).max()) > 1e-6


def test_batched_lokr_matches_per_layer_kron():
    """The einsum-batched Kronecker for stacked kernels must equal
    jnp.kron applied per layer."""
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    w1 = jax.random.normal(k1, (3, 4, 2))
    w2 = jax.random.normal(k2, (3, 5, 6))
    batched = jnp.einsum("lio,lpq->lipoq", w1, w2).reshape(3, 4 * 5, 2 * 6)
    for layer in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[layer]),
            np.asarray(jnp.kron(w1[layer], w2[layer])),
            rtol=1e-6,
        )
