"""ControlNet tests: no-op-at-init invariant, trunk init from UNet,
trainer gradient routing, conditioning effect, e2e sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.controlnet import (
    build_controlnet_unet_fn,
    controlnet_from_unet,
    controlnet_params_from_unet,
)
from uwudiff_tpu.models.unet import UNet2DConditionModel


def _tiny_setup(seed=0):
    """Tiny text-conditional UNet + matching controlnet with params."""
    unet = UNet2DConditionModel.from_config("tiny")
    cn = controlnet_from_unet(unet, conditioning_embedding_channels=(8, 16))
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32))
    hint = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    unet_params = unet.init(rng, x, t, ctx, None, None)["params"]
    cn_params = cn.init(rng, x, t, ctx, None, None, controlnet_cond=hint)[
        "params"
    ]
    return unet, cn, unet_params, cn_params, (x, t, ctx, hint)


def test_controlnet_is_noop_at_init():
    """Zero convs + zero hint-encoder output => plugging a fresh
    controlnet into a UNet changes NOTHING (the paper's construction)."""
    unet, cn, unet_params, cn_params, (x, t, ctx, hint) = _tiny_setup()
    cn_params = controlnet_params_from_unet(cn_params, unet_params)

    base = unet.apply({"params": unet_params}, x, t, ctx, None, None)
    down_res, mid_res = cn.apply(
        {"params": cn_params}, x, t, ctx, None, None, controlnet_cond=hint
    )
    for r in down_res:
        np.testing.assert_array_equal(np.asarray(r), 0.0)
    np.testing.assert_array_equal(np.asarray(mid_res), 0.0)

    with_cn = unet.apply(
        {"params": unet_params}, x, t, ctx, None, None,
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_cn))


def test_controlnet_trunk_init_copies_unet():
    unet, cn, unet_params, cn_params, _ = _tiny_setup()
    merged = controlnet_params_from_unet(cn_params, unet_params)
    # every shared path takes the UNet value...
    flat_u = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(unet_params)
    )
    n_shared = 0
    for p, v in jax.tree_util.tree_leaves_with_path(merged):
        key = jax.tree_util.keystr(p)
        if key in flat_u:
            np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_u[key]))
            n_shared += 1
        else:
            assert (
                "cond_embed" in key or "controlnet_" in key
            ), f"unexpected controlnet-only param {key}"
    assert n_shared > 10  # the whole trunk is shared


def test_controlnet_residuals_shift_output():
    """Non-zero residuals (perturbed zero convs) change the UNet
    output — the injection points are live."""
    unet, cn, unet_params, cn_params, (x, t, ctx, hint) = _tiny_setup()
    cn_params = controlnet_params_from_unet(cn_params, unet_params)
    # kick the zero convs off zero
    cn_params = jax.tree_util.tree_map(
        lambda v: v + 0.05 if v.ndim == 4 else v, cn_params
    )
    down_res, mid_res = cn.apply(
        {"params": cn_params}, x, t, ctx, None, None, controlnet_cond=hint
    )
    assert any(float(jnp.abs(r).max()) > 0 for r in down_res)
    base = unet.apply({"params": unet_params}, x, t, ctx, None, None)
    out = unet.apply(
        {"params": unet_params}, x, t, ctx, None, None,
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res,
    )
    assert float(jnp.abs(out - base).max()) > 1e-4
    # and the hint content matters: different hint -> different output
    hint2 = hint + 1.0
    down2, mid2 = cn.apply(
        {"params": cn_params}, x, t, ctx, None, None, controlnet_cond=hint2
    )
    out2 = unet.apply(
        {"params": unet_params}, x, t, ctx, None, None,
        down_block_additional_residuals=down2,
        mid_block_additional_residual=mid2,
    )
    assert float(jnp.abs(out2 - out).max()) > 1e-5


def test_controlnet_trainer_end_to_end():
    """Only controlnet params train; frozen UNet untouched; loss falls
    on a fixed batch."""
    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.training import ControlNetTrainer

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    trainer = ControlNetTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "controlnet": {"conditioning_embedding_channels": (8, 16)},
            "te": te,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        seed=0,
    )
    ds = DummyDataset(
        sample_size=(16, 16, 4), control_size=(32, 32, 3), n_samples=4
    )
    ds.set_tokenizers(trainer.tokenizers)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["control_cond"].shape == (2, 32, 32, 3)

    unet_before = None
    losses = []
    for i in range(12):
        metrics, aux = trainer.train_step(batch)
        if unet_before is None:
            unet_before = jax.tree_util.tree_map(
                np.asarray, trainer.frozen["unet"]
            )
        losses.append(float(metrics["train/loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # trainable tree is the controlnet (has its exclusive params)
    assert "controlnet_mid" in trainer.state.params
    assert "cond_embed_out" in trainer.state.params
    # frozen UNet stayed frozen
    unet_after = jax.tree_util.tree_map(np.asarray, trainer.frozen["unet"])
    for a, b in zip(
        jax.tree_util.tree_leaves(unet_before),
        jax.tree_util.tree_leaves(unet_after),
    ):
        np.testing.assert_array_equal(a, b)


def test_controlnet_trainer_rejects_class_conditional():
    from uwudiff_tpu.training import ControlNetTrainer
    from uwudiff_tpu.models.dit import DiT

    trainer = ControlNetTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((2, 16, 16, 4)).astype(np.float32),
        "tokenizer_outputs": [],
        "class_labels": np.asarray([0, 1], np.int32),
        "control_cond": rng.standard_normal((2, 32, 32, 3)).astype(np.float32),
    }
    with pytest.raises(ValueError, match="class"):
        trainer.train_step(batch)


def test_controlnet_sampling_end_to_end():
    """build_controlnet_unet_fn drives diffusion_sampling (CFG doubles
    the batch; the hint tiles along)."""
    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.sampling import diffusion_sampling

    unet = UNet2DConditionModel.from_config("tiny")
    cn = controlnet_from_unet(unet, conditioning_embedding_channels=(8, 16))
    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    rng = jax.random.PRNGKey(0)
    tok = SimpleTokenizer()
    tok_out = [{k: jnp.asarray(v) for k, v in tok(["x"]).items()}]
    te_params = te.init(rng, tok_out)["params"]
    emb, _, _, mask = te.apply({"params": te_params}, tok_out)
    x0 = jnp.zeros((1, 8, 8, 4))
    t0 = jnp.zeros((1,))
    hint = jax.random.normal(rng, (1, 16, 16, 3))
    unet_params = unet.init(rng, x0, t0, emb, mask, None)["params"]
    cn_params = controlnet_params_from_unet(
        cn.init(rng, x0, t0, emb, mask, None, controlnet_cond=hint)["params"],
        unet_params,
    )
    te_pipe = TextEncodingPipeline(te, te_params, [tok])

    unet_fn = build_controlnet_unet_fn(unet, cn, conditioning_scale=0.8)
    params = {
        "unet": unet_params,
        "controlnet": cn_params,
        "control_cond": hint,
    }
    latents = diffusion_sampling(
        unet_fn,
        te_pipe,
        None,
        train_schedule=NoiseSchedule.sdxl(),
        prompt=["a", "b"],
        neg_prompt=["", ""],
        num_steps=4,
        num_samples=2,
        cfg_scale=2.0,
        width=64,
        height=64,
        return_latents=True,
        unet_params=params,
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_controlnet_import_roundtrip():
    """controlnet_key_map covers every param: trunk via UNet/diffusers
    names, hint encoder + zero convs via diffusers ControlNetModel
    names; synth-torch round trip is exact."""
    from uwudiff_tpu.models.import_torch import (
        controlnet_key_map,
        import_params,
    )
    from tests.test_import_torch import _synth_torch_sd

    unet = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    cn = controlnet_from_unet(
        unet, conditioning_embedding_channels=(8, 16, 24)
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 32))
    hint = jnp.zeros((1, 32, 32, 3))  # latent x 2^(3-1)
    params = cn.init(
        rng, x, jnp.zeros((1,)), ctx, None, None, controlnet_cond=hint
    )["params"]

    sd = _synth_torch_sd(params, controlnet_key_map)
    assert any(
        k.startswith("controlnet_cond_embedding.blocks.") for k in sd
    )
    assert "controlnet_cond_embedding.conv_in.weight" in sd
    assert "controlnet_cond_embedding.conv_out.weight" in sd
    assert "controlnet_mid_block.weight" in sd
    assert any(k.startswith("controlnet_down_blocks.") for k in sd)
    assert any(k.startswith("down_blocks.") for k in sd)  # trunk

    zeros = jax.tree_util.tree_map(lambda v: jnp.zeros_like(v), params)
    imported = import_params(zeros, sd, controlnet_key_map)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(imported),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
