"""MMDiT (SD3-class dual-stream joint-attention transformer)."""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.models.mmdit import MMDiT


def _inputs(b=2, hw=16, c=4, t_len=7, ctx_dim=48, pooled_dim=24, seed=0):
    rng = jax.random.PRNGKey(seed)
    kx, kc, kp = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (b, hw, hw, c))
    t = jnp.linspace(50.0, 900.0, b)
    ctx = jax.random.normal(kc, (b, t_len, ctx_dim))
    mask = jnp.asarray(
        [[1] * 3 + [0] * (t_len - 3), [1] * t_len][:b], jnp.int32
    )
    pooled = jax.random.normal(kp, (b, pooled_dim))
    return x, t, ctx, mask, pooled


def test_mmdit_forward_shape_and_zero_init():
    m = MMDiT.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    params = m.init(
        jax.random.PRNGKey(0), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]
    out = m.apply({"params": params}, x, t, ctx, mask, {"text_embeds": pooled})
    assert out.shape == x.shape
    # zero-init final projection -> exactly zero output at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_mmdit_scan_blocks_matches_unrolled():
    x, t, ctx, mask, pooled = _inputs()
    added = {"text_embeds": pooled}
    m_u = MMDiT.from_config("tiny")
    params = m_u.init(jax.random.PRNGKey(3), x, t, ctx, mask, added)["params"]
    ref = m_u.apply({"params": params}, x, t, ctx, mask, added)

    # restack the unrolled block params into the nn.scan layout
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), params["blocks_0"], params["blocks_1"]
    )
    params_s = {
        k: v for k, v in params.items() if not k.startswith("blocks_")
    }
    params_s["blocks"] = stacked
    m_s = MMDiT.from_config("tiny", scan_blocks=True)
    out = m_s.apply({"params": params_s}, x, t, ctx, mask, added)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mmdit_mask_blocks_padded_text():
    """Garbage in masked-out text positions must not reach the image
    stream (their keys are masked; zero_for_padding isn't relied on)."""
    m = MMDiT.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    added = {"text_embeds": pooled}
    params = m.init(jax.random.PRNGKey(1), x, t, ctx, mask, added)["params"]
    # perturb ONLY positions where mask == 0
    noise = jax.random.normal(jax.random.PRNGKey(9), ctx.shape) * 100.0
    ctx_garbage = jnp.where(mask[:, :, None].astype(bool), ctx, ctx + noise)
    out_a = m.apply({"params": params}, x, t, ctx, mask, added)
    out_b = m.apply({"params": params}, x, t, ctx_garbage, mask, added)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-5
    )


def test_mmdit_pooled_changes_output():
    m = MMDiT.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    params = m.init(
        jax.random.PRNGKey(2), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]
    # non-zero-init blocks are gated by zero adaLN at init, so perturb a
    # gate kernel to make the conditioning path live
    params = jax.tree_util.tree_map(
        lambda p: p
        + 0.01 * jax.random.normal(jax.random.PRNGKey(4), p.shape, p.dtype),
        params,
    )
    out_a = m.apply({"params": params}, x, t, ctx, mask, {"text_embeds": pooled})
    out_b = m.apply(
        {"params": params}, x, t, ctx, mask, {"text_embeds": pooled + 1.0}
    )
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_mmdit_tp_rules_hit_stream_projections():
    from uwudiff_tpu.parallel import fsdp_param_sharding, make_mesh

    m = MMDiT.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    params = m.init(
        jax.random.PRNGKey(0), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]
    mesh = make_mesh({"data": 4, "tensor": 2})
    sh = fsdp_param_sharding(params, mesh)
    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): str(v.spec)
        for path, v in jax.tree_util.tree_leaves_with_path(sh)
    }
    for stream in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v", "to_out"):
            key = f"blocks_0/{stream}/{proj}/kernel"
            assert "tensor" in specs[key], (key, specs[key])
    assert "tensor" in specs["blocks_0/mlp_x/fc1/kernel"]
    assert "tensor" in specs["blocks_0/mlp_ctx/fc2/kernel"]


def test_mmdit_training_with_trainer():
    """SD3-style config end-to-end: MMDiT + RF loss + pooled CLIP TE
    through the full jitted step — loss decreases."""
    from uwudiff_tpu.diffusion import NoiseSchedule, RectifiedFlowLoss
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.training import DMTrainer

    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "layer_idx": -2},
            )
        ]
    )
    trainer = DMTrainer(
        model_config={
            "unet": MMDiT.from_config(
                "tiny", context_dim=32, pooled_dim=32
            ),
            "te": te,
            "vae": None,
        },
        lr=2e-3,
        use_warm_up=False,
        loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    ds_rng = np.random.default_rng(0)
    batch = {
        "sample": ds_rng.standard_normal((4, 16, 16, 4)).astype(np.float32)
        * 0.2,
        "captions": ["a", "b", "c", "d"],
        "tokenizer_outputs": [],
    }
    # tokenize through the trainer's tokenizers (SimpleTokenizer default)
    trainer_toks = [
        tok(batch["captions"], padding=True, truncation=True)
        for tok in [__import__(
            "uwudiff_tpu.models.tokenizers", fromlist=["SimpleTokenizer"]
        ).SimpleTokenizer()]
    ]
    batch["tokenizer_outputs"] = trainer_toks
    losses = [
        float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(15)
    ]
    assert losses[-1] < losses[0], losses


def test_mmdit_context_pre_only_trains():
    """The real-SD3 architecture (heterogeneous final block, cropped
    pos embed) through the full jitted step — scan + remat included."""
    from uwudiff_tpu.diffusion import NoiseSchedule, RectifiedFlowLoss
    from uwudiff_tpu.training import DMTrainer

    m = MMDiT.from_config(
        "tiny", depth=3, context_pre_only=True, pos_embed_max_size=24,
        pos_embed_base_size=8, scan_blocks=True,
        gradient_checkpointing=True,
    )
    trainer = DMTrainer(
        model_config={"unet": m, "te": None, "vae": None},
        lr=2e-3,
        use_warm_up=False,
        loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((4, 16, 16, 4)).astype(np.float32)
        * 0.2,
        "ctx": rng.standard_normal((4, 7, 48)).astype(np.float32),
        "tokenizer_outputs": [],
        "added_cond": {
            "text_embeds": rng.standard_normal((4, 24)).astype(np.float32)
        },
    }
    losses = [
        float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(12)
    ]
    assert losses[-1] < losses[0], losses
    # the scan covers depth-1 blocks; the final block sits outside it
    p = trainer.state.params
    p = p.get("unet", p)
    assert p["blocks"]["attn1"]["to_q"]["kernel"].shape[0] == 2
    assert "to_out" not in p["final_block"]["attn2"]


def test_mmdit_context_pre_only_rejects_pipeline():
    import pytest as _pytest

    from uwudiff_tpu.parallel.pipeline import pipelined_mmdit_apply

    m = MMDiT.from_config(
        "tiny", depth=3, context_pre_only=True, scan_blocks=True
    )
    with _pytest.raises(ValueError, match="context_pre_only"):
        pipelined_mmdit_apply(
            m, {}, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 3, 48)), None, None, None
        )


def test_mmdit_txt2img_sampling():
    """RF-schedule txt2img through the generic sampling entry point."""
    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.sampling import diffusion_sampling
    from uwudiff_tpu.sampling.get_sigmas import get_sigmas_for_rf

    te_mod = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "layer_idx": -2},
            )
        ]
    )
    tok = SimpleTokenizer()
    te_params = te_mod.init(
        jax.random.PRNGKey(0),
        [{k: jnp.asarray(v) for k, v in tok(["x"]).items()}],
    )["params"]
    te = TextEncodingPipeline(te_mod, te_params, [tok])

    m = MMDiT.from_config("tiny", context_dim=32, pooled_dim=32)
    x, t, ctx, mask, pooled = _inputs(ctx_dim=32, pooled_dim=32)
    params = m.init(
        jax.random.PRNGKey(0), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]

    def unet_fn(p, x, t, ctx, mask, added_cond):
        return m.apply({"params": p}, x, t, ctx, mask, added_cond)

    latents = diffusion_sampling(
        unet_fn,
        te,
        None,  # no VAE: return latents
        NoiseSchedule.sdxl(),
        prompt="a photo",
        neg_prompt="",
        num_steps=4,
        get_sigma_func=lambda n: get_sigmas_for_rf(n, max_sigma=80.0),
        num_samples=2,
        width=64,
        height=64,
        latent_channels=4,
        unet_params=params,
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_mmdit_skip_layers():
    """skip_layers bypasses exactly the named blocks: unrolled matches
    a manual forward that omits block 1; scanned matches unrolled on
    restacked params; () is bitwise the baseline."""
    x, t, ctx, mask, pooled = _inputs()
    added = {"text_embeds": pooled}
    base = MMDiT.from_config("tiny", depth=3)
    params = base.init(jax.random.PRNGKey(3), x, t, ctx, mask, added)["params"]
    # the zero-init output head hides everything — give it real weights
    params = jax.tree_util.tree_map(
        lambda leaf: (
            leaf
            + 0.02
            * jax.random.normal(jax.random.PRNGKey(9), leaf.shape, leaf.dtype)
            if leaf.ndim >= 1
            else leaf
        ),
        params,
    )
    ref = base.apply({"params": params}, x, t, ctx, mask, added)

    noskip = MMDiT.from_config("tiny", depth=3, skip_layers=())
    np.testing.assert_array_equal(
        np.asarray(noskip.apply({"params": params}, x, t, ctx, mask, added)),
        np.asarray(ref),
    )

    skip1 = MMDiT.from_config("tiny", depth=3, skip_layers=(1,))
    out_skip = skip1.apply({"params": params}, x, t, ctx, mask, added)
    assert not np.allclose(np.asarray(out_skip), np.asarray(ref), atol=1e-5)

    # manual oracle: run blocks 0 and 2 only
    def manual(m, sample, tt, ctx_in, msk, add):
        xx, cc, c = m.embed(sample, tt, ctx_in, add.get("text_embeds"))
        p = m.patch_size
        n_img = (sample.shape[1] // p) * (sample.shape[2] // p)
        bias = m.joint_bias(msk, n_img)
        for i, blk in enumerate(m.blocks):
            if i == 1:
                continue
            xx, cc = blk(xx, cc, c, bias)
        return m.head(xx, c, sample.shape)

    out_manual = base.apply(
        {"params": params}, x, t, ctx, mask, added, method=manual
    )
    np.testing.assert_allclose(
        np.asarray(out_skip), np.asarray(out_manual), atol=1e-6
    )

    # scanned layout agrees with the unrolled skip
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        params["blocks_0"], params["blocks_1"], params["blocks_2"],
    )
    params_s = {
        k: v for k, v in params.items() if not k.startswith("blocks_")
    }
    params_s["blocks"] = stacked
    m_s = MMDiT.from_config(
        "tiny", depth=3, scan_blocks=True, skip_layers=(1,)
    )
    out_s = m_s.apply({"params": params_s}, x, t, ctx, mask, added)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_skip), atol=1e-5
    )
