"""Flux (dual-stream + single-stream rectified-flow transformer)."""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.models.flux import Flux


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


def test_flux_forward_shape_and_zero_init():
    m = Flux.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    params = m.init(
        jax.random.PRNGKey(0), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]
    out = m.apply({"params": params}, x, t, ctx, mask, {"text_embeds": pooled})
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_flux_pack_unpack_roundtrip():
    m = Flux.from_config("tiny")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 4))
    packed = m._pack(x)
    assert packed.shape == (2, 4 * 6, 16)
    np.testing.assert_allclose(
        np.asarray(m._unpack(packed, x.shape)), np.asarray(x), atol=0
    )


def test_flux_scan_blocks_matches_unrolled():
    x, t, ctx, mask, pooled = _inputs()
    added = {"text_embeds": pooled}
    m_u = Flux.from_config("tiny")
    params = m_u.init(jax.random.PRNGKey(3), x, t, ctx, mask, added)["params"]
    ref = m_u.apply({"params": params}, x, t, ctx, mask, added)

    from uwudiff_tpu.models.import_torch import stack_block_params

    params_s = stack_block_params(jax.device_get(params))
    assert "blocks" in params_s and "single_blocks" in params_s
    m_s = Flux.from_config("tiny", scan_blocks=True)
    out = m_s.apply({"params": params_s}, x, t, ctx, mask, added)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flux_remat_matches():
    x, t, ctx, mask, pooled = _inputs()
    added = {"text_embeds": pooled}
    m = Flux.from_config("tiny", scan_blocks=True)
    params = m.init(jax.random.PRNGKey(3), x, t, ctx, mask, added)["params"]
    ref = m.apply({"params": params}, x, t, ctx, mask, added)
    m_r = Flux.from_config(
        "tiny", scan_blocks=True, gradient_checkpointing=True
    )
    out = m_r.apply({"params": params}, x, t, ctx, mask, added)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_flux_mask_blocks_padded_text():
    m = Flux.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    added = {"text_embeds": pooled}
    params = m.init(jax.random.PRNGKey(1), x, t, ctx, mask, added)["params"]
    noise = jax.random.normal(jax.random.PRNGKey(9), ctx.shape) * 100.0
    ctx_garbage = jnp.where(mask[:, :, None].astype(bool), ctx, ctx + noise)
    out_a = m.apply({"params": params}, x, t, ctx, mask, added)
    out_b = m.apply({"params": params}, x, t, ctx_garbage, mask, added)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_flux_guidance_changes_output():
    """flux-dev guidance embedding is live: default vs explicit
    added_cond["guidance"] differ (after de-gating the zero init)."""
    m = Flux.from_config("tiny")
    x, t, ctx, mask, pooled = _inputs()
    params = m.init(
        jax.random.PRNGKey(2), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]
    params = jax.tree_util.tree_map(
        lambda p: p
        + 0.01 * jax.random.normal(jax.random.PRNGKey(4), p.shape, p.dtype),
        params,
    )
    base = m.apply(
        {"params": params}, x, t, ctx, mask,
        {"text_embeds": pooled, "guidance": jnp.full((2,), 3.5)},
    )
    # default_guidance=3.5 -> identical to explicit 3.5
    default = m.apply(
        {"params": params}, x, t, ctx, mask, {"text_embeds": pooled}
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(default), atol=1e-6)
    other = m.apply(
        {"params": params}, x, t, ctx, mask,
        {"text_embeds": pooled, "guidance": jnp.full((2,), 1.0)},
    )
    assert float(jnp.abs(base - other).max()) > 1e-6

    # schnell has no guidance leaves and ignores the key
    m_s = Flux.from_config("tiny", guidance_embeds=False)
    p_s = m_s.init(
        jax.random.PRNGKey(0), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]
    assert "g_fc1" not in p_s


def test_flux_tp_rules_hit_projections():
    from uwudiff_tpu.parallel import fsdp_param_sharding, make_mesh

    m = Flux.from_config("tiny")
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
    assert "tensor" in specs["single_blocks_0/attn1/to_q/kernel"]


def test_flux_pooled_only_text_stack():
    """Flux conditioning stack: CLIP slot contributes ONLY pooled, T5
    carries the sequence context."""
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "pooled_only": True, "layer_idx": -2},
            ),
            (
                {"model_type": "t5", "preset": "tiny", "d_model": 16},
                {"concat_bucket": 1, "need_mask": True},
            ),
        ]
    )
    toks = [
        SimpleTokenizer(model_max_length=8),
        SimpleTokenizer(model_max_length=6),
    ]
    dummy = [t(["x"]) for t in toks]
    params = te.init(jax.random.PRNGKey(0), dummy)["params"]
    pipe = TextEncodingPipeline(te, params, toks)
    emb, normed, pooled, mask = pipe.encode(["a cat", "dog"])
    # context = T5 only (seq 6, width 16); pooled = tiny CLIP (32)
    assert emb.shape == (2, 6, 16)
    assert pooled.shape == (2, 32)
    assert mask.shape == (2, 6)


def test_flux_training_with_trainer():
    """Flux + RF loss + pooled-only CLIP / T5 stack through the full
    jitted step — loss decreases."""
    from uwudiff_tpu.diffusion import NoiseSchedule, RectifiedFlowLoss
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.training import DMTrainer

    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "pooled_only": True, "layer_idx": -2},
            ),
            (
                {"model_type": "t5", "preset": "tiny", "d_model": 16},
                {"concat_bucket": 1, "need_mask": True},
            ),
        ]
    )
    trainer = DMTrainer(
        model_config={
            "unet": Flux.from_config(
                "tiny", context_dim=16, pooled_dim=32
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
    toks = [
        SimpleTokenizer(model_max_length=8),
        SimpleTokenizer(model_max_length=6),
    ]
    captions = ["a", "b", "c", "d"]
    batch = {
        "sample": ds_rng.standard_normal((4, 16, 16, 4)).astype(np.float32)
        * 0.2,
        "captions": captions,
        "tokenizer_outputs": [
            tok(captions, padding=True, truncation=True) for tok in toks
        ],
    }
    losses = [
        float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(15)
    ]
    assert losses[-1] < losses[0], losses


def test_flux_txt2img_sampling():
    """RF txt2img through the generic sampling entry point with the
    RFDenoiser + dynamic-shift grid."""
    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.sampling import RFDenoiser, diffusion_sampling
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

    m = Flux.from_config("tiny", context_dim=32, pooled_dim=32)
    x, t, ctx, mask, pooled = _inputs(ctx_dim=32, pooled_dim=32)
    params = m.init(
        jax.random.PRNGKey(0), x, t, ctx, mask, {"text_embeds": pooled}
    )["params"]

    def unet_fn(p, x, t, ctx, mask, added_cond):
        return m.apply({"params": p}, x, t, ctx, mask, added_cond)

    latents = diffusion_sampling(
        unet_fn,
        te,
        None,
        NoiseSchedule.sdxl(),
        prompt="a photo",
        neg_prompt="",
        num_steps=4,
        num_samples=2,
        cfg_scale=1.0,  # distilled-guidance convention: no CFG doubling
        width=128,
        height=128,
        denoiser_cls=RFDenoiser,
        get_sigma_func=lambda n: get_sigmas_for_rf(n, max_sigma=80.0),
        return_latents=True,
        unet_params=params,
    )
    assert latents.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_flux_lora_adapter_training():
    """LoRA preset targets Flux's attention/MLP kernels (incl. the
    single-block fused proj_mlp/proj_out) through the standard adapter
    machinery; only adapter params train."""
    from uwudiff_tpu.diffusion import NoiseSchedule, RectifiedFlowLoss
    from uwudiff_tpu.training import DMTrainer

    trainer = DMTrainer(
        model_config={
            "unet": Flux.from_config("tiny", context_dim=32, pooled_dim=32),
            "te": None,
            "vae": None,
        },
        lr=1e-2,
        use_warm_up=False,
        loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.sdxl()),
        lycoris_config={
            "targets": [
                {
                    "pattern": r".*attn\d/(to_q|to_k|to_v|to_out)/kernel$",
                    "algo": "lora",
                    "dim": 2,
                },
                {
                    "pattern": r".*(proj_mlp|proj_out)/kernel$",
                    "algo": "lora",
                    "dim": 2,
                },
            ]
        },
        seed=0,
    )
    rng_np = np.random.default_rng(0)
    batch = {
        "sample": rng_np.standard_normal((2, 16, 16, 4)).astype(np.float32)
        * 0.2,
        "ctx": rng_np.standard_normal((2, 5, 32)).astype(np.float32),
        "tokenizer_outputs": [],
        "added_cond": {
            "text_embeds": rng_np.standard_normal((2, 32)).astype(np.float32)
        },
    }
    losses = [
        float(trainer.train_step(batch)[0]["train/loss"]) for _ in range(10)
    ]
    assert losses[-1] < losses[0], losses
    # adapter specs actually latched onto flux paths (incl. single blocks)
    names = list(trainer.adapter.params)
    assert any("single_blocks" in n for n in names), names[:5]
    assert any("attn1" in n for n in names), names[:5]
