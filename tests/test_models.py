import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.clip import CLIPTextModel
from uwudiff_tpu.models.t5 import T5EncoderModel
from uwudiff_tpu.models.text_encoders import (
    ConcatTextEncoders,
    TextEncodingPipeline,
    TextModelExtraConfig,
)
from uwudiff_tpu.models.tokenizers import SimpleTokenizer
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.models.vae import AutoencoderKL


def test_tiny_unet_forward_shape():
    unet = UNet2DConditionModel.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([0, 500])
    ctx = jnp.zeros((2, 8, 32))
    params = unet.init(rng, x, t, ctx)["params"]
    out = unet.apply({"params": params}, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_tiny_unet_zero_init_output_small():
    """From-scratch init zero-inits conv_out -> output ~0 regardless of input
    (unet_patch.py:29-31 semantics)."""
    unet = UNet2DConditionModel.from_config("tiny")
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    ctx = jax.random.normal(rng, (1, 8, 32))
    t = jnp.array([100])
    params = unet.init(rng, x, t, ctx)["params"]
    out = unet.apply({"params": params}, x, t, ctx)
    assert float(jnp.abs(out).max()) < 1e-2


def test_tiny_sdxl_unet_added_cond():
    unet = UNet2DConditionModel.from_config("tiny_sdxl")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([0.5, 500.2])  # continuous t (RF) must work
    ctx = jnp.zeros((2, 8, 32))
    added = {
        "time_ids": jnp.tile(
            jnp.array([[1024.0, 1024, 0, 0, 1024, 1024]]), (2, 1)
        ),
        "text_embeds": jnp.zeros((2, 16)),
    }
    params = unet.init(rng, x, t, ctx, None, added)["params"]
    out = unet.apply({"params": params}, x, t, ctx, None, added)
    assert out.shape == (2, 16, 16, 4)


def test_tiny_unet_rope_and_mask():
    unet = UNet2DConditionModel.from_config("tiny", use_rope=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(rng, (1, 8, 32))
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]])
    params = unet.init(rng, x, t, ctx, mask)["params"]
    out = unet.apply({"params": params}, x, t, ctx, mask)
    assert out.shape == (1, 16, 16, 4)
    # params contain learned rope freqs
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("freqs_h" in jax.tree_util.keystr(p) for p, _ in flat)


def test_unet_gradient_checkpointing_same_output():
    kwargs = {}
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    unet_a = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    unet_b = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, gradient_checkpointing=True
    )
    params = unet_a.init(rng, x, t, ctx)["params"]
    out_a = unet_a.apply({"params": params}, x, t, ctx)
    out_b = unet_b.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-4)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    variables = vae.init(rng, x, rng)
    dist = vae.apply(variables, x, method=AutoencoderKL.encode)
    assert dist.mean.shape == (2, 16, 16, 4)
    z = dist.sample(rng)
    recon = vae.apply(variables, z, method=AutoencoderKL.decode)
    assert recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(dist.kl())).all()


def test_clip_text_model_outputs():
    model = CLIPTextModel.from_config("tiny")
    tok = SimpleTokenizer(vocab_size=1024, model_max_length=16)
    batch = tok(["hello world", "a cat"])
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])
    )["params"]
    out = model.apply(
        {"params": params},
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
        layer_idx=-2,
    )
    assert out.last_hidden_state.shape == (2, 16, 32)
    assert out.pooler_output.shape == (2, 32)
    assert len(out.hidden_states) == 3  # embeddings + 2 layers
    # embedding is the penultimate hidden state
    np.testing.assert_allclose(
        np.asarray(out.embedding), np.asarray(out.hidden_states[-2])
    )


def test_t5_encoder_output():
    model = T5EncoderModel.from_config("tiny")
    tok = SimpleTokenizer(vocab_size=1024, model_max_length=12)
    batch = tok(["some text"])
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(batch["input_ids"])
    mask = jnp.asarray(batch["attention_mask"])
    params = model.init(rng, ids, mask)["params"]
    out = model.apply({"params": params}, ids, mask)
    assert out.last_hidden_state.shape == (1, 12, 32)


def _make_sdxl_style_stack():
    """CLIP-L-like + CLIP-bigG-like in bucket 0 + T5 in bucket 1."""
    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny", "hidden_size": 32,
                 "num_heads": 2, "intermediate_size": 64},
                {"use_pooled": False, "layer_idx": -2},
            ),
            (
                {"model_type": "clip", "preset": "tiny", "hidden_size": 48,
                 "num_heads": 2, "intermediate_size": 96},
                {"use_pooled": True, "layer_idx": -2},
            ),
            (
                {"model_type": "t5", "preset": "tiny", "d_model": 16},
                {"concat_bucket": 1, "need_mask": True},
            ),
        ],
        zero_for_padding=False,
    )
    return te


def test_concat_text_encoders_buckets():
    te = _make_sdxl_style_stack()
    toks = [
        SimpleTokenizer(model_max_length=8),
        SimpleTokenizer(model_max_length=8),
        SimpleTokenizer(model_max_length=6),
    ]
    outs = [
        {k: jnp.asarray(v) for k, v in t(["hi there", "foo"]).items()}
        for t in toks
    ]
    rng = jax.random.PRNGKey(0)
    params = te.init(rng, outs)["params"]
    emb, normed, pooled, mask = te.apply({"params": params}, outs)
    # bucket 0: 32+48=80 features, seq 8; bucket 1: 16 -> padded to 80, seq 6
    assert emb.shape == (2, 14, 80)
    assert normed.shape == (2, 14, 80)
    assert pooled.shape == (2, 48)  # only model 2 pooled
    assert mask.shape == (2, 14)
    # bucket 0 has no need_mask model -> its mask positions are all ones
    assert np.asarray(mask)[:, :8].all()


def test_concat_text_encoders_pad_context_to():
    """SD3 no-T5 mode: the CLIP-pair context zero-pads to the
    checkpoint's context width (what the T5 bucket would have forced),
    driven by `pad_context_to` (configs/demo_training_latent_sd3.yaml)."""
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders

    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "layer_idx": -2},
            )
        ],
        pad_context_to=96,
    )
    tok = SimpleTokenizer(model_max_length=8)
    outs = [{k: jnp.asarray(v) for k, v in tok(["hi", "yo"]).items()}]
    params = te.init(jax.random.PRNGKey(0), outs)["params"]
    emb, normed, pooled, _ = te.apply({"params": params}, outs)
    assert emb.shape == (2, 8, 96)
    assert normed.shape == (2, 8, 96)
    # the pad is zeros beyond the real 32-wide features
    assert np.abs(np.asarray(emb)[..., :32]).max() > 0
    np.testing.assert_allclose(np.asarray(emb)[..., 32:], 0.0)
    np.testing.assert_allclose(np.asarray(normed)[..., 32:], 0.0)


def test_sd3_true_scale_config_parses():
    """The SD3-at-true-scale overlay builds real module objects (no
    init — sd3_medium is 2.0B) with the released architecture."""
    import os

    from uwudiff_tpu.config import instantiate_any, load_config_files

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    cfg = load_config_files(
        [
            os.path.join(root, "configs/demo_training_mmdit.yaml"),
            os.path.join(root, "configs/demo_training_latent_sd3.yaml"),
        ]
    )
    model_cfg = dict(cfg["trainer"]["model_config"])
    unet = instantiate_any(model_cfg["unet"])
    assert unet.context_pre_only and unet.pos_embed_max_size == 192
    assert unet.depth == 24 and unet.in_channels == 16
    te_cfg = dict(model_cfg["te"])
    te_cfg.pop("_load_config_", None)  # consumed by the trainer/loader
    te = instantiate_any(te_cfg)
    assert te.pad_context_to == 4096
    assert len(te.text_models) == 2


def test_pipeline_nested_encode():
    te = _make_sdxl_style_stack()
    toks = [
        SimpleTokenizer(model_max_length=8),
        SimpleTokenizer(model_max_length=8),
        SimpleTokenizer(model_max_length=6),
    ]
    dummy = [{k: jnp.asarray(v) for k, v in t(["x"]).items()} for t in toks]
    rng = jax.random.PRNGKey(0)
    params = te.init(rng, dummy)["params"]
    pipe = TextEncodingPipeline(te, params, toks)
    emb, normed, pooled, mask = pipe.encode(
        [["cap one", "cap two"], ["only cap"]], nested=True
    )
    # 2 images, max 2 captions, seq 14 each -> [2, 28, 80]
    assert emb.shape == (2, 28, 80)
    assert pooled.shape == (2, 48)
    assert mask.shape == (2, 28)
    # second image's second caption slot is zero-padded
    np.testing.assert_allclose(np.asarray(emb[1, 14:]), 0.0)


def test_unet_remat_policy_same_output():
    """Selective remat (policy) must be numerically identical too."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    unet_a = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    unet_b = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, gradient_checkpointing=True,
        remat_policy="dots_with_no_batch_dims_saveable",
    )
    params = unet_a.init(rng, x, t, ctx)["params"]
    out_a = unet_a.apply({"params": params}, x, t, ctx)
    out_b = unet_b.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-4)
    # gradients flow through the policy-rematted blocks
    g = jax.grad(
        lambda p: unet_b.apply({"params": p}, x, t, ctx).sum()
    )(params)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(g)[0])
    ).all()


def test_unet_save_names_remat_policy():
    """The named-checkpoint policy (save attention/FF/resnet outputs,
    recompute the rest) is output- and gradient-identical to plain
    full-block remat."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    unet_full = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, gradient_checkpointing=True
    )
    unet_named = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, gradient_checkpointing=True,
        remat_policy="save_names:attn_out,ffn_out,resnet_out",
    )
    params = unet_full.init(rng, x, t, ctx)["params"]

    def loss(unet):
        return lambda p: (
            unet.apply({"params": p}, x, t, ctx).astype(jnp.float32) ** 2
        ).mean()

    l_full, g_full = jax.value_and_grad(loss(unet_full))(params)
    l_named, g_named = jax.value_and_grad(loss(unet_named))(params)
    np.testing.assert_allclose(float(l_full), float(l_named), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_named)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_save_names_remat_policy_scanned():
    """The named policy composes with scan-of-remat (scanned stacks)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    unet_named = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, gradient_checkpointing=True,
        scan_transformer_blocks=True,
        remat_policy="save_names:attn_out,ffn_out",
    )
    params = unet_named.init(rng, x, t, ctx)["params"]
    out = unet_named.apply({"params": params}, x, t, ctx)
    g = jax.grad(
        lambda p: unet_named.apply({"params": p}, x, t, ctx).sum()
    )(params)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()


def test_freeu():
    """FreeU: no new params, identity at (b=1, s=1), real settings
    change the output; the fourier filter kills low frequencies at
    scale=0."""
    from uwudiff_tpu.models.unet import _fourier_filter

    # filter unit behavior: a constant image is pure low-frequency
    const = jnp.ones((1, 8, 8, 2)) * 3.0
    filt = _fourier_filter(const, threshold=1, scale=0.0)
    assert float(jnp.abs(filt).max()) < 1e-4
    ident = _fourier_filter(const, threshold=1, scale=1.0)
    np.testing.assert_allclose(np.asarray(ident), 3.0, atol=1e-5)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    base = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    params = base.init(rng, x, t, ctx)["params"]

    neutral = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, freeu=(1.0, 1.0, 1.0, 1.0)
    )
    # identical param tree: enable on trained weights with no surgery
    import jax.tree_util as jtu

    assert jtu.tree_structure(
        neutral.init(rng, x, t, ctx)["params"]
    ) == jtu.tree_structure(params)

    out_base = base.apply({"params": params}, x, t, ctx)
    out_neutral = neutral.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_neutral), atol=1e-4
    )

    active = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, freeu=(1.5, 1.6, 0.9, 0.2)
    )
    out_active = active.apply({"params": params}, x, t, ctx)
    assert not np.allclose(
        np.asarray(out_base), np.asarray(out_active), atol=1e-3
    )


def test_sd21_preset_and_clip_h():
    """SD2.1 family point: per-block head counts follow the
    64-dim-per-head rule, OpenCLIP-H text tower shape (23 layers as
    released). Import rides the same unet/clip key maps."""
    from uwudiff_tpu.models.clip import CLIP_PRESETS, CLIPTextModel
    from uwudiff_tpu.models.unet import UNET_PRESETS, UNet2DConditionModel

    cfg = UNET_PRESETS["sd21"]
    assert cfg["cross_attention_dim"] == 1024
    assert cfg["num_attention_heads"] == (5, 10, 20, 20)
    assert cfg["use_linear_projection"]
    m = UNet2DConditionModel.from_config("sd21")
    assert m.block_out_channels == (320, 640, 1280, 1280)

    h = CLIP_PRESETS["clip_h"]
    assert (h["hidden_size"], h["num_layers"], h["hidden_act"]) == (
        1024, 23, "gelu",
    )
    te = CLIPTextModel.from_config("clip_h")
    assert te.intermediate_size == 4096
