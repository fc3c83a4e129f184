"""IP-Adapter: decoupled cross-attention no-op-at-init, projections-only
training, CFG negative-image handling, e2e sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.ip_adapter import (
    ImageProjection,
    build_ip_unet_fn,
    is_ip_param,
    merge_overlay,
    partition_by_path,
)
from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
from uwudiff_tpu.models.unet import UNet2DConditionModel


def test_partition_and_merge_roundtrip():
    tree = {
        "a": {"to_k_ip": {"kernel": jnp.ones(2)}, "w": jnp.zeros(2)},
        "b": {"to_v_ip": {"kernel": jnp.ones(3)}},
        "c": jnp.ones(1),
    }
    sel, rest = partition_by_path(tree, is_ip_param)
    assert "to_k_ip" in sel["a"] and "w" not in sel.get("a", {})
    assert "b" in sel and "c" not in sel
    assert "c" in rest and "w" in rest["a"] and "b" not in rest
    merged = merge_overlay(rest, sel)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(tree),
        jax.tree_util.tree_leaves_with_path(merged),
    ):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def _ip_setup():
    # default (non-near-zero) out-projection init: the from-scratch
    # zero-family init crushes any attention contribution to ~1e-9,
    # hiding the ip branch from the "shifts output" assertions
    unet = UNet2DConditionModel.from_config("tiny", zero_init_stddev=-1.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32))
    ip_tokens = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32))
    params = unet.init(
        rng, x, t, ctx, None, None, ip_hidden_states=ip_tokens
    )["params"]
    return unet, params, (x, t, ctx, ip_tokens)


def test_ip_adapter_noop_at_init_and_param_presence():
    """Zero-init to_v_ip => output with image tokens EQUALS the plain
    forward; the ip params exist only in cross-attention (attn2)."""
    unet, params, (x, t, ctx, ip_tokens) = _ip_setup()
    ip_paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
        if "ip" in jax.tree_util.keystr(p)
    ]
    assert ip_paths and all("attn2" in p for p in ip_paths)

    with_ip = unet.apply(
        {"params": params}, x, t, ctx, None, None,
        ip_hidden_states=ip_tokens,
    )
    # plain forward works with the superset params (branch not taken)
    without = unet.apply({"params": params}, x, t, ctx, None, None)
    np.testing.assert_array_equal(np.asarray(with_ip), np.asarray(without))


def test_ip_adapter_tokens_shift_output_when_live():
    unet, params, (x, t, ctx, ip_tokens) = _ip_setup()
    # kick to_v_ip off zero
    live = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.1 if "to_v_ip" in jax.tree_util.keystr(p) else v,
        params,
    )
    base = unet.apply({"params": live}, x, t, ctx, None, None)
    out = unet.apply(
        {"params": live}, x, t, ctx, None, None,
        ip_hidden_states=ip_tokens,
    )
    assert float(jnp.abs(out - base).max()) > 1e-5
    # different image tokens -> different output
    out2 = unet.apply(
        {"params": live}, x, t, ctx, None, None,
        ip_hidden_states=ip_tokens + 1.0,
    )
    assert float(jnp.abs(out2 - out).max()) > 1e-6


def test_ip_trainer_projections_only():
    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.training import IPAdapterTrainer

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    trainer = IPAdapterTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": te,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        ip_embed_dim=16,
        ip_num_tokens=4,
        ip_dropout_prob=0.5,
        seed=0,
    )
    ds = DummyDataset(
        sample_size=(16, 16, 4), ip_embed_dim=16, n_samples=4
    )
    ds.set_tokenizers(trainer.tokenizers)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["ip_embeds"].shape == (2, 16)

    unet_before = None
    for _ in range(5):
        metrics, aux = trainer.train_step(batch)
        if unet_before is None:
            unet_before = jax.tree_util.tree_map(
                np.asarray, trainer.frozen["unet"]
            )
        assert np.isfinite(float(metrics["train/loss"]))
        assert float(metrics["train/grad_norm"]) > 0
    # trainable: ip projections + image proj only
    assert set(trainer.state.params) == {"unet_ip", "image_proj"}
    for p, _ in jax.tree_util.tree_leaves_with_path(
        trainer.state.params["unet_ip"]
    ):
        assert is_ip_param(jax.tree_util.keystr(p))
    # frozen UNet untouched
    unet_after = jax.tree_util.tree_map(np.asarray, trainer.frozen["unet"])
    for a, b in zip(
        jax.tree_util.tree_leaves(unet_before),
        jax.tree_util.tree_leaves(unet_after),
    ):
        np.testing.assert_array_equal(a, b)


def test_ip_sampling_end_to_end_with_cfg():
    """build_ip_unet_fn under CFG: cond half gets the image tokens,
    uncond half the zero-embedding projection."""
    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.models.text_encoders import TextEncodingPipeline
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.sampling import diffusion_sampling

    unet, params, (x, t, ctx, ip_tokens) = _ip_setup()
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.1 if "to_v_ip" in jax.tree_util.keystr(p) else v,
        params,
    )
    proj = ImageProjection(cross_attention_dim=32, num_tokens=4)
    proj_params = proj.init(jax.random.PRNGKey(3), jnp.zeros((1, 16)))[
        "params"
    ]
    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    tok = SimpleTokenizer()
    tok_out = [{k: jnp.asarray(v) for k, v in tok(["x"]).items()}]
    te_params = te.init(jax.random.PRNGKey(0), tok_out)["params"]
    te_pipe = TextEncodingPipeline(te, te_params, [tok])

    unet_fn = build_ip_unet_fn(unet, proj)
    embeds = jax.random.normal(jax.random.PRNGKey(5), (2, 16))
    all_params = {
        "unet": params, "image_proj": proj_params, "ip_embeds": embeds
    }
    latents = diffusion_sampling(
        unet_fn, te_pipe, None,
        train_schedule=NoiseSchedule.sdxl(),
        prompt=["a", "b"], neg_prompt=["", ""],
        num_steps=3, num_samples=2, cfg_scale=2.0,
        width=64, height=64, return_latents=True,
        unet_params=all_params,
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()

    # the image embedding matters
    all_params2 = dict(all_params, ip_embeds=embeds * 5.0)
    latents2 = diffusion_sampling(
        unet_fn, te_pipe, None,
        train_schedule=NoiseSchedule.sdxl(),
        prompt=["a", "b"], neg_prompt=["", ""],
        num_steps=3, num_samples=2, cfg_scale=2.0,
        width=64, height=64, return_latents=True,
        unet_params=all_params2,
    )
    assert float(jnp.abs(latents2 - latents).max()) > 1e-5


def test_ip_unet_fn_batch_routing():
    """Ambiguous batch sizes raise; explicit cfg=False tiles the COND
    tokens over the whole batch (no silent zero-image back half)."""
    unet, params, (x, t, ctx, ip_tokens) = _ip_setup()
    proj = ImageProjection(cross_attention_dim=32, num_tokens=4)
    proj_params = proj.init(jax.random.PRNGKey(3), jnp.zeros((1, 16)))[
        "params"
    ]
    embeds = jax.random.normal(jax.random.PRNGKey(5), (1, 16))
    all_params = {
        "unet": params, "image_proj": proj_params, "ip_embeds": embeds
    }
    x4 = jnp.tile(x, (2, 1, 1, 1))
    t4 = jnp.tile(t, (2,))
    ctx4 = jnp.tile(ctx, (2, 1, 1))

    # b=4, n=1 is ambiguous (k=4 single-pass or k=2 CFG): must raise
    import pytest

    with pytest.raises(AssertionError, match="ambiguous"):
        build_ip_unet_fn(unet, proj)(all_params, x4, t4, ctx4, None, None)

    # explicit single-pass: equals per-sample application with the
    # SAME (conditional) image tokens everywhere
    out = build_ip_unet_fn(unet, proj, cfg=False)(
        all_params, x4, t4, ctx4, None, None
    )
    tokens = proj.apply({"params": proj_params}, embeds)
    ref = unet.apply(
        {"params": params}, x4, t4, ctx4, None, None,
        ip_hidden_states=jnp.tile(tokens, (4, 1, 1)),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # explicit CFG on b=4: back half gets the zero-embedding projection
    out_cfg = build_ip_unet_fn(unet, proj, cfg=True)(
        all_params, x4, t4, ctx4, None, None
    )
    neg = proj.apply({"params": proj_params}, jnp.zeros_like(embeds))
    ref_cfg = unet.apply(
        {"params": params}, x4, t4, ctx4, None, None,
        ip_hidden_states=jnp.concatenate(
            [jnp.tile(tokens, (2, 1, 1)), jnp.tile(neg, (2, 1, 1))]
        ),
    )
    np.testing.assert_array_equal(np.asarray(out_cfg), np.asarray(ref_cfg))
