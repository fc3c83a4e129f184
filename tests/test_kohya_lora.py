"""kohya/A1111 LoRA file-format conversion tests.

The kohya naming convention is pinned against hand-written literal
keys (sd-scripts ``create_network_from_weights`` layout), and the
weight semantics against a manual torch-convention computation
``W' = W + (alpha/r) * up @ down`` — independent of the converter's
own table builder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training.adapters import AdapterConfig, AdapterTarget, \
    LycorisAdapter
from uwudiff_tpu.training.kohya_lora import (
    export_kohya_lora,
    import_kohya_lora,
    kohya_module_name,
    load_kohya_lora,
    save_kohya_lora,
)


def _unet_and_params(**overrides):
    unet = UNet2DConditionModel.from_config(
        "tiny", zero_init_stddev=-1.0, **overrides)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = unet.init(rng, x, jnp.zeros((1,)), ctx)["params"]
    return unet, params, (x, jnp.zeros((1,)), ctx)


def _attn_ff_adapter(unet, params, seed=1, dim=4, alpha=2.0):
    cfg = AdapterConfig(targets=(
        AdapterTarget(pattern=r".*attn\d/(to_q|to_k|to_v|to_out)/kernel$",
                      algo="lora", dim=dim, alpha=alpha),
        AdapterTarget(pattern=r".*/ff/(proj_in|proj_out)/kernel$",
                      algo="lora", dim=dim, alpha=alpha),
    ))
    adapter = LycorisAdapter.create(unet, params, cfg,
                                    jax.random.PRNGKey(seed))
    # randomize lora_up away from zero so values round-trip non-trivially
    rng = np.random.default_rng(seed)
    adapter.params = {
        name: {k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
               for k, v in leaves.items()}
        for name, leaves in adapter.params.items()
    }
    return adapter


def test_kohya_module_name():
    assert kohya_module_name(
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"
    ) == ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
          "_attn1_to_q")
    assert kohya_module_name(
        "text_model.encoder.layers.3.mlp.fc1.weight", prefix="lora_te1"
    ) == "lora_te1_text_model_encoder_layers_3_mlp_fc1"


def test_export_naming_and_layout():
    unet, params, _ = _unet_and_params()
    adapter = _attn_ff_adapter(unet, params)
    sd = export_kohya_lora(adapter, params)
    # sd-scripts literal key layout for the tiny UNet's first attention
    mod = ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
           "_attn1_to_q")
    assert mod + ".lora_down.weight" in sd
    assert mod + ".lora_up.weight" in sd
    assert mod + ".alpha" in sd
    down = sd[mod + ".lora_down.weight"]
    up = sd[mod + ".lora_up.weight"]
    assert down.shape[0] == 4 and up.shape[1] == 4  # torch [r,in]/[out,r]
    assert float(sd[mod + ".alpha"]) == 2.0
    assert all(v.flags["C_CONTIGUOUS"] for v in sd.values())
    # to_out keeps its ModuleList index like sd-scripts does
    assert any(k.endswith("_attn1_to_out_0.alpha") for k in sd)


def test_roundtrip_exact():
    unet, params, _ = _unet_and_params()
    adapter = _attn_ff_adapter(unet, params)
    sd = export_kohya_lora(adapter, params)
    back = import_kohya_lora(sd, params)
    assert sorted(back.specs) == sorted(adapter.specs)
    for name in adapter.params:
        assert back.specs[name]["alpha"] == adapter.specs[name]["alpha"]
        assert back.specs[name]["dim"] == adapter.specs[name]["dim"]
        for leaf in ("lora_down", "lora_up"):
            np.testing.assert_array_equal(
                np.asarray(back.params[name][leaf]),
                np.asarray(adapter.params[name][leaf]),
            )
    # merged weights identical up to one fp32 reassociation ULP. (The
    # adapter leaves round-trip BITWISE — asserted above; the merge
    # matmul itself is not guaranteed a stable accumulation order
    # across XLA:CPU kernel selections — observed 4.8e-7 drift when a
    # persistent compile cache built on different host CPU features is
    # loaded, round 4.)
    merged_a = adapter.merge(params)
    merged_b = back.merge(params)
    for a, b in zip(jax.tree_util.tree_leaves(merged_a),
                    jax.tree_util.tree_leaves(merged_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        )


def test_import_torch_convention_oracle():
    """A hand-built kohya entry must merge as W' = W + (a/r) up@down in
    torch layout — checked through the flax merge."""
    unet, params, _ = _unet_and_params()
    rng = np.random.default_rng(0)
    r, alpha = 3, 1.5
    kernel = params["down_0_attn_0"]["blocks_0"]["attn1"]["to_q"]["kernel"]
    d_in, d_out = kernel.shape
    down = rng.normal(size=(r, d_in)).astype(np.float32)
    up = rng.normal(size=(d_out, r)).astype(np.float32)
    mod = ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
           "_attn1_to_q")
    sd = {
        mod + ".lora_down.weight": down,
        mod + ".lora_up.weight": up,
        mod + ".alpha": np.float32(alpha),
    }
    adapter = import_kohya_lora(sd, params)
    merged = adapter.merge(params)
    got = merged["down_0_attn_0"]["blocks_0"]["attn1"]["to_q"]["kernel"]
    # torch: W'[out,in] = W[out,in] + (a/r) up@down; flax kernel is W.T
    want = np.asarray(kernel) + (alpha / r) * (up @ down).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_scanned_stack_roundtrip():
    unet, params, _ = _unet_and_params(scan_transformer_blocks=True)
    adapter = _attn_ff_adapter(unet, params)
    stacked = [n for n, s in adapter.specs.items() if s["stack"]]
    if not stacked:
        pytest.skip("tiny config has no multi-layer stacks")
    sd = export_kohya_lora(adapter, params)
    back = import_kohya_lora(sd, params)
    for name in adapter.params:
        for leaf in ("lora_down", "lora_up"):
            np.testing.assert_array_equal(
                np.asarray(back.params[name][leaf]),
                np.asarray(adapter.params[name][leaf]),
            )


def test_conv_locon_roundtrip_and_oracle():
    unet, params, _ = _unet_and_params()
    cfg = AdapterConfig(
        targets=(AdapterTarget(pattern=r".*res_\d/conv1/kernel$",
                               algo="lora", dim=2, alpha=2.0),),
        enable_conv=True,
    )
    adapter = LycorisAdapter.create(unet, params, cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    adapter.params = {
        name: {k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
               for k, v in leaves.items()}
        for name, leaves in adapter.params.items()
    }
    sd = export_kohya_lora(adapter, params)
    mod = next(k for k in sd if k.endswith(".lora_down.weight"))
    down = sd[mod]
    assert down.ndim == 4 and down.shape[0] == 2  # [r, cin, kh, kw]
    up = sd[mod.replace("lora_down", "lora_up")]
    assert up.shape[1:] == (2, 1, 1)  # [out, r, 1, 1]
    back = import_kohya_lora(sd, params)
    for name in adapter.params:
        for leaf in ("lora_down", "lora_up"):
            np.testing.assert_array_equal(
                np.asarray(back.params[name][leaf]),
                np.asarray(adapter.params[name][leaf]),
            )
    # conv oracle: effective torch delta kernel [out, cin, kh, kw]
    name = next(iter(adapter.params))
    spec = adapter.specs[name]
    kh, kw, cin, cout = spec["shape"]
    r = spec["dim"]
    d = np.asarray(sd[mod])  # [r, cin, kh, kw]
    u = np.asarray(sd[mod.replace("lora_down", "lora_up")])[:, :, 0, 0]
    delta_torch = np.einsum("or,rchw->ochw", u, d) * (spec["alpha"] / r)
    merged = back.merge(params)
    flat = dict(
        (tuple(str(getattr(p, "key", p)) for p in path), leaf)
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(merged)[0]
    )
    key = tuple(name.split("/"))
    got = np.asarray(flat[key])
    base = np.asarray(
        dict((tuple(str(getattr(p, "key", p)) for p in path), leaf)
             for path, leaf in
             jax.tree_util.tree_flatten_with_path(params)[0])[key]
    )
    # flax kernel HWIO; torch OIHW
    np.testing.assert_allclose(
        got - base, delta_torch.transpose(2, 3, 1, 0), rtol=1e-4, atol=1e-5
    )


def test_strict_false_skips_te_modules(tmp_path):
    unet, params, _ = _unet_and_params()
    adapter = _attn_ff_adapter(unet, params)
    sd = export_kohya_lora(adapter, params)
    sd["lora_te_text_model_encoder_layers_0_mlp_fc1.lora_down.weight"] = \
        np.zeros((4, 8), np.float32)
    sd["lora_te_text_model_encoder_layers_0_mlp_fc1.lora_up.weight"] = \
        np.zeros((8, 4), np.float32)
    sd["lora_te_text_model_encoder_layers_0_mlp_fc1.alpha"] = np.float32(4)
    # te keys are outside the lora_unet prefix: ignored entirely
    back = import_kohya_lora(sd, params)
    assert sorted(back.specs) == sorted(adapter.specs)
    # an unknown unet module errors under strict, skips otherwise
    sd["lora_unet_mid_block_attentions_9_to_nowhere.lora_down.weight"] = \
        np.zeros((4, 8), np.float32)
    sd["lora_unet_mid_block_attentions_9_to_nowhere.lora_up.weight"] = \
        np.zeros((8, 4), np.float32)
    with pytest.raises(KeyError):
        import_kohya_lora(sd, params)
    back = import_kohya_lora(sd, params, strict=False)
    assert sorted(back.specs) == sorted(adapter.specs)


def test_save_load_file(tmp_path):
    unet, params, _ = _unet_and_params()
    adapter = _attn_ff_adapter(unet, params)
    path = str(tmp_path / "adapter.safetensors")
    save_kohya_lora(adapter, params, path)
    back = load_kohya_lora(path, params)
    for name in adapter.params:
        np.testing.assert_array_equal(
            np.asarray(back.params[name]["lora_down"]),
            np.asarray(adapter.params[name]["lora_down"]),
        )
