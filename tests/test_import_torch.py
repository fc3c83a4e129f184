"""Round-trip test of the torch-checkpoint importer: synthesize a
diffusers-style state dict from our params (inverse transforms), import
it back, and require exact recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.clip import CLIPTextModel
from uwudiff_tpu.models.import_torch import (
    clip_text_key_map,
    extract_state_dict,
    import_params,
    unet_key_map,
)
from uwudiff_tpu.models.unet import UNet2DConditionModel


def _synth_torch_sd(params, key_map):
    """Build a torch-naming state dict whose import recovers `params`."""
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        our = "/".join(str(getattr(p, "key", p)) for p in path)
        torch_key, tr = key_map(our)
        arr = np.asarray(leaf)
        if tr == "proj":
            tr_name = "linear" if arr.ndim == 2 else "conv"
        elif tr.__name__ == "_t_linear":
            tr_name = "linear"
        elif tr.__name__ == "_t_conv":
            tr_name = "conv"
        else:
            tr_name = "id"
        if tr_name == "linear":
            sd[torch_key] = np.transpose(arr, (1, 0))
        elif tr_name == "conv":
            sd[torch_key] = np.transpose(arr, (3, 2, 0, 1))
        else:
            sd[torch_key] = arr
    return sd


@pytest.mark.parametrize("preset", ["tiny", "tiny_sdxl"])
def test_unet_import_roundtrip(preset):
    unet = UNet2DConditionModel.from_config(preset, zero_init_stddev=-1.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    added = (
        {
            "time_ids": jnp.zeros((1, 6)),
            "text_embeds": jnp.zeros((1, 16)),
        }
        if preset == "tiny_sdxl"
        else None
    )
    params = unet.init(rng, x, jnp.zeros((1,)), ctx, None, added)["params"]

    sd = _synth_torch_sd(params, unet_key_map)
    # keys follow diffusers naming conventions
    assert any(k.startswith("down_blocks.") for k in sd)
    assert any("transformer_blocks.0.attn1.to_q.weight" in k for k in sd)

    zeros = jax.tree_util.tree_map(lambda v: jnp.zeros_like(v), params)
    imported = import_params(zeros, sd, unet_key_map)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(imported)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_clip_import_roundtrip():
    model = CLIPTextModel.from_config("tiny", projection_dim=16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(rng, ids)["params"]
    sd = _synth_torch_sd(params, clip_text_key_map)
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    zeros = jax.tree_util.tree_map(lambda v: jnp.zeros_like(v), params)
    imported = import_params(zeros, sd, clip_text_key_map)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(imported)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_extract_state_dict():
    sd = {"model.a": 1, "model.b": 2, "other": 3}
    out = extract_state_dict(sd, prefix="model.")
    assert out == {"a": 1, "b": 2}
    nested = {"state_dict": sd}
    out = extract_state_dict(nested, key="state_dict", prefix="model.")
    assert out == {"a": 1, "b": 2}


def test_import_shape_mismatch_raises():
    unet = UNet2DConditionModel.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    params = unet.init(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)), jnp.zeros((1, 8, 32))
    )["params"]
    sd = _synth_torch_sd(params, unet_key_map)
    bad_key = "conv_in.weight"
    sd[bad_key] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_params(params, sd, unet_key_map)


@pytest.mark.parametrize("preset", ["tiny", "tiny_sdxl"])
def test_export_params_roundtrip(preset):
    """export_params is the exact inverse of import_params: a trained
    tree exports to diffusers naming and imports back bit-identical."""
    from uwudiff_tpu.models.import_torch import export_params

    unet = UNet2DConditionModel.from_config(preset, zero_init_stddev=-1.0)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    added = (
        {"time_ids": jnp.zeros((1, 6)), "text_embeds": jnp.zeros((1, 16))}
        if preset == "tiny_sdxl"
        else None
    )
    params = unet.init(
        jax.random.PRNGKey(1), x, jnp.zeros((1,)), ctx, None, added
    )["params"]

    sd = export_params(params, unet_key_map)
    assert any(k.startswith("down_blocks.") for k in sd)
    # matches the synthetic-fixture layout exactly
    ref = _synth_torch_sd(params, unet_key_map)
    assert set(sd) == set(ref)
    for k in sd:
        np.testing.assert_allclose(sd[k], np.asarray(ref[k], np.float32))

    zeros = jax.tree_util.tree_map(lambda v: jnp.zeros_like(v), params)
    back = import_params(zeros, sd, unet_key_map)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_export_params_scanned_stack():
    """Scanned (nn.scan) param stacks export one torch entry per layer,
    identical to exporting the unrolled model."""
    from uwudiff_tpu.models.import_torch import export_params
    from uwudiff_tpu.models.transformer import Transformer2DModel

    kwargs = dict(
        num_heads=2, head_dim=16, num_layers=3, cross_attention_dim=24,
        use_linear_projection=True,
    )
    x = jnp.zeros((1, 4, 4, 32))
    ctx = jnp.zeros((1, 7, 24))
    unrolled = Transformer2DModel(**kwargs, scan_blocks=False)
    p_unrolled = unrolled.init(jax.random.PRNGKey(2), x, ctx)["params"]
    from uwudiff_tpu.models.import_torch import stack_block_params

    p_scanned = stack_block_params(p_unrolled)

    # nest under a UNet-style prefix so unet_key_map applies (the
    # /blocks/ stack detection reads the full tree path)
    sd_a = export_params({"mid_attn": p_unrolled}, unet_key_map)
    sd_b = export_params({"mid_attn": p_scanned}, unet_key_map)
    assert set(sd_a) == set(sd_b)
    for k in sd_a:
        np.testing.assert_allclose(sd_a[k], sd_b[k])
