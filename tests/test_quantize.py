"""Int8 weight-only quantization: per-channel error bounds, tree
structure preservation, jit-traceable dequant, end-to-end serving."""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.ops.quantize import (
    dequantize_tree,
    quantize_tree,
    quantized_bytes,
)


def _tree():
    rng = np.random.default_rng(0)
    return {
        "dense": {
            "kernel": jnp.asarray(
                rng.standard_normal((64, 128)), jnp.float32
            ),
            "bias": jnp.asarray(rng.standard_normal(128), jnp.float32),
        },
        "conv": {
            "kernel": jnp.asarray(
                rng.standard_normal((3, 3, 32, 64)), jnp.float32
            )
        },
        "norm": {"scale": jnp.ones(32), "bias": jnp.zeros(32)},
        "tiny": {"kernel": jnp.ones((4, 4))},  # below min_size
    }


def test_quantize_selects_large_kernels_only():
    q = quantize_tree(_tree())
    assert "__q8__" in q["dense"]["kernel"]
    assert "__q8__" in q["conv"]["kernel"]
    assert q["dense"]["kernel"]["__q8__"].dtype == jnp.int8
    # biases / norms / tiny kernels untouched
    assert isinstance(q["dense"]["bias"], jnp.ndarray)
    assert isinstance(q["norm"]["scale"], jnp.ndarray)
    assert isinstance(q["tiny"]["kernel"], jnp.ndarray)
    qb, tb = quantized_bytes(q)
    assert qb == 64 * 128 + 3 * 3 * 32 * 64


def test_roundtrip_error_bound():
    t = _tree()
    deq = dequantize_tree(quantize_tree(t), dtype=jnp.float32)
    for name in ("dense", "conv"):
        orig = np.asarray(t[name]["kernel"], np.float32)
        back = np.asarray(deq[name]["kernel"], np.float32)
        # per-channel absmax / 127 / 2 error bound (+f32 rounding slack)
        absmax = np.max(
            np.abs(orig), axis=tuple(range(orig.ndim - 1)), keepdims=True
        )
        bound = absmax / 127.0 * 0.5001
        assert np.all(np.abs(orig - back) <= bound + 1e-7)
    # structure identical to the original
    assert jax.tree_util.tree_structure(
        deq
    ) == jax.tree_util.tree_structure(t)


def test_dequant_inside_jit():
    t = _tree()
    q = quantize_tree(t)

    @jax.jit
    def f(qp, x):
        p = dequantize_tree(qp, dtype=jnp.float32)
        return x @ p["dense"]["kernel"] + p["dense"]["bias"]

    x = jnp.ones((2, 64))
    ref = x @ dequantize_tree(q, jnp.float32)["dense"]["kernel"] + t[
        "dense"
    ]["bias"]
    np.testing.assert_allclose(np.asarray(f(q, x)), np.asarray(ref), rtol=1e-5)


def test_quantized_serving_pipeline_close_to_fp():
    from uwudiff_tpu.diffusion import NoiseSchedule
    from uwudiff_tpu.models.text_encoders import (
        ConcatTextEncoders,
        TextEncodingPipeline,
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.serving import Txt2ImgPipeline

    unet = UNet2DConditionModel.from_config("tiny")
    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    tok = SimpleTokenizer()
    te_params = te.init(
        jax.random.PRNGKey(0), [tok(["x"], padding="max_length")]
    )["params"]
    te_pipe = TextEncodingPipeline(te, te_params, [tok])
    x = jnp.zeros((1, 8, 8, 4))
    uparams = unet.init(
        jax.random.PRNGKey(1), x, jnp.zeros((1,)),
        jnp.zeros((1, 77, te.text_models[0].hidden_size)), None, None
    )["params"]

    def unet_fn(params, x, t, ctx, mask, added):
        return unet.apply({"params": params}, x, t, ctx, mask, added)

    common = dict(
        te_pipeline=te_pipe,
        vae_decode=None,
        schedule=NoiseSchedule.sdxl(),
        unet_params=uparams,
    )
    fp = Txt2ImgPipeline(unet_fn, **common)
    q8 = Txt2ImgPipeline(unet_fn, **common, quantize_weights=True)
    kw = dict(
        num_steps=2, num_samples=1, width=64, height=64, seed=3,
        return_latents=True, jit_compile=False,
    )
    lat_fp = np.asarray(fp(prompt="a cat", **kw))
    lat_q8 = np.asarray(q8(prompt="a cat", **kw))
    assert lat_fp.shape == lat_q8.shape
    # int8 weights perturb the output only slightly (same scale field)
    denom = np.abs(lat_fp).mean() + 1e-6
    assert np.abs(lat_q8 - lat_fp).mean() / denom < 0.15
    # and the quantized tree really is int8-backed
    from uwudiff_tpu.ops.quantize import quantized_bytes

    qb, tb = quantized_bytes(q8.unet_params)
    assert qb > 0
