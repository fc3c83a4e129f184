"""Flash-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.ops.attention import _xla_attention, attention_bias_from_mask
from uwudiff_tpu.ops.flash_attention import flash_attention, flash_shape_supported


def _rand_qkv(b=2, sq=256, sk=256, h=2, d=64, seed=0, dtype=jnp.float32):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype)
    k = jax.random.normal(kk, (b, sk, h, d), dtype)
    v = jax.random.normal(kv, (b, sk, h, d), dtype)
    return q, k, v


def test_shape_gate():
    q, k, v = _rand_qkv(d=64)
    assert flash_shape_supported(q, k, v)
    # odd-but-aligned head dims (SD1.5's 40) are supported
    q, k, v = _rand_qkv(d=40)
    assert flash_shape_supported(q, k, v)
    # tiny sequences fall back to XLA
    q, k, v = _rand_qkv(sq=64, sk=64)
    assert not flash_shape_supported(q, k, v)
    # short KV (cross-attention): XLA wins isolated at every measured
    # shape (stage-4, hw_logs/xattn4_*.log), BUT at >= 8192 queries the
    # XLA logits materialization stops the full rematted step from
    # compiling (bench5_sd15_1024) — flash takes over there.
    import os

    q, _, _ = _rand_qkv(sq=4096)
    _, k, v = _rand_qkv(sk=77)
    assert not flash_shape_supported(q, k, v)
    q, _, _ = _rand_qkv(sq=1024)
    assert not flash_shape_supported(q, k, v)
    q16, _, _ = _rand_qkv(sq=16384)
    assert flash_shape_supported(q16, k, v)
    os.environ["UWU_FLASH_XATTN"] = "1"
    try:
        assert flash_shape_supported(q, k, v)
    finally:
        os.environ.pop("UWU_FLASH_XATTN")
    os.environ["UWU_FLASH_XATTN"] = "0"
    try:
        assert not flash_shape_supported(q16, k, v)
    finally:
        os.environ.pop("UWU_FLASH_XATTN")
    # a short query (text-encoder self-attn) always falls back
    q, k, v = _rand_qkv(sq=77, sk=77)
    assert not flash_shape_supported(q, k, v)
    # unaligned head dim falls back
    q, k, v = _rand_qkv(d=36)
    assert not flash_shape_supported(q, k, v)


def test_matches_xla_reference():
    q, k, v = _rand_qkv()
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unaligned_seq_lengths():
    """Padding with -inf key bias must be exact for ragged lengths."""
    q, k, v = _rand_qkv(sq=200, sk=300)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    ref = _xla_attention(q, k, v)
    assert out.shape == (2, 200, 2, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_key_padding_mask():
    q, k, v = _rand_qkv(sk=256)
    mask = jnp.concatenate(
        [jnp.ones((2, 100), jnp.int32), jnp.zeros((2, 156), jnp.int32)], axis=1
    )
    bias = attention_bias_from_mask(mask)
    out = flash_attention(q, k, v, bias=bias, interpret=True,
                          block_q=128, block_k=128)
    ref = _xla_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # masked keys must not influence output: permute masked-out keys
    k2 = k.at[:, 100:].set(jax.random.normal(jax.random.PRNGKey(9), k[:, 100:].shape))
    out2 = flash_attention(q, k2, v, bias=bias, interpret=True,
                           block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-5)


def test_cross_attention_shapes():
    q, _, _ = _rand_qkv(sq=1024)
    _, k, v = _rand_qkv(sk=128)
    out = flash_attention(q, k, v, interpret=True, block_q=256, block_k=128)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_inputs():
    q, k, v = _rand_qkv(dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    ref = _xla_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_short_kv_cross_attention():
    """UNet cross-attention shape: Sk=77 text tokens, long image query.
    Padding K/V to one block with -inf bias must be exact in both
    directions (this is the shape the relaxed dispatch gate admits)."""
    q, _, _ = _rand_qkv(sq=256)
    _, k, v = _rand_qkv(sk=77)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    ref = _xla_attention(q, k, v)
    assert out.shape == (2, 256, 2, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_flash(q, k, v):
        return (
            flash_attention(q, k, v, interpret=True,
                            block_q=128, block_k=128) ** 2
        ).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_gradients_match_xla():
    q, k, v = _rand_qkv(sq=128, sk=128)

    def loss_flash(q, k, v):
        return flash_attention(
            q, k, v, interpret=True, block_q=128, block_k=128
        ).sum()

    def loss_ref(q, k, v):
        return _xla_attention(q, k, v).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gradients_with_mask_and_ragged():
    """Backward kernels must respect key masks and padded lengths."""
    q, k, v = _rand_qkv(sq=200, sk=300)
    mask = jnp.concatenate(
        [jnp.ones((2, 250), jnp.int32), jnp.zeros((2, 50), jnp.int32)], axis=1
    )
    bias = attention_bias_from_mask(mask)

    def loss_flash(q, k, v):
        return (
            flash_attention(q, k, v, bias=bias, interpret=True,
                            block_q=128, block_k=128) ** 2
        ).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, bias=bias) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_full_bias_matches_xla():
    """[B, H, Sq, Sk] additive biases stream as [BQ, BK] blocks."""
    q, k, v = _rand_qkv(sq=256, sk=256)
    bias = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 256, 256)) * 2.0
    out = flash_attention(q, k, v, bias=bias, interpret=True,
                          block_q=128, block_k=128)
    ref = _xla_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_full_bias_broadcast_heads_and_ragged():
    """[B, 1, Sq, Sk] broadcast over heads + unaligned lengths."""
    q, k, v = _rand_qkv(sq=200, sk=300)
    bias = jax.random.normal(jax.random.PRNGKey(8), (2, 1, 200, 300))
    out = flash_attention(q, k, v, bias=bias, interpret=True,
                          block_q=128, block_k=128)
    ref = _xla_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_full_bias_qkv_gradients_match_xla():
    """q/k/v grads with a constant full bias (bias itself has no grad on
    the default path - pass bias_grad=True for learned biases)."""
    q, k, v = _rand_qkv(sq=128, sk=128)
    bias = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 128, 128))

    def loss_flash(q, k, v):
        return flash_attention(
            q, k, v, bias=bias, interpret=True, block_q=128, block_k=128
        ).sum()

    def loss_ref(q, k, v):
        return _xla_attention(q, k, v, bias=bias).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bias_gradient_default_is_zero():
    """Document the default: without bias_grad=True the flash path treats
    the bias as a constant (masks)."""
    q, k, v = _rand_qkv(sq=128, sk=128)
    bias = jax.random.normal(jax.random.PRNGKey(10), (2, 2, 128, 128))
    g = jax.grad(
        lambda b_: flash_attention(
            q, k, v, bias=b_, interpret=True, block_q=128, block_k=128
        ).sum()
    )(bias)
    assert float(jnp.abs(g).max()) == 0.0


@pytest.mark.parametrize(
    "bias_shape", [(2, 2, 128, 128), (1, 1, 128, 128), (2, 1, 1, 128)]
)
def test_bias_gradients_match_xla(bias_shape):
    """bias_grad=True: true dBias from the dQ kernel, on full biases,
    broadcast biases, and key biases (VERDICT r2 item 4)."""
    q, k, v = _rand_qkv(sq=128, sk=128)
    bias = jax.random.normal(jax.random.PRNGKey(11), bias_shape)

    def loss_flash(q, k, v, b_):
        return (
            flash_attention(q, k, v, bias=b_, bias_grad=True, interpret=True,
                            block_q=128, block_k=128) ** 2
        ).sum()

    def loss_ref(q, k, v, b_):
        return (_xla_attention(q, k, v, bias=b_) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bias_gradients_ragged_lengths():
    """Learned-bias grads must stay exact under sequence padding: padded
    key columns get -inf bias, whose grad contribution must not leak
    into the real bias entries."""
    q, k, v = _rand_qkv(sq=200, sk=200)
    bias = jax.random.normal(jax.random.PRNGKey(12), (2, 2, 200, 200))

    gf = jax.grad(
        lambda b_: (
            flash_attention(q, k, v, bias=b_, bias_grad=True, interpret=True,
                            block_q=128, block_k=128) ** 2
        ).sum()
    )(bias)
    gr = jax.grad(
        lambda b_: (_xla_attention(q, k, v, bias=b_) ** 2).sum()
    )(bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4)


def test_t5_rel_pos_bias_trains_through_dispatch():
    """The T5 relative-position bias must receive nonzero, XLA-matching
    gradients through dot_product_attention on the flash path."""
    from uwudiff_tpu.ops.attention import dot_product_attention

    q, k, v = _rand_qkv(sq=128, sk=128)
    bias = jax.random.normal(jax.random.PRNGKey(13), (1, 2, 128, 128))

    g_flash = jax.grad(
        lambda b_: dot_product_attention(
            q, k, v, bias=b_, scale=1.0, use_flash=True, bias_grad=True
        ).sum()
    )(bias)
    g_xla = jax.grad(
        lambda b_: dot_product_attention(
            q, k, v, bias=b_, scale=1.0, use_flash=False
        ).sum()
    )(bias)
    assert float(jnp.abs(g_flash).max()) > 0.0
    np.testing.assert_allclose(
        np.asarray(g_flash), np.asarray(g_xla), atol=5e-4
    )
