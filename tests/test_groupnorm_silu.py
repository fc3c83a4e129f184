"""Fused GroupNorm+SiLU kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.ops.groupnorm_silu import (
    _gn_silu,
    fused_supported,
    group_norm_silu,
    group_norm_silu_reference,
)


def _data(n=2, h=16, w=16, c=64, seed=0, dtype=jnp.float32):
    rng = jax.random.PRNGKey(seed)
    kx, kg, kb = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (n, h, w, c), dtype) * 2.0 + 0.5
    gamma = jax.random.normal(kg, (c,)) * 0.2 + 1.0
    beta = jax.random.normal(kb, (c,)) * 0.1
    return x, gamma, beta


def test_reference_matches_flax_groupnorm():
    import flax.linen as nn

    x, gamma, beta = _data()
    ref = group_norm_silu_reference(x, gamma, beta, groups=32, eps=1e-5)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    flax_out = nn.silu(
        gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(flax_out), atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 16, 16, 64), (1, 8, 8, 320), (2, 32, 32, 64)])
def test_kernel_matches_reference(shape):
    n, h, w, c = shape
    x, gamma, beta = _data(n, h, w, c)
    groups = 32
    assert fused_supported(x, groups)
    out = _gn_silu(x, gamma, beta, groups, 1e-5, True)  # interpret
    ref = group_norm_silu_reference(x, gamma, beta, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_chunked_stats_path():
    # hw = 32*32 = 1024 > 512 chunk: exercises the fori_loop accumulation
    x, gamma, beta = _data(1, 32, 32, 64)
    out = _gn_silu(x, gamma, beta, 8, 1e-5, True)
    ref = group_norm_silu_reference(x, gamma, beta, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_big_tile_chunked_kernel_path(monkeypatch):
    """Tiles over the VMEM budget (1024px levels) take the chunked-stats
    Pallas kernel + fused XLA apply (VERDICT r2 item 8). Shrink the
    budget so the path triggers at test sizes."""
    import uwudiff_tpu.ops.groupnorm_silu as gns

    monkeypatch.setattr(gns, "_VMEM_TILE_BYTES", 64 * 1024)
    x, gamma, beta = _data(2, 32, 32, 64)  # 1024x64 f32 tile = 512KB >> 64KB
    assert fused_supported(x, 8)
    assert not gns._tile_fits_vmem(x)
    out = _gn_silu(x, gamma, beta, 8, 1e-5, True)
    ref = group_norm_silu_reference(x, gamma, beta, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients flow through the custom VJP on the chunked path too
    g = jax.grad(
        lambda x_: _gn_silu(x_, gamma, beta, 8, 1e-5, True).sum()
    )(x)
    gr = jax.grad(
        lambda x_: group_norm_silu_reference(x_, gamma, beta, 8, 1e-5).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_big_tile_chunked_bf16(monkeypatch):
    import uwudiff_tpu.ops.groupnorm_silu as gns

    monkeypatch.setattr(gns, "_VMEM_TILE_BYTES", 64 * 1024)
    x, gamma, beta = _data(1, 32, 32, 64, dtype=jnp.bfloat16)
    out = _gn_silu(x, gamma, beta, 8, 1e-5, True)
    ref = group_norm_silu_reference(x, gamma, beta, 8, 1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_kernel_bf16():
    x, gamma, beta = _data(dtype=jnp.bfloat16)
    out = _gn_silu(x, gamma, beta, 32, 1e-5, True)
    ref = group_norm_silu_reference(x, gamma, beta, 32, 1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_gradients_match_reference():
    x, gamma, beta = _data(1, 8, 8, 64)

    def loss_fused(x, g, b):
        return (_gn_silu(x, g, b, 32, 1e-5, True) ** 2).sum()

    def loss_ref(x, g, b):
        return (group_norm_silu_reference(x, g, b, 32, 1e-5) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_wide_channel_scoped_vmem_accounting():
    """Regression for THREE measured scoped-VMEM overflows: the concat
    GN [.,1024,1920] hit 16.04M at chunk=512 (adapter13) AND 16.05M at
    chunk=256 (sampler21 — chunk-independent, so chunk shrink is NOT a
    fix), and [.,4096,640] hit 20.0M (adapter14). All three equal
    2*(in+out) + onehot: Mosaic double-buffers the grid-mapped blocks.
    Every shape Mosaic measured as overflowing must route to the
    chunked-stats path; the shapes that historically compiled must
    stay single-pass."""
    import uwudiff_tpu.ops.groupnorm_silu as gns

    # measured-overflow shapes -> chunked path (still fused_supported)
    for shape in [(16, 32, 32, 1920), (32, 32, 32, 1920),
                  (16, 64, 64, 640), (4, 64, 64, 1920)]:
        x = jnp.zeros(shape, jnp.bfloat16)
        assert fused_supported(x, 32), shape
        assert not gns._tile_fits_vmem(x), shape
        # the double-buffer model predicts each measured overflow
        hw, c = shape[1] * shape[2], shape[3]
        assert 4 * hw * c * 2 + c * 128 * 4 > gns._VMEM_TILE_BYTES
    # historically-compiling single-pass shapes stay admitted
    for shape in [(8, 64, 64, 320), (8, 32, 32, 1280), (8, 32, 32, 640),
                  (8, 16, 16, 2560)]:
        x = jnp.zeros(shape, jnp.bfloat16)
        assert fused_supported(x, 32), shape
        assert gns._tile_fits_vmem(x), shape
    # chunk shrink still bounds the fp32 temps for wide channels
    chunk = gns._chunk_for(1024, 1920)
    assert chunk is not None and 2 * chunk * 1920 * 4 <= gns._CHUNK_TEMP_BYTES
    assert 1024 % chunk == 0  # halving preserves divisibility into hw
    # narrow channels keep the full 512 chunk
    assert gns._chunk_for(4096, 320) == 512


def test_wide_channel_chunk_shrink_numerics(monkeypatch):
    """The shrunk-chunk single-pass kernel stays exact (interpret)."""
    import uwudiff_tpu.ops.groupnorm_silu as gns

    monkeypatch.setattr(gns, "_CHUNK_TEMP_BYTES", 64 * 1024)
    x, gamma, beta = _data(1, 16, 16, 64)
    chunk = gns._chunk_for(256, 64)
    assert chunk is not None and chunk < 256  # shrink actually engaged
    out = _gn_silu(x, gamma, beta, 8, 1e-5, True)
    ref = group_norm_silu_reference(x, gamma, beta, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dispatch_gates():
    x, gamma, beta = _data(c=64)
    assert fused_supported(x, 32)
    assert not fused_supported(x, 7)  # c % groups
    bad = jnp.zeros((1, 600, 36))  # c % 8
    assert not fused_supported(bad, 4)
    # tiles > VMEM are supported since r3 (chunked-stats path)
    huge = jnp.zeros((1, 1 << 16, 1024), jnp.float32)
    assert fused_supported(huge, 32)
    from uwudiff_tpu.ops.groupnorm_silu import _tile_fits_vmem

    assert not _tile_fits_vmem(huge)
    odd_hw = jnp.zeros((1, 520, 1, 64))  # hw not chunkable
    assert not fused_supported(odd_hw, 8)
    # dispatch on CPU silently uses the reference (no pallas)
    out = group_norm_silu(x, gamma, beta, 32)
    ref = group_norm_silu_reference(x, gamma, beta, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 16, 16, 64), 32),   # single chunk, batch 2
        ((2, 32, 32, 64), 8),    # hw=1024 -> 2 chunks of 512
        ((1, 32, 32, 96), 32),   # group_size 3 (repeat path)
    ],
)
def test_pallas_backward_matches_reference(shape, groups):
    """The round-5 Pallas GN+SiLU backward (3-pass chunked scheme) is
    exact against XLA autodiff of the reference formulation."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    ct = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def fused(x, g, b):
        return (_gn_silu(x, g, b, groups, 1e-5, True) * ct).sum()

    def ref(x, g, b):
        return (
            group_norm_silu_reference(x, g, b, groups, 1e-5) * ct
        ).sum()

    gf = jax.grad(fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b, name in zip(gf, gr, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-5,
            err_msg=name,
        )


def test_pallas_backward_bf16_io():
    """bf16 activations/cotangents: fp32 internal accumulation keeps
    grads close to the fp32 reference path."""
    rng = np.random.default_rng(3)
    shape = (2, 16, 16, 64)
    x32 = rng.standard_normal(shape).astype(np.float32)
    g32 = rng.standard_normal(64).astype(np.float32)
    b32 = rng.standard_normal(64).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    gamma, beta = jnp.asarray(g32), jnp.asarray(b32)

    def fused(x, g, b):
        return (_gn_silu(x, g, b, 32, 1e-5, True).astype(jnp.float32) ** 2).sum()

    def ref(x, g, b):
        return (group_norm_silu_reference(x, g, b, 32, 1e-5) ** 2).sum()

    gf = jax.grad(fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(ref, argnums=(0, 1, 2))(jnp.asarray(x32), gamma, beta)
    assert gf[0].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gf[0], np.float32), np.asarray(gr[0]),
        rtol=2e-2, atol=6e-2,
    )
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                               rtol=3e-2, atol=3e-2)


def test_backward_env_gate_falls_back(monkeypatch):
    monkeypatch.setenv("UWU_FUSED_GN_BWD", "0")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    gf = jax.grad(
        lambda x: (_gn_silu(x, gamma, beta, 32, 1e-5, True) ** 2).sum()
    )(x)
    gr = jax.grad(
        lambda x: (
            group_norm_silu_reference(x, gamma, beta, 32, 1e-5) ** 2
        ).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)
