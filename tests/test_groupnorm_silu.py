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
    """Regression: the [16,1024,1920] concat GN overflowed the 16MB
    scoped-VMEM limit by 44KB on hardware at chunk=512 because the gate
    only counted the bf16 in/out tiles. The chunk shrink must cut the
    fp32 temps so the single-pass kernel's full footprint fits, and
    wider tiles must route to the chunked-stats path."""
    import uwudiff_tpu.ops.groupnorm_silu as gns

    x = jnp.zeros((16, 32, 32, 1920), jnp.bfloat16)
    assert fused_supported(x, 32)
    # chunk shrinks for wide channels so fp32 temps stay bounded
    chunk = gns._chunk_for(1024, 1920)
    assert chunk is not None and 2 * chunk * 1920 * 4 <= gns._CHUNK_TEMP_BYTES
    assert 1024 % chunk == 0  # halving preserves divisibility into hw
    # with the shrunk chunk the full footprint fits -> single-pass kept
    assert gns._tile_fits_vmem(x)
    # the old accounting (in/out only, 7.5MB <= 8MB) admitted it at
    # chunk=512 for a true 16.3MB footprint; the new gate would reject
    # that combination
    io = 2 * 1024 * 1920 * 2
    assert io + 2 * 512 * 1920 * 4 + 1920 * 128 * 4 > gns._VMEM_TILE_BYTES
    # wider tiles (1024px concat levels) still route to chunked stats
    big = jnp.zeros((4, 64, 64, 1920), jnp.bfloat16)
    assert fused_supported(big, 32)
    assert not gns._tile_fits_vmem(big)
    # [16,4096,640] overflowed the limit at 2x the io estimate
    # (hw_logs/adapter14_cn_fusedgn.log): the io cap must keep any
    # io > 8MB shape on the chunked path
    mid = jnp.zeros((16, 64, 64, 640), jnp.bfloat16)
    assert fused_supported(mid, 32)
    assert not gns._tile_fits_vmem(mid)
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
