"""Ring attention (sequence-parallel over a `seq` mesh axis) vs the
single-device reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from uwudiff_tpu.ops.attention import _xla_attention
from uwudiff_tpu.parallel import make_mesh
from uwudiff_tpu.parallel.ring_attention import (
    attention_with_lse,
    ring_attention,
)


def _qkv(b=2, s=64, h=4, d=16, seed=0):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    return (
        jax.random.normal(kq, (b, s, h, d)),
        jax.random.normal(kk, (b, s, h, d)),
        jax.random.normal(kv, (b, s, h, d)),
    )


def test_attention_with_lse_matches_reference():
    q, k, v = _qkv()
    out, lse = attention_with_lse(q, k, v)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert lse.shape == (2, 4, 64)


def _ring_sharded(q, k, v, key_bias=None):
    mesh = make_mesh({"seq": 8})
    spec = P(None, "seq")
    in_specs = [spec, spec, spec]
    args = [q, k, v]
    if key_bias is not None:
        in_specs.append(P(None, "seq"))
        args.append(key_bias)

        def fn(q, k, v, kb):
            return ring_attention(q, k, v, axis_name="seq", key_bias=kb)

    else:

        def fn(q, k, v):
            return ring_attention(q, k, v, axis_name="seq")

    sharded = shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=spec,
        check_vma=False,
    )
    placed = [
        jax.device_put(a, NamedSharding(mesh, s))
        for a, s in zip(args, in_specs)
    ]
    return jax.jit(sharded)(*placed)


def test_ring_attention_matches_full_attention():
    q, k, v = _qkv(s=64)
    out = _ring_sharded(q, k, v)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_with_key_bias():
    q, k, v = _qkv(s=64, seed=1)
    # mask out the last 24 keys (crosses shard boundaries: 8 shards of 8)
    kb = jnp.where(jnp.arange(64)[None, :] < 40, 0.0, -1e30)
    kb = jnp.broadcast_to(kb, (2, 64))
    out = _ring_sharded(q, k, v, key_bias=kb)
    ref = _xla_attention(q, k, v, bias=kb[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_gradients():
    q, k, v = _qkv(s=32, seed=2)
    mesh = make_mesh({"seq": 8})
    spec = P(None, "seq")
    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )

    def loss_ring(q, k, v):
        return (ring(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v) ** 2).sum()

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gt = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
