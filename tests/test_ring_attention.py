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


def test_attention_with_lse_flash_dispatch_matches_einsum():
    """The ring inner step must give identical (out, lse) and gradients
    whether it runs the Pallas kernel (interpret on CPU) or the einsum
    formulation — the docstring's composition claim, made true in r3."""
    q, k, v = _qkv(s=256, h=2, d=64, seed=3)

    out_f, lse_f = attention_with_lse(q, k, v, use_flash=True)
    out_e, lse_e = attention_with_lse(q, k, v, use_flash=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_f), np.asarray(lse_e), atol=2e-5)

    def loss(uf):
        def f(q, k, v):
            o, l = attention_with_lse(q, k, v, use_flash=uf)
            # both outputs in the loss so the lse cotangent is exercised
            return (o**2).sum() + 0.1 * l.sum()

        return f

    gf = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_trainer_seq_parallel_matches_unsharded(monkeypatch):
    """End-to-end: a tiny UNet trained on mesh_axes={'data':2, 'seq':4}
    must match the data-parallel-only run step for step — and the ring
    path must actually engage (VERDICT r2 item 3)."""
    import uwudiff_tpu.ops.attention as att
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    def make_trainer(mesh_axes):
        return DMTrainer(
            model_config={
                "unet": UNet2DConditionModel.from_config(
                    "tiny", cross_attention_dim=None
                ),
                "te": None,
                "vae": None,
            },
            lr=1e-3,
            use_warm_up=False,
            loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
            grad_clip=1.0,
            mesh_axes=mesh_axes,
            seed=0,
        )

    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((4, 16, 16, 4)).astype(np.float32) * 0.1,
        "tokenizer_outputs": [],
        "added_cond": {
            "time_ids": np.tile(
                np.asarray([[16, 16, 0, 0, 16, 16]], np.float32), (4, 1)
            )
        },
    }

    ring_hits = []
    orig = att._maybe_ring

    def spy(q, k, v, bias, scale, use_flash=None):
        out = orig(q, k, v, bias, scale, use_flash)
        if out is not None:
            ring_hits.append(tuple(q.shape))
        return out

    monkeypatch.setattr(att, "_maybe_ring", spy)

    key = jax.random.PRNGKey(7)
    ref_losses = []
    t_ref = make_trainer({"data": 2})
    for _ in range(3):
        m, _ = t_ref.train_step(batch, key)
        ref_losses.append(float(m["train/loss"]))
    assert not ring_hits  # no seq axis -> normal path

    seq_losses = []
    t_seq = make_trainer({"data": 2, "seq": 4})
    for _ in range(3):
        m, _ = t_seq.train_step(batch, key)
        seq_losses.append(float(m["train/loss"]))
    assert ring_hits, "seq mesh active but ring attention never engaged"
    # every engaged call saw the full token axis, sharded inside shard_map
    assert all(s[1] % 4 == 0 for s in ring_hits)
    np.testing.assert_allclose(seq_losses, ref_losses, rtol=2e-4)


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


import pytest


@pytest.mark.parametrize("family", ["mmdit", "flux"])
def test_trainer_seq_parallel_joint_attention(monkeypatch, family):
    """The sequence_parallel context is model-agnostic: MMDiT/Flux JOINT
    attention (one unmasked self-attention over [text; image]) also
    rides the ring when the joint token count divides the seq axis —
    loss parity vs the data-parallel-only run, and the ring must
    actually engage on the joint length."""
    import uwudiff_tpu.ops.attention as att
    from uwudiff_tpu.diffusion import NoiseSchedule, RectifiedFlowLoss
    from uwudiff_tpu.training import DMTrainer

    def make_model():
        if family == "mmdit":
            from uwudiff_tpu.models.mmdit import MMDiT

            return MMDiT.from_config("tiny")
        from uwudiff_tpu.models.flux import Flux

        return Flux.from_config("tiny")

    def make_trainer(mesh_axes):
        return DMTrainer(
            model_config={"unet": make_model(), "te": None, "vae": None},
            lr=1e-3,
            use_warm_up=False,
            loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.sdxl()),
            grad_clip=1.0,
            mesh_axes=mesh_axes,
            seed=0,
        )

    rng = np.random.default_rng(0)
    # 16x16 latents @ patch 2 -> 64 image tokens; 8 text tokens -> the
    # 72-token joint sequence divides seq=4
    batch = {
        "sample": rng.standard_normal((4, 16, 16, 4)).astype(np.float32)
        * 0.1,
        "ctx": rng.standard_normal((4, 8, 48)).astype(np.float32),
        "tokenizer_outputs": [],
        "added_cond": {
            "text_embeds": rng.standard_normal((4, 24)).astype(np.float32)
        },
    }

    ring_hits = []
    orig = att._maybe_ring

    def spy(q, k, v, bias, scale, use_flash=None):
        out = orig(q, k, v, bias, scale, use_flash)
        if out is not None:
            ring_hits.append(tuple(q.shape))
        return out

    monkeypatch.setattr(att, "_maybe_ring", spy)

    key = jax.random.PRNGKey(7)
    t_ref = make_trainer({"data": 2})
    ref_losses = [
        float(t_ref.train_step(batch, key)[0]["train/loss"])
        for _ in range(3)
    ]
    assert not ring_hits

    t_seq = make_trainer({"data": 2, "seq": 4})
    seq_losses = [
        float(t_seq.train_step(batch, key)[0]["train/loss"])
        for _ in range(3)
    ]
    assert ring_hits, "seq mesh active but ring never engaged"
    assert all(s[1] == 72 for s in ring_hits), ring_hits  # joint length
    np.testing.assert_allclose(seq_losses, ref_losses, rtol=2e-4)
