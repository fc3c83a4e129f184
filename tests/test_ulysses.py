"""Ulysses (head all-to-all) sequence parallelism vs single-device
attention — the second `seq`-axis strategy beside ring attention."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from uwudiff_tpu.ops.attention import _xla_attention
from uwudiff_tpu.parallel import make_mesh
from uwudiff_tpu.parallel.ulysses import ulysses_attention


def _qkv(b=2, s=64, h=8, d=16, seed=0):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    return (
        jax.random.normal(kq, (b, s, h, d)),
        jax.random.normal(kk, (b, s, h, d)),
        jax.random.normal(kv, (b, s, h, d)),
    )


def _sharded(fn_builder, args, n=8):
    mesh = make_mesh({"seq": n})
    spec = P(None, "seq")
    sharded = shard_map(
        fn_builder(), mesh=mesh,
        in_specs=(spec,) * len(args), out_specs=spec, check_vma=False,
    )
    placed = [jax.device_put(a, NamedSharding(mesh, spec)) for a in args]
    return sharded(*placed)


def test_ulysses_matches_full_attention():
    q, k, v = _qkv()
    out = _sharded(
        lambda: functools.partial(ulysses_attention, axis_name="seq"),
        [q, k, v],
    )
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_with_key_bias():
    q, k, v = _qkv()
    kb = jnp.where(jnp.arange(64)[None, :] < 40, 0.0, -1e30)
    kb = jnp.broadcast_to(kb, (2, 64))

    def build():
        def fn(q, k, v, kb):
            return ulysses_attention(q, k, v, axis_name="seq", key_bias=kb)

        return fn

    out = _sharded(build, [q, k, v, kb])
    ref = _xla_attention(q, k, v, bias=kb[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_rejects_indivisible_heads():
    q, k, v = _qkv(h=6)  # 6 % 8 != 0
    with pytest.raises(Exception, match="divisible|ulysses"):
        _sharded(
            lambda: functools.partial(ulysses_attention, axis_name="seq"),
            [q, k, v],
        )


def test_ulysses_gradients():
    q, k, v = _qkv(s=32, h=8)
    mesh = make_mesh({"seq": 4})
    spec = P(None, "seq")
    sharded = shard_map(
        functools.partial(ulysses_attention, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )

    def loss_sh(q, k, v):
        return (sharded(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v) ** 2).sum()

    gs = jax.grad(loss_sh, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_trainer_ulysses_matches_unsharded(monkeypatch):
    """DMTrainer(sequence_parallel_method='ulysses') on a
    mesh_axes={'data':2,'seq':4} mesh matches the data-parallel run and
    actually routes through the ulysses path."""
    import uwudiff_tpu.parallel.ulysses as uly
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    def make_trainer(mesh_axes, method="ring"):
        return DMTrainer(
            model_config={
                # 4 heads so the seq=4 axis divides every attention
                "unet": UNet2DConditionModel.from_config(
                    "tiny", cross_attention_dim=None, num_attention_heads=4
                ),
                "te": None,
                "vae": None,
            },
            lr=1e-3,
            use_warm_up=False,
            loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
            grad_clip=1.0,
            mesh_axes=mesh_axes,
            sequence_parallel_method=method,
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

    hits = []
    orig = uly.ulysses_attention

    def spy(q, k, v, axis_name, **kw):
        hits.append(tuple(q.shape))
        return orig(q, k, v, axis_name, **kw)

    monkeypatch.setattr(uly, "ulysses_attention", spy)

    key = jax.random.PRNGKey(7)
    ref_losses = []
    t_ref = make_trainer({"data": 2})
    for _ in range(3):
        m, _ = t_ref.train_step(batch, key)
        ref_losses.append(float(m["train/loss"]))
    assert not hits

    uly_losses = []
    t_u = make_trainer({"data": 2, "seq": 4}, method="ulysses")
    for _ in range(3):
        m, _ = t_u.train_step(batch, key)
        uly_losses.append(float(m["train/loss"]))
    assert hits, "seq mesh + ulysses method but the ulysses path never ran"
    np.testing.assert_allclose(uly_losses, ref_losses, rtol=2e-4)
