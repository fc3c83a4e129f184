"""Pipeline parallelism (GPipe over a `pipe` mesh axis) vs the
single-device reference (SURVEY.md §2.3: PP absent in the reference;
this is the framework's extension slot)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.dit import DiT
from uwudiff_tpu.parallel import make_mesh, pipeline_blocks, pipelined_dit_apply


def _toy_stack(l=8, d=16, seed=0):
    rng = jax.random.PRNGKey(seed)
    kw, kb = jax.random.split(rng)
    # per-layer params: {'w': [D, D], 'b': [D]} stacked on a layer axis
    return {
        "w": jax.random.normal(kw, (l, d, d)) * (d**-0.5),
        "b": jax.random.normal(kb, (l, d)) * 0.1,
    }


def _toy_block(p, x, extras):
    (c,) = extras
    return jnp.tanh(x @ p["w"] + p["b"]) + c[:, None, :]


def _sequential(params, x, c):
    def body(carry, p):
        return _toy_block(p, carry, (c,)), None

    out, _ = jax.lax.scan(body, x, params)
    return out


def _toy_inputs(b=4, s=8, d=16, seed=1):
    rng = jax.random.PRNGKey(seed)
    kx, kc = jax.random.split(rng)
    return (
        jax.random.normal(kx, (b, s, d)),
        jax.random.normal(kc, (b, d)) * 0.1,
    )


@pytest.mark.parametrize(
    "mesh_axes,m",
    [({"pipe": 8}, None), ({"data": 2, "pipe": 4}, None), ({"pipe": 4}, 2)],
)
def test_pipeline_blocks_matches_sequential(mesh_axes, m):
    params = _toy_stack()
    x, c = _toy_inputs()
    mesh = make_mesh(mesh_axes)
    out = jax.jit(
        lambda p, x, c: pipeline_blocks(
            _toy_block, p, x, (c,), mesh, n_microbatches=m
        )
    )(params, x, c)
    ref = _sequential(params, x, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_blocks_gradients():
    params = _toy_stack()
    x, c = _toy_inputs()
    mesh = make_mesh({"data": 2, "pipe": 4})

    def loss_pipe(p, x, c):
        return (pipeline_blocks(_toy_block, p, x, (c,), mesh) ** 2).sum()

    def loss_ref(p, x, c):
        return (_sequential(p, x, c) ** 2).sum()

    gp = jax.jit(jax.grad(loss_pipe, argnums=(0, 1, 2)))(params, x, c)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, c)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pipeline_blocks_single_stage_degenerate():
    params = _toy_stack(l=4)
    x, c = _toy_inputs()
    mesh = make_mesh({"data": 2})  # no pipe axis size; build pipe=1 mesh
    mesh1 = make_mesh({"data": 2, "pipe": 1})
    out = pipeline_blocks(_toy_block, params, x, (c,), mesh1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(params, x, c)), atol=1e-5
    )
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        pipeline_blocks(_toy_block, params, x, (c,), mesh)


def test_pipeline_blocks_layer_divisibility():
    params = _toy_stack(l=6)
    x, c = _toy_inputs()
    mesh = make_mesh({"pipe": 4})
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(_toy_block, params, x, (c,), mesh)


def _tiny_dit(depth=4, **kw):
    return DiT.from_config("tiny", depth=depth, scan_blocks=True, **kw)


def test_pipelined_dit_matches_plain_apply():
    dit = _tiny_dit()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 8, 8, 4))
    t = jnp.asarray([0.0, 100.0, 500.0, 900.0])
    y = jnp.asarray([1, 2, 3, 4])
    params = dit.init({"params": rng, "dropout": rng}, x, t, y, train=True)[
        "params"
    ]
    assert params["blocks"]["q"]["kernel"].shape[0] == 4  # stacked

    mesh = make_mesh({"data": 2, "pipe": 4})
    ref = dit.apply({"params": params}, x, t, y)
    out = jax.jit(
        lambda p: pipelined_dit_apply(dit, p, x, t, y, mesh)
    )(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients through the pipeline match the plain backward
    def loss_pipe(p):
        return (pipelined_dit_apply(dit, p, x, t, y, mesh) ** 2).sum()

    def loss_ref(p):
        return (dit.apply({"params": p}, x, t, y) ** 2).sum()

    gp = jax.jit(jax.grad(loss_pipe))(params)
    gr = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pipelined_dit_rope_and_remat():
    """RoPE position maps and cell-remat compose with the pipeline."""
    dit = _tiny_dit(use_rope=True, gradient_checkpointing=True)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (4, 8, 8, 4))
    t = jnp.asarray([10.0, 20.0, 30.0, 40.0])
    params = dit.init({"params": rng, "dropout": rng}, x, t, None)["params"]
    mesh = make_mesh({"pipe": 4})
    out = jax.jit(
        lambda p: pipelined_dit_apply(dit, p, x, t, None, mesh)
    )(params)
    ref = dit.apply({"params": params}, x, t, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipelined_dit_requires_scan_blocks():
    dit = DiT.from_config("tiny", depth=4)  # unrolled blocks_0..3
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 8, 8, 4))
    t = jnp.zeros((4,))
    params = dit.init({"params": rng, "dropout": rng}, x, t, None)["params"]
    mesh = make_mesh({"pipe": 4})
    with pytest.raises(ValueError, match="scan_blocks"):
        pipelined_dit_apply(dit, params, x, t, None, mesh)


def test_trainer_pipe_parallel_matches_unsharded():
    """DMTrainer(mesh_axes={'data':2,'pipe':4}) trains a scan_blocks DiT
    step-for-step identically to the data-parallel-only run, with the
    block stack actually stage-sharded."""
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.training import DMTrainer

    def make_trainer(mesh_axes):
        return DMTrainer(
            model_config={
                "unet": _tiny_dit(class_dropout_prob=0.0),
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
        "sample": rng.standard_normal((8, 8, 8, 4)).astype(np.float32) * 0.1,
        "class_labels": np.arange(8, dtype=np.int32) % 10,
        "tokenizer_outputs": [],
    }

    key = jax.random.PRNGKey(7)
    t_ref = make_trainer({"data": 2})
    ref_losses = [
        float(t_ref.train_step(batch, key)[0]["train/loss"]) for _ in range(3)
    ]

    t_pipe = make_trainer({"data": 2, "pipe": 4})
    pipe_losses = [
        float(t_pipe.train_step(batch, key)[0]["train/loss"]) for _ in range(3)
    ]
    np.testing.assert_allclose(pipe_losses, ref_losses, rtol=2e-4)

    # the block stack must be stage-sharded over `pipe`
    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): str(v.sharding.spec)
        for path, v in jax.tree_util.tree_leaves_with_path(
            t_pipe.state.params
        )
    }
    block_specs = [s for p, s in specs.items() if p.startswith("blocks/")]
    assert block_specs and all("pipe" in s for s in block_specs), specs
    non_block = [s for p, s in specs.items() if not p.startswith("blocks/")]
    assert all("pipe" not in s for s in non_block)


def _tiny_mmdit(depth=4, **kw):
    from uwudiff_tpu.models.mmdit import MMDiT

    return MMDiT.from_config("tiny", depth=depth, scan_blocks=True, **kw)


def _mmdit_inputs(b=4, seed=0):
    rng = jax.random.PRNGKey(seed)
    kx, kc, kp = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (b, 8, 8, 4))
    t = jnp.linspace(0.0, 900.0, b)
    ctx = jax.random.normal(kc, (b, 6, 48))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]] * b, jnp.int32)
    added = {"text_embeds": jax.random.normal(kp, (b, 24))}
    return x, t, ctx, mask, added


def test_pipelined_mmdit_matches_plain_apply():
    """The dual-stream (x, ctx) carry pipelines as one pytree — fwd and
    grads match the plain apply, incl. the joint text-mask bias extra."""
    from uwudiff_tpu.parallel.pipeline import pipelined_mmdit_apply

    mmdit = _tiny_mmdit()
    x, t, ctx, mask, added = _mmdit_inputs()
    params = mmdit.init(jax.random.PRNGKey(0), x, t, ctx, mask, added)[
        "params"
    ]
    assert params["blocks"]["attn1"]["to_q"]["kernel"].shape[0] == 4

    mesh = make_mesh({"data": 2, "pipe": 4})
    ref = mmdit.apply({"params": params}, x, t, ctx, mask, added)
    out = jax.jit(
        lambda p: pipelined_mmdit_apply(
            mmdit, p, x, t, ctx, mask, added, mesh
        )
    )(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_pipe(p):
        return (
            pipelined_mmdit_apply(mmdit, p, x, t, ctx, mask, added, mesh)
            ** 2
        ).sum()

    def loss_ref(p):
        return (mmdit.apply({"params": p}, x, t, ctx, mask, added) ** 2).sum()

    gp = jax.jit(jax.grad(loss_pipe))(params)
    gr = jax.grad(loss_ref)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pipelined_mmdit_no_mask_and_remat():
    """mask=None (no bias extra) + cell remat compose with the pipeline."""
    from uwudiff_tpu.parallel.pipeline import pipelined_mmdit_apply

    mmdit = _tiny_mmdit(gradient_checkpointing=True)
    x, t, ctx, _, added = _mmdit_inputs(seed=3)
    params = mmdit.init(jax.random.PRNGKey(1), x, t, ctx, None, added)[
        "params"
    ]
    mesh = make_mesh({"pipe": 4})
    out = jax.jit(
        lambda p: pipelined_mmdit_apply(
            mmdit, p, x, t, ctx, None, added, mesh
        )
    )(params)
    ref = mmdit.apply({"params": params}, x, t, ctx, None, added)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_trainer_pipe_parallel_mmdit_matches_unsharded():
    """DMTrainer drives an MMDiT over {data, pipe} via the batch 'ctx'
    path, matching the data-parallel-only run; blocks stage-sharded."""
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.training import DMTrainer

    def make_trainer(mesh_axes):
        return DMTrainer(
            model_config={"unet": _tiny_mmdit(), "te": None, "vae": None},
            lr=1e-3,
            use_warm_up=False,
            loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
            grad_clip=1.0,
            mesh_axes=mesh_axes,
            seed=0,
        )

    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((8, 8, 8, 4)).astype(np.float32) * 0.1,
        "ctx": rng.standard_normal((8, 6, 48)).astype(np.float32),
        "pooled": rng.standard_normal((8, 24)).astype(np.float32),
        "tokenizer_outputs": [],
    }

    key = jax.random.PRNGKey(7)
    t_ref = make_trainer({"data": 2})
    ref_losses = [
        float(t_ref.train_step(batch, key)[0]["train/loss"]) for _ in range(3)
    ]

    t_pipe = make_trainer({"data": 2, "pipe": 4})
    pipe_losses = [
        float(t_pipe.train_step(batch, key)[0]["train/loss"])
        for _ in range(3)
    ]
    np.testing.assert_allclose(pipe_losses, ref_losses, rtol=2e-4)

    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): str(v.sharding.spec)
        for path, v in jax.tree_util.tree_leaves_with_path(
            t_pipe.state.params
        )
    }
    block_specs = [s for p, s in specs.items() if p.startswith("blocks/")]
    assert block_specs and all("pipe" in s for s in block_specs), specs


def test_trainer_pipe_rejects_moe_mmdit():
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.mmdit import MMDiT
    from uwudiff_tpu.training import DMTrainer

    trainer = DMTrainer(
        model_config={
            "unet": MMDiT.from_config("tiny_moe", depth=4, scan_blocks=True),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes={"data": 2, "pipe": 4},
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((8, 8, 8, 4)).astype(np.float32),
        "ctx": rng.standard_normal((8, 6, 48)).astype(np.float32),
        "pooled": rng.standard_normal((8, 24)).astype(np.float32),
        "tokenizer_outputs": [],
    }
    with pytest.raises(ValueError, match="MoE"):
        trainer.train_step(batch)


def test_pipeline_default_microbatches_indivisible_batch():
    """n_microbatches=None picks a divisor of the local batch instead of
    raising when n_stages doesn't divide it (local_b=6, stages=4 -> 3)."""
    params = _toy_stack()
    x, c = _toy_inputs(b=6)
    mesh = make_mesh({"pipe": 4})
    out = jax.jit(
        lambda p, x, c: pipeline_blocks(_toy_block, p, x, (c,), mesh)
    )(params, x, c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(params, x, c)), atol=1e-5
    )


def test_trainer_pipe_rejects_unet():
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    trainer = DMTrainer(
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
        mesh_axes={"data": 2, "pipe": 4},
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((8, 16, 16, 4)).astype(np.float32),
        "tokenizer_outputs": [],
        "added_cond": {
            "time_ids": np.tile(
                np.asarray([[16, 16, 0, 0, 16, 16]], np.float32), (8, 1)
            )
        },
    }
    with pytest.raises(ValueError, match="DiT"):
        trainer.train_step(batch)
