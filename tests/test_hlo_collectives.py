"""Collective audit of the compiled GSPMD train steps (VERDICT r4 weak
#4): assert the compiled HLO's collectives match the structural
predictions of the scale-out model (``scripts/parallel_perf_model.py``).

A sharding regression is numerically invisible — GSPMD will happily
insert an all-to-all or a full-param all-gather to "fix" a bad
``PartitionSpec`` and every loss-parity test still passes. These tests
pin the op classes each mesh axis is allowed to generate:

- fsdp axis: params all-gather + grad reduction (all-reduce or
  reduce-scatter); NO all-to-all, NO collective-permute. Measured:
  GSPMD gathers only PART of the param bytes — for channel-sharded
  conv weights it prefers partial-compute + activation reduction over
  weight gathers — so only the UPPER byte bound (4x params, catching
  a per-layer full-tree gather) is asserted.
- tensor axis: Megatron col->row all-reduces, PLUS a bounded number of
  all-to-alls: the head_parallel shard_map island reshards activations
  hidden-sharded <-> head-sharded around attention, and all-to-all is
  GSPMD's cheap lowering for moving a sharded axis. An all-to-all
  EXPLOSION (> per-attention-site count) would flag a spec regression.
- seq axis (ring attention): collective-permute hops (the K/V
  rotation); NO all-to-all.
- pipe axis (GPipe): collective-permute at stage boundaries.
- expert axis (MoE): GSPMD lowers this dispatch as gather+reduce over
  the expert axis (measured; the perf model's a2a formula is the
  upper-bound manual-dispatch cost); still NO all-to-all.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py). NOTE: the
ground truth here is the CPU SPMD partitioner's choices; op CLASSES
are asserted (stable), exact counts are not.
"""

import jax
import numpy as np
import pytest

from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.parallel.hlo_audit import collective_summary
from uwudiff_tpu.training import DMTrainer


def _compiled_hlo(trainer, batch):
    trainer.setup(batch)
    dev_batch = trainer._put_batch(batch)
    return (
        trainer._train_step.lower(
            trainer.state, trainer.frozen, dev_batch, jax.random.PRNGKey(0)
        )
        .compile()
        .as_text()
    )


def _unet_trainer(mesh_axes, **unet_kw):
    from uwudiff_tpu.models.unet import UNet2DConditionModel

    return DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny", **unet_kw),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        mesh_axes=mesh_axes,
        seed=0,
    )


def _batch(n, ctx_dim=32):
    rng = np.random.default_rng(0)
    b = {
        "sample": rng.standard_normal((n, 16, 16, 4)).astype(np.float32),
        "tokenizer_outputs": [],
    }
    if ctx_dim:
        b["ctx"] = rng.standard_normal((n, 7, ctx_dim)).astype(np.float32)
    return b


def test_collective_summary_parses_hlo():
    hlo = """
  %ag = bf16[8,64,320]{2,1,0} all-gather(bf16[2,64,320] %p), dims={0}
  %ar.1 = f32[128]{0} all-reduce(f32[128] %x), to_apply=%add
  %ags = (f32[16,8]{1,0}, f32[16,8]{1,0}) all-gather-start(f32[2,8] %y)
  %agd = f32[16,8]{1,0} all-gather-done((f32[16,8], f32[16,8]) %ags)
  %cp = bf16[4,4]{1,0} collective-permute(bf16[4,4] %z), pairs={{0,1}}
"""
    s = collective_summary(hlo)
    assert s.count("all-gather") == 2  # start counted once, done skipped
    assert s.count("all-reduce") == 1
    assert s.count("collective-permute") == 1
    assert s.count("all-to-all") == 0
    assert s.total_bytes("all-reduce") == 128 * 4
    assert s.total_bytes("collective-permute") == 16 * 2


def test_fsdp_leg_collectives():
    t = _unet_trainer({"data": 2, "fsdp": 4})
    s = collective_summary(_compiled_hlo(t, _batch(8)))
    # params gather + grad reduction only
    assert s.count("all-gather") >= 1
    assert s.count("all-reduce") + s.count("reduce-scatter") >= 1
    assert s.count("all-to-all") == 0, s
    assert s.count("collective-permute") == 0, s
    # byte sanity: gathered bytes bounded by ~the param tree (GSPMD
    # legitimately gathers LESS — partial-conv + activation reduction
    # beats weight gathers on small convs — but a per-layer full-tree
    # gather regression would blow the upper bound)
    param_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(t.state.params)
    )
    ag = s.total_bytes("all-gather")
    assert 0 < ag <= 4 * param_bytes, (
        f"all-gather bytes {ag:,} vs params {param_bytes:,}"
    )


def test_tensor_leg_collectives():
    t = _unet_trainer({"data": 2, "tensor": 2})
    s = collective_summary(_compiled_hlo(t, _batch(4)))
    assert s.count("all-reduce") >= 1  # Megatron row-parallel outputs
    # head_parallel island resharding: tiny UNet has 4 attention sites
    # (2 blocks x self+cross), each fwd+bwd pair may reshard in/out —
    # measured 12; a spec regression that reshards per-op would explode
    # this
    assert s.count("all-to-all") <= 16, s


def test_ring_seq_leg_collectives():
    t = _unet_trainer(
        {"data": 2, "seq": 4},
        cross_attention_dim=None,
    )
    s = collective_summary(_compiled_hlo(t, _batch(4, ctx_dim=0)))
    # the K/V ring rotation: (seq-1) hops per attention, fwd and bwd
    assert s.count("collective-permute") >= 6, s
    assert s.count("all-to-all") == 0, s


def test_pipeline_leg_collectives():
    from uwudiff_tpu.models.dit import DiT

    t = DMTrainer(
        model_config={
            "unet": DiT.from_config("tiny", depth=4, scan_blocks=True),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        mesh_axes={"data": 2, "pipe": 4},
        seed=0,
    )
    rng = np.random.default_rng(1)
    b = {
        "sample": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "class_labels": np.arange(4, dtype=np.int32) % 10,
        "tokenizer_outputs": [],
    }
    s = collective_summary(_compiled_hlo(t, b))
    assert s.count("collective-permute") >= 1, s  # stage boundaries
    assert s.count("all-to-all") == 0, s


def test_expert_leg_collectives():
    from uwudiff_tpu.models.dit import DiT

    t = DMTrainer(
        model_config={
            "unet": DiT.from_config("tiny_moe", scan_blocks=True),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        mesh_axes={"data": 2, "expert": 4},
        seed=0,
    )
    rng = np.random.default_rng(2)
    b = {
        "sample": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "class_labels": np.arange(4, dtype=np.int32) % 10,
        "tokenizer_outputs": [],
    }
    s = collective_summary(_compiled_hlo(t, b))
    # GSPMD lowers the one-hot dispatch as gather+reduce (measured —
    # the structural point is it stays gather/reduce-class, and a
    # regression to all-to-all or permute chatter is flagged)
    assert s.count("all-gather") + s.count("all-reduce") >= 1, s
    assert s.count("all-to-all") == 0, s


def test_allowed_ops_table():
    from uwudiff_tpu.parallel.hlo_audit import allowed_ops

    assert "all-to-all" not in allowed_ops(["data", "fsdp"])
    assert "all-to-all" in allowed_ops(["data", "tensor"])
    assert "collective-permute" in allowed_ops(["seq"])
    # unknown axes stay permissive rather than rejecting new designs
    assert allowed_ops(["future_axis"]) == set(
        __import__(
            "uwudiff_tpu.parallel.hlo_audit", fromlist=["COLLECTIVE_OPS"]
        ).COLLECTIVE_OPS
    )
