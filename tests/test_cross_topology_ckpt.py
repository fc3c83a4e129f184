"""Cross-topology checkpoint portability (VERDICT r4 missing #3).

On real pods the slice topology changes across preemptions: a state
saved under mesh ``{data:2, fsdp:4}`` must restore under
``{data:4, fsdp:2}`` — and on a single device — with bit-identical
params and a continuous loss trajectory. The reference gets this from
Lightning resume (``test_scripts/test_train.py:71-77``); here it is
Orbax ``StandardRestore`` against the NEW trainer's shardings (the
same code path ``DMTrainer.fit(resume_from=...)`` uses).

Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import jax
import numpy as np
import pytest

from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training import DMTrainer
from uwudiff_tpu.training.checkpoint import CheckpointManager


def _make_trainer(mesh_axes):
    return DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        mesh_axes=mesh_axes,
        seed=0,
    )


def _batch(i):
    rng = np.random.default_rng(100 + i)
    return {
        "sample": rng.standard_normal((8, 16, 16, 4)).astype(np.float32),
        "ctx": rng.standard_normal((8, 7, 32)).astype(np.float32),
        "tokenizer_outputs": [],
    }


def _restore_into(trainer, ckpt_dir):
    """The fit(resume_from=...) restore path: abstract state carries
    the NEW trainer's shardings; Orbax reshards the saved arrays."""
    trainer.setup(_batch(0))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        trainer.state,
    )
    mgr = CheckpointManager(ckpt_dir, async_save=False)
    restored, data_state = mgr.restore(abstract)
    mgr.close()
    trainer.state = restored
    return data_state


def _host_params(state):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)


@pytest.mark.parametrize(
    "restore_mesh",
    [{"data": 4, "fsdp": 2}, None],
    ids=["reshard_4x2", "single_device"],
)
def test_restore_under_different_topology(tmp_path, restore_mesh):
    ckpt = str(tmp_path / "ckpt")

    # train 2 steps under {data:2, fsdp:4}, checkpoint, keep going 2
    # more steps as the continuity control
    src = _make_trainer({"data": 2, "fsdp": 4})
    for i in range(2):
        src.train_step(_batch(i), rng=jax.random.PRNGKey(0))
    mgr = CheckpointManager(ckpt, async_save=False)
    mgr.save(int(src.state.step), src.state, {"batches_seen": 2})
    mgr.wait()
    mgr.close()
    saved_params = _host_params(src.state)
    control_losses = [
        float(src.train_step(_batch(i), rng=jax.random.PRNGKey(0))[0][
            "train/loss"
        ])
        for i in range(2, 4)
    ]

    # restore under the OTHER topology
    dst = _make_trainer(restore_mesh)
    data_state = _restore_into(dst, ckpt)
    assert data_state == {"batches_seen": 2}
    assert int(dst.state.step) == 2

    # param equality across the reshape (gathered to host)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        saved_params,
        dst.state.params,
    )

    # loss continuity: the restored trainer's next steps match the
    # never-interrupted control (cross-topology reduction order can
    # differ at float tolerance, not trajectory level)
    resumed_losses = [
        float(dst.train_step(_batch(i), rng=jax.random.PRNGKey(0))[0][
            "train/loss"
        ])
        for i in range(2, 4)
    ]
    np.testing.assert_allclose(resumed_losses, control_losses, rtol=2e-5)


def test_single_device_save_restores_onto_mesh(tmp_path):
    """The reverse direction: a dev-box (single-device) checkpoint
    scales out onto a sharded mesh."""
    ckpt = str(tmp_path / "ckpt")
    src = _make_trainer(None)
    for i in range(2):
        src.train_step(_batch(i), rng=jax.random.PRNGKey(0))
    mgr = CheckpointManager(ckpt, async_save=False)
    mgr.save(int(src.state.step), src.state, None)
    mgr.wait()
    mgr.close()
    saved_params = _host_params(src.state)

    dst = _make_trainer({"data": 2, "fsdp": 4})
    _restore_into(dst, ckpt)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        saved_params,
        dst.state.params,
    )
    # the restored state is genuinely sharded over the new mesh
    leaf = jax.tree_util.tree_leaves(dst.state.params)[0]
    assert len(leaf.sharding.device_set) in (2, 4, 8)
    # and trains
    m, _ = dst.train_step(_batch(2), rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(m["train/loss"]))
