"""Preemption drill (SURVEY §5.3): SIGKILL a training process mid-run,
then resume from whatever checkpoint survived on disk.

This is the dominant TPU failure mode; the drill validates that the
checkpoint directory is always in a restorable state (atomic Orbax
saves) and that a fresh process continues from the last completed save
rather than restarting.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path


_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from uwudiff_tpu.data import TrainDataModule
from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training import DMTrainer

trainer = DMTrainer(
    model_config={{
        "unet": UNet2DConditionModel.from_config(
            "tiny", cross_attention_dim=None
        ),
        "te": None,
        "vae": None,
    }},
    lr=1e-3,
    use_warm_up=False,
    loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
    seed=0,
)
dm = TrainDataModule(
    dataset_config={{
        "_target_": "uwudiff_tpu.data.DummyDataset",
        "sample_size": [16, 16, 4],
        "n_samples": 16,
    }},
    dataloader_config={{"batch_size": 4, "seed": 0}},
)
trainer.fit(
    dm,
    max_steps={max_steps},
    ckpt_dir={ckpt!r},
    ckpt_every=1,
    resume_from=True,
    log_every=1,
)
print("FINISHED", int(trainer.state.step), flush=True)
"""


def test_sigkill_mid_training_then_resume(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    ckpt = str(tmp_path / "ckpt")
    code = _SCRIPT.format(repo=repo, ckpt=ckpt, max_steps=50)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device is fine and faster
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    # wait until at least one checkpoint step directory is committed
    deadline = time.time() + 600
    seen_step = None
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"victim exited early:\n{proc.stdout.read()}"
            )
        if os.path.isdir(ckpt):
            steps = [p for p in os.listdir(ckpt) if p.isdigit()]
            if steps:
                seen_step = max(int(s) for s in steps)
                if seen_step >= 2:
                    break
        time.sleep(0.5)
    assert seen_step is not None, "no checkpoint appeared before timeout"
    # the kill: straight SIGKILL, no cleanup
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # resume in a fresh process with a short remaining budget
    code2 = _SCRIPT.format(repo=repo, ckpt=ckpt, max_steps=seen_step + 3)
    out = subprocess.run(
        [sys.executable, "-c", code2],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert f"FINISHED {seen_step + 3}" in out.stdout, out.stdout
