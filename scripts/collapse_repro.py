#!/usr/bin/env python
"""Tiny-scale CPU reproduction of the factored-recipe collapse
(round 5): runs ONE arm of the width-tiny convergence A/B and appends
flushed per-window means to hw_logs/collapse_repro.txt, so partial
results survive interrupts. CR_ARM picks the arm (see ARMS in
scripts/convergence_ab.py); CR_STEPS (default 400), CR_LR (1e-4)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("UWU_PLATFORM", "cpu")
os.environ.setdefault("UWU_FUSED_GN", "0")

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()

ARM = os.environ.get("CR_ARM", "bf16sr")
STEPS = int(os.environ.get("CR_STEPS", "400"))
LR = float(os.environ.get("CR_LR", "1e-4"))


def main():
    import importlib.util

    import jax
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "conv_ab", Path(__file__).resolve().parent / "convergence_ab.py"
    )
    conv = importlib.util.module_from_spec(spec)
    # don't run its main; just reuse the ARMS table
    spec.loader.exec_module(conv)
    opt, extra, pdt, clip = conv.ARMS[ARM]

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    gen = np.random.default_rng(123)
    n, hw = 64, 16
    basis = gen.standard_normal((8, hw * hw * 4)).astype(np.float32)
    coefs = gen.standard_normal((n, 8)).astype(np.float32)
    lat = (coefs @ basis / np.sqrt(8)).reshape(n, hw, hw, 4)
    lat += 0.1 * gen.standard_normal(lat.shape).astype(np.float32)
    ctx = gen.standard_normal((n, 7, 32)).astype(np.float32)
    bs = 8

    def batch_at(i):
        epoch, k = divmod(i * bs, n)
        order = np.random.default_rng(1000 + epoch).permutation(n)
        idx = order[k:k + bs]
        return {"sample": lat[idx], "ctx": ctx[idx],
                "tokenizer_outputs": []}

    t = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": None, "vae": None,
        },
        lr=LR, optimizer=opt,
        opt_config={"weight_decay": 0.01, "betas": (0.9, 0.999), **extra},
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        grad_clip=clip, param_dtype=pdt, log_grad_norm=False, seed=0,
    )
    out = Path("hw_logs/collapse_repro.txt")
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(STEPS):
        m, _ = t.train_step(batch_at(i), rng=rng)
        losses.append(float(m["train/loss"]))
        if (i + 1) % 100 == 0:
            a = np.asarray(losses[-100:])
            with out.open("a") as f:
                f.write(
                    f"{ARM:20s} lr={LR:g} steps {i-99:4d}-{i+1:4d}: "
                    f"mean {a.mean():.4f} min {a.min():.4f}\n"
                )
    print(f"done {ARM}")


if __name__ == "__main__":
    sys.exit(main())
