#!/usr/bin/env python
"""Convergence A/B: does the bench-default training recipe TRAIN as
well as the conservative one? (VERDICT r4 missing #1.)

Arms (CONV_ARM):
  fp32        — fp32 params, full AdamW (fp32 moments), global-norm
                clip 1.0: the reference's stability stance
                (``/root/reference/configs/demo_training.yaml:75-77``
                keeps the UNet fp32 because fp16+AdamW NaNs).
  bf16sr      — the EXACT bench default: bf16 params + stochastic-
                rounding updates, factored second moment
                (``adamw_factored``), no clipping.
  bf16sr_clip — bench default + Adafactor-style per-leaf update-RMS
                clipping (clipping_threshold=1.0), the documented
                memory-free stability substitute for global-norm.

Protocol: SD1.5-class UNet (fits fp32 comfortably), bs=16, 64x64
latents, a FIXED 256-sample synthetic latent dataset with fixed
per-sample text context, identical shuffle order and identical
per-step noise/timestep draws across arms (the trainer folds the base
rng with ``state.step``, so a constant base rng reproduces the same
draw schedule in every arm). Seed-to-seed noise scale comes from
re-running an arm with CONV_SEED=1 (different init + different base
rng). Writes one JSONL line per step to hw_logs/conv_<arm>_s<seed>.jsonl
and a summary line at the end.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()

# no-remat sd15-style runs: the fused-GN custom_vjp pins residuals
# where XLA would rematerialize them (bench.py sets the same default
# for sd15) — and the recipe A/B is about optimizer/precision, not GN
os.environ.setdefault("UWU_FUSED_GN", "0")

ARM = os.environ.get("CONV_ARM", "fp32")
SEED = int(os.environ.get("CONV_SEED", "0"))
STEPS = int(os.environ.get("CONV_STEPS", "2000"))
BATCH = int(os.environ.get("CONV_BATCH", "16"))
LATENT = int(os.environ.get("CONV_LATENT", "64"))
N_DATA = int(os.environ.get("CONV_NDATA", "256"))
LR = float(os.environ.get("CONV_LR", "1e-4"))
WARMUP = int(os.environ.get("CONV_WARMUP", "0"))  # linear warmup steps
# width multiplier on the sd15 channel stack. Default 0.8 (~550M):
# the LARGEST scale where the fp32 + full-Adam + global-clip CONTROL
# arm fits a 16GB v5e — at full sd15 width (860M) the control needs
# 4 fp32 copies (params/m/v/clip-pinned grads) = 13.8GB before
# activations and OOMs (measured, conv_fp32_s0 leg). The bf16+SR arm
# ALSO runs once at full width for same-scale stability evidence.
WIDTH = float(os.environ.get("CONV_WIDTH", "0.8"))
OUT = os.environ.get(
    "CONV_OUT", f"hw_logs/conv_{ARM}_s{SEED}.jsonl"
)

ARMS = {
    # optimizer, opt_config extras, param_dtype, grad_clip
    "fp32": ("adamw", {}, None, 1.0),
    "bf16sr": ("adamw_factored", {}, "bfloat16", None),
    "bf16sr_clip": (
        "adamw_factored", {"clipping_threshold": 1.0}, "bfloat16", None,
    ),
    # diagnostic arms (round 5): isolate STORAGE (bf16+SR with the
    # control's full Adam + global clip) vs OPTIMIZER (fp32 storage
    # with factored+clip) when the combined recipe misbehaves
    "bf16sr_adamw": ("adamw", {}, "bfloat16", 1.0),
    "fp32_factored_clip": (
        "adamw_factored", {"clipping_threshold": 1.0}, None, None,
    ),
}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    optimizer, extra_opt, param_dtype, grad_clip = ARMS[ARM]

    width_kw = {}
    if WIDTH != 1.0:
        from uwudiff_tpu.models.unet import UNET_PRESETS

        base = UNET_PRESETS["sd15"]["block_out_channels"]
        width_kw["block_out_channels"] = tuple(
            int(round(c * WIDTH / 64)) * 64 for c in base
        )
    unet = UNet2DConditionModel.from_config(
        "sd15", dtype=jnp.bfloat16, **width_kw
    )
    trainer = DMTrainer(
        model_config={"unet": unet, "te": None, "vae": None},
        lr=LR,
        optimizer=optimizer,
        opt_config={
            "weight_decay": 0.01, "betas": (0.9, 0.999), **extra_opt,
        },
        use_warm_up=WARMUP > 0,
        warm_up_period=max(WARMUP, 1),
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        grad_clip=grad_clip,
        param_dtype=param_dtype,
        log_grad_norm=False,
        seed=SEED,
    )

    # fixed learnable dataset: N latents with per-sample structure (a
    # shared low-rank basis + per-sample coefficients) and a fixed,
    # sample-specific context so conditioning is informative
    gen = np.random.default_rng(123)
    basis = gen.standard_normal((8, LATENT * LATENT * 4)).astype(np.float32)
    coefs = gen.standard_normal((N_DATA, 8)).astype(np.float32)
    lat = (coefs @ basis / np.sqrt(8)).reshape(N_DATA, LATENT, LATENT, 4)
    lat += 0.1 * gen.standard_normal(lat.shape).astype(np.float32)
    ctx = gen.standard_normal((N_DATA, 77, 768)).astype(np.float32)

    def batch_at(step):
        epoch, k = divmod(step * BATCH, N_DATA)
        order = np.random.default_rng(1000 + epoch).permutation(N_DATA)
        idx = order[k:k + BATCH]
        if len(idx) < BATCH:  # wrap into next epoch's order
            order2 = np.random.default_rng(1001 + epoch).permutation(N_DATA)
            idx = np.concatenate([idx, order2[: BATCH - len(idx)]])
        return {
            "sample": lat[idx],
            "ctx": ctx[idx],
            "tokenizer_outputs": [],
        }

    # constant base rng: trainer folds with state.step, so every arm
    # sees the IDENTICAL timestep/noise schedule; the seed variant gets
    # a different one (init + draws both move — full seed noise)
    base_rng = jax.random.PRNGKey(7 + SEED)

    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    log = open(OUT, "a")
    meta = {
        "arm": ARM, "seed": SEED, "steps": STEPS, "batch": BATCH,
        "lr": LR, "optimizer": optimizer, "opt_extra": extra_opt,
        "param_dtype": param_dtype, "grad_clip": grad_clip,
        "n_data": N_DATA, "width": WIDTH, "warmup": WARMUP,
        "t0": time.time(),
    }
    log.write(json.dumps({"meta": meta}) + "\n")
    log.flush()
    print(f"# convergence arm={ARM} seed={SEED} -> {OUT}", flush=True)

    t_compile = time.time()
    pending: list[tuple[int, object]] = []

    def flush_pending():
        if not pending:
            return
        vals = jax.device_get([m for _, m in pending])
        for (i, _), v in zip(pending, vals):
            log.write(
                json.dumps({"step": i, "loss": round(float(v), 6)}) + "\n"
            )
        log.flush()
        pending.clear()

    first_loss = None
    for i in range(STEPS):
        metrics, _aux = trainer.train_step(batch_at(i), rng=base_rng)
        pending.append((i, metrics["train/loss"]))
        if i == 0:
            first_loss = float(jax.device_get(metrics["train/loss"]))
            print(
                f"# compiled+step0 in {time.time() - t_compile:.1f}s "
                f"loss={first_loss:.4f}",
                flush=True,
            )
            t_run = time.time()
        elif len(pending) >= 100:
            flush_pending()
            if i % 500 < 100:
                print(f"# step {i} t={time.time() - t_run:.0f}s", flush=True)
    flush_pending()

    # summary: mean loss over the last 200 steps (the convergence level)
    losses = []
    with open(OUT) as f:
        for line in f:
            d = json.loads(line)
            if "loss" in d:
                losses.append(d["loss"])
    tail = np.asarray(losses[-200:])
    summary = {
        "arm": ARM, "seed": SEED, "steps": len(losses),
        "first_loss": first_loss,
        "final200_mean": round(float(tail.mean()), 6),
        "final200_std": round(float(tail.std()), 6),
        "nan_steps": int(np.sum(~np.isfinite(np.asarray(losses)))),
        "wall_s": round(time.time() - t_compile, 1),
    }
    log.write(json.dumps({"summary": summary}) + "\n")
    log.close()
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    sys.exit(main())
