#!/usr/bin/env python
"""Adapter-training throughput on one chip.

Every personalization trainer in the framework — LoRA / LoKr (LyCORIS
tree transforms), ControlNet, IP-Adapter, textual inversion — timed at
SD-class scale next to the full-fine-tune anchor, so the README can
state measured imgs/sec *and* trainable-parameter footprint per mode.
(The reference integrates LyCORIS for the same purpose,
``trainer/trainer.py:60-76``; ControlNet/IP-Adapter/TI are this
framework's additions.)

Prints one JSON line PER MODE:
  {"mode": ..., "imgs_per_sec": N, "step_ms": N, "compile_s": N,
   "trainable_params": N, "total_params": N, "trials": k,
   "imgs_per_sec_min": N, "imgs_per_sec_max": N}

Env knobs:
  AB_MODES=full,lora,lokr,controlnet,ip,ti   (default: all)
  AB_MODEL=sd15  AB_BATCH=16  AB_LATENT=64  AB_STEPS=8  AB_TRIALS=3
  UWU_PLATFORM=cpu to run off-chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()

# These modes all train SD-class no-remat, where the fused-GN
# custom_vjp pins ~2.5GB of residuals (bench.py sets the same default
# for sd15; the stage-13 full-mode leg OOMed without it).
os.environ.setdefault("UWU_FUSED_GN", os.environ.get("AB_FUSED_GN", "0"))

MODEL = os.environ.get("AB_MODEL", "sd15")
BATCH = int(os.environ.get("AB_BATCH", "16"))
LATENT = int(os.environ.get("AB_LATENT", "64"))
STEPS = int(os.environ.get("AB_STEPS", "8"))
TRIALS = int(os.environ.get("AB_TRIALS", "3"))
MODES = os.environ.get(
    "AB_MODES", "full,lora,lokr,controlnet,ip,ti"
).split(",")

# LyCORIS preset for the sweep: every attention + ff projection, the
# standard community fine-tune surface
_LYCO_PATTERN = r".*(to_q|to_k|to_v|to_out|proj_in|proj_out)/kernel$"


def _enable_compile_cache():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def _build(mode):
    """(trainer, batch) for one adapter mode at the AB_* scale."""
    import jax.numpy as jnp
    import numpy as np

    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel

    unet = UNet2DConditionModel.from_config(MODEL, dtype=jnp.bfloat16)
    common = dict(
        lr=1e-4,
        optimizer="adamw_fp16",
        opt_config={"weight_decay": 0.01, "betas": (0.9, 0.999)},
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sd15()),
        grad_clip=1.0,
        seed=0,
    )
    rng = np.random.default_rng(0)
    ctx_dim = unet.cross_attention_dim
    batch = {
        "sample": rng.standard_normal(
            (BATCH, LATENT, LATENT, 4), dtype=np.float32
        ),
        "ctx": rng.standard_normal((BATCH, 77, ctx_dim), dtype=np.float32),
        "tokenizer_outputs": [],
        "added_cond": {
            "time_ids": np.tile(
                np.asarray([[1024, 1024, 0, 0, 1024, 1024]], np.float32),
                (BATCH, 1),
            )
        },
    }

    if mode == "full":
        from uwudiff_tpu.training import DMTrainer

        return DMTrainer(
            model_config={"unet": unet, "te": None, "vae": None}, **common
        ), batch
    if mode in ("lora", "lokr"):
        from uwudiff_tpu.training import DMTrainer

        target = {"pattern": _LYCO_PATTERN, "algo": mode}
        target.update({"dim": 16} if mode == "lora" else {"factor": 8})
        return DMTrainer(
            model_config={"unet": unet, "te": None, "vae": None},
            lycoris_config={"targets": [target]},
            **common,
        ), batch
    if mode == "controlnet":
        from uwudiff_tpu.training import ControlNetTrainer

        batch["control_cond"] = rng.standard_normal(
            (BATCH, LATENT * 8, LATENT * 8, 3), dtype=np.float32
        )
        return ControlNetTrainer(
            model_config={"unet": unet, "te": None, "vae": None}, **common
        ), batch
    if mode == "ip":
        from uwudiff_tpu.training import IPAdapterTrainer

        batch["ip_embeds"] = rng.standard_normal(
            (BATCH, 768), dtype=np.float32
        )
        return IPAdapterTrainer(
            model_config={"unet": unet, "te": None, "vae": None},
            ip_embed_dim=768,
            **common,
        ), batch
    if mode == "ti":
        from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
        from uwudiff_tpu.training import TextualInversionTrainer

        # TE preset matching the UNet's context width (clip_l for the
        # SD1.5-class 768; the tiny fixture for CPU smoke runs)
        preset = "clip_l" if ctx_dim == 768 else "tiny"
        te = ConcatTextEncoders.from_config(
            [({"model_type": "clip", "preset": preset},
              {"use_pooled": False, "layer_idx": -1})]
        )
        trainer = TextualInversionTrainer(
            model_config={"unet": unet, "te": te, "vae": None},
            placeholder_token="<concept>",
            num_vectors=4,
            **common,
        )
        ds = DummyDataset(
            sample_size=(LATENT, LATENT, 4),
            n_samples=BATCH,
            caption="a photo of <concept>",
        )
        ds.set_tokenizers(trainer.tokenizers)
        return trainer, ds.collate([ds[i] for i in range(BATCH)])
    raise SystemExit(f"unknown AB mode {mode!r}")


def _count(tree):
    import jax
    import numpy as np

    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))
    )


def main():
    _enable_compile_cache()
    import jax
    import numpy as np

    for mode in MODES:
        mode = mode.strip()
        try:
            trainer, batch = _build(mode)

            def _sync(trainer=trainer):
                # value-fetch barrier: block_until_ready alone has
                # returned spuriously early over the axon tunnel
                # (bench22 measured 10-step windows in one step's wall
                # time) — fetching a leaf of the newest donated state
                # forces the whole chain
                leaves = jax.tree_util.tree_leaves(trainer.state.params)
                jax.device_get(min(leaves, key=lambda l: l.size))
                jax.block_until_ready(trainer.state.params)

            t0 = time.perf_counter()
            trainer.train_step(batch)
            _sync()
            compile_s = time.perf_counter() - t0
            trainer.train_step(batch)
            _sync()

            window_dts = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    metrics, _ = trainer.train_step(batch)
                _sync()
                window_dts.append((time.perf_counter() - t0) / STEPS)
            dt = float(np.median(window_dts))

            total = _count(trainer.state.params) + sum(
                _count(v) for v in trainer.frozen.values()
            )
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "model": MODEL,
                        "batch": BATCH,
                        "latent": LATENT,
                        "imgs_per_sec": round(BATCH / dt, 3),
                        "step_ms": round(dt * 1000, 1),
                        "compile_s": round(compile_s, 1),
                        "trainable_params": _count(trainer.state.params),
                        "total_params": total,
                        "trials": TRIALS,
                        "imgs_per_sec_min": round(
                            BATCH / max(window_dts), 3
                        ),
                        "imgs_per_sec_max": round(
                            BATCH / min(window_dts), 3
                        ),
                        "loss": round(float(metrics["train/loss"]), 4),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep the sweep alive past one bad mode
            print(
                json.dumps({"mode": mode, "error": f"{type(e).__name__}: {e}"}),
                flush=True,
            )
        # free the chip between modes
        trainer = batch = None


if __name__ == "__main__":
    main()
