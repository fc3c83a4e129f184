#!/usr/bin/env python
"""Isolated roofline for the long-seq flash kernels (VERDICT r4 weak #1).

sd15@1024px trains at matmul-MFU 0.171, explained to first order by
d=40 attention physics: every QK^T / PV matmul contracts-or-emits over
40 of the MXU's 128 lanes, capping those matmuls at 40/128 = 31.25% of
peak. This script MEASURES, in isolation, what the 16384-token d=40
flash fwd and fwd+bwd kernels actually achieve against that ceiling —
and bounds the VPU/softmax share by timing the same shapes as bare
bf16 matmul chains (the compute floor with no softmax/online-rescale).

    python scripts/flash_roofline.py              # sd15@1024 level-0
    FR_SEQ=4096 FR_D=64 python scripts/flash_roofline.py  # SDXL-like

Timing uses the donated-buffer chain pattern (the only pattern the
axon link times honestly — scripts/timing_probe.py): each iteration's
input is the previous iteration's output, so the whole chain must
execute before the final value fetch returns.

Writes hw_logs/flash_roofline_<seq>x<d>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()

SEQ = int(os.environ.get("FR_SEQ", "16384"))
HEADS = int(os.environ.get("FR_HEADS", "8"))
D = int(os.environ.get("FR_D", "40"))
BATCH = int(os.environ.get("FR_BATCH", "2"))  # sd15@1024 bs=2 level-0
ITERS = int(os.environ.get("FR_ITERS", "20"))
TRIALS = int(os.environ.get("FR_TRIALS", "3"))


def _measure(fn, x0, iters, trials):
    """Median seconds/iter of a donated chain x -> fn(x). Copies the
    seed input first — donation consumes the chain's buffers, and the
    caller reuses x0 across measurements."""
    import jax
    import jax.numpy as jnp

    x0 = jax.jit(lambda a: a + jnp.zeros_like(a))(x0)  # fresh buffer
    step = jax.jit(fn, donate_argnums=(0,))
    x = step(x0)
    jax.block_until_ready(x)
    best = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        # value fetch forces the chain (timing_probe verdict)
        jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:8])
        best.append((time.perf_counter() - t0) / iters)
    import numpy as np

    return float(np.median(best)), [round(b * 1e3, 3) for b in best]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = str(Path(__file__).resolve().parent.parent / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uwudiff_tpu.ops.flash_attention import flash_attention

    b, s, h, d = BATCH, SEQ, HEADS, D
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)

    # attention FLOPs: QK^T (2*b*h*s*s*d) + PV (2*b*h*s*s*d); backward
    # re-does QK^T plus dV/dP/dQ/dK matmuls = 5 more s*s*d products
    fwd_flops = 4.0 * b * h * s * s * d
    bwd_flops = 10.0 * b * h * s * s * d  # dQ pass (incl. s recompute) + dKV pass
    peak = 197e12  # v5e dense bf16
    lane_ceiling = peak * min(d, 128) / 128.0

    results = {"shape": [b, s, h, d], "peak_tf": peak / 1e12,
               "lane_ceiling_tf": round(lane_ceiling / 1e12, 2)}

    # ---- forward kernel ------------------------------------------------
    def fwd_chain(x):
        o = flash_attention(x, k, v)
        return (x + 1e-6 * o.astype(x.dtype)).astype(jnp.bfloat16)

    dt, windows = _measure(fwd_chain, q, ITERS, TRIALS)
    results["fwd"] = {
        "ms": round(dt * 1e3, 3),
        "achieved_tf": round(fwd_flops / dt / 1e12, 2),
        "vs_lane_ceiling": round(fwd_flops / dt / lane_ceiling, 3),
        "windows_ms": windows,
    }

    # ---- fwd+bwd kernels ----------------------------------------------
    def loss(qq):
        return (flash_attention(qq, k, v).astype(jnp.float32) ** 2).sum()

    grad = jax.grad(loss)

    def bwd_chain(x):
        g = grad(x)
        return (x + 1e-6 * g.astype(x.dtype)).astype(jnp.bfloat16)

    dt_b, windows_b = _measure(bwd_chain, q, ITERS, TRIALS)
    results["fwd_bwd"] = {
        "ms": round(dt_b * 1e3, 3),
        "achieved_tf": round((fwd_flops + bwd_flops) / dt_b / 1e12, 2),
        "vs_lane_ceiling": round(
            (fwd_flops + bwd_flops) / dt_b / lane_ceiling, 3
        ),
        "windows_ms": windows_b,
    }

    # ---- matmul floor: same contraction shapes, no softmax -------------
    # per (b, h): S = Q K^T [s,d]x[d,s], O = S V [s,s]x[s,d] — blocked
    # to the kernel's tiles so the comparison is apples-to-apples on
    # MXU utilization, minus every VPU op (exp, rescale, running max).
    def matmul_floor_chain(x):
        # x: [b, s, h, d] -> einsum pair at fp32 accumulation like the
        # kernel's preferred_element_type
        s_mat = jnp.einsum(
            "bqhd,bkhd->bhqk", x, k,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", s_mat, v,
            preferred_element_type=jnp.float32,
        )
        return (x + 1e-6 * o.astype(x.dtype)).astype(jnp.bfloat16)

    try:
        dt_m, windows_m = _measure(matmul_floor_chain, q, ITERS, TRIALS)
        results["matmul_floor"] = {
            "ms": round(dt_m * 1e3, 3),
            "achieved_tf": round(fwd_flops / dt_m / 1e12, 2),
            "vs_lane_ceiling": round(fwd_flops / dt_m / lane_ceiling, 3),
            "windows_ms": windows_m,
            "note": "same contractions, no softmax; the [s,s] fp32->bf16 "
                    "materialization costs HBM the flash kernel avoids, "
                    "so this is a floor on MXU time, not a fair total",
        }
        results["softmax_vpu_share_est"] = round(
            max(0.0, 1.0 - dt_m / dt), 3
        )
    except Exception as e:  # the [b,h,s,s] tensor may OOM at 16k
        results["matmul_floor"] = {"error": str(e)[:200]}

    results["device"] = str(jax.devices()[0])
    out = Path("hw_logs") / f"flash_roofline_{s}x{d}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
