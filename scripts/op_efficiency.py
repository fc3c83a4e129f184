"""Isolated-op MXU efficiency probe (real TPU).

`scripts/step_profile.py` (memory-space-aware since round 3) shows the
SDXL bs=8 train step is MXU-efficiency-bound: conv+dot speed-of-light is
199 ms of a 535 ms step while true HBM traffic is only ~29 GB (~35 ms).
This script times the step's dominant convolution / matmul shapes in
isolation (jitted, warm) and prints achieved TFLOP/s vs the chip's bf16
peak — separating "XLA runs these ops slowly" from "the step schedule
stalls between fast ops".

    python scripts/op_efficiency.py          # on the real TPU
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def _time_op(op, *args, iters=30, repeats=3):
    """Chained-carry per-op timing (see ``uwudiff_tpu/utils/timing.py``
    for why the naive dispatch-loop measured 3-16x the chip's peak over
    the axon tunnel)."""
    from uwudiff_tpu.utils.timing import chained_op_time

    return chained_op_time(op, *args, iters=iters, repeats=repeats)


def main():
    import jax
    import jax.numpy as jnp

    import bench

    peak = bench._device_peak_flops_bf16() or 197e12

    # dominant shapes of the SDXL bs=8 64x64-latent step (step_profile
    # FLOPs table): GEGLU ff matmuls, attention projections, 3x3 resnet
    # convs per level, the up/downsample convs
    matmuls = [
        # (name, M, K, N)
        ("ff_in lvl1 (GEGLU)", 8 * 1024, 640, 5120 * 2),
        ("ff_out lvl1", 8 * 1024, 2560, 640),
        ("ff_in lvl2 (GEGLU)", 8 * 256, 1280, 10240 * 2),
        ("ff_out lvl2", 8 * 256, 5120, 1280),
        ("qkv proj lvl1", 8 * 1024, 640, 640),
        ("qkv proj lvl2", 8 * 256, 1280, 1280),
        ("cross kv proj lvl2", 8 * 77, 2048, 1280),
    ]
    convs = [
        # (name, B, H, W, Cin, Cout)
        ("res conv lvl0 64x64x320", 8, 64, 64, 320, 320),
        ("res conv lvl1 32x32x640", 8, 32, 32, 640, 640),
        ("res conv lvl2 16x16x1280", 8, 16, 16, 1280, 1280),
        ("upsample conv 32x32x1280", 8, 32, 32, 1280, 1280),
    ]

    key = jax.random.PRNGKey(0)
    print(f"{'op':28s} {'ms':>8s} {'TFLOP/s':>9s} {'% peak':>7s}")
    for name, m, k, n in matmuls:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        dt = _time_op(lambda a, b: a @ b, a, b)
        fl = 2 * m * k * n
        print(f"{name:28s} {dt*1e3:8.3f} {fl/dt/1e12:9.2f} "
              f"{100*fl/dt/peak:6.1f}%")
    for name, b_, h, w, cin, cout in convs:
        x = jax.random.normal(key, (b_, h, w, cin), jnp.bfloat16)
        kern = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        dt = _time_op(
            lambda x, k: jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            x, kern,
        )
        fl = 2 * b_ * h * w * cin * cout * 9
        print(f"{name:28s} {dt*1e3:8.3f} {fl/dt/1e12:9.2f} "
              f"{100*fl/dt/peak:6.1f}%")


if __name__ == "__main__":
    main()
