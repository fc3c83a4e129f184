"""Cross-attention backend micro-benchmark (real TPU).

The dispatch gate admits short-KV cross-attention (Sk=77 text tokens vs
long image queries) to the Pallas flash kernel since round 3: the XLA
path materializes [B, H, Sq, Sk] fp32 logits in HBM (measured 20.4
GB/step across the SDXL bench, ``scripts/step_profile.py``) while the
kernel pads K/V to one block and keeps logits in VMEM. This script
measures both backends fwd and fwd+bwd at the exact SDXL/SD1.5
cross-attention shapes so the gate stays an evidence-backed decision.

    python scripts/xattn_bench.py          # on the real TPU
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def _bench(fn, *args, iters=256):
    # chained-carry timing: the dispatch-N-block-once pattern measured
    # impossible numbers over the axon tunnel (see utils/timing.py)
    from uwudiff_tpu.utils.timing import chained_op_time

    return chained_op_time(fn, *args, iters=iters) * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from uwudiff_tpu.ops.attention import _on_tpu, _xla_attention
    from uwudiff_tpu.ops.flash_attention import flash_attention

    if not _on_tpu():
        print("not on TPU - this benchmark needs the compiled kernel path")
        sys.exit(2)

    # (name, B, Sq, Sk, H, D) — UNet cross-attention sites at 512px/1024px
    cases = [
        ("sdxl_lvl1 bs8 512px", 8, 1024, 77, 10, 64),
        ("sdxl_lvl2 bs8 512px", 8, 256, 77, 20, 64),
        ("boundary sq2048", 8, 2048, 77, 10, 64),
        ("sdxl_lvl1 bs4 1024px", 4, 4096, 77, 10, 64),
        ("sd15_lvl0 bs16 512px", 16, 4096, 77, 8, 40),
        ("sd15_lvl1 bs16 512px", 16, 1024, 77, 8, 80),
        ("sd15_lvl0 bs4 1024px", 4, 16384, 77, 8, 40),
    ]
    key = jax.random.PRNGKey(0)
    print(f"{'case':24s} {'dir':7s} {'xla ms':>8s} {'flash ms':>9s} "
          f"{'speedup':>8s}")
    for name, b, sq, sk, h, d in cases:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, sk, h, d), jnp.bfloat16)

        fl = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False))
        xl = jax.jit(_xla_attention)
        t_x = _bench(xl, q, k, v)
        t_f = _bench(fl, q, k, v)
        print(f"{name:24s} {'fwd':7s} {t_x:8.3f} {t_f:9.3f} {t_x/t_f:8.2f}x")

        def loss_f(q, k, v):
            return (flash_attention(q, k, v, interpret=False) ** 2).sum()

        def loss_x(q, k, v):
            return (_xla_attention(q, k, v) ** 2).sum()

        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        t_x = _bench(gx, q, k, v)
        t_f = _bench(gf, q, k, v)
        print(f"{name:24s} {'fwd+bwd':7s} {t_x:8.3f} {t_f:9.3f} "
              f"{t_x/t_f:8.2f}x")


if __name__ == "__main__":
    main()
