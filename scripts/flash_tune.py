"""Flash-attention block-size autotune sweep (real TPU).

Measures fwd and fwd+bwd wall time of ``ops.flash_attention`` across
the (seq, head_dim, heads) shapes the SD1.5/SDXL UNets actually run
(`models/transformer.py` attention sites at 512/768/1024px) for a grid
of (block_q, block_k), and prints a winners table to bake into
``BLOCK_TABLE`` in ``ops/flash_attention.py``.

Usage (chip must be free — runs are short, compiles dominate):
    python scripts/flash_tune.py [--quick]
"""

import argparse
import itertools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init

from uwudiff_tpu.ops.flash_attention import flash_attention  # noqa: E402

# (name, B*H, Sq, Sk, D) — attention sites:
#   SDXL@512px: 32x32 latents -> seq 1024 (d64 H20 level2) / 256 (H20? lvl3)
#   SDXL@1024px: seq 4096 / 1024; SD1.5@512: seq 4096 (d40), 1024 (d80),
#   256 (d160); cross-attn Sk=77->128 pad
_CASES = [
    ("sdxl_lvl2_512px", 8 * 10, 1024, 1024, 64),
    ("sdxl_lvl3_512px", 8 * 20, 256, 256, 64),
    ("sdxl_lvl2_1024px", 4 * 10, 4096, 4096, 64),
    ("sdxl_lvl3_1024px", 4 * 20, 1024, 1024, 64),
    ("sd15_lvl1_512px", 16 * 8, 4096, 4096, 40),
    ("sd15_lvl2_512px", 16 * 8, 1024, 1024, 80),
    ("sd15_lvl1_1024px", 4 * 8, 16384, 16384, 40),
    ("sdxl_cross_512px", 8 * 10, 1024, 128, 64),
]

_BQ = [256, 512, 1024]
_BK = [512, 1024, 2048, 4096]


def _bench(fn, *args, iters=256):
    # chained-carry timing: the dispatch-N-block-once pattern measured
    # impossible numbers over the axon tunnel (see utils/timing.py)
    from uwudiff_tpu.utils.timing import chained_op_time

    return chained_op_time(fn, *args, iters=iters) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="first 3 cases")
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()

    cases = _CASES[:3] if args.quick else _CASES
    key = jax.random.PRNGKey(0)
    winners = {}
    for name, bh, sq, sk, d in cases:
        kq, kk, kv = jax.random.split(key, 3)
        # flash_attention takes [B, S, H, D]; fold heads into batch=bh,
        # H=1 (the kernel grid only sees b*h)
        q = jax.random.normal(kq, (bh, sq, 1, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, sk, 1, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, sk, 1, d), jnp.bfloat16)

        rows = []
        for bq, bk in itertools.product(_BQ, _BK):
            if bq > sq or bk > sk:
                continue

            fwd = jax.jit(
                lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, block_q=bq, block_k=bk
                )
            )

            def loss(q, k, v, bq=bq, bk=bk):
                return (
                    flash_attention(q, k, v, block_q=bq, block_k=bk)
                    .astype(jnp.float32)
                    ** 2
                ).sum()

            fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                t_f = _bench(fwd, q, k, v, iters=args.iters)
                t_b = _bench(fb, q, k, v, iters=max(args.iters // 2, 5))
            except Exception as e:  # compile failure at this tile size
                print(f"{name} bq={bq} bk={bk}: FAIL {type(e).__name__}")
                continue
            rows.append((t_f + t_b, t_f, t_b, bq, bk))
            print(
                f"{name} bq={bq} bk={bk}: fwd={t_f:.2f}ms "
                f"fwd+bwd={t_f + t_b:.2f}ms"
            )
        rows.sort()
        if rows:
            tot, t_f, t_b, bq, bk = rows[0]
            winners[name] = (sq, sk, d, bq, bk, tot)
            print(f"== {name}: best bq={bq} bk={bk} ({tot:.2f}ms)")

    print("\n# winners table ((sq, sk, d) -> (block_q, block_k)):")
    for name, (sq, sk, d, bq, bk, tot) in winners.items():
        print(f"#   {name}: ({sq}, {sk}, {d}) -> ({bq}, {bk})  {tot:.2f}ms")


if __name__ == "__main__":
    main()
