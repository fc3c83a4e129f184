"""Characterize the axon backend's execution/sync semantics.

Round-3 mystery: isolated-op micro-benchmarks (op_efficiency,
xattn_bench, flash_tune) measure chains of matmuls completing 16x+
faster than the MXU's physical peak, with block_until_ready returning
in ~30us over a network tunnel — while bench.py's donated-state train
steps measure perfectly sane numbers with the same sync call. This
probe isolates the mechanism:

  1. one HUGE matmul (8k^3 ~ 1.1 TFLOP, >=5.6ms at peak): time the
     dispatch, block_until_ready, and a full np.asarray value fetch
  2. a scan-of-30 chain of it (>=170ms of real compute)
  3. immediate repeats with identical inputs (execution caching?)
  4. repeats with perturbed inputs
  5. a donated-buffer loop like bench.py's (the known-good pattern)

    python scripts/timing_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 8192
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    flops_one = 2 * n**3

    fetch_tfs: list[float] = []  # chain fetch-implied TF/s (the verdict)

    def report(tag, dt, fl):
        tfs = fl / dt / 1e12
        if "(fetch)" in tag:
            fetch_tfs.append(tfs)
        print(f"{tag:44s} {dt*1e3:10.3f} ms  {tfs:8.1f} TF/s")

    # 1. single huge matmul
    f1 = jax.jit(lambda a, b: a @ b)
    out = f1(a, b)
    out.block_until_ready()  # compile
    for trial in range(3):
        t0 = time.perf_counter()
        out = f1(a, b)
        t_disp = time.perf_counter() - t0
        out.block_until_ready()
        t_block = time.perf_counter() - t0
        _ = np.asarray(out[:2, :2])
        t_fetch_slice = time.perf_counter() - t0
        print(
            f"single matmul trial{trial}: dispatch={t_disp*1e3:.3f}ms "
            f"block={t_block*1e3:.3f}ms slice-fetch={t_fetch_slice*1e3:.3f}ms"
        )
    report("  -> implied from block", t_block, flops_one)

    # 2. chained scan of 30
    iters = 30

    def chained(a, b):
        def body(carry, _):
            out = carry @ b
            carry = carry + (1e-30 * jnp.sum(out)).astype(carry.dtype)
            return carry, ()

        final, _ = jax.lax.scan(body, a, None, length=iters)
        return final

    f2 = jax.jit(chained)
    f2(a, b).block_until_ready()  # compile
    for trial in range(3):
        t0 = time.perf_counter()
        out = f2(a, b)
        out.block_until_ready()
        t_block = time.perf_counter() - t0
        _ = np.asarray(out[:2, :2])
        t_fetch = time.perf_counter() - t0
        report(
            f"chain x{iters} identical-args trial{trial} (block)",
            t_block, flops_one * iters,
        )
        report(
            f"chain x{iters} identical-args trial{trial} (fetch)",
            t_fetch, flops_one * iters,
        )

    # 4. perturbed inputs each time (>= 1 bf16 ULP — (1 + 1e-3) would
    # be a bit-exact no-op in bfloat16 and indistinguishable from the
    # identical-args arm)
    eps = float(jnp.finfo(a.dtype).eps)
    for trial in range(3):
        a2 = (a * (1.0 + (trial + 1) * 4.0 * eps)).block_until_ready()
        assert not bool(jnp.all(a2 == a)), "perturbation no-op"
        t0 = time.perf_counter()
        out = f2(a2, b)
        out.block_until_ready()
        t_block = time.perf_counter() - t0
        _ = np.asarray(out[:2, :2])
        t_fetch = time.perf_counter() - t0
        report(
            f"chain x{iters} perturbed trial{trial} (block)",
            t_block, flops_one * iters,
        )
        report(
            f"chain x{iters} perturbed trial{trial} (fetch)",
            t_fetch, flops_one * iters,
        )

    # 5. donated-buffer loop (bench.py's known-good pattern)
    @jax.jit
    def step(a, b):
        return a @ b * 1e-2  # keep magnitudes bounded

    donated = jax.jit(step, donate_argnums=0)
    x = a
    x = donated(x, b).block_until_ready()  # warm
    t0 = time.perf_counter()
    for _ in range(10):
        x = donated(x, b)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    report("donated loop x10 (block)", dt, flops_one * 10)

    # ---- verdict + session marker (VERDICT r3 #8: every hardware
    # number must trace to a probe that PASSED in the same session).
    # PASS = every value-fetch-implied chain throughput is physically
    # sane: above a dead-relay floor and at/below the chip's bf16 peak
    # (a >peak reading is the bench22-style async-dedup corruption).
    peak_tfs = 197.0 if "v5 lite" in jax.devices()[0].device_kind.lower() \
        else 460.0
    ok = bool(fetch_tfs) and all(5.0 < t <= peak_tfs for t in fetch_tfs)
    marker = Path(__file__).resolve().parent.parent / "hw_logs" / \
        ".timing_probe_ok"
    if ok:
        marker.parent.mkdir(exist_ok=True)
        marker.write_text(f"{time.time()}\n")
        print(f"PROBE PASS — marker {marker}")
    else:
        if marker.exists():
            marker.unlink()
        print(f"PROBE FAIL — fetch-implied TF/s: {fetch_tfs}")
        sys.exit(1)


if __name__ == "__main__":
    main()
