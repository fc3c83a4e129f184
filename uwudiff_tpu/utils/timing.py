"""Trustworthy isolated-op timing on (possibly remote) accelerators.

Round-3 findings from ``scripts/timing_probe.py`` on the axon TPU
tunnel (hw_logs/timing_probe.log):

- Big chained programs time correctly and reproducibly: a scan of 30
  8192^3 matmuls measures 208±4 ms (156-159 TF/s, ~79% of v5e peak)
  whether synced by ``block_until_ready`` or a value fetch, and
  identical-args repeats are NOT served from a cache.
- BUT ``block_until_ready`` can return spuriously early: the first
  re-execution after the compile call "blocked" in 0.08 ms while the
  value fetch took 612 ms. Micro-benchmarks whose whole chain is a few
  ms hit this constantly — that is how ops "ran" at 16x the MXU's
  physical peak in the first two rounds of measurements.

Rules implemented by :func:`chained_op_time`:
1. chain the iterations inside ONE jitted ``lax.scan`` whose carry
   depends on every output leaf (no LICM hoist / DCE / reordering);
2. sync by FETCHING a slice of the result, never only
   ``block_until_ready``;
3. discard the first post-compile execution;
4. auto-scale the chain length until one execution takes >= ~100 ms,
   so early-readiness glitches and round-trip jitter can't dominate;
5. perturb inputs by >= 1 ULP between runs (belt-and-braces against
   value-keyed result caching; (1 + 1e-3) is a bit-exact no-op in
   bfloat16 — the first version of this guard silently did nothing).
"""

from __future__ import annotations

import time
from typing import Callable

__all__ = ["chained_op_time"]

_MIN_CHAIN_SECONDS = 0.1


def _build(op, iters: int):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        first = a[0]

        def body(carry, _):
            out = op(carry, *a[1:])
            dep = sum(
                jnp.sum(leaf).astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out)
            )
            carry = carry + (1e-30 * dep).astype(carry.dtype)
            return carry, ()

        final, _ = jax.lax.scan(body, first, None, length=iters)
        return final

    return jax.jit(chained)


def _fetch_sync(out):
    """Force a real device->host value round trip (block_until_ready
    alone can return early on the axon backend)."""
    import numpy as np

    idx = tuple(slice(0, 1) for _ in range(out.ndim))
    return np.asarray(out[idx])


def _perturb(x, r: int):
    import jax.numpy as jnp

    eps = float(jnp.finfo(x.dtype).eps)
    out = x * (1.0 + (r + 1) * 4.0 * eps)
    _fetch_sync(out)
    assert not bool(jnp.all(out == x)), (
        "perturbation was a no-op; cached-execution guard broken"
    )
    return out


def _run_once(f, args, r: int):
    a0 = _perturb(args[0], r)
    t0 = time.perf_counter()
    out = f(a0, *args[1:])
    _fetch_sync(out)
    return time.perf_counter() - t0


def chained_op_time(
    op: Callable,
    *args,
    iters: int = 30,
    repeats: int = 3,
) -> float:
    """Seconds per single execution of ``op(*args)``.

    ``args[0]`` must be a float array (the chain carry); outputs may be
    any pytree — every leaf feeds the carry so none can be eliminated.
    ``iters`` is the MINIMUM chain length; it is grown automatically
    until one chain execution takes >= 100 ms. Returns the best of
    ``repeats`` timed runs divided by the final chain length.
    """
    f = _build(op, iters)
    _fetch_sync(f(*args))  # compile + warm
    dt = _run_once(f, args, 0)  # discarded (first post-compile exec)
    dt = _run_once(f, args, 1)  # calibration measurement

    # grow the chain until it dominates sync/round-trip noise
    while dt < _MIN_CHAIN_SECONDS and iters < 100_000:
        scale = max(2, int(_MIN_CHAIN_SECONDS / max(dt, 1e-6) * 1.5))
        iters *= scale
        f = _build(op, iters)
        _fetch_sync(f(*args))  # recompile + warm
        _run_once(f, args, 0)  # discard
        dt = _run_once(f, args, 1)

    best = dt
    for r in range(2, repeats + 1):
        best = min(best, _run_once(f, args, r))
    return best / iters
