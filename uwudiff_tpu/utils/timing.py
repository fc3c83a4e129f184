"""Trustworthy isolated-op timing on (possibly remote) accelerators.

The obvious pattern — dispatch N async calls, block on the last —
under-measures badly over the axon TPU tunnel (round-3 finding: ops
"ran" at 3-16x the chip's physical peak because identical dispatches
get deduplicated/reordered somewhere between client and device).
``bench.py`` never hit this because its train step donates and consumes
the state, forcing a data-dependent chain across calls.

:func:`chained_op_time` builds the same protection for isolated ops:
ONE jitted program whose ``lax.scan`` carry depends on every output
leaf of every iteration — no LICM hoist, no dead-code elimination, no
dedup — then times whole executions and divides by the iteration
count. The per-iteration dependency costs one reduction per output
leaf, so reported efficiency is a slight lower bound.
"""

from __future__ import annotations

import time
from typing import Callable

__all__ = ["chained_op_time"]


def chained_op_time(
    op: Callable,
    *args,
    iters: int = 30,
    repeats: int = 3,
) -> float:
    """Seconds per single execution of ``op(*args)``.

    ``args[0]`` must be a float array (the chain carry); outputs may be
    any pytree — every leaf feeds the carry so none can be eliminated.
    Returns the best of ``repeats`` timed runs of the ``iters``-long
    chain, divided by ``iters``.
    """
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

    f = jax.jit(chained)
    f(*args).block_until_ready()  # compile + warm
    best = float("inf")
    for r in range(1, repeats + 1):
        # fresh input VALUES every timed run: the axon relay serves
        # repeated (executable, identical inputs) executions from a
        # cache (measured: whole 30-iter chains "ran" in ~30us), so a
        # re-run with the same buffers times nothing. The perturbation
        # multiply is its own (untimed) execution.
        a0 = (args[0] * (1.0 + r * 1e-3)).block_until_ready()
        t0 = time.perf_counter()
        f(a0, *args[1:]).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters
