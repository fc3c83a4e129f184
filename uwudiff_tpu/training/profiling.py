"""Profiling & sanitizers (SURVEY.md §5.1-5.2).

The reference has essentially no tracing (one commented line_profiler
hook, ``duwu/utils/aggregation.py:1``); here profiling is first-class:
``jax.profiler`` traces viewable in TensorBoard/Perfetto plus wall-clock
step timing, and the NaN story is ``jax_debug_nans`` + an in-graph
finite-check helper.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["StepTimer", "trace_steps", "enable_nan_debugging", "check_finite"]


class StepTimer:
    """Rolling wall-clock step timing -> metrics dict entries."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> dict[str, float]:
        now = time.perf_counter()
        out: dict[str, float] = {}
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
            out["perf/step_time_ms"] = dt * 1000.0
            out["perf/steps_per_sec"] = 1.0 / (
                sum(self._times) / len(self._times)
            )
        self._last = now
        return out


@contextlib.contextmanager
def trace_steps(log_dir: str):
    """jax.profiler trace context; open the result in TensorBoard or
    Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    """Global NaN checking (the TPU counterpart of torch anomaly mode)."""
    jax.config.update("jax_debug_nans", True)


def check_finite(tree, name: str = "tree") -> jnp.ndarray:
    """In-graph finite check: returns a bool scalar (all finite); use
    with ``jax.debug.print`` or as a metrics entry."""
    leaves = jax.tree_util.tree_leaves(tree)
    finite = jnp.array(True)
    for leaf in leaves:
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))
    return finite
