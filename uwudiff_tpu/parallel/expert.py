"""Expert parallelism — sharding glue for the `expert` mesh axis.

MoE expert weights ([E, d, f] stacked leaves, ``models/moe.py``) shard
their leading expert axis over the ``expert`` mesh axis
(``mesh.fsdp_param_sharding`` rule). The activation side is this
module: an ``expert_parallel`` context (entered by ``DMTrainer`` when
its mesh has ``expert > 1``, same pattern as ``ops.attention
.sequence_parallel``) under which ``MoEMlp`` pins its [E, B, C, D]
dispatch/combine intermediates to ``P(expert, data...)`` — each
expert-shard computes only its experts' slots for the locally-sharded
batch, and GSPMD closes the combine with one psum over ``expert``.
Batch tensors stay sharded over ``data`` (replicated over ``expert``),
so no all-to-all is required at this layout.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["expert_parallel", "constrain_expert", "EXPERT_AXIS"]

EXPERT_AXIS = "expert"

_ep_ctx: "expert_parallel | None" = None


class expert_parallel:
    """Context manager activating expert-axis sharding constraints
    inside ``MoEMlp`` (no-op for code paths without MoE layers)."""

    def __init__(self, mesh, axis: str = EXPERT_AXIS):
        self.mesh = mesh
        self.axis = axis

    def __enter__(self):
        global _ep_ctx
        self._prev = _ep_ctx
        _ep_ctx = self
        return self

    def __exit__(self, *exc):
        global _ep_ctx
        _ep_ctx = self._prev
        return False


def constrain_expert(x: jax.Array) -> jax.Array:
    """Pin a leading-expert-axis intermediate ([E, B, ...]) to
    ``P(expert, data-axes)`` under an active ``expert_parallel``
    context; identity otherwise."""
    if _ep_ctx is None:
        return x
    mesh, axis = _ep_ctx.mesh, _ep_ctx.axis
    if axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        return x
    batch_axes = tuple(
        a for a in ("data", "fsdp") if a in mesh.axis_names
    )
    spec = [axis, batch_axes if batch_axes else None]
    spec += [None] * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )
