"""Device mesh + sharding rules — the framework's entire "distributed
communication backend".

The reference delegates DP to Lightning/NCCL (SURVEY.md §2.4). Here the
equivalent is declarative: a ``jax.sharding.Mesh`` with ``data`` and
``fsdp`` axes, ``NamedSharding`` annotations on the batch and the param
pytree, and GSPMD emitting the collectives over ICI. FSDP (absent in the
reference, SURVEY.md §2.3) falls out of the same mechanism: shard each
large param along its largest divisible axis over ``fsdp``.

An optional ``tensor`` axis is reserved for megamodels (>10B); SDXL-class
parity needs only data+fsdp.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "fsdp_param_sharding",
    "replicate_sharding",
    "DATA_AXIS",
    "FSDP_AXIS",
    "TENSOR_AXIS",
]

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"


def make_mesh(
    axis_sizes: Mapping[str, int] | None = None, devices=None
) -> Mesh:
    """Build a mesh over the available devices.

    ``axis_sizes`` maps axis name -> size; a single ``-1`` entry absorbs
    the remaining devices. Default: all devices on ``data``.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        assert n % known == 0, f"{n} devices not divisible by {known}"
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {dict(zip(names, sizes))} needs {total} > {n} devices"
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every data-like mesh axis
    present (``data`` and ``fsdp`` jointly act as data-parallel for the
    batch; this is standard FSDP batch placement)."""
    axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS) if a in mesh.axis_names)
    if not axes:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axes))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec_for_leaf(
    shape: tuple[int, ...], fsdp_size: int, min_size: int
) -> P:
    """Shard the largest axis divisible by ``fsdp_size``; replicate small
    or indivisible leaves."""
    if int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest dim; tie-break on the last axis (features) which
    # keeps conv kernels replicated spatially
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for dim in order:
        if shape[dim] % fsdp_size == 0 and shape[dim] >= fsdp_size:
            spec = [None] * len(shape)
            spec[dim] = FSDP_AXIS
            return P(*spec)
    return P()


def fsdp_param_sharding(
    params: Any, mesh: Mesh, min_size: int = 2**16
) -> Any:
    """NamedSharding pytree for params: FSDP over the ``fsdp`` axis
    (replicated over ``data``). If the mesh has no fsdp axis, fully
    replicate."""
    if FSDP_AXIS not in mesh.axis_names or mesh.shape[FSDP_AXIS] == 1:
        rep = replicate_sharding(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)
    fsdp_size = mesh.shape[FSDP_AXIS]

    def leaf_sharding(x):
        spec = _fsdp_spec_for_leaf(tuple(x.shape), fsdp_size, min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(leaf_sharding, params)
