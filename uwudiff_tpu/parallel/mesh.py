"""Device mesh + sharding rules — the framework's entire "distributed
communication backend".

The reference delegates DP to Lightning/NCCL (SURVEY.md §2.4). Here the
equivalent is declarative: a ``jax.sharding.Mesh`` with ``data``,
``fsdp`` and optional ``tensor`` axes, ``NamedSharding`` annotations on
the batch and the param pytree, and GSPMD emitting the collectives over
ICI. FSDP (absent in the reference, SURVEY.md §2.3) falls out of the
same mechanism: shard each large param along its largest divisible axis
over ``fsdp``.

Tensor parallelism (the >SDXL scale-out lever) is Megatron-style rules
keyed on param paths: attention q/k/v and MLP up-projections split
their OUTPUT features over ``tensor`` (column parallel), out/down
projections split their INPUT features (row parallel — GSPMD emits the
psum). FSDP then shards a remaining free axis of the same tensor.
"""

from __future__ import annotations

import re
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
    "PIPE_AXIS",
    "EXPERT_AXIS",
]

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"

# MoE expert-stacked leaves (models/moe.py): [E, d, f] kernels and
# [E, f] biases whose leading expert axis shards over `expert`. The
# fp32 router kernel is excluded (replicated/FSDP like any small leaf).
_MOE_EXPERT_LEAF = re.compile(r"(^|/)moe/(wi|wo|bi|bo)$")


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


# Megatron-style tensor-parallel rules over OUR param paths
# ("/"-joined). Value: which kernel dim carries the tensor axis —
# "col" = output features (last dim), "row" = input features (dim 0 for
# linear kernels [in, out]). Biases of column-parallel layers shard too.
_TP_RULES: list[tuple[str, str]] = [
    # UNet/DiT transformer blocks (models/transformer.py naming)
    (r"attn\d/to_(q|k|v|qkv|kv)/kernel$", "col"),
    (r"attn\d/to_out/kernel$", "row"),
    (r"ff/proj_in/kernel$", "col"),   # GEGLU up-projection
    (r"ff/proj_out/kernel$", "row"),
    (r"attn\d/to_(q|k|v)/bias$", "col1d"),
    (r"ff/proj_in/bias$", "col1d"),
    # CLIP/T5 towers (models/clip.py, t5.py naming)
    (r"(q|k|v)_proj/kernel$", "col"),
    (r"out_proj/kernel$", "row"),
    (r"fc1/kernel$", "col"),
    (r"fc2/kernel$", "row"),
    (r"(q|k|v)_proj/bias$", "col1d"),
    (r"fc1/bias$", "col1d"),
]


def _tp_spec_for_path(
    path: str, shape: tuple[int, ...], tp_size: int
) -> tuple[int, ...] | None:
    """Returns the dim index carrying the tensor axis, or None."""
    for pat, kind in _TP_RULES:
        if re.search(pat, path):
            if kind == "col" and len(shape) >= 2:
                dim = len(shape) - 1
            elif kind == "row" and len(shape) >= 2:
                # input-features dim: 0 for [in, out] kernels, -2 for
                # nn.scan-stacked [layers, in, out] kernels
                dim = len(shape) - 2
            elif kind == "col1d" and len(shape) == 1:
                dim = 0
            else:
                continue
            if shape[dim] % tp_size == 0 and shape[dim] >= tp_size:
                return (dim,)
            return None
    return None


def fsdp_param_sharding(
    params: Any, mesh: Mesh, min_size: int = 2**16
) -> Any:
    """NamedSharding pytree for params.

    - ``pipe`` axis (if in the mesh, size>1): layer-stacked block params
      (``.../blocks/...`` leaves from ``nn.scan`` stacks) shard their
      leading layer axis stage-wise — the pipeline-parallel layout
      (``parallel/pipeline.py``).
    - ``tensor`` axis (if in the mesh, size>1): Megatron-style
      column/row splits on attention and MLP kernels (``_TP_RULES``).
    - ``fsdp`` axis: shard the largest remaining divisible axis of each
      large leaf; replicate small/indivisible leaves.
    - replicated over ``data`` always.
    """
    has_fsdp = FSDP_AXIS in mesh.axis_names and mesh.shape[FSDP_AXIS] > 1
    has_tp = TENSOR_AXIS in mesh.axis_names and mesh.shape[TENSOR_AXIS] > 1
    has_pipe = PIPE_AXIS in mesh.axis_names and mesh.shape[PIPE_AXIS] > 1
    has_ep = EXPERT_AXIS in mesh.axis_names and mesh.shape[EXPERT_AXIS] > 1
    if not has_fsdp and not has_tp and not has_pipe and not has_ep:
        rep = replicate_sharding(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)
    fsdp_size = mesh.shape[FSDP_AXIS] if has_fsdp else 1
    tp_size = mesh.shape[TENSOR_AXIS] if has_tp else 1
    pipe_size = mesh.shape[PIPE_AXIS] if has_pipe else 1
    ep_size = mesh.shape[EXPERT_AXIS] if has_ep else 1

    def leaf_sharding(path, x):
        shape = tuple(x.shape)
        spec = [None] * len(shape)
        tp_dim = None
        pipe_dim = None
        ep_dim = None
        our = "/".join(str(getattr(p, "key", p)) for p in path)
        if (
            has_pipe
            and re.search(r"(^|/)blocks/", our)
            and shape
            and shape[0] % pipe_size == 0
            and shape[0] >= pipe_size
        ):
            spec[0] = PIPE_AXIS
            pipe_dim = 0
        if has_ep and _MOE_EXPERT_LEAF.search(our):
            # expert axis: leading dim, or dim 1 under an nn.scan layer
            # stack (leading dim = layers, already pipe's if pipe>1)
            dim = 1 if re.search(r"(^|/)blocks/", our) else 0
            if (
                dim != pipe_dim
                and dim < len(shape)
                and shape[dim] % ep_size == 0
                and shape[dim] >= ep_size
            ):
                spec[dim] = EXPERT_AXIS
                ep_dim = dim
        if has_tp:
            hit = _tp_spec_for_path(our, shape, tp_size)
            if hit is not None and hit[0] != pipe_dim and hit[0] != ep_dim:
                tp_dim = hit[0]
                spec[tp_dim] = TENSOR_AXIS
        if has_fsdp and int(np.prod(shape)) >= min_size:
            order = sorted(
                range(len(shape)), key=lambda i: (shape[i], i), reverse=True
            )
            for dim in order:
                if dim == tp_dim or dim == pipe_dim or dim == ep_dim:
                    continue
                # a dim already carrying tensor can't also carry fsdp;
                # sharded-dim remainder must still divide
                size = shape[dim]
                if size % fsdp_size == 0 and size >= fsdp_size:
                    spec[dim] = FSDP_AXIS
                    break
        while spec and spec[-1] is None:  # canonical form, trailing-trimmed
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)
