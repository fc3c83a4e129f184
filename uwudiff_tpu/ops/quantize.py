"""Int8 weight-only quantization for serving.

No reference counterpart (UwUDiff serves fp16 torch) — TPU-first
serving lever: small-batch sampling is HBM-bandwidth-bound on weight
streaming, so storing kernels as int8 (+ per-output-channel fp32
scales) halves the bytes the MXU pipeline pulls per step vs bf16. The
dequantize runs INSIDE the jitted program — XLA keeps the int8 buffer
as the HBM-resident form and fuses the convert+scale into the
consumer's operand pipeline (VMEM tiles), so compute stays bf16 on the
MXU while traffic drops ~2x.

Per-channel symmetric scheme: for a kernel ``[..., out]`` the scale is
``max|w| / 127`` over all axes but the last. Quantization error is
<= scale/2 per element (~0.4% of the channel's dynamic range) — small
against bf16 activation noise; validated end-to-end in
``tests/test_quantize.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["quantize_tree", "dequantize_tree", "quantized_bytes"]

_QKEY = "__q8__"


def _is_quantizable(x, min_size: int) -> bool:
    if not hasattr(x, "ndim") or x.ndim < 2 or x.size < min_size:
        return False
    return x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)


def quantize_tree(params: Any, min_size: int = 4096) -> Any:
    """Replace large float kernels with ``{_QKEY: int8, "scale": f32}``
    nodes; everything else (biases, norms, small tables) passes through
    unchanged. Pure function of the tree — run once at serving setup."""

    def rec(node):
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if not _is_quantizable(node, min_size):
            return node
        x = jnp.asarray(node, jnp.float32)
        absmax = jnp.max(
            jnp.abs(x), axis=tuple(range(x.ndim - 1)), keepdims=True
        )
        scale = absmax / 127.0
        safe = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
        return {_QKEY: q, "scale": scale.astype(jnp.float32)}

    return rec(params)


def dequantize_tree(qparams: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse of :func:`quantize_tree`; jit-traceable (call INSIDE the
    compiled program so int8 stays the stored form)."""

    def rec(node):
        if isinstance(node, dict):
            if _QKEY in node:
                return (
                    node[_QKEY].astype(jnp.float32) * node["scale"]
                ).astype(dtype)
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(qparams)


def quantized_bytes(tree: Any) -> tuple[int, int]:
    """(quantized_leaf_bytes, total_bytes) for reporting."""
    qb = tb = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        n = leaf.size * leaf.dtype.itemsize
        tb += n
        if leaf.dtype == jnp.int8:
            qb += n
    return qb, tb
