"""Pallas TPU flash-attention kernel (placeholder gate).

The real kernel lands in ``flash_attention`` below; until the kernel is
wired, ``flash_shape_supported`` returns False so dispatch falls back to
the XLA path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["flash_attention", "flash_shape_supported"]


def flash_shape_supported(q, k, v) -> bool:
    return False


def flash_attention(q, k, v, bias=None, scale=None) -> jnp.ndarray:
    raise NotImplementedError
