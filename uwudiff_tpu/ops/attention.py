"""Attention dispatch: one implementation surface for every attention in
the framework (replaces the reference's dual SDPA/xformers backends,
``duwu/modules/rope_unet.py:151,249``).

``dot_product_attention(q, k, v, bias)`` takes ``[B, S, H, D]`` tensors
(sequence-major, head-split) and returns ``[B, Sq, H, D]``.

Backend selection:
- on TPU, for supported shapes, the Pallas flash-attention kernel
  (``uwudiff_tpu/ops/flash_attention.py``) — O(S) memory, fused softmax;
- otherwise the XLA einsum path (which XLA fuses well on its own).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention", "attention_bias_from_mask"]


_flash_override: bool | None = None


class flash_disabled:
    """Context manager forcing the XLA attention path — used when
    tracing/initializing on host CPU while TPU devices exist (the
    device_kind heuristic would otherwise pick the compiled kernel)."""

    def __enter__(self):
        global _flash_override
        self._prev = _flash_override
        _flash_override = False
        return self

    def __exit__(self, *exc):
        global _flash_override
        _flash_override = self._prev
        return False


def _on_tpu() -> bool:
    """TPU detection that also covers proxy platforms (e.g. 'axon')
    whose platform name is not 'tpu' but whose devices are TPU chips."""
    if jax.default_backend() == "tpu":
        return True
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:
        return False


def attention_bias_from_mask(
    mask: jnp.ndarray | None, dtype=jnp.float32
) -> jnp.ndarray | None:
    """[B, Sk] boolean/0-1 key mask -> additive bias [B, 1, 1, Sk]."""
    if mask is None:
        return None
    neg = jnp.finfo(dtype).min
    bias = jnp.where(mask.astype(bool), 0.0, neg).astype(dtype)
    return bias[:, None, None, :]


def _xla_attention(q, k, v, bias=None, scale=None):
    """Reference einsum attention; softmax in fp32 for stability."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


@functools.partial(jax.named_call, name="dot_product_attention")
def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Fused scaled-dot-product attention.

    Args:
        q: [B, Sq, H, D]
        k, v: [B, Sk, H, D]
        bias: additive logit bias broadcastable to [B, H, Sq, Sk]
        scale: overrides the default 1/sqrt(D)
        use_flash: force (True) or forbid (False) the Pallas kernel;
            None = auto (TPU backend + shape constraints).
    """
    if use_flash is None:
        use_flash = _flash_override if _flash_override is not None else _on_tpu()
    if use_flash:
        from uwudiff_tpu.ops.flash_attention import (
            flash_attention,
            flash_shape_supported,
        )

        if flash_shape_supported(q, k, v):
            return flash_attention(q, k, v, bias=bias, scale=scale)
    return _xla_attention(q, k, v, bias=bias, scale=scale)
