"""Ring attention: sequence-parallel attention over a ``seq`` mesh axis.

The long-context extension slot SURVEY.md §5.7 reserves: latent/text
tokens shard over a ``seq`` axis, each device holds its local Q block
and the K/V blocks rotate around the ring over ICI
(``jax.lax.ppermute``) while partial attention accumulates in
log-sum-exp space. Attention memory per device stays O(S/n); no device
ever materializes the full sequence. (Ring Attention, Liu et al. 2023 —
re-derived here on top of the blockwise kernel.)

Composition: the per-(Q_local, KV_block) inner attention is the
framework's own dispatch — the Pallas flash kernel on TPU (its forward
already emits the row logsumexp the merge needs), the XLA einsum path
elsewhere — so ring attention is a ~100-line wrapper, exactly the
slot-in SURVEY.md planned.

Usage (inside ``shard_map`` with a mesh that has a ``seq`` axis)::

    out = ring_attention(q_local, k_local, v_local, axis_name="seq")

No causal masking (diffusion attention is bidirectional); an optional
additive key bias rotates with its K/V block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "attention_with_lse"]


def attention_with_lse(q, k, v, bias=None, scale=None, use_flash=None,
                       bias_grad: bool = False):
    """Attention returning (out, lse): out [B, Sq, H, D], row
    log-sum-exp lse [B, H, Sq] — the quantities needed to merge
    partial attentions over K/V blocks.

    Dispatches like ``dot_product_attention``: the Pallas flash kernel
    (``flash_attention(..., return_lse=True)``) on TPU for supported
    block shapes — so each ring step stays O(block) memory — and the
    jnp einsum formulation elsewhere (small per-device blocks trace
    fine through XLA).

    ``bias_grad``: the flash return_lse path treats ``bias`` as a
    CONSTANT (zero gradient — correct for masks, the only bias ring
    attention passes). Set True for a *learned* bias: the einsum
    formulation (exact bias gradients) is used instead, since the
    kernel does not support dBias together with return_lse.
    """
    from uwudiff_tpu.ops import attention as _dispatch

    if use_flash is None:
        use_flash = (
            _dispatch._flash_override
            if _dispatch._flash_override is not None
            else _dispatch._on_tpu()
        )
    if bias is not None and bias_grad:
        use_flash = False
    if use_flash:
        from uwudiff_tpu.ops.flash_attention import (
            flash_attention,
            flash_shape_supported,
        )

        if flash_shape_supported(q, k, v):
            return flash_attention(
                q, k, v, bias=bias, scale=scale, return_lse=True
            )
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(v.dtype), v)
    lse = (m + jnp.log(l))[..., 0]  # [B, H, Sq]
    return out, lse


def _merge(out_a, lse_a, out_b, lse_b):
    """Numerically-stable combination of two normalized partial
    attentions via their log-sum-exps."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    # [B, H, Sq] -> [B, Sq, H, 1] to weight [B, Sq, H, D]
    wa4 = wa.transpose(0, 2, 1)[..., None]
    wb4 = wb.transpose(0, 2, 1)[..., None]
    denom = wa4 + wb4
    out = (
        out_a.astype(jnp.float32) * wa4 + out_b.astype(jnp.float32) * wb4
    ) / denom
    lse = m + jnp.log(wa + wb)
    return out.astype(out_a.dtype), lse


def ring_attention(
    q: jnp.ndarray,  # [B, Sq_local, H, D]
    k: jnp.ndarray,  # [B, Sk_local, H, D]
    v: jnp.ndarray,
    axis_name: str,
    key_bias: jnp.ndarray | None = None,  # [B, Sk_local], rotates with KV
    scale: float | None = None,
    use_flash: bool | None = None,  # None = auto; False honors an
    # explicit XLA-numerics request threaded from the dispatch
) -> jnp.ndarray:
    """Sequence-parallel attention inside ``shard_map`` (see module
    docstring). Returns the local [B, Sq_local, H, D] output."""
    n = jax.lax.psum(1, axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def bias4(kb):
        if kb is None:
            return None
        return kb[:, None, None, :]  # [B, 1, 1, Sk_local]

    out, lse = attention_with_lse(
        q, k, v, bias=bias4(key_bias), scale=scale, use_flash=use_flash
    )

    def step(carry, _):
        out, lse, kk, vv, kb = carry
        kk = jax.lax.ppermute(kk, axis_name, perm)
        vv = jax.lax.ppermute(vv, axis_name, perm)
        if kb is not None:
            kb = jax.lax.ppermute(kb, axis_name, perm)
        o_i, lse_i = attention_with_lse(
            q, kk, vv, bias=bias4(kb), scale=scale, use_flash=use_flash
        )
        out, lse = _merge(out, lse, o_i, lse_i)
        return (out, lse, kk, vv, kb), None

    (out, lse, _, _, _), _ = jax.lax.scan(
        step, (out, lse, k, v, key_bias), None, length=n - 1
    )
    return out
