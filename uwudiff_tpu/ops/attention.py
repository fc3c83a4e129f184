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

__all__ = [
    "dot_product_attention",
    "attention_bias_from_mask",
    "sequence_parallel",
    "head_parallel",
]


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


_seq_ctx: "sequence_parallel | None" = None


class sequence_parallel:
    """Context manager routing *self*-attention calls through
    sequence-parallel attention over a ``seq`` mesh axis (SURVEY.md
    §5.7): ``method="ring"`` (K/V rotation, ``parallel/ring_attention``)
    or ``method="ulysses"`` (head all-to-all, ``parallel/ulysses``;
    requires heads divisible by the axis and no tensor axis — falls
    back to ring otherwise).

    Activate around model tracing (DMTrainer does this when its mesh has
    a ``seq`` axis): every ``dot_product_attention`` call with Sq == Sk,
    no bias, and a token count divisible by the axis size runs as a
    ``shard_map`` over the token dimension — each device holds S/n
    tokens, K/V blocks rotate over ICI (``ppermute``), and no device
    materializes full-sequence attention. Calls that don't qualify
    (cross-attention, masked attention, short levels below
    ``min_tokens``) take the normal path, where GSPMD reshards as
    needed.
    """

    def __init__(self, mesh, axis: str = "seq", min_tokens: int = 0,
                 method: str = "ring"):
        if method not in ("ring", "ulysses"):
            raise ValueError(f"unknown sequence-parallel method {method!r}")
        self.mesh = mesh
        self.axis = axis
        self.min_tokens = min_tokens
        self.method = method

    def __enter__(self):
        global _seq_ctx
        self._prev = _seq_ctx
        _seq_ctx = self
        return self

    def __exit__(self, *exc):
        global _seq_ctx
        _seq_ctx = self._prev
        return False


def _maybe_ring(q, k, v, bias, scale, use_flash=None):
    """Ring-attention dispatch under an active ``sequence_parallel``
    context; returns None when the call doesn't qualify."""
    ctx = _seq_ctx
    if ctx is None:
        return None
    mesh, axis = ctx.mesh, ctx.axis
    if axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        return None
    n = mesh.shape[axis]
    sq, sk = q.shape[1], k.shape[1]
    if sq != sk or bias is not None:  # self-attention only, unmasked
        return None
    if sq % n != 0 or sq < max(ctx.min_tokens, n):
        return None
    batch_axes = tuple(
        a for a in ("data", "fsdp")
        if a in mesh.axis_names and mesh.shape[a] > 1
    )
    if batch_axes:
        import numpy as np

        if q.shape[0] % int(np.prod([mesh.shape[a] for a in batch_axes])):
            return None
    head_axis = None
    if (
        "tensor" in mesh.axis_names
        and mesh.shape["tensor"] > 1
        and q.shape[2] % mesh.shape["tensor"] == 0
    ):
        head_axis = "tensor"

    from jax.sharding import PartitionSpec as P

    method = getattr(ctx, "method", "ring")
    if method == "ulysses" and head_axis is None and q.shape[2] % n == 0:
        from uwudiff_tpu.parallel.ulysses import ulysses_attention

        inner = functools.partial(
            ulysses_attention, axis_name=axis, scale=scale,
            use_flash=use_flash,
        )
    else:  # ring: no head-divisibility constraint, composes with TP
        from uwudiff_tpu.parallel.ring_attention import ring_attention

        inner = functools.partial(
            ring_attention, axis_name=axis, scale=scale, use_flash=use_flash
        )

    spec = P(batch_axes if batch_axes else None, axis, head_axis, None)
    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


_tp_ctx: "head_parallel | None" = None


class head_parallel:
    """Context manager routing attention through a ``shard_map`` over the
    head axis under tensor parallelism.

    GSPMD cannot partition a custom call: a Pallas flash kernel applied
    to head-sharded activations (the natural layout after Megatron
    column-split QKV projections, ``parallel/mesh.py`` TP rules) would
    force an all-gather back to full H on every attention. Attention is
    embarrassingly parallel over heads, so a shard_map island with
    ``P(batch, None, tensor, None)`` specs runs the kernel per-shard
    with ZERO added communication — the specs coincide with the
    sharding GSPMD already picked for the surrounding projections.

    DMTrainer activates this whenever its mesh has a ``tensor`` axis of
    size > 1. Calls whose head count or batch doesn't divide the mesh
    fall through to the normal (GSPMD-partitioned XLA) path.
    """

    def __init__(self, mesh, axis: str = "tensor"):
        self.mesh = mesh
        self.axis = axis

    def __enter__(self):
        global _tp_ctx
        self._prev = _tp_ctx
        _tp_ctx = self
        return self

    def __exit__(self, *exc):
        global _tp_ctx
        _tp_ctx = self._prev
        return False


def _maybe_head_parallel(q, k, v, bias, scale, use_flash, bias_grad):
    """Head-sharded shard_map dispatch under an active ``head_parallel``
    context; returns None when the call doesn't qualify."""
    ctx = _tp_ctx
    if ctx is None:
        return None
    mesh, axis = ctx.mesh, ctx.axis
    if axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        return None
    n = mesh.shape[axis]
    if q.shape[2] % n:
        return None
    batch_axes = tuple(
        a for a in ("data", "fsdp")
        if a in mesh.axis_names and mesh.shape[a] > 1
    )
    if batch_axes:
        import numpy as np

        if q.shape[0] % int(np.prod([mesh.shape[a] for a in batch_axes])):
            return None

    from jax.sharding import PartitionSpec as P

    bspec = ()
    bargs = ()
    if bias is not None:
        if bias.ndim != 4 or bias.shape[1] not in (1, q.shape[2]):
            return None
        bspec = (
            P(
                batch_axes if (batch_axes and bias.shape[0] > 1) else None,
                axis if bias.shape[1] > 1 else None,
                None,
                None,
            ),
        )
        bargs = (bias,)
    spec = P(batch_axes if batch_axes else None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(
            _local_attention,
            scale=scale,
            use_flash=use_flash,
            bias_grad=bias_grad,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec) + bspec,
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, *bargs)


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
    bias_grad: bool = False,
) -> jnp.ndarray:
    """Fused scaled-dot-product attention.

    Args:
        q: [B, Sq, H, D]
        k, v: [B, Sk, H, D]
        bias: additive logit bias broadcastable to [B, H, Sq, Sk]
        scale: overrides the default 1/sqrt(D)
        use_flash: force (True) or forbid (False) the Pallas kernel;
            None = auto (TPU backend + shape constraints).
        bias_grad: set True when ``bias`` is LEARNED (needs gradients).
            The default treats the bias as a constant on the flash path
            — correct for masks, silently wrong for trained biases.
    """
    ring_out = _maybe_ring(q, k, v, bias, scale, use_flash)
    if ring_out is not None:
        return ring_out
    hp_out = _maybe_head_parallel(q, k, v, bias, scale, use_flash, bias_grad)
    if hp_out is not None:
        return hp_out
    return _local_attention(
        q, k, v, bias, scale=scale, use_flash=use_flash, bias_grad=bias_grad
    )


def _local_attention(q, k, v, bias=None, scale=None, use_flash=None,
                     bias_grad=False):
    """Single-shard backend selection (flash kernel when available)."""
    if use_flash is None:
        use_flash = _flash_override if _flash_override is not None else _on_tpu()
    if use_flash:
        from uwudiff_tpu.ops.flash_attention import (
            flash_attention,
            flash_shape_supported,
        )

        if flash_shape_supported(q, k, v):
            return flash_attention(
                q, k, v, bias=bias, scale=scale, bias_grad=bias_grad
            )
    return _xla_attention(q, k, v, bias=bias, scale=scale)
