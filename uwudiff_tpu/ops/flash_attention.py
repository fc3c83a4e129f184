"""Pallas TPU flash attention.

The framework's hot attention kernel — replaces the CUDA SDPA/xformers
paths of the reference (``duwu/modules/rope_unet.py:151,249``) with one
TPU-native implementation (SURVEY.md §2.2).

Design:
- inputs ``[B, S, H, D]`` are folded to ``[B*H, S, D]`` and tiled over a
  ``(batch*heads, q_blocks)`` grid
- K/V live in VMEM per program; the kernel streams K-blocks through the
  MXU with online-softmax accumulation (m/l/acc carries) — no [Sq, Sk]
  logits ever hit HBM
- logits/accumulator in fp32, inputs bf16/fp32
- optional additive key bias ``[B, Sk]`` (padding masks; CFG's ragged
  text lengths) — broadcast over heads and queries
- sequence lengths are padded to block multiples with -inf key bias, so
  arbitrary shapes are exact
- backward: custom VJP. The backward pass currently recomputes attention
  with XLA einsums (correct, fuses well); a Pallas backward kernel is the
  planned next optimization.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_shape_supported"]

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def flash_shape_supported(q, k, v) -> bool:
    """Gate for the dispatch layer: last dim must be MXU-friendly and
    sequences long enough to be worth a kernel launch."""
    d = q.shape[-1]
    if d % 64 != 0 or d > 256:
        return False
    if q.shape[1] < 128 or k.shape[1] < 128:
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float, block_k: int
):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, Sk, D]; bias_ref: [1, Sk]
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, D]
    sk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = sk // block_k

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b_blk = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = (
            jax.lax.dot_general(
                q,
                k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_blk[None, :]
        )  # [BQ, BK]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [BQ, BK]
        alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            p,
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    out_ref[0] = out.astype(out_ref.dtype)


def _flash_forward(
    q3: jnp.ndarray,  # [BH, Sq, D]
    k3: jnp.ndarray,  # [BH, Sk, D]
    v3: jnp.ndarray,
    bias2: jnp.ndarray,  # [BH, 1, Sk] additive
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    grid = (bh, sq // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, block_k=block_k
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, sk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(q3, k3, v3, bias2)


def _xla_attention_bhsd(q3, k3, v3, bias2, scale):
    """Reference path on folded [BH, S, D] tensors (used by the VJP)."""
    logits = (
        jnp.einsum("bqd,bkd->bqk", q3.astype(jnp.float32), k3.astype(jnp.float32))
        * scale
    )
    logits = logits + bias2.astype(jnp.float32)  # [BH, 1, Sk] broadcasts
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", weights, v3.astype(jnp.float32)).astype(
        q3.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core(q3, k3, v3, bias2, scale, block_q, block_k, interpret):
    return _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k, interpret)


def _flash_core_fwd(q3, k3, v3, bias2, scale, block_q, block_k, interpret):
    out = _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k, interpret)
    return out, (q3, k3, v3, bias2)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, g):
    q3, k3, v3, bias2 = res
    qf = q3.astype(jnp.float32)
    kf = k3.astype(jnp.float32)
    vf = v3.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    logits = jnp.einsum("bqd,bkd->bqk", qf, kf) * scale
    logits = logits + bias2.astype(jnp.float32)  # [BH, 1, Sk]
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf) * scale
    return (
        dq.astype(q3.dtype),
        dk.astype(k3.dtype),
        dv.astype(v3.dtype),
        jnp.zeros_like(bias2),
    )


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, Sq, H, D]
    k: jnp.ndarray,  # [B, Sk, H, D]
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,  # broadcastable to [B, H, Sq, Sk]
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # key bias [B, Sk]: accept None or [B, 1, 1, Sk]-style key masks
    if bias is None:
        bias2 = jnp.zeros((b, sk), jnp.float32)
    else:
        bias2 = jnp.broadcast_to(bias, (b, 1, 1, sk))[:, 0, 0, :].astype(
            jnp.float32
        )
    # clamp -inf-ish masks to a finite mask value (exp underflows to 0)
    bias2 = jnp.maximum(bias2, NEG_INF)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))

    # pad sequences to block multiples (exact: padded keys get -inf bias,
    # padded queries are sliced off)
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qp = jnp.pad(q, [(0, 0), (0, sq_p - sq), (0, 0), (0, 0)])
    kp = jnp.pad(k, [(0, 0), (0, sk_p - sk), (0, 0), (0, 0)])
    vp = jnp.pad(v, [(0, 0), (0, sk_p - sk), (0, 0), (0, 0)])
    bias2 = jnp.pad(bias2, [(0, 0), (0, sk_p - sk)], constant_values=NEG_INF)

    # fold heads: [B, S, H, D] -> [B*H, S, D]
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    q3, k3, v3 = fold(qp), fold(kp), fold(vp)
    bias_bh = jnp.repeat(bias2, h, axis=0)[:, None, :]  # [B*H, 1, Sk]

    out3 = _flash_core(
        q3, k3, v3, bias_bh, scale, block_q, block_k, interpret
    )
    out = out3.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :sq]
