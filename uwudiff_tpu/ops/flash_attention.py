"""Pallas TPU flash attention — forward AND backward kernels.

The framework's hot attention path, replacing the CUDA SDPA/xformers
backends of the reference (``duwu/modules/rope_unet.py:151,249``,
SURVEY.md §2.2). O(S) memory in both directions: no [Sq, Sk] logits
matrix ever hits HBM.

Design (canonical TPU tiling):
- inputs ``[B, S, H, D]`` fold to ``[B*H, S, D]``
- forward grid = ``(batch*heads, q_blocks, k_blocks)`` with the K axis
  marked "arbitrary" (sequential): online-softmax state (m/l/acc) lives
  in VMEM scratch across K steps; K/V stream through as (BK, D) blocks —
  VMEM residency is O(BQ*D + BK*D), independent of sequence length
- the forward also emits the row logsumexp for the backward
- backward (FlashAttention-2 scheme): dQ kernel iterates K blocks per Q
  block; dK/dV kernel iterates Q blocks per K block; P is recomputed
  from the saved lse and ``delta = rowsum(dO * O)``
- logits/accumulators fp32 on the MXU (``preferred_element_type``),
  inputs bf16/fp32
- additive bias, two forms sharing one kernel body (the block is
  broadcast against the [BQ, BK] logits):
    * key bias, anything broadcastable to ``[B, 1, 1, Sk]`` (padding
      masks, CFG ragged text) — streamed as [1, BK] blocks, O(Sk) HBM
    * full bias, anything broadcastable to ``[B, H, Sq, Sk]`` (e.g.
      relative-position biases) — streamed as [BQ, BK] blocks; costs
      O(B*H*Sq*Sk) HBM for the materialized bias but never materializes
      logits. By default the bias is treated as a constant (zero
      gradient, the right trade for masks); pass ``bias_grad=True`` for
      a *learned* bias — the dQ backward kernel then also emits the true
      dBias blocks (dL/dbias = p*(dp-delta)).
  Sequence padding uses -inf key bias so arbitrary lengths are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_shape_supported"]

DEFAULT_BLOCK_Q = 512  # larger Q tiles halve K/V re-reads across the grid
DEFAULT_BLOCK_K = 2048
NEG_INF = -1e30
# exp2-domain softmax (round 5): exp(x) = exp2(x * LOG2E), with the
# LOG2E folded into the [*, D] q-scale (cheap) instead of a per-element
# multiply on every [BQ, BK] logit tile — and the backward kernels drop
# their full-tile `* scale` pass the same way. At d=40 the VPU softmax
# ops rival the lane-limited MXU time, so logit-tile passes are the
# long-seq kernel's marginal cost (scripts/flash_roofline.py).
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453

# measured winners from scripts/flash_tune.py (v5e, bf16, fwd+bwd,
# probe-validated chained timer — hw_logs/flash_tune4.log):
# (sq_bucket, sk_bucket) -> (block_q, block_k) where buckets are
# "rounded up to the nearest entry". (1024, 1024) beat the (512, 2048)
# defaults at both measured SDXL self-attn shapes (2.15 vs 2.17 ms at
# seq 1024; 12.76 vs 13.15 at 4096). Unmeasured shapes fall through to
# the defaults above.
BLOCK_TABLE: dict[tuple[int, int], tuple[int, int]] = {
    (1024, 1024): (1024, 1024),
    (4096, 4096): (1024, 1024),
    # 16384-token 1024px sweep (hw_logs/flash_tune5.log): (1024, 1024)
    # 150.3ms fwd+bwd vs the (512, 2048) defaults' 154.7ms; bk>=2048
    # with bq=1024 fails VMEM at this seq
    (16384, 16384): (1024, 1024),
}


def _pick_blocks(sq: int, sk: int) -> tuple[int, int]:
    """Best measured (block_q, block_k) for this shape; defaults when
    the sweep has no data point. ``UWU_FLASH_BLOCKS=bq,bk`` overrides
    everything — the in-step A/B lever (isolated-op wins don't always
    survive remat/VMEM pressure inside the full train step)."""
    import os

    override = os.environ.get("UWU_FLASH_BLOCKS", "")
    if override:
        bq, bk = override.split(",")
        return int(bq), int(bk)
    for (tsq, tsk), blocks in sorted(BLOCK_TABLE.items()):
        if sq <= tsq and sk <= tsk:
            return blocks
    return DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K


def flash_shape_supported(q, k, v) -> bool:
    """Gate for the dispatch layer: last dim must be MXU-friendly and
    sequences long enough to be worth a kernel launch."""
    d = q.shape[-1]
    # blocks carry the full head dim (legal for any d — the last block
    # dim equals the array dim); Mosaic pads lanes internally, so odd
    # head dims (SD1.5's 40/80/160) work, just at lower MXU utilization
    if d % 8 != 0 or d > 256:
        return False
    if q.shape[1] < 128:
        # short queries (text-encoder self-attn at 77 tokens) aren't
        # worth a kernel launch
        return False
    if k.shape[1] < 128:
        # Short keys with a long query: UNet cross-attention, Sk=77 text
        # tokens vs image tokens. MEASURED verdict (round-3 stage-4/5,
        # probe-validated chained timer, hw_logs/xattn4_*.log +
        # bench5_sd15_1024):
        # - SPEED: XLA wins isolated at every shape — flash is 3-14x
        #   slower (the kernel pads Sk=77 to a full K block) because
        #   XLA's thin [*, 77] einsum runs near peak.
        # - MEMORY: at very long queries the XLA path materializes the
        #   [B, H, Sq, 77] logits; inside the full rematted train step
        #   the 16384-query SD1.5@1024px program stopped compiling
        #   (remote-compile crash) once routed to XLA, while the flash
        #   route compiles and trains (3.0 imgs/s measured round 3).
        # Verdict: XLA default below 8192 queries, flash at >= 8192
        # where the materialization dominates. UWU_FLASH_XATTN=1/0
        # still force either path for A/B re-measurement.
        import os

        mode = os.environ.get("UWU_FLASH_XATTN", "")
        if k.shape[1] < 32 or mode == "0":
            return False
        if mode != "1" and q.shape[1] < 8192:
            return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _compiler_params(parallel_dims: int):
    """First `parallel_dims` grid dims are parallel, the rest arbitrary
    (sequential, so VMEM scratch carries across them)."""
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel",) * parallel_dims + ("arbitrary",)
        )
    except TypeError:  # older API without dimension_semantics
        return None


# ---------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, has_bias: bool):
    """Softmax runs in the exp2 domain: s2 = s * LOG2E via the q-scale,
    p = exp2(s2 - m2) == exp(s - m). m/l scratch live in log2 units;
    only the final lse converts back to natural log. ``has_bias=False``
    (no mask, no key padding) skips the [BQ, BK] bias add entirely."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # [BQ, D]
    k_blk = k_ref[0].astype(jnp.float32)  # [BK, D]
    v_blk = v_ref[0].astype(jnp.float32)  # [BK, D]

    s = jax.lax.dot_general(
        q, k_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, BK], log2 units
    if has_bias:  # bias pre-scaled by LOG2E at the call site
        s = s + bias_ref[0].astype(jnp.float32)
    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ki == nk - 1)
    def _():
        l_safe = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = (acc_scr[:] / l_safe).astype(out_ref.dtype)
        # natural-log lse for the public contract: m is in log2 units
        lse_ref[0, 0] = (m_scr[:] * LN2 + jnp.log(l_safe))[:, 0]


def _bias_spec(bias3, block_q, block_k, k_axis_first: bool):
    """BlockSpec for the bias operand: [*, 1, Sk] key biases stream
    [1, BK] blocks; [*, Sq, Sk] full biases stream [BQ, BK] blocks.
    ``k_axis_first``: grid is (b, k_block, q_block) (the dK/dV kernel)."""
    rows = bias3.shape[1]
    if rows == 1:
        if k_axis_first:
            return pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b, 0, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j),
                            memory_space=pltpu.VMEM)
    if k_axis_first:
        return pl.BlockSpec((1, block_q, block_k), lambda b, j, i: (b, i, j),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, block_q, block_k), lambda b, i, j: (b, i, j),
                        memory_space=pltpu.VMEM)


def _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k, interpret,
                   has_bias=True):
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    grid = (bh, sq // block_q, sk // block_k)
    kwargs = {}
    cp = _compiler_params(2)
    if cp is not None and not interpret:
        kwargs["compiler_params"] = cp
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            _bias_spec(bias2, block_q, block_k, k_axis_first=False),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        **kwargs,
    )(q3, k3, v3, bias2)
    return out, lse


# ---------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_scr, *, scale: float,
                   has_bias: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    # scale*LOG2E folded into the [BQ, D] q tile: kills the full-tile
    # `* scale` logit pass AND runs the softmax recompute in exp2
    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # [BQ, D]
    do = do_ref[0].astype(jnp.float32)  # [BQ, D]
    lse2 = lse_ref[0, 0].astype(jnp.float32)[:, None] * LOG2E  # [BQ, 1]
    delta = delta_ref[0, 0].astype(jnp.float32)[:, None]  # [BQ, 1]
    k_blk = k_ref[0].astype(jnp.float32)  # [BK, D]
    v_blk = v_ref[0].astype(jnp.float32)  # [BK, D]

    s = jax.lax.dot_general(
        q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:  # bias pre-scaled by LOG2E at the call site
        s = s + bias_ref[0].astype(jnp.float32)
    p = jnp.exp2(s - lse2)  # [BQ, BK] — == exp(s_nat - lse)
    dp = jax.lax.dot_general(
        do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k_blk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dq_dbias_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, dbias_ref, dq_scr, *,
                         scale: float, has_bias: bool):
    """dQ kernel variant that also emits dBias per [BQ, BK] block. The
    kernel sees the LOG2E-pre-scaled bias b2 = b * LOG2E, so it emits
    dL/db2 = ds * LN2; the call site's pre-scale multiply contributes
    its own LOG2E factor under autodiff and the composed dBias is
    exactly ds. Used when a *learned* full bias needs gradients (e.g.
    T5 relative position bias trained through the kernel).

    The s and dp dots run at Precision.HIGHEST: dq/dk/dv contract ds
    against K/Q (hundreds of terms average out MXU bf16-pass noise) but
    dBias IS ds pointwise — single-pass products leave ~3% elementwise
    error on the real chip (measured, flash_check r3)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)
    do = do_ref[0].astype(jnp.float32)
    lse2 = lse_ref[0, 0].astype(jnp.float32)[:, None] * LOG2E
    delta = delta_ref[0, 0].astype(jnp.float32)[:, None]
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    p = jnp.exp2(s - lse2)
    dp = jax.lax.dot_general(
        do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ds = p * (dp - delta)
    dbias_ref[0] = (ds * LN2).astype(dbias_ref.dtype)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k_blk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                    scale: float, has_bias: bool):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k = k_ref[0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0].astype(jnp.float32)  # [BK, D]
    # q pre-scaled by scale*LOG2E (exp2 softmax; kills the [BQ, BK]
    # `* scale` pass). dk then accumulates ds @ q_scaled — the final
    # emit multiplies by LN2 since scale*LOG2E*LN2 == scale.
    q_blk = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # [BQ, D]
    do_blk = do_ref[0].astype(jnp.float32)  # [BQ, D]
    lse2 = lse_ref[0, 0].astype(jnp.float32)[:, None] * LOG2E  # [BQ, 1]
    delta_blk = delta_ref[0, 0].astype(jnp.float32)[:, None]

    s = jax.lax.dot_general(
        q_blk, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:  # bias pre-scaled by LOG2E at the call site
        s = s + bias_ref[0].astype(jnp.float32)
    p = jnp.exp2(s - lse2)  # [BQ, BK]
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do_blk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_blk, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_blk)  # [BQ, BK]
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q_blk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _():
        # dk_scr carries the q-side scale*LOG2E factor; * LN2 restores
        # the true scale multiplier exactly
        dk_ref[0] = (dk_scr[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q3, k3, v3, bias2, out, lse, g, scale, block_q, block_k,
                    interpret, with_dbias=False, g_lse=None, has_bias=True):
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]  # [BH, 1, Sq]
    if g_lse is not None:
        # lse cotangent: d lse/d s = softmax rows = p, so the lse term adds
        # p * g_lse to ds = p * (dp - delta) — i.e. delta' = delta - g_lse.
        # No kernel change needed; the row constant folds into delta.
        delta = delta - g_lse.astype(jnp.float32)
    kwargs = {}
    cp = _compiler_params(2)
    if cp is not None and not interpret:
        kwargs["compiler_params"] = cp

    dq_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        _bias_spec(bias2, block_q, block_k, k_axis_first=False),
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    dq_cost = pl.CostEstimate(
        flops=5 * bh * sq * sk * d,
        bytes_accessed=(q3.size * 3) * q3.dtype.itemsize,
        transcendentals=bh * sq * sk,
    )
    dbias = None
    if with_dbias:
        # each (i, j) grid cell is visited exactly once per b: the dQ pass
        # can emit the dBias block for free alongside the dq accumulation
        dq, dbias = pl.pallas_call(
            functools.partial(_bwd_dq_dbias_kernel, scale=scale,
                              has_bias=has_bias),
            grid=(bh, sq // block_q, sk // block_k),
            in_specs=dq_in_specs,
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, block_k), lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
                jax.ShapeDtypeStruct((bh, sq, sk), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
            interpret=interpret,
            cost_estimate=dq_cost,
            **kwargs,
        )(q3, k3, v3, bias2, g, lse, delta)
    else:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, scale=scale,
                              has_bias=has_bias),
            grid=(bh, sq // block_q, sk // block_k),
            in_specs=dq_in_specs,
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
            interpret=interpret,
            cost_estimate=dq_cost,
            **kwargs,
        )(q3, k3, v3, bias2, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale,
                          has_bias=has_bias),
        grid=(bh, sk // block_k, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            _bias_spec(bias2, block_q, block_k, k_axis_first=True),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * sq * sk * d,
            bytes_accessed=(q3.size * 3) * q3.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        **kwargs,
    )(q3, k3, v3, bias2, g, lse, delta)
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------
# custom VJP plumbing
# ---------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_core(q3, k3, v3, bias2, scale, block_q, block_k, interpret,
                with_dbias=False, has_bias=True):
    out, _ = _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k,
                            interpret, has_bias=has_bias)
    return out


def _flash_core_fwd(q3, k3, v3, bias2, scale, block_q, block_k, interpret,
                    with_dbias, has_bias):
    out, lse = _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k,
                              interpret, has_bias=has_bias)
    return out, (q3, k3, v3, bias2, out, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, with_dbias,
                    has_bias, res, g):
    q3, k3, v3, bias2, out, lse = res
    dq, dk, dv, dbias = _flash_backward(
        q3, k3, v3, bias2, out, lse, g, scale, block_q, block_k, interpret,
        with_dbias=with_dbias, has_bias=has_bias,
    )
    if dbias is None:
        # masks/constant biases: zero gradient by construction (fast path)
        dbias = jnp.zeros_like(bias2)
    return dq, dk, dv, dbias


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_core_lse(q3, k3, v3, bias2, scale, block_q, block_k, interpret,
                    has_bias=True):
    """Flash core returning (out, lse) — the ring-attention inner step.
    lse is [BH, 1, Sq] fp32; its cotangent is handled exactly (folded
    into delta in the backward)."""
    return _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k,
                          interpret, has_bias=has_bias)


def _flash_core_lse_fwd(q3, k3, v3, bias2, scale, block_q, block_k,
                        interpret, has_bias):
    out, lse = _flash_forward(q3, k3, v3, bias2, scale, block_q, block_k,
                              interpret, has_bias=has_bias)
    return (out, lse), (q3, k3, v3, bias2, out, lse)


def _flash_core_lse_bwd(scale, block_q, block_k, interpret, has_bias,
                        res, g):
    q3, k3, v3, bias2, out, lse = res
    g_out, g_lse = g
    dq, dk, dv, _ = _flash_backward(
        q3, k3, v3, bias2, out, lse, g_out, scale, block_q, block_k,
        interpret, g_lse=g_lse, has_bias=has_bias,
    )
    return dq, dk, dv, jnp.zeros_like(bias2)


_flash_core_lse.defvjp(_flash_core_lse_fwd, _flash_core_lse_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, Sq, H, D]
    k: jnp.ndarray,  # [B, Sk, H, D]
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,  # broadcastable to [B, H, Sq, Sk]
    scale: float | None = None,
    block_q: int | None = None,  # None -> tuned BLOCK_TABLE / defaults
    block_k: int | None = None,
    interpret: bool | None = None,
    bias_grad: bool = False,
    return_lse: bool = False,
) -> jnp.ndarray:
    """``bias_grad=False`` (default): the bias is treated as a constant —
    zero gradient, the cheap path for masks. ``bias_grad=True``: real
    dBias is computed in the dQ backward kernel (required for *learned*
    biases, e.g. relative-position biases); the bias is broadcast to the
    full [B, H, Sq, Sk] layout so gradients reduce back to the caller's
    shape through the broadcast's own VJP.

    ``return_lse=True`` additionally returns the row log-sum-exp
    ``[B, H, Sq]`` (fp32) — what ring attention needs to merge partial
    attentions; fully differentiable (the lse cotangent folds into the
    backward's delta term)."""
    if bias_grad and return_lse:
        raise NotImplementedError("bias_grad with return_lse is unsupported")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d**-0.5
    if interpret is None:
        from uwudiff_tpu.ops.attention import _on_tpu

        interpret = not _on_tpu()

    # bias: None | key bias broadcastable to [B, 1, 1, Sk] (fast path,
    # streamed as [1, BK] blocks) | full bias broadcastable to
    # [B, H, Sq, Sk] (streamed as [BQ, BK] blocks)
    if bias is not None:
        bias = bias.astype(jnp.float32)
        while bias.ndim < 4:
            bias = bias[None]
    with_dbias = bias_grad and bias is not None
    key_bias_only = bias is None or (
        not with_dbias and bias.shape[1] == 1 and bias.shape[2] == 1
    )

    auto_q, auto_k = _pick_blocks(sq, sk)
    block_q = min(block_q or auto_q, _round_up(sq, 128))
    block_k = min(block_k or auto_k, _round_up(sk, 128))

    # pad sequences to block multiples (-inf bias on padded keys is exact;
    # padded query rows are sliced off)
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qp = jnp.pad(q, [(0, 0), (0, sq_p - sq), (0, 0), (0, 0)])
    kp = jnp.pad(k, [(0, 0), (0, sk_p - sk), (0, 0), (0, 0)])
    vp = jnp.pad(v, [(0, 0), (0, sk_p - sk), (0, 0), (0, 0)])

    # the kernels run their softmax in the exp2 domain; the bias joins
    # the logits AFTER the q-side LOG2E fold, so it is pre-scaled ONCE
    # here (per call, not per tile). has_bias=False (no mask AND no key
    # padding) skips the [BQ, BK] bias add inside every kernel.
    has_bias = bias is not None or sk_p != sk
    if key_bias_only:
        if bias is None:
            bias2 = jnp.zeros((b, sk), jnp.float32)
        else:
            bias2 = jnp.broadcast_to(bias, (b, 1, 1, sk))[:, 0, 0, :]
        bias2 = jnp.maximum(bias2, NEG_INF)
        bias2 = jnp.pad(
            bias2, [(0, 0), (0, sk_p - sk)], constant_values=NEG_INF
        )
        bias_bh = jnp.repeat(bias2 * LOG2E, h, axis=0)[:, None, :]
    else:
        bias4 = jnp.maximum(
            jnp.broadcast_to(bias, (b, h, sq, sk)), NEG_INF
        )
        bias4 = jnp.pad(
            bias4,
            [(0, 0), (0, 0), (0, sq_p - sq), (0, sk_p - sk)],
            constant_values=NEG_INF,
        )
        bias_bh = bias4.reshape(b * h, sq_p, sk_p) * LOG2E

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    q3, k3, v3 = fold(qp), fold(kp), fold(vp)

    if return_lse:
        out3, lse3 = _flash_core_lse(
            q3, k3, v3, bias_bh, scale, block_q, block_k, interpret,
            has_bias
        )
        out = out3.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)
        lse = lse3.reshape(b, h, sq_p)[:, :, :sq]
        return out[:, :sq], lse
    out3 = _flash_core(
        q3, k3, v3, bias_bh, scale, block_q, block_k, interpret,
        with_dbias, has_bias
    )
    out = out3.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :sq]
