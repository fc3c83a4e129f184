"""Fused GroupNorm+SiLU Pallas kernel for the ResNet hot path.

TPU-native replacement for the cuDNN GroupNorm/SiLU pair inside the
reference's diffusers UNet ResNet blocks (SURVEY.md §2.2 row 3;
``ResnetBlock2D`` here). The fusion wins HBM bandwidth: XLA executes
GN+SiLU as reduce(x) + normalize(x) = 2 reads + 1 write of the
activation; this kernel keeps the [HW, C] tile resident in VMEM and
does 1 read + 1 write.

Kernel scheme (grid over batch):
- per-channel sum / sum-of-squares over the spatial axis (sublane
  reduction — C stays on lanes)
- channel->group reduction and group->channel broadcast as matmuls with
  a one-hot [C, G] indicator (avoids lane-dim reshapes Mosaic dislikes)
- y = silu((x - mean_c) * rsqrt(var_c + eps) * gamma + beta)

Backward is exact XLA autodiff of the reference formulation (the
forward saves only (x, gamma, beta) — GN recompute is cheap), wired via
``jax.custom_vjp``.

Dispatch: ``group_norm_silu`` uses the kernel on TPU when the [HW, C]
tile fits VMEM (covers every SDXL/SD1.5 resolution at 64x64 latents)
and falls back to the pure-XLA path otherwise or on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_silu", "group_norm_silu_reference", "fused_supported"]

# Scoped-VMEM budget for the single-pass kernel, calibrated against
# Mosaic's OWN reported stack allocations. Three hardware measurements
# pin the model: [16,1024,1920] -> 16.04M at chunk=512
# (hw_logs/adapter13_bench.log), [32,1024,1920] -> 16.05M at chunk=256
# (hw_logs/sampler21_scaling_sd15.log — chunk-INDEPENDENT), and
# [16,4096,640] -> 20.0M (hw_logs/adapter14_cn_fusedgn.log). All three
# equal 2*(in_tile + out_tile) + lane-padded onehot + ~0.1M: Mosaic
# DOUBLE-BUFFERS the grid-mapped in/out blocks for pipelining, and the
# fori_loop chunk temporaries are stack-reused (they never show up).
# The gate therefore charges 2x io + onehot + slack against the 16MiB
# scoped limit; _VMEM_TILE_BYTES leaves 0.5MiB of margin for the
# gamma/beta blocks and small temps.
_VMEM_TILE_BYTES = int(15.5 * 1024 * 1024)
# Cap on the in-kernel fp32 row-chunk temporaries (2 x chunk x C x 4B);
# the chunk size halves until under this.
_CHUNK_TEMP_BYTES = 4 * 1024 * 1024


def group_norm_silu_reference(x, gamma, beta, groups: int, eps: float):
    """Pure-XLA GN+SiLU (the fallback and the autodiff source of truth).
    x: [N, H, W, C] (or [N, S, C]); gamma/beta: [C]."""
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    xr = x.reshape(n, -1, groups, c // groups).astype(jnp.float32)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    xn = (xr - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(n, -1, c) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32
    )
    return jax.nn.silu(xn).reshape(orig_shape).astype(x.dtype)


_STAT_CHUNK = 512  # max rows per stats-accumulation step


def _chunk_for(hw: int, c: int = 1) -> int | None:
    """Row-chunk size: starts at min(512, hw) and halves while the fp32
    chunk temporaries (2 x chunk x C x 4B) exceed their budget — wide-
    channel tiles (concat GNs, C=1920/2560) need smaller chunks to stay
    inside scoped VMEM. Halving preserves divisibility, so any returned
    chunk divides hw; None -> XLA fallback (hw not a multiple of 512)."""
    chunk = min(_STAT_CHUNK, hw)
    if hw % chunk:
        return None
    while chunk > 8 and chunk % 2 == 0 and 2 * chunk * c * 4 > _CHUNK_TEMP_BYTES:
        chunk //= 2
    return chunk


def _tile_fits_vmem(x) -> bool:
    """True when the single-pass kernel's scoped-VMEM footprint —
    DOUBLE-BUFFERED in+out tiles plus the lane-padded onehot (the
    measured model, see the budget comment above) — fits the budget;
    bigger tiles take the chunked-stats kernel."""
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    if _chunk_for(hw, c) is None:
        return False
    pipelined_io = 2 * 2 * hw * c * x.dtype.itemsize  # 2 buffers each
    onehot = c * 128 * 4  # [C, G] indicator, G lane-padded to 128
    return pipelined_io + onehot <= _VMEM_TILE_BYTES


def fused_supported(x, groups: int) -> bool:
    c = x.shape[-1]
    if c % groups or c % 8:  # keep channel lanes tileable
        return False
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    if _chunk_for(hw, c) is None:
        return False
    # tiles that fit VMEM take the single-pass kernel; larger tiles
    # (128x128-latent level-0 is ~21MB) take the chunked stats kernel +
    # fused XLA apply — both avoid XLA GN's full-size fp32 temps
    return hw >= 8


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, onehot_ref, out_ref, *,
                    eps: float, group_size: int, hw: int, chunk: int):
    onehot = onehot_ref[...].astype(jnp.float32)  # [C, G]
    c = onehot.shape[0]
    denom = hw * group_size
    n_chunks = hw // chunk

    def stats_step(i, carry):
        s1, s2 = carry
        rows = x_ref[0, pl.ds(i * chunk, chunk)].astype(jnp.float32)
        return s1 + jnp.sum(rows, axis=0), s2 + jnp.sum(rows * rows, axis=0)

    s1, s2 = jax.lax.fori_loop(
        0, n_chunks, stats_step,
        (jnp.zeros((c,), jnp.float32), jnp.zeros((c,), jnp.float32)),
    )
    g1 = jax.lax.dot_general(  # [G] group sums
        s1[None, :], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    g2 = jax.lax.dot_general(
        s2[None, :], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    mean_g = g1 / denom
    var_g = g2 / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: [1, G] @ [G, C] via dot
    # with the transposed indicator (contract the G axis of onehot)
    mean_c = jax.lax.dot_general(
        mean_g[None, :], onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    inv_c = jax.lax.dot_general(
        inv_g[None, :], onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]

    gamma = gamma_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)
    scale = (inv_c * gamma)[None, :]
    shift = (beta - mean_c * inv_c * gamma)[None, :]

    def apply_step(i, _):
        rows = x_ref[0, pl.ds(i * chunk, chunk)].astype(jnp.float32)
        y = rows * scale + shift
        y = y * jax.nn.sigmoid(y)
        out_ref[0, pl.ds(i * chunk, chunk)] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_step, 0)


def _gn_stats_kernel(x_ref, out_ref, s1_scr, s2_scr):
    """Per-channel sum / sum-of-squares accumulated across row chunks
    (grid = (batch, chunks), chunk axis sequential). Emits [1, 2, C]."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        s1_scr[:] = jnp.zeros_like(s1_scr)
        s2_scr[:] = jnp.zeros_like(s2_scr)

    rows = x_ref[0].astype(jnp.float32)  # [chunk, C]
    s1_scr[:] = s1_scr[:] + jnp.sum(rows, axis=0, keepdims=True)
    s2_scr[:] = s2_scr[:] + jnp.sum(rows * rows, axis=0, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, 0] = s1_scr[0]
        out_ref[0, 1] = s2_scr[0]


def _gn_silu_fwd_chunked(x3, gamma, beta, groups: int, eps: float,
                         interpret: bool):
    """Big-tile path (tile > VMEM): Pallas chunked stats + fused XLA
    apply. Two HBM reads of x (same as XLA GN) but no full-size fp32
    temps — the memory property that matters under remat at 1024px."""
    n, hw, c = x3.shape
    chunk = _chunk_for(hw, c)
    kwargs = {}
    try:
        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
        if not interpret:
            kwargs["compiler_params"] = cp
    except TypeError:
        pass
    sums = pl.pallas_call(
        _gn_stats_kernel,
        grid=(n, hw // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * n * hw * c,
            bytes_accessed=n * hw * c * x3.dtype.itemsize,
            transcendentals=0,
        ),
        **kwargs,
    )(x3)
    denom = hw * (c // groups)
    g1 = sums[:, 0].reshape(n, groups, -1).sum(-1)  # [N, G]
    g2 = sums[:, 1].reshape(n, groups, -1).sum(-1)
    mean_g = g1 / denom
    inv_g = jax.lax.rsqrt(g2 / denom - mean_g * mean_g + eps)
    mean_c = jnp.repeat(mean_g, c // groups, axis=-1)  # [N, C]
    inv_c = jnp.repeat(inv_g, c // groups, axis=-1)
    gamma32 = gamma.astype(jnp.float32)
    scale = inv_c * gamma32[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean_c * scale
    y = x3.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x3.dtype)


def _gn_silu_fwd_pallas(x, gamma, beta, groups: int, eps: float,
                        interpret: bool):
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(n, -1, c)
    if not _tile_fits_vmem(x):
        return _gn_silu_fwd_chunked(
            x3, gamma, beta, groups, eps, interpret
        ).reshape(orig_shape)
    hw = x3.shape[1]
    chunk = _chunk_for(hw, c)
    group_size = c // groups
    onehot = (
        (jnp.arange(c)[:, None] // group_size) == jnp.arange(groups)[None, :]
    ).astype(jnp.float32)

    kwargs = {}
    try:
        cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
        if not interpret:
            kwargs["compiler_params"] = cp
    except TypeError:
        pass
    out = pl.pallas_call(
        functools.partial(
            _gn_silu_kernel, eps=eps, group_size=group_size, hw=hw,
            chunk=chunk,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * hw * c,
            bytes_accessed=2 * n * hw * c * x.dtype.itemsize,
            transcendentals=n * hw * c,
        ),
        **kwargs,
    )(x3, gamma, beta, onehot)
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------
# Pallas backward (round 5): the GN backward's transpose/convert chains
# were the top-bytes instructions of the SDXL step's ~250ms glue
# (README round-4 accounting). XLA's autodiff materializes full-size
# fp32 temps (dz, xhat, their products) and reduces them with layout
# changes; this backward streams [chunk, C] tiles instead:
#   pass A (x)    : per-channel sums -> mean/inv  (reuses the fwd
#                   chunked stats kernel)
#   pass B (x, g) : dz = g * silu'(z); per-channel t1 = sum dz,
#                   t2 = sum dz * xhat  (-> dbeta, dgamma, and the two
#                   per-group means the GN backward needs)
#   tiny XLA glue : group-reduce gamma*t1, gamma*t2 -> a_c, b_c  [N, C]
#   pass C (x, g) : dx = inv * (dz*gamma - a_c - xhat*b_c)
# HBM traffic: 3 reads of x + 2 of g + 1 write of dx, all bf16, with
# no full-size fp32 intermediates and no transposes.
# ---------------------------------------------------------------------


def _silu_dz(x_rows, g_rows, scale, shift):
    """dz for a [chunk, C] tile: z = x*scale + shift (the fwd affine),
    dz = g * sigmoid(z) * (1 + z*(1 - sigmoid(z)))."""
    z = x_rows * scale + shift
    sig = jax.nn.sigmoid(z)
    return g_rows * sig * (1.0 + z * (1.0 - sig))


def _gn_bwd_partials_kernel(x_ref, g_ref, scale_ref, shift_ref,
                            mean_ref, inv_ref, out_ref, t1_scr, t2_scr):
    """grid = (batch, chunks); accumulates t1 = sum_hw dz and
    t2 = sum_hw dz * xhat into VMEM scratch, emits [1, 2, C] per n."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        t1_scr[:] = jnp.zeros_like(t1_scr)
        t2_scr[:] = jnp.zeros_like(t2_scr)

    x_rows = x_ref[0].astype(jnp.float32)
    g_rows = g_ref[0].astype(jnp.float32)
    dz = _silu_dz(x_rows, g_rows, scale_ref[0].astype(jnp.float32),
                  shift_ref[0].astype(jnp.float32))
    xhat = (x_rows - mean_ref[0].astype(jnp.float32)) * inv_ref[0].astype(
        jnp.float32
    )
    t1_scr[:] = t1_scr[:] + jnp.sum(dz, axis=0, keepdims=True)
    t2_scr[:] = t2_scr[:] + jnp.sum(dz * xhat, axis=0, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, 0] = t1_scr[0]
        out_ref[0, 1] = t2_scr[0]


def _gn_bwd_dx_kernel(x_ref, g_ref, scale_ref, shift_ref, mean_ref,
                      inv_ref, gamma_ref, a_ref, b_ref, out_ref):
    """grid = (batch, chunks); dx = inv*(dz*gamma - a - xhat*b)."""
    x_rows = x_ref[0].astype(jnp.float32)
    g_rows = g_ref[0].astype(jnp.float32)
    dz = _silu_dz(x_rows, g_rows, scale_ref[0].astype(jnp.float32),
                  shift_ref[0].astype(jnp.float32))
    inv = inv_ref[0].astype(jnp.float32)
    xhat = (x_rows - mean_ref[0].astype(jnp.float32)) * inv
    dx = inv * (
        dz * gamma_ref[0].astype(jnp.float32)
        - a_ref[0].astype(jnp.float32)
        - xhat * b_ref[0].astype(jnp.float32)
    )
    out_ref[0] = dx.astype(out_ref.dtype)


def _row_specs(chunk, c):
    return pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(c):
    # per-n vectors ride as [n, 1, C] so the block's last two dims
    # (1, C) EQUAL the array's trailing dims — Mosaic requires the last
    # two block dims be (8,128)-divisible or dim-equal, and a (1, C)
    # block on an [n, C] array violates that for n > 1 (measured crash:
    # hw_logs/conv_bf16sr_s0.log)
    return pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _gn_silu_bwd_pallas(x, gamma, beta, g, groups: int, eps: float,
                        interpret: bool):
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(n, -1, c)
    g3 = g.reshape(n, -1, c)
    hw = x3.shape[1]
    chunk = _chunk_for(hw, c)
    gs = c // groups
    denom = float(hw * gs)

    kwargs = {}
    try:
        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
        if not interpret:
            kwargs["compiler_params"] = cp
    except TypeError:
        pass

    # pass A: per-channel stats (the fwd chunked-stats kernel)
    sums = pl.pallas_call(
        _gn_stats_kernel,
        grid=(n, hw // chunk),
        in_specs=[_row_specs(chunk, c)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(x3)
    mean_g = sums[:, 0].reshape(n, groups, -1).sum(-1) / denom  # [N, G]
    var_g = sums[:, 1].reshape(n, groups, -1).sum(-1) / denom - mean_g**2
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)  # [N, C]
    inv_c = jnp.repeat(inv_g, gs, axis=-1)
    gamma32 = gamma.astype(jnp.float32)
    scale = inv_c * gamma32[None, :]  # the fwd affine: z = x*scale+shift
    shift = beta.astype(jnp.float32)[None, :] - mean_c * scale

    # per-n vectors as [n, 1, C] (see _vec_spec)
    v3 = lambda a: a[:, None, :]

    # pass B: per-(n, channel) grad partials
    t = pl.pallas_call(
        _gn_bwd_partials_kernel,
        grid=(n, hw // chunk),
        in_specs=[
            _row_specs(chunk, c), _row_specs(chunk, c),
            _vec_spec(c), _vec_spec(c), _vec_spec(c), _vec_spec(c),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(x3, g3, v3(scale), v3(shift), v3(mean_c), v3(inv_c))
    t1, t2 = t[:, 0], t[:, 1]  # [N, C] each

    dbeta = t1.sum(0).astype(beta.dtype)
    dgamma = t2.sum(0).astype(gamma.dtype)

    # the two per-group means of the GN backward:
    #   a_g = mean(dxhat)        = sum_{c in g} gamma_c * t1_c / m
    #   b_g = mean(dxhat * xhat) = sum_{c in g} gamma_c * t2_c / m
    a_g = (gamma32[None, :] * t1).reshape(n, groups, -1).sum(-1) / denom
    b_g = (gamma32[None, :] * t2).reshape(n, groups, -1).sum(-1) / denom
    a_c = jnp.repeat(a_g, gs, axis=-1)
    b_c = jnp.repeat(b_g, gs, axis=-1)

    # pass C: dx
    dx = pl.pallas_call(
        _gn_bwd_dx_kernel,
        grid=(n, hw // chunk),
        in_specs=[
            _row_specs(chunk, c), _row_specs(chunk, c),
            _vec_spec(c), _vec_spec(c), _vec_spec(c), _vec_spec(c),
            _vec_spec(c), _vec_spec(c), _vec_spec(c),
        ],
        out_specs=_row_specs(chunk, c),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
        **kwargs,
    )(x3, g3, v3(scale), v3(shift), v3(mean_c), v3(inv_c),
      jnp.broadcast_to(gamma32, (n, 1, c)), v3(a_c), v3(b_c))
    return dx.reshape(orig_shape), dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_silu(x, gamma, beta, groups, eps, interpret):
    return _gn_silu_fwd_pallas(x, gamma, beta, groups, eps, interpret)


def _gn_silu_vjp_fwd(x, gamma, beta, groups, eps, interpret):
    out = _gn_silu_fwd_pallas(x, gamma, beta, groups, eps, interpret)
    return out, (x, gamma, beta)


def _gn_silu_vjp_bwd(groups, eps, interpret, res, g):
    import os

    x, gamma, beta = res
    # Pallas backward (A/B gate UWU_FUSED_GN_BWD; default ON wherever
    # the fused fwd dispatched — same shape support by construction)
    if os.environ.get("UWU_FUSED_GN_BWD", "1") != "0":
        return _gn_silu_bwd_pallas(x, gamma, beta, g, groups, eps,
                                   interpret)
    _, vjp = jax.vjp(
        lambda x, gamma, beta: group_norm_silu_reference(
            x, gamma, beta, groups, eps
        ),
        x, gamma, beta,
    )
    return vjp(g)


_gn_silu.defvjp(_gn_silu_vjp_fwd, _gn_silu_vjp_bwd)


def group_norm_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused GroupNorm+SiLU with XLA fallback (see module docstring).

    Default: the Pallas kernel (on TPU, supported shapes). Measured on a
    v5e (SDXL full fine-tune, 64x64 latents): step TIME is a wash at
    bs=4 (fused 348.2 ms vs XLA 345.6 ms — XLA fuses the arithmetic
    fine) but the kernel's chunked in-VMEM stats cut ~320MB of XLA GN
    HLO temps, which is exactly the margin that lets bs=6 fit 16GB HBM
    (13.3 imgs/sec/chip) while the XLA path OOMs there by 316MB.

    CAVEAT (measured): the win holds UNDER REMAT. In no-remat training
    the custom_vjp pins its (x, gamma, beta) residuals where XLA's own
    autodiff would have rematerialized/fused them — SD1.5 bs=16
    no-remat OOMs by 2.5GB fused vs 34 imgs/sec XLA. Set
    ``UWU_FUSED_GN=0`` for no-remat runs (bench.py does this per
    model).
    """
    import os

    from uwudiff_tpu.ops import attention as _attn
    from uwudiff_tpu.ops.attention import _on_tpu

    if os.environ.get("UWU_FUSED_GN", "1") == "0":
        return group_norm_silu_reference(x, gamma, beta, groups, eps)
    if _attn._flash_override is False:
        # host-CPU tracing/init window (``flash_disabled``): no Pallas
        return group_norm_silu_reference(x, gamma, beta, groups, eps)
    if interpret is None:
        on_tpu = _on_tpu()
        if not on_tpu:
            return group_norm_silu_reference(x, gamma, beta, groups, eps)
        interpret = False
    if not fused_supported(x, groups):
        return group_norm_silu_reference(x, gamma, beta, groups, eps)
    return _gn_silu(x, gamma, beta, groups, eps, interpret)
