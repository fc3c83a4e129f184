"""Pipeline parallelism (GPipe) over a layer-stacked transformer body.

The reference has no pipeline parallelism (SURVEY.md §2.3 lists PP as
absent, with this framework's ``pipe`` mesh axis as the documented
extension slot). This is the TPU-idiomatic construction: no process
groups, no send/recv runtime — one ``shard_map`` over a ``pipe`` mesh
axis in which every device holds a contiguous slice of the layer stack
(the leading axis of ``nn.scan``-stacked block params) and activations
hop stage-to-stage over ICI with ``jax.lax.ppermute`` inside a
``lax.scan`` over pipeline ticks.

Schedule: plain GPipe. The global batch is split into ``M`` microbatches;
tick ``t`` has stage ``s`` processing microbatch ``t - s`` (bubble
fraction ``(P-1)/(M+P-1)``). All stages run the same program every tick
— invalid (bubble) ticks compute on don't-care data and are masked out
of the result, which is exactly how SPMD pipelining is expressed for a
single compiled XLA program (the "How to Scale Your Model" pipelining
recipe; re-derived here, no code taken).

Composition: the ``pipe`` axis composes with ``data`` (and ``fsdp``
acting as batch) — batch-sharded activations flow through the pipeline
per data-shard while params are stage-sharded, giving DP x PP from one
``shard_map``. Backward is ordinary autodiff through ``ppermute``/
``scan`` (reverse hops ride the same ICI links).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_blocks", "pipelined_dit_apply", "pipelined_mmdit_apply"]

PIPE_AXIS = "pipe"


def _batch_axes(mesh: Mesh) -> tuple[str, ...]:
    return tuple(
        a for a in ("data", "fsdp")
        if a in mesh.axis_names and mesh.shape[a] > 1
    )


def pipeline_blocks(
    block_apply: Callable[[Any, Any, Sequence[jnp.ndarray]], Any],
    stacked_params: Any,
    x: Any,
    extras: Sequence[jnp.ndarray],
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    n_microbatches: int | None = None,
) -> Any:
    """Run ``L`` stacked layers over ``P`` pipeline stages.

    Args:
        block_apply: ``(params_of_one_layer, carry, extras) -> carry``
            pure single-block application. Called under ``lax.scan``
            twice (local layer slice x pipeline ticks) — must be
            trace-safe.
        stacked_params: pytree whose every leaf has a leading layer axis
            of size ``L`` with ``L % P == 0``.
        x: the activation carry entering the stack — a ``[B, ...]``
            array or any pytree of them sharing the leading batch dim
            (e.g. MMDiT's dual-stream ``(x_img, ctx)``). ``B`` must
            split into ``n_microbatches`` after the data-axis sharding.
        extras: per-sample broadcast inputs (e.g. adaLN conditioning),
            each ``[B, ...]`` — microbatched alongside ``x``. Static
            (batch-independent) context belongs in ``block_apply``'s
            closure instead.
        mesh: mesh containing ``axis`` (and optionally data/fsdp axes).
        n_microbatches: microbatch count ``M`` (default: the stage
            count when it divides the local batch, else the largest
            divisor that does; raise it to shrink the (P-1)/(M+P-1)
            bubble).

    Returns:
        the carry after all ``L`` layers (same pytree structure as
        ``x``), replicated over ``axis`` (one ``psum`` broadcast from
        the last stage).
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
    tmap = jax.tree_util.tree_map
    n_stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if not leaves:
        return x
    n_layers = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.ndim < 1 or leaf.shape[0] != n_layers:
            raise ValueError(
                "pipeline_blocks needs layer-stacked params (every leaf "
                f"with leading axis {n_layers}); got shape {leaf.shape}"
            )
    carry_leaves = jax.tree_util.tree_leaves(x)
    if not carry_leaves:
        raise ValueError("pipeline_blocks carry has no array leaves")
    b = carry_leaves[0].shape[0]
    for leaf in carry_leaves:
        if leaf.shape[0] != b:
            raise ValueError(
                "carry leaves must share the leading batch dim; got "
                f"{leaf.shape[0]} vs {b}"
            )
    if n_stages == 1:
        # degenerate mesh: sequential scan, no communication
        def body(carry, p):
            return block_apply(p, carry, extras), None

        out, _ = jax.lax.scan(body, x, stacked_params)
        return out
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers not divisible by {n_stages} pipeline stages"
        )
    batch_axes = _batch_axes(mesh)
    import numpy as np

    dp = int(np.prod([mesh.shape[a] for a in batch_axes])) if batch_axes else 1
    if b % dp:
        raise ValueError(f"batch {b} not divisible by {dp} data shards")
    local_b = b // dp
    if n_microbatches is not None:
        m = n_microbatches
        if local_b % m:
            raise ValueError(
                f"local batch {local_b} not divisible by {m} microbatches"
            )
    else:
        # default: one microbatch per stage when that divides the local
        # batch, else the largest divisor of local_b that fits in n_stages
        # (always exists: 1 divides everything)
        m = max(
            d for d in range(1, min(n_stages, local_b) + 1) if local_b % d == 0
        )

    bspec = P(batch_axes if batch_axes else None)
    pspec = tmap(lambda _: P(axis), stacked_params)
    cspec = tmap(lambda _: bspec, x)
    espec = tuple(bspec for _ in extras)

    def run(params_local, x_local, *extras_local):
        # params_local leaves: [L/P, ...]; x_local leaves: [b_local, ...]
        stage = jax.lax.axis_index(axis)
        mb = local_b // m
        mbs = tmap(
            lambda a: a.reshape((m, mb) + a.shape[1:]), x_local
        )
        ex_mbs = tuple(
            e.reshape((m, mb) + e.shape[1:]) for e in extras_local
        )

        def stage_fn(xi, exi):
            def body(carry, p):
                return block_apply(p, carry, exi), None

            out, _ = jax.lax.scan(body, xi, params_local)
            return out

        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def take(tree, i):
            return tmap(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, 0, keepdims=False
                ),
                tree,
            )

        def tick(carry, t):
            state, outputs = carry
            # stage 0 injects microbatch t (clamped to a real index on
            # bubble ticks; the result is masked out below)
            inj = jnp.clip(t, 0, m - 1)
            x0 = take(mbs, inj)
            x_in = tmap(
                lambda a0, s: jnp.where(stage == 0, a0, s), x0, state
            )
            # stage s holds microbatch (t - s) at tick t
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            exi = tuple(
                jax.lax.dynamic_index_in_dim(e, mb_idx, 0, keepdims=False)
                for e in ex_mbs
            )
            y = stage_fn(x_in, exi)
            # last stage emits microbatch t-(P-1) once it's a real one
            out_idx = t - (n_stages - 1)
            valid = (out_idx >= 0) & (stage == n_stages - 1)
            oi = jnp.clip(out_idx, 0, m - 1)
            prev = take(outputs, oi)
            outputs = tmap(
                lambda o, yy, pp: jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(valid, yy, pp), oi, 0
                ),
                outputs, y, prev,
            )
            state_next = tmap(
                lambda a: jax.lax.ppermute(a, axis, fwd_perm), y
            )
            return (state_next, outputs), None

        n_ticks = m + n_stages - 1
        init = (
            tmap(lambda a: jnp.zeros_like(a[0]), mbs),
            tmap(jnp.zeros_like, mbs),
        )
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
        # results live on the last stage only; psum broadcasts them to
        # every pipe rank (masked: other stages contribute zeros)
        outputs = tmap(
            lambda o: jax.lax.psum(
                jnp.where(stage == n_stages - 1, o, 0.0), axis
            ),
            outputs,
        )
        return tmap(
            lambda o, xl: o.reshape(xl.shape), outputs, x_local
        )

    fn = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(pspec, cspec) + espec,
        out_specs=cspec,
        check_vma=False,
    )
    return fn(stacked_params, x, *extras)


def pipelined_dit_apply(
    dit,
    params: Any,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    class_labels: jnp.ndarray | None,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    n_microbatches: int | None = None,
    train: bool = False,
    rngs: dict | None = None,
) -> jnp.ndarray:
    """DiT forward with the transformer body pipelined over ``axis``.

    Equivalent to ``dit.apply({"params": params}, ...)`` for a
    ``scan_blocks=True`` DiT: the cheap embed/head ends run replicated
    on every stage (identical compute, no communication), the depth-wise
    block stack runs as a GPipe pipeline over its stacked ``blocks``
    params.
    """
    if not getattr(dit, "scan_blocks", False):
        raise ValueError(
            "pipeline parallelism needs DiT(scan_blocks=True) "
            "(layer-stacked block params)"
        )
    x, c = dit.apply(
        {"params": params},
        sample,
        timesteps,
        class_labels,
        train=train,
        rngs=rngs,
        method=dit.embed,
    )
    position_map = dit.block_position_map(sample.shape)
    block_apply = partial(dit.apply_block, position_map=position_map)
    if dit.gradient_checkpointing:
        block_apply = jax.checkpoint(block_apply, prevent_cse=False)
    x = pipeline_blocks(
        block_apply,
        params["blocks"],
        x,
        (c,),
        mesh,
        axis=axis,
        n_microbatches=n_microbatches,
    )
    return dit.apply(
        {"params": params},
        x,
        c,
        sample.shape,
        method=dit.head,
    )


def pipelined_mmdit_apply(
    mmdit,
    params: Any,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    encoder_attention_mask: jnp.ndarray | None,
    added_cond: dict | None,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    n_microbatches: int | None = None,
) -> jnp.ndarray:
    """MMDiT forward with the joint-attention body pipelined over
    ``axis``.

    Equivalent to ``mmdit.apply({"params": params}, ...)`` for a
    ``scan_blocks=True`` MMDiT: the dual-stream carry ``(x, ctx)`` hops
    stages as one pytree (``pipeline_blocks`` microbatches/permutes
    every leaf), the cheap embed/head ends run replicated on every
    stage. MoE variants are rejected upstream by DMTrainer (the
    pipelined block apply cannot collect sown aux losses).
    """
    if not getattr(mmdit, "scan_blocks", False):
        raise ValueError(
            "pipeline parallelism needs MMDiT(scan_blocks=True) "
            "(layer-stacked block params)"
        )
    if getattr(mmdit, "context_pre_only", False):
        raise ValueError(
            "pipeline parallelism needs homogeneous stages: "
            "MMDiT(context_pre_only=True) ends in a heterogeneous final "
            "block (use context_pre_only=False for pipelined training)"
        )
    pooled = added_cond.get("text_embeds") if added_cond else None
    x, ctx, c = mmdit.apply(
        {"params": params},
        sample,
        timesteps,
        encoder_hidden_states,
        pooled,
        method=mmdit.embed,
    )
    p = mmdit.patch_size
    n_img = (sample.shape[1] // p) * (sample.shape[2] // p)
    bias = mmdit.apply(
        {"params": params},
        encoder_attention_mask,
        n_img,
        method=mmdit.joint_bias,
    )
    extras = (c,) if bias is None else (c, bias)
    block_apply = partial(mmdit.apply_block, has_bias=bias is not None)
    if mmdit.gradient_checkpointing:
        block_apply = jax.checkpoint(block_apply, prevent_cse=False)
    x, _ = pipeline_blocks(
        block_apply,
        params["blocks"],
        (x, ctx),
        extras,
        mesh,
        axis=axis,
        n_microbatches=n_microbatches,
    )
    return mmdit.apply(
        {"params": params},
        x,
        c,
        sample.shape,
        method=mmdit.head,
    )
