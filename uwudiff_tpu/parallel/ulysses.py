"""Ulysses attention: sequence parallelism via head-axis all-to-all.

The second strategy for the ``seq`` mesh axis beside
``parallel/ring_attention.py`` (SURVEY.md §2.3 lists Ulysses as the
reference's absent "attention-head all-to-all" row; DeepSpeed-Ulysses,
Jacobs et al. 2023 — re-derived here on XLA collectives).

Where ring attention keeps Q local and rotates K/V blocks around the
``seq`` ring ((n-1) ``ppermute`` hops of the full local K+V per layer),
Ulysses transposes the problem: one ``all_to_all`` converts the
[B, S/n, H, D] sequence-sharded activations into [B, S, H/n, D]
head-sharded ones, each device runs ORDINARY full-sequence attention
over its head group (the Pallas flash kernel — no lse merging, no
per-block rescaling), and a second ``all_to_all`` converts back.

Trade-offs (why both exist):
- Ulysses moves q+k+v+out once each (4 tensors x 1 hop) vs ring's
  2 tensors x (n-1) hops — fewer, larger transfers; better when n is
  large relative to heads-per-device... until H/n < 1, its hard limit:
  it needs ``H % n == 0``. Ring has no head constraint.
- Ulysses' inner attention sees the FULL sequence: O(S) VMEM blocks in
  the flash kernel (fine), but per-device attention FLOPs identical to
  ring's total — only the communication pattern differs.

Composition: the inner attention is the framework's own dispatch, so
TPU runs the flash kernel per head group exactly like the
``head_parallel`` tensor-parallel island.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ulysses_attention"]


def ulysses_attention(
    q: jnp.ndarray,  # [B, Sq_local, H, D]  (inside shard_map over `seq`)
    k: jnp.ndarray,  # [B, Sk_local, H, D]
    v: jnp.ndarray,
    axis_name: str,
    key_bias: jnp.ndarray | None = None,  # [B, Sk_local]
    scale: float | None = None,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Sequence-parallel attention inside ``shard_map``: head-group
    all-to-all -> full-sequence attention -> all-to-all back. Requires
    ``H % axis_size == 0`` (checked at trace time). Returns the local
    [B, Sq_local, H, D] output."""
    n = jax.lax.psum(1, axis_name)
    h = q.shape[2]
    if h % n != 0:
        raise ValueError(
            f"ulysses_attention needs heads ({h}) divisible by the "
            f"'{axis_name}' axis size ({n}); use ring attention otherwise"
        )

    def seq_to_heads(x):  # [B, S/n, H, D] -> [B, S, H/n, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    qg, kg, vg = seq_to_heads(q), seq_to_heads(k), seq_to_heads(v)
    bias = None
    if key_bias is not None:
        kb = jax.lax.all_gather(
            key_bias, axis_name, axis=1, tiled=True
        )  # [B, Sk]
        bias = kb[:, None, None, :]

    from uwudiff_tpu.ops.attention import _local_attention

    out = _local_attention(qg, kg, vg, bias, scale=scale, use_flash=use_flash)
    # [B, Sq, H/n, D] -> [B, Sq/n, H, D]
    return jax.lax.all_to_all(
        out, axis_name, split_axis=1, concat_axis=2, tiled=True
    )
