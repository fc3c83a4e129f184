"""Ragged multi-caption embedding aggregation, jit-friendly.

Capability parity with ``duwu/utils/aggregation.py``: packing a ragged
stack of per-caption embeddings ``[sum(n_i), L, D]`` into a padded
``[B, max_n * L, D]`` batch ("concat" mode) or taking the first element
per group ("first" mode), plus the inverse split.

TPU-first design: instead of the reference's in-place indexed writes
(``aggregation.py:64-107``), these are pure static-shape scatter/gather
ops — `n_elements` may be a traced array, while the output shape is
determined by the static ``pad_to_n_elements`` (defaults to a Python int
``max(n_elements)`` when called with concrete lists).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = [
    "aggregate_embeddings",
    "concat_aggregate_embeddings",
    "split_aggregate_embeddings",
    "first_aggregate_embeddings",
]


def _as_array(n_elements) -> jnp.ndarray:
    if isinstance(n_elements, (list, tuple)):
        return jnp.asarray(n_elements, dtype=jnp.int32)
    return n_elements.astype(jnp.int32)


def aggregate_embeddings(
    embeddings: jnp.ndarray,
    n_elements: Sequence[int] | jnp.ndarray,
    mode: str,
    **kwargs,
) -> jnp.ndarray:
    """Dispatch like ``duwu/utils/aggregation.py:6-13``."""
    if mode == "concat":
        return concat_aggregate_embeddings(embeddings, n_elements, **kwargs)
    if mode == "first":
        return first_aggregate_embeddings(embeddings, n_elements, **kwargs)
    raise ValueError(f'Invalid aggregation mode "{mode}"')


def concat_aggregate_embeddings(
    embeddings: jnp.ndarray,
    n_elements: Sequence[int] | jnp.ndarray,
    pad_value: float = 0.0,
    pad_to_n_elements: int | None = None,
) -> jnp.ndarray:
    """Pack ``[N, L, *E]`` per-element embeddings into ``[B, max_n*L, *E]``.

    Element ``j`` of group ``b`` lands at rows ``[j*L, (j+1)*L)`` of batch
    ``b``; tail positions are ``pad_value``. Matches
    ``concat_aggregate_embeddings_vectorize`` (``aggregation.py:64-107``).
    """
    n_arr = _as_array(n_elements)
    batch_size = n_arr.shape[0]
    n_total, seq_len = embeddings.shape[0], embeddings.shape[1]

    if pad_to_n_elements is None:
        if isinstance(n_elements, (list, tuple)):
            pad_to_n_elements = max(int(x) for x in n_elements)
        else:
            raise ValueError(
                "pad_to_n_elements must be given (static) when n_elements "
                "is a traced array"
            )
    max_n = int(pad_to_n_elements)

    # For each source element: which batch row and which slot within it.
    ends = jnp.cumsum(n_arr)
    starts = ends - n_arr
    elem_ids = jnp.arange(n_total, dtype=jnp.int32)
    elem_batch = jnp.searchsorted(ends, elem_ids, side="right").astype(jnp.int32)
    elem_slot = elem_ids - starts[elem_batch]

    out = jnp.full(
        (batch_size, max_n * seq_len, *embeddings.shape[2:]),
        pad_value,
        dtype=embeddings.dtype,
    )
    # Scatter whole [L, *E] rows per element.
    row_pos = elem_slot[:, None] * seq_len + jnp.arange(seq_len, dtype=jnp.int32)
    out = out.at[elem_batch[:, None], row_pos].set(embeddings)
    return out


def split_aggregate_embeddings(
    cat_embeddings: jnp.ndarray,
    n_elements: Sequence[int] | jnp.ndarray,
    sequence_length: int,
) -> jnp.ndarray:
    """Inverse of :func:`concat_aggregate_embeddings`
    (``aggregation.py:110-171``). Requires concrete ``n_elements`` (the
    output first dim ``sum(n_elements)`` is shape-defining)."""
    n_list = [int(x) for x in n_elements]
    n_arr = jnp.asarray(n_list, dtype=jnp.int32)
    n_total = sum(n_list)

    ends = jnp.cumsum(n_arr)
    starts = ends - n_arr
    elem_ids = jnp.arange(n_total, dtype=jnp.int32)
    elem_batch = jnp.searchsorted(ends, elem_ids, side="right").astype(jnp.int32)
    elem_slot = elem_ids - starts[elem_batch]

    row_pos = (
        elem_slot[:, None] * sequence_length
        + jnp.arange(sequence_length, dtype=jnp.int32)
    )
    return cat_embeddings[elem_batch[:, None], row_pos]


def first_aggregate_embeddings(
    embeddings: jnp.ndarray,
    n_elements: Sequence[int] | jnp.ndarray,
) -> jnp.ndarray:
    """Take the first element of each group (``aggregation.py:174-184``)."""
    n_arr = _as_array(n_elements)
    starts = jnp.cumsum(n_arr) - n_arr
    return embeddings[starts]
