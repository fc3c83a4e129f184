"""Axial rotary position embeddings (parity with ``duwu/modules/rope.py``).

Positions live in an aspect-ratio-aware [-1, 1] bounding box so the same
learned frequencies serve any H x W latent grid (resolution
generalization, SURVEY.md §5.7). Pure jnp + a tiny linen module holding
the learned per-head log-frequencies.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["bounding_box", "make_axial_pos", "apply_rotary_emb", "AxialRoPE"]


def bounding_box(h: int, w: int, pixel_aspect_ratio: float = 1.0):
    """Aspect-ratio bounding box (``rope.py:10-26``). Static Python math."""
    w_adj = w
    h_adj = h * pixel_aspect_ratio
    ar_adj = w_adj / h_adj
    y_min, y_max, x_min, x_max = -1.0, 1.0, -1.0, 1.0
    if ar_adj > 1:
        y_min, y_max = -1 / ar_adj, 1 / ar_adj
    elif ar_adj < 1:
        x_min, x_max = -ar_adj, ar_adj
    return y_min, y_max, x_min, x_max


def _centers(start: float, stop: float, num: int) -> jnp.ndarray:
    edges = jnp.linspace(start, stop, num + 1)
    return (edges[:-1] + edges[1:]) / 2


def make_axial_pos(
    h: int,
    w: int,
    pixel_aspect_ratio: float = 1.0,
    align_corners: bool = False,
) -> jnp.ndarray:
    """[h*w, 2] (y, x) position grid (``rope.py:29-53``)."""
    y_min, y_max, x_min, x_max = bounding_box(h, w, pixel_aspect_ratio)
    if align_corners:
        h_pos = jnp.linspace(y_min, y_max, h)
        w_pos = jnp.linspace(x_min, x_max, w)
    else:
        h_pos = _centers(y_min, y_max, h)
        w_pos = _centers(x_min, x_max, w)
    grid = jnp.stack(jnp.meshgrid(h_pos, w_pos, indexing="ij"), axis=-1)
    return grid.reshape(h * w, 2)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(``rope.py:56-58``): interleave (-odd, even) pairs."""
    x = jnp.stack((-x[..., 0::2], x[..., 1::2]), axis=-1)
    return x.reshape(*x.shape[:-2], -1)


def apply_rotary_emb(
    freqs: jnp.ndarray,
    t: jnp.ndarray,
    start_index: int = 0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Rotate the ``[start_index, start_index+rot_dim)`` slice of the last
    dim of ``t`` by ``freqs`` (``rope.py:61-71``)."""
    freqs = freqs.astype(t.dtype)
    rot_dim = freqs.shape[-1]
    end_index = start_index + rot_dim
    t_left = t[..., :start_index]
    t_mid = t[..., start_index:end_index]
    t_right = t[..., end_index:]
    t_mid = (t_mid * jnp.cos(freqs) * scale) + (
        _rotate_half(t_mid) * jnp.sin(freqs) * scale
    )
    return jnp.concatenate([t_left, t_mid, t_right], axis=-1)


def freqs_pixel_log_init(max_freq: float = 10.0):
    """Log-spaced frequency init (``rope.py:74-80``)."""

    def init(key, shape, dtype=jnp.float32):
        log_min = math.log(math.pi)
        log_max = math.log(max_freq * math.pi / 2)
        return jnp.broadcast_to(
            jnp.linspace(log_min, log_max, shape[-1], dtype=dtype), shape
        )

    return init


class AxialRoPE(nn.Module):
    """Learned-frequency axial RoPE (``rope.py:83-108``).

    ``dim`` is the per-head dim; a quarter of it rotates per spatial axis
    (freqs are repeat-interleaved x2, h and w concatenated -> dim/2
    rotated dims total... matching the reference exactly: freqs_h/freqs_w
    each [n_heads, dim//4], concat -> dim//2, repeat_interleave(2) ->
    dim rotated).
    """

    dim: int  # per-head dim
    n_heads: int
    start_index: int = 0
    max_freq: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """x: [..., seq, n_heads, dim]; pos: [..., seq, 2] or [seq, 2]."""
        init = freqs_pixel_log_init(self.max_freq)
        freqs_h = self.param("freqs_h", init, (self.n_heads, self.dim // 4))
        freqs_w = self.param("freqs_w", init, (self.n_heads, self.dim // 4))
        # pos[..., None, None, k] broadcasts over heads/freq dims
        fh = pos[..., None, None, 0] * jnp.exp(freqs_h)
        fw = pos[..., None, None, 1] * jnp.exp(freqs_w)
        freqs = jnp.concatenate([fh, fw], axis=-1)
        freqs = jnp.repeat(freqs, 2, axis=-1)  # [..., seq, heads, dim//2*2]
        return apply_rotary_emb(freqs, x, self.start_index)
