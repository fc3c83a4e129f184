"""IP-Adapter (Ye et al. 2023): image-prompt conditioning.

Beyond-the-reference capability. The decoupled cross-attention lives in
``models/transformer.py::Attention`` (``to_k_ip``/``to_v_ip``, zero-init
value projection -> exact no-op at init); this module holds the image
projection that turns a CLIP image embedding into ``num_tokens``
context-dim tokens, the param-tree partition helpers the trainer uses,
and the sampler-side ``build_ip_unet_fn``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ImageProjection",
    "partition_by_path",
    "merge_overlay",
    "build_ip_unet_fn",
]


class ImageProjection(nn.Module):
    """CLIP image embedding [B, D] -> [B, num_tokens, cross_dim]
    (linear + reshape + LayerNorm, the original IP-Adapter projection)."""

    cross_attention_dim: int
    num_tokens: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.num_tokens * self.cross_attention_dim,
            dtype=self.dtype,
            name="proj",
        )(image_embeds.astype(self.dtype))
        x = x.reshape(
            image_embeds.shape[0], self.num_tokens, self.cross_attention_dim
        )
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


def partition_by_path(tree, pred: Callable[[str], bool]):
    """Split a nested-dict param tree into (selected, rest) by a
    predicate over '/'-joined paths. Both keep the nested structure
    (empty subtrees pruned)."""

    def walk(node, prefix):
        sel, rest = {}, {}
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                s, r = walk(v, path)
                if s:
                    sel[k] = s
                if r:
                    rest[k] = r
            elif pred(path):
                sel[k] = v
            else:
                rest[k] = v
        return sel, rest

    return walk(tree, "")


def merge_overlay(base, overlay):
    """Recursive dict merge: overlay leaves replace base leaves (the
    inverse of :func:`partition_by_path`)."""
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_overlay(out[k], v)
        else:
            out[k] = v
    return out


def is_ip_param(path: str) -> bool:
    return "to_k_ip" in path or "to_v_ip" in path


def build_ip_unet_fn(
    unet,
    image_proj: ImageProjection,
    uncond_zero_embeds: bool = True,
    cfg: bool | None = None,
) -> Callable:
    """A ``unet_fn(params, x, t, ctx, mask, added)`` for the sampling
    entry points; ``params = {"unet", "image_proj", "ip_embeds"}``.

    Under CFG the incoming batch is the doubled [cond | uncond] stack —
    the conditional half gets the projected image tokens, the
    unconditional half gets the projection of ZERO embeddings (the
    diffusers negative-image convention) unless
    ``uncond_zero_embeds=False`` (image tokens on both halves).

    ``cfg`` declares the batch layout: True = [cond | uncond] doubled,
    False = single-pass (tiled tokens). The default (None) infers it
    only for the unambiguous sizes b == n (single) and b == 2n (CFG);
    any other multiple of n raises — with k samples per embedding,
    b = k·n and b = 2k·n are indistinguishable from shape alone, and
    guessing CFG would silently zero the image conditioning on the
    back half of a cfg=1 batch.
    """

    def unet_fn(params, x, t, ctx, mask, added):
        embeds = params["ip_embeds"]
        n = embeds.shape[0]
        b = x.shape[0]
        is_cfg = cfg
        if is_cfg is None:
            if b == n:
                is_cfg = False
            elif b == 2 * n:
                is_cfg = True
            else:
                raise AssertionError(
                    f"ambiguous batch {b} for {n} ip_embeds: pass "
                    f"cfg=True/False to build_ip_unet_fn"
                )
        tokens = image_proj.apply({"params": params["image_proj"]}, embeds)
        if is_cfg:
            # CFG-doubled [cond | uncond] with k samples per embedding
            # (one reference image, several samples): tile each half
            if b % (2 * n):
                raise AssertionError(
                    f"CFG batch {b} is not a doubled multiple of {n} "
                    f"ip_embeds"
                )
            k = b // (2 * n)
            if uncond_zero_embeds:
                neg = image_proj.apply(
                    {"params": params["image_proj"]},
                    jnp.zeros_like(embeds),
                )
            else:
                neg = tokens
            tokens = jnp.concatenate(
                [jnp.tile(tokens, (k, 1, 1)), jnp.tile(neg, (k, 1, 1))]
            )
        elif b % n == 0:  # no CFG (or the cfg==1 single-pass path)
            tokens = jnp.tile(tokens, (b // n, 1, 1))
        else:
            raise AssertionError(
                f"ip_embeds batch {n} does not divide model batch {b}"
            )
        return unet.apply(
            {"params": params["unet"]},
            x, t, ctx, mask, added,
            ip_hidden_states=tokens,
        )

    return unet_fn
