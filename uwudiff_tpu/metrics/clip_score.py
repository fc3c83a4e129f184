"""CLIP score (parity with ``duwu/metrics/clip.py``).

score = mean over pairs of max(0, 100 * cosine(image_emb, text_emb)),
computed jit-compiled on TPU from a CLIP text tower (+projection) and
vision tower. The reference pins ``apple/DFN5B-CLIP-ViT-H-14-378``
(``configs/demo_metrics.yaml``); here the towers are a parameter
(``CLIP_VISION_PRESETS['vit_h14_378']`` matches that architecture, with
weights importable via ``models/import_torch.py``).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["clip_score_from_embeddings", "compute_clip_score"]


def clip_score_from_embeddings(
    image_embeds: jnp.ndarray, text_embeds: jnp.ndarray
) -> jnp.ndarray:
    img = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return jnp.maximum((img * txt).sum(-1) * 100.0, 0.0)


def compute_clip_score(
    images: Iterable[np.ndarray],  # [H, W, 3] float in [0, 1] or [0, 255]
    prompts: Sequence[str],
    image_embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    text_embed_fn: Callable[[Sequence[str]], jnp.ndarray],
    batch_size: int = 32,
) -> float:
    """Batched like ``metrics/clip.py:17-33`` (images scaled to 0..255 by
    the torchmetrics convention are accepted either way — embeddings are
    cosine-normalized so affine input scaling is the extractor's concern)."""
    images = list(images)
    assert len(images) == len(prompts)
    image_embed_fn = jax.jit(image_embed_fn)
    scores = []
    for i in range(0, len(images), batch_size):
        chunk = images[i : i + batch_size]
        texts = prompts[i : i + batch_size]
        batch = jnp.asarray(np.stack(chunk).astype(np.float32))
        img_emb = image_embed_fn(batch)
        txt_emb = text_embed_fn(texts)
        scores.append(np.asarray(clip_score_from_embeddings(img_emb, txt_emb)))
    return float(np.concatenate(scores).mean())
