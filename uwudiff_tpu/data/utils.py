"""Image pre/post-processing (parity with ``duwu/data/utils.py``)."""

from __future__ import annotations

import numpy as np

__all__ = [
    "vae_image_postprocess",
    "vae_image_preprocess",
    "resize_and_crop_image",
    "augment_caption",
]


def vae_image_postprocess(image_tensor) -> "PIL.Image.Image":
    """[-1, 1] NHWC float image -> PIL (``data/utils.py:10-19``)."""
    from PIL import Image

    arr = np.asarray(image_tensor)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.dtype != np.uint8:  # already-u8 input: device-side convert
        arr = ((np.clip(arr, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
    return Image.fromarray(arr)


def vae_image_preprocess(image) -> np.ndarray:
    """PIL -> [-1, 1] HWC float32."""
    arr = np.asarray(image.convert("RGB"), dtype=np.float32)
    return arr / 127.5 - 1.0


def resize_and_crop_image(image, target_size: tuple[int, int]):
    """Resize preserving aspect then center-crop to (width, height)
    (``data/utils.py`` BicubicResize + crop semantics)."""
    from PIL import Image

    tw, th = target_size
    w, h = image.size
    scale = max(tw / w, th / h)
    new_w, new_h = round(w * scale), round(h * scale)
    image = image.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - tw) // 2
    top = (new_h - th) // 2
    return image.crop((left, top, left + tw, top + th))


def augment_caption(
    caption: str,
    rng,
    shuffle_tags: bool = False,
    keep_tokens: int = 0,
    tag_dropout: float = 0.0,
    sep: str = ",",
) -> str:
    """Tag-level caption augmentation (the kohya-style booru-caption
    staples; no reference counterpart): split on ``sep``, keep the
    first ``keep_tokens`` tags pinned in place, randomly drop each
    remaining tag with prob ``tag_dropout``, optionally shuffle the
    rest. ``rng`` is a ``numpy.random.Generator``."""
    if not (shuffle_tags or tag_dropout):
        return caption
    tags = [t.strip() for t in caption.split(sep)]
    tags = [t for t in tags if t]
    head, tail = tags[:keep_tokens], tags[keep_tokens:]
    if tag_dropout:
        tail = [t for t in tail if rng.random() >= tag_dropout]
    if shuffle_tags:
        tail = list(tail)
        rng.shuffle(tail)
    return ", ".join(head + tail)
