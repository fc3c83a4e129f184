"""Local-folder image/caption datasets (parity with
``duwu/data/text_image_local.py``)."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Sequence

import numpy as np

from uwudiff_tpu.data.base import UwUBaseDataset
from uwudiff_tpu.data.utils import resize_and_crop_image, vae_image_preprocess
from uwudiff_tpu.utils import get_images_recursively

__all__ = [
    "LocalImageDataset",
    "LocalImageDatasetFromFolder",
    "LocalTextImageDataset",
    "LocalClassImageDataset",
]


class LocalImageDataset(UwUBaseDataset):
    """Images from an explicit path list, resized+center-cropped."""

    def __init__(
        self,
        image_paths: Sequence[str],
        image_size: tuple[int, int] = (1024, 1024),  # (W, H)
        tokenizers: Sequence = (),
        caption: str = "",
        native_decode: bool = True,  # C++ decode pool; PIL fallback
        # tag-level caption augmentation (data/utils.py::augment_caption);
        # caption_seed=None re-rolls per access (fresh augmentation each
        # epoch), an int makes it deterministic per index (tests)
        shuffle_tags: bool = False,
        keep_tokens: int = 0,
        tag_dropout: float = 0.0,
        caption_seed: int | None = None,
        # masked loss (community staple): per-image [H, W] masks in
        # [0, 1] restricting the training loss to the subject.
        # mask_dir: `<mask_dir>/<image stem>.png` grayscale (missing
        # file -> all-ones); alpha_mask: the image's own alpha channel
        mask_dir: str | None = None,
        alpha_mask: bool = False,
        # train-time long prompts: fixed window count (UwUBaseDataset)
        long_prompt_chunks: int | None = None,
    ):
        self.image_paths = list(image_paths)
        self.image_size = tuple(image_size)
        self.tokenizers = list(tokenizers)
        self.caption = caption
        self.native_decode = native_decode
        self._native_ok: bool | None = None
        self.shuffle_tags = shuffle_tags
        self.keep_tokens = keep_tokens
        self.tag_dropout = tag_dropout
        self.caption_seed = caption_seed
        self.mask_dir = mask_dir
        self.alpha_mask = alpha_mask
        self.long_prompt_chunks = long_prompt_chunks

    def __len__(self):
        return len(self.image_paths)

    def _load_image(self, path: str) -> np.ndarray:
        if self.native_decode and self._native_ok is not False:
            try:
                from uwudiff_tpu.data.native_image import decode_image

                w, h = self.image_size
                out = decode_image(path, (h, w))
                self._native_ok = True
                return out
            except Exception:
                if self._native_ok:  # was working: real decode error
                    raise
                self._native_ok = False  # no toolchain/libs: PIL fallback
        from PIL import Image

        img = Image.open(path).convert("RGB")
        img = resize_and_crop_image(img, self.image_size)
        return vae_image_preprocess(img)  # HWC in [-1, 1]

    def _caption_for(self, index: int) -> str:
        return self.caption

    def _mask_for(self, index: int):
        """[H, W] float32 loss mask in [0, 1] through the SAME
        aspect-fill + center-crop transform as the image (bicubic on
        the soft mask, clipped), or None when masking is off."""
        if self.mask_dir is None and not self.alpha_mask:
            return None
        from PIL import Image

        from uwudiff_tpu.data.utils import resize_and_crop_image

        path = Path(self.image_paths[index])
        m = None
        if self.mask_dir is not None:
            mp = Path(self.mask_dir) / (path.stem + ".png")
            if mp.exists():
                m = Image.open(mp).convert("L")
        elif self.alpha_mask:
            img = Image.open(path)
            if "A" in img.getbands():
                m = img.getchannel("A")
        w, h = self.image_size
        if m is None:  # missing mask -> train on the whole image
            return np.ones((h, w), np.float32)
        m = resize_and_crop_image(m, self.image_size)
        return np.clip(
            np.asarray(m, np.float32) / 255.0, 0.0, 1.0
        )

    def __getitem__(self, index: int) -> dict:
        sample = self._load_image(self.image_paths[index])
        caption = self._caption_for(index)
        if self.shuffle_tags or self.tag_dropout:
            from uwudiff_tpu.data.utils import augment_caption

            rng = np.random.default_rng(
                None if self.caption_seed is None
                else self.caption_seed + index
            )
            caption = augment_caption(
                caption, rng,
                shuffle_tags=self.shuffle_tags,
                keep_tokens=self.keep_tokens,
                tag_dropout=self.tag_dropout,
            )
        w, h = self.image_size
        item = {
            "sample": sample,
            "caption": caption,
            "tokenizer_out": self._tokenize(caption),
            "add_time_ids": np.asarray([h, w, 0, 0, h, w], dtype=np.float32),
        }
        mask = self._mask_for(index)
        if mask is not None:
            item["loss_mask"] = mask
        return item


class LocalImageDatasetFromFolder(LocalImageDataset):
    """All images found recursively under a folder."""

    def __init__(self, image_dir: str, **kwargs):
        paths = sorted(get_images_recursively(image_dir))
        super().__init__(image_paths=paths, **kwargs)


class LocalTextImageDataset(LocalImageDataset):
    """Image list + sidecar caption files (``<image>.txt`` next to each
    image, falling back to a default caption)."""

    def __init__(
        self,
        image_paths: Sequence[str] | None = None,
        image_dir: str | None = None,
        caption_ext: str = ".txt",
        default_caption: str = "",
        **kwargs,
    ):
        if image_paths is None:
            assert image_dir is not None
            image_paths = sorted(get_images_recursively(image_dir))
        super().__init__(image_paths=image_paths, caption=default_caption,
                         **kwargs)
        self.caption_ext = caption_ext

    def _caption_for(self, index: int) -> str:
        path = Path(self.image_paths[index]).with_suffix(self.caption_ext)
        if os.path.exists(path):
            return path.read_text().strip()
        return self.caption


class LocalClassImageDataset(LocalImageDataset):
    """ImageNet-style folder-per-class dataset for the class-conditional
    DiT family (no reference counterpart — its datasets are caption-
    based): ``<root>/<class_name>/*.{jpg,png,...}``, labels = index of
    the sorted class-folder name. Captions default to the class name so
    the same tree can also drive text-conditional models."""

    def __init__(
        self,
        image_dir: str,
        caption_from_class: bool = True,
        **kwargs,
    ):
        root = Path(image_dir)
        classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        assert classes, f"no class subfolders under {image_dir}"
        self.idx_to_class = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        paths: list[str] = []
        labels: list[int] = []
        for c in classes:
            for p in sorted(get_images_recursively(str(root / c))):
                paths.append(p)
                labels.append(self.class_to_idx[c])
        super().__init__(image_paths=paths, **kwargs)
        self.labels = np.asarray(labels, np.int32)
        self.caption_from_class = caption_from_class

    @property
    def num_classes(self) -> int:
        return len(self.idx_to_class)

    def _caption_for(self, index: int) -> str:
        if self.caption_from_class:
            return self.idx_to_class[int(self.labels[index])]
        return self.caption

    def __getitem__(self, index: int) -> dict:
        item = super().__getitem__(index)
        item["class_label"] = int(self.labels[index])
        return item
