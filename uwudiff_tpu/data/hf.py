"""HuggingFace-datasets wrappers (parity with
``duwu/data/hf_dataset.py``). Requires the ``datasets`` package and a
locally cached dataset (zero-egress environment)."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from uwudiff_tpu.data.base import UwUBaseDataset
from uwudiff_tpu.data.utils import resize_and_crop_image, vae_image_preprocess

__all__ = ["HfImageDataset", "HfPromptDataset"]


class HfImageDataset(UwUBaseDataset):
    def __init__(
        self,
        dataset_name_or_path: str,
        split: str = "train",
        image_column: str = "image",
        caption_column: str | None = None,
        image_size: tuple[int, int] = (1024, 1024),
        tokenizers: Sequence = (),
        default_caption: str = "",
        # tag-level caption augmentation (same knobs as the local
        # datasets; data/utils.py::augment_caption)
        shuffle_tags: bool = False,
        keep_tokens: int = 0,
        tag_dropout: float = 0.0,
        caption_seed: int | None = None,
        **load_kwargs,
    ):
        import datasets

        self.ds = datasets.load_dataset(
            dataset_name_or_path, split=split, **load_kwargs
        )
        self.image_column = image_column
        self.caption_column = caption_column
        self.image_size = tuple(image_size)
        self.tokenizers = list(tokenizers)
        self.default_caption = default_caption
        self.shuffle_tags = shuffle_tags
        self.keep_tokens = keep_tokens
        self.tag_dropout = tag_dropout
        self.caption_seed = caption_seed

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, index: int) -> dict:
        row = self.ds[int(index)]
        img = row[self.image_column].convert("RGB")
        img = resize_and_crop_image(img, self.image_size)
        sample = vae_image_preprocess(img)
        caption = (
            row[self.caption_column]
            if self.caption_column
            else self.default_caption
        )
        if isinstance(caption, (list, tuple)):
            caption = caption[0]
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
        return {
            "sample": sample,
            "caption": caption,
            "tokenizer_out": self._tokenize(caption),
            "add_time_ids": np.asarray([h, w, 0, 0, h, w], dtype=np.float32),
        }


class HfPromptDataset:
    """Prompt-only dataset for sampling/eval (``hf_dataset.py`` parity)."""

    def __init__(
        self,
        dataset_name_or_path: str,
        split: str = "train",
        caption_column: str = "caption",
        **load_kwargs,
    ):
        import datasets

        self.ds = datasets.load_dataset(
            dataset_name_or_path, split=split, **load_kwargs
        )
        self.caption_column = caption_column

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, index: int) -> str:
        cap = self.ds[int(index)][self.caption_column]
        if isinstance(cap, (list, tuple)):
            cap = cap[0]
        return cap
