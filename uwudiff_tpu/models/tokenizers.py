"""Host-side tokenizers.

Tokenization stays on host (SURVEY.md §7.3); models only see fixed-shape
int arrays. Two providers:

- ``load_hf_tokenizer``: a locally-available HuggingFace tokenizer
  (the reference uses ``AutoTokenizer.from_pretrained``,
  ``duwu/modules/text_encoders.py:68-75``)
- ``SimpleTokenizer``: a self-contained hash tokenizer with the same
  call convention, used by tests and DummyDataset (no downloads needed)
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["SimpleTokenizer", "load_hf_tokenizer", "clamp_tokenizer_length"]


class SimpleTokenizer:
    """Deterministic hash tokenizer with an HF-compatible call API.

    ids: 0=pad, 1=bos, 2=eos, words hash into [3, vocab_size).
    """

    def __init__(
        self,
        vocab_size: int = 1024,
        model_max_length: int = 77,
        pad_token_id: int = 0,
        bos_token_id: int = 1,
        eos_token_id: int = 2,
    ):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self.pad_token_id = pad_token_id
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.pad_token = "<pad>"
        self.eos_token = "<eos>"

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(
            hashlib.md5(word.encode("utf-8")).digest()[:4], "little"
        )
        return 3 + h % (self.vocab_size - 3)

    def __call__(
        self,
        text: str | list[str],
        padding: bool | str = "max_length",
        truncation: bool = True,
        max_length: int | None = None,
        return_tensors: str | None = None,  # accepted for API parity
    ) -> dict[str, np.ndarray]:
        if isinstance(text, str):
            text = [text]
        max_length = max_length or self.model_max_length
        ids_batch, mask_batch = [], []
        for t in text:
            ids = [self.bos_token_id]
            ids += [self._word_id(w) for w in t.lower().split()]
            ids.append(self.eos_token_id)
            if truncation and len(ids) > max_length:
                ids = ids[: max_length - 1] + [self.eos_token_id]
            mask = [1] * len(ids)
            if padding in (True, "max_length", "longest"):
                pad_n = max_length - len(ids)
                ids = ids + [self.pad_token_id] * pad_n
                mask = mask + [0] * pad_n
            ids_batch.append(ids)
            mask_batch.append(mask)
        # pad ragged to the longest in batch (when padding=False)
        longest = max(len(i) for i in ids_batch)
        ids_batch = [i + [self.pad_token_id] * (longest - len(i)) for i in ids_batch]
        mask_batch = [m + [0] * (longest - len(m)) for m in mask_batch]
        return {
            "input_ids": np.asarray(ids_batch, dtype=np.int32),
            "attention_mask": np.asarray(mask_batch, dtype=np.int32),
        }


def load_hf_tokenizer(name_or_path: str, max_length: int = 256):
    """Load a HuggingFace tokenizer if available locally; clamps
    ``model_max_length`` like ``text_encoders.py:71-75``."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(name_or_path)
    return clamp_tokenizer_length(tok, max_length)


def clamp_tokenizer_length(tokenizer, max_length: int = 256):
    if not getattr(tokenizer, "pad_token", None):
        tokenizer.pad_token = tokenizer.eos_token
    if tokenizer.model_max_length > max_length:
        tokenizer.model_max_length = max_length
    return tokenizer
