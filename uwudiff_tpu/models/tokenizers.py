"""Host-side tokenizers.

Tokenization stays on host (SURVEY.md §7.3); models only see fixed-shape
int arrays. Providers:

- ``CLIPBPETokenizer``: self-contained CLIP byte-level BPE
  (vocab.json + merges.txt), id-equal to ``transformers.CLIPTokenizer``
- ``T5SPTokenizer`` (``spiece.py``): self-contained SentencePiece
  unigram for T5 checkpoints (spiece.model or tokenizer.json),
  id-equal to ``transformers.T5TokenizerFast``
- ``load_hf_tokenizer``: a locally-available HuggingFace tokenizer
  (the reference uses ``AutoTokenizer.from_pretrained``,
  ``duwu/modules/text_encoders.py:68-75``)
- ``SimpleTokenizer``: a self-contained hash tokenizer with the same
  call convention, used by tests and DummyDataset (no downloads needed)
"""

from __future__ import annotations

import hashlib
import json
from functools import lru_cache

import numpy as np

from uwudiff_tpu.models.spiece import T5SPTokenizer  # noqa: F401 (re-export)

__all__ = [
    "SimpleTokenizer",
    "CLIPBPETokenizer",
    "T5SPTokenizer",
    "load_hf_tokenizer",
    "clamp_tokenizer_length",
]


@lru_cache(maxsize=1)
def _byte_to_unicode() -> dict[int, str]:
    """GPT-2/CLIP reversible byte<->printable-unicode table: printable
    latin bytes map to themselves, the rest to U+0100.. codepoints."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {b: chr(b) for b in keep}
    shift = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + shift)
            shift += 1
    return table


def _split_on_added(text: str, added: dict[str, list[int]]):
    """Yield ("ids", expansion) for placeholder hits (case-insensitive,
    keys stored lowercase) and ("text", segment) for everything else —
    the shared pre-pass both tokenizers run so placeholder semantics
    stay identical across them.

    Placeholders whose edges are alphanumeric only match at word
    boundaries ("sks" must not fire inside "tasks"); non-word edges
    like "<concept>" stay punctuation-adjacent-matchable."""
    import re as _re

    parts = []
    for k in added:
        p = _re.escape(k)
        if k[0].isalnum():
            p = r"(?<![a-z0-9])" + p
        if k[-1].isalnum():
            p = p + r"(?![a-z0-9])"
        parts.append(p)
    pattern = "(" + "|".join(parts) + ")"
    for part in _re.split(pattern, text, flags=_re.IGNORECASE):
        if part is None:
            continue
        key = part.lower()
        if key in added:
            yield ("ids", added[key])
        elif part.strip():
            yield ("text", part)


class CLIPBPETokenizer:
    """Self-contained CLIP byte-level BPE tokenizer.

    Loads the standard ``vocab.json`` + ``merges.txt`` pair (the file
    format used by every CLIP checkpoint) and reproduces the reference
    tokenization exactly — the reference tokenizes with HF
    ``AutoTokenizer`` CLIP vocabularies
    (``duwu/modules/text_encoders.py:68-75``); id-equality with
    ``transformers.CLIPTokenizer`` is asserted in
    ``tests/test_tokenizers.py``.

    Pipeline: whitespace-collapse + lowercase, CLIP's word/number/
    punctuation regex, utf-8 bytes -> printable unicode, greedy
    lowest-rank BPE merges with a ``</w>`` end-of-word marker, then
    ``<|startoftext|> ids <|endoftext|>`` with truncation keeping the
    final eos and padding to ``max_length``.
    """

    def __init__(
        self,
        vocab_file: str,
        merges_file: str,
        model_max_length: int = 77,
        pad_token: str | None = None,  # default: eos (HF CLIP behavior)
    ):
        import regex

        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: dict[str, int] = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().strip().split("\n")
        # first line is the "#version:" header
        merges = [tuple(l.split()) for l in lines[1:] if l and len(l.split()) == 2]
        self.merge_rank = {pair: i for i, pair in enumerate(merges)}

        self.byte_enc = _byte_to_unicode()
        self.model_max_length = model_max_length
        self.bos_token = "<|startoftext|>"
        self.eos_token = "<|endoftext|>"
        self.bos_token_id = self.encoder[self.bos_token]
        self.eos_token_id = self.encoder[self.eos_token]
        self.pad_token = pad_token or self.eos_token
        self.pad_token_id = self.encoder[self.pad_token]
        self.vocab_size = len(self.encoder)
        self._bpe_cache: dict[str, list[str]] = {}
        # textual-inversion placeholders: exact-string -> id expansion,
        # matched before BPE (see add_placeholder)
        self.added_tokens: dict[str, list[int]] = {}

        self._pattern = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )
        self._ws = regex.compile(r"\s+")

    # -- BPE ----------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            best = min(
                pairs, key=lambda p: self.merge_rank.get(p, float("inf"))
            )
            if best not in self.merge_rank:
                break
            merged: list[str] = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and parts[i] == best[0]
                    and parts[i + 1] == best[1]
                ):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._bpe_cache[token] = parts
        return parts

    def add_placeholder(self, token: str, ids: list[int]) -> None:
        """Register a textual-inversion placeholder: every occurrence of
        ``token`` (case-insensitive, punctuation-adjacent OK) expands to
        ``ids``, bypassing BPE."""
        self.added_tokens[str(token).lower()] = [int(i) for i in ids]

    def tokenize(self, text: str) -> list[int]:
        """Raw BPE ids for one string, no special tokens."""
        if self.added_tokens:
            ids: list[int] = []
            for kind, val in _split_on_added(text, self.added_tokens):
                if kind == "ids":
                    ids.extend(val)
                else:
                    ids.extend(self._tokenize_plain(val))
            return ids
        return self._tokenize_plain(text)

    def _tokenize_plain(self, text: str) -> list[int]:
        text = self._ws.sub(" ", text).strip().lower()
        ids: list[int] = []
        unk = self.encoder.get(self.eos_token)
        for chunk in self._pattern.findall(text):
            if chunk in (self.bos_token, self.eos_token):
                ids.append(self.encoder[chunk])
                continue
            mapped = "".join(self.byte_enc[b] for b in chunk.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.encoder.get(piece, unk))
        return ids

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
            ids = [self.bos_token_id] + self.tokenize(t) + [self.eos_token_id]
            if truncation and len(ids) > max_length:
                ids = ids[: max_length - 1] + [self.eos_token_id]
            mask = [1] * len(ids)
            if padding in (True, "max_length", "longest"):
                pad_n = max_length - len(ids)
                ids += [self.pad_token_id] * pad_n
                mask += [0] * pad_n
            ids_batch.append(ids)
            mask_batch.append(mask)
        longest = max(len(i) for i in ids_batch)
        ids_batch = [
            i + [self.pad_token_id] * (longest - len(i)) for i in ids_batch
        ]
        mask_batch = [m + [0] * (longest - len(m)) for m in mask_batch]
        return {
            "input_ids": np.asarray(ids_batch, dtype=np.int32),
            "attention_mask": np.asarray(mask_batch, dtype=np.int32),
        }


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
        self.added_tokens: dict[str, list[int]] = {}

    def add_placeholder(self, token: str, ids: list[int]) -> None:
        """Register a textual-inversion placeholder (case-insensitive,
        punctuation-adjacent OK — same semantics as the BPE tokenizer)."""
        self.added_tokens[str(token).lower()] = [int(i) for i in ids]

    def tokenize(self, text: str) -> list[int]:
        """Raw word ids, no special tokens (API parity with the BPE
        tokenizer)."""
        if self.added_tokens:
            ids: list[int] = []
            for kind, val in _split_on_added(text, self.added_tokens):
                if kind == "ids":
                    ids.extend(val)
                else:
                    ids.extend(
                        self._word_id(w) for w in val.lower().split()
                    )
            return ids
        return [self._word_id(w) for w in text.lower().split()]

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
            ids = [self.bos_token_id] + self.tokenize(t)
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
