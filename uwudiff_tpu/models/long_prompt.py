"""Long-prompt chunking: prompts beyond the CLIP 77-token window.

No reference counterpart (UwUDiff truncates at ``model_max_length``) —
this is the A1111/kohya community staple for prompts longer than CLIP's
positional table: the raw token stream is split into windows of
``model_max_length - 2`` tokens (breaking at the last comma within the
final ``backtrack`` positions when possible, so phrases survive the
split), each window is wrapped in its own BOS/EOS, every window is
encoded independently through the SAME text encoder, and the per-window
hidden states are concatenated along the sequence axis. Pooled output
comes from the FIRST window.

TPU-first split: the host side here only builds fixed-shape
``[B, n_chunks * L]`` id/mask (and optional per-token weight) arrays;
the device side is one reshape in ``ConcatTextEncoders`` —
``[B, n*L] -> [B*n, L]`` around the encoder call — so the whole batch
of windows rides one XLA program with the batch dimension doing the
work (no per-chunk Python loop on device).

Encoders without a BOS token (T5-style, relative position bias) have no
77-token wall and keep their single-window tokenization.
"""

from __future__ import annotations

import numpy as np

from uwudiff_tpu.models.prompt_weights import (
    apply_token_weights,
    parse_weighted_prompt,
)

__all__ = ["chunk_token_stream", "tokenize_long", "required_chunks", "encode_long"]

# A1111's comma_padding_backtrack default: when a window fills, break at
# the last comma within this many trailing positions instead.
_BACKTRACK = 20


def _raw_ids(tok, text: str) -> list[int]:
    """Raw token ids, no special tokens (HF ``.tokenize`` returns token
    STRINGS — route those through ``convert_tokens_to_ids``)."""
    out = tok.tokenize(text)
    if out and not isinstance(out[0], (int, np.integer)):
        out = tok.convert_tokens_to_ids(out)
    return [int(i) for i in out]


def _comma_id(tok) -> int | None:
    try:
        ids = _raw_ids(tok, ",")
    except Exception:
        return None
    return ids[0] if len(ids) == 1 else None


def _is_windowed(tok, model=None) -> bool:
    """Chunk this encoder? Keyed on the MODEL when known — only
    absolute-position CLIP towers have the 77-token wall; T5-style
    relative-bias encoders take any length in one window. Falls back to
    the tokenizer (has a BOS token) when no model is given."""
    if model is not None:
        from uwudiff_tpu.models.clip import CLIPTextModel

        return isinstance(model, CLIPTextModel)
    return getattr(tok, "bos_token_id", None) is not None


def chunk_token_stream(
    ids: list[int],
    weights: list[float],
    limit: int,
    comma_id: int | None = None,
    backtrack: int = _BACKTRACK,
) -> list[tuple[list[int], list[float]]]:
    """Split a raw (no BOS/EOS) token stream into windows of <= limit
    tokens, breaking after the last comma in the trailing ``backtrack``
    positions of a full window when one exists."""
    chunks: list[tuple[list[int], list[float]]] = []
    cur_i: list[int] = []
    cur_w: list[float] = []
    for i, w in zip(ids, weights):
        cur_i.append(i)
        cur_w.append(w)
        if len(cur_i) == limit:
            cut = limit
            if comma_id is not None and backtrack > 0:
                lo = max(0, limit - backtrack)
                for j in range(limit - 1, lo - 1, -1):
                    if cur_i[j] == comma_id:
                        cut = j + 1
                        break
            chunks.append((cur_i[:cut], cur_w[:cut]))
            cur_i, cur_w = cur_i[cut:], cur_w[cut:]
    if cur_i or not chunks:
        chunks.append((cur_i, cur_w))
    return chunks


def _text_chunks(tok, text: str, weighted: bool):
    """One prompt -> list of (ids, weights) windows (no specials yet)."""
    if weighted:
        ids: list[int] = []
        wts: list[float] = []
        for frag, w in parse_weighted_prompt(text):
            frag_ids = _raw_ids(tok, frag)
            ids.extend(frag_ids)
            wts.extend([w] * len(frag_ids))
    else:
        ids = _raw_ids(tok, text)
        wts = [1.0] * len(ids)
    limit = tok.model_max_length - 2  # room for BOS/EOS per window
    return chunk_token_stream(ids, wts, limit, _comma_id(tok))


def tokenize_long(
    tok,
    texts: list[str],
    max_chunks: int | None = None,
    weighted: bool = False,
) -> tuple[dict[str, np.ndarray], np.ndarray, int]:
    """Chunked analogue of ``tok(texts, padding="max_length")``.

    Returns ({input_ids, attention_mask} of shape ``[B, n*L]``, float32
    weights ``[B, n*L]``, n). Prompts shorter than the common chunk
    count are padded with EMPTY-prompt windows (BOS+EOS only), matching
    the A1111 convention — not zero rows.
    """
    if isinstance(texts, str):
        texts = [texts]
    L = tok.model_max_length
    per_text = [_text_chunks(tok, t, weighted) for t in texts]
    n = max(len(c) for c in per_text)
    if max_chunks is not None:
        per_text = [c[:max_chunks] for c in per_text]
        n = max_chunks
    n = max(n, 1)

    bos, eos, pad = tok.bos_token_id, tok.eos_token_id, tok.pad_token_id
    ids_b, mask_b, w_b = [], [], []
    for chunks in per_text:
        ids_row: list[int] = []
        mask_row: list[int] = []
        w_row: list[float] = []
        for k in range(n):
            c_ids, c_wts = chunks[k] if k < len(chunks) else ([], [])
            window = [bos] + c_ids + [eos]
            wts = [1.0] + c_wts + [1.0]
            pad_n = L - len(window)
            ids_row += window + [pad] * pad_n
            mask_row += [1] * len(window) + [0] * pad_n
            w_row += wts + [1.0] * pad_n
        ids_b.append(ids_row)
        mask_b.append(mask_row)
        w_b.append(w_row)
    return (
        {
            "input_ids": np.asarray(ids_b, dtype=np.int32),
            "attention_mask": np.asarray(mask_b, dtype=np.int32),
        },
        np.asarray(w_b, dtype=np.float32),
        n,
    )


def required_chunks(pipe, texts) -> int:
    """Windows needed to hold ``texts`` across the pipeline's windowed
    tokenizers (use to align cond/uncond encodings to one shape)."""
    if isinstance(texts, str):
        texts = [texts]
    n = 1
    for tok, model in zip(pipe.tokenizers, pipe.module.text_models):
        if _is_windowed(tok, model):
            for t in texts:
                n = max(n, len(_text_chunks(tok, t, weighted=False)))
    return n


def encode_long(
    pipe,
    texts,
    max_chunks: int | None = None,
    weighted: bool = False,
    **tokenize_kwargs,
):
    """Long-prompt counterpart of ``TextEncodingPipeline.encode`` (flat
    mode): windowed tokenizers chunk (to a common window count),
    T5-style tokenizers keep one window; optional A1111 emphasis
    weighting composes (weights chunk with their tokens)."""
    if isinstance(texts, str):
        texts = [texts]
    module = pipe.module

    # common window count across every windowed tokenizer (vocabularies
    # differ -> token counts differ; feature-concat buckets need one n)
    if max_chunks is None:
        max_chunks = 1
        for tok, model in zip(pipe.tokenizers, module.text_models):
            if _is_windowed(tok, model):
                for t in texts:
                    max_chunks = max(
                        max_chunks, len(_text_chunks(tok, t, weighted))
                    )

    tok_outs, enc_weights = [], []
    for tok, model in zip(pipe.tokenizers, module.text_models):
        if _is_windowed(tok, model):
            out, w, _ = tokenize_long(
                tok, texts, max_chunks=max_chunks, weighted=weighted
            )
        elif weighted:
            from uwudiff_tpu.models.prompt_weights import tokenize_with_weights

            out, w = tokenize_with_weights(tok, texts)
        else:
            out = tok(texts, padding="max_length", truncation=True,
                      **tokenize_kwargs)
            w = np.ones(out["input_ids"].shape, dtype=np.float32)
        tok_outs.append(out)
        enc_weights.append(w)

    emb, normed, pooled, mask = pipe.forward(tok_outs)

    if weighted:
        # final sequence = buckets ascending, feature-concat inside a
        # bucket (shared token alignment) -> the bucket's first
        # encoder's weights, seq-concat across buckets
        buckets: dict[int, np.ndarray] = {}
        for cfg, w in zip(module.configs, enc_weights):
            buckets.setdefault(cfg.concat_bucket, w)
        w_full = np.concatenate([buckets[b] for b in sorted(buckets)], axis=1)
        if w_full.shape[1] != emb.shape[1]:
            raise ValueError(
                f"token-weight length {w_full.shape[1]} != encoded "
                f"sequence {emb.shape[1]} — bucket layout changed?"
            )
        emb = apply_token_weights(emb, w_full)
        normed = apply_token_weights(normed, w_full)
    return emb, normed, pooled, mask
