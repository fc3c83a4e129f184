"""Attention-weighted prompts: ``(word:1.3)`` / ``(up)`` / ``[down]``.

No reference counterpart (UwUDiff encodes plain strings) — this is the
community prompt-emphasis staple (A1111/compel syntax). Pure host-side
preprocessing: parse the syntax into (fragment, weight) runs, tokenize
fragments through the SAME self-contained tokenizers, and scale the
encoded token embeddings — the device program is unchanged (the scaled
context tensor has the same shape), so nothing recompiles.

Semantics (matching the A1111 convention):
- ``(text)`` multiplies the run's weight by 1.1, nesting compounds
- ``[text]`` divides by 1.1
- ``(text:1.5)`` sets an explicit multiplier on the parenthesized run
- ``\\(`` ``\\)`` ``\\[`` ``\\]`` ``\\\\`` escape literals
- after encoding, token embeddings are scaled by their weight, then the
  whole sequence is rescaled so its per-sample mean matches the
  unweighted encoding's (keeps overall conditioning magnitude).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

__all__ = [
    "parse_weighted_prompt",
    "tokenize_with_weights",
    "apply_token_weights",
    "encode_weighted",
]

_UP = 1.1
_DOWN = 1.0 / 1.1

_TOKEN_RE = re.compile(
    r"""
    \\[()\[\]\\:]          # escaped literal
    | \(                   # open emphasis
    | \[                   # open de-emphasis
    | :\s*([+-]?\d+\.?\d*)\s*\)   # explicit weight close
    | \)
    | \]
    | [^\\()\[\]:]+        # plain text run
    | :                    # bare colon is literal
    | \\                   # lone backslash is literal too
    """,
    re.X,
)


def parse_weighted_prompt(text: str) -> list[tuple[str, float]]:
    """A1111-style emphasis syntax -> [(fragment, weight)], adjacent
    equal-weight fragments merged, empty fragments dropped."""
    res: list[list] = []  # [text, weight]
    round_stack: list[int] = []
    square_stack: list[int] = []

    def _multiply(start: int, mult: float):
        for i in range(start, len(res)):
            res[i][1] *= mult

    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        explicit = m.group(1)
        if tok.startswith("\\"):
            # "\(" -> "("; a lone "\" stays itself (windows paths etc.)
            res.append([tok[1:] or "\\", 1.0])
        elif tok == "(":
            round_stack.append(len(res))
        elif tok == "[":
            square_stack.append(len(res))
        elif explicit is not None:
            if round_stack:
                _multiply(round_stack.pop(), float(explicit))
            else:  # stray ":1.5)" with no open paren: literal text
                res.append([tok, 1.0])
        elif tok == ")":
            if round_stack:
                _multiply(round_stack.pop(), _UP)
            else:
                res.append([tok, 1.0])
        elif tok == "]":
            if square_stack:
                _multiply(square_stack.pop(), _DOWN)
            else:
                res.append([tok, 1.0])
        else:
            res.append([tok, 1.0])
    # unclosed brackets still emphasize their tail (A1111 behavior)
    for pos in round_stack:
        _multiply(pos, _UP)
    for pos in square_stack:
        _multiply(pos, _DOWN)

    merged: list[list] = []
    for t, w in res:
        if merged and abs(merged[-1][1] - w) < 1e-9:
            merged[-1][0] += t
        else:
            merged.append([t, w])
    return [(t, w) for t, w in merged if t]


def tokenize_with_weights(
    tok, texts: list[str], max_length: int | None = None
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Weighted analogue of ``tok(texts, padding="max_length")``:
    fragments tokenize independently (via ``tok.tokenize``) and carry
    their weight per token. BOS/EOS/pad weigh 1.0. Returns the usual
    {input_ids, attention_mask} plus a float32 ``[B, S]`` weight array.
    """
    max_length = max_length or tok.model_max_length
    bos = getattr(tok, "bos_token_id", None)  # T5-style has none

    def _frag_ids(frag: str) -> list[int]:
        out = tok.tokenize(frag)
        if out and not isinstance(out[0], (int, np.integer)):
            # HF tokenizers' .tokenize returns token STRINGS
            out = tok.convert_tokens_to_ids(out)
        return [int(i) for i in out]

    ids_batch, mask_batch, w_batch = [], [], []
    for text in texts:
        ids: list[int] = [] if bos is None else [bos]
        wts: list[float] = [] if bos is None else [1.0]
        for frag, w in parse_weighted_prompt(text):
            frag_ids = _frag_ids(frag)
            ids.extend(frag_ids)
            wts.extend([w] * len(frag_ids))
        ids.append(tok.eos_token_id)
        wts.append(1.0)
        if len(ids) > max_length:
            ids = ids[: max_length - 1] + [tok.eos_token_id]
            wts = wts[: max_length - 1] + [1.0]
        mask = [1] * len(ids)
        pad_n = max_length - len(ids)
        ids += [tok.pad_token_id] * pad_n
        wts += [1.0] * pad_n
        mask += [0] * pad_n
        ids_batch.append(ids)
        mask_batch.append(mask)
        w_batch.append(wts)
    return (
        {
            "input_ids": np.asarray(ids_batch, dtype=np.int32),
            "attention_mask": np.asarray(mask_batch, dtype=np.int32),
        },
        np.asarray(w_batch, dtype=np.float32),
    )


def apply_token_weights(emb: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Scale token embeddings ``[B, S, D]`` by per-token weights
    ``[B, S]``, then restore each sample's mean activation (A1111's
    renormalization — emphasis shifts direction, not magnitude)."""
    emb = jnp.asarray(emb)
    w = jnp.asarray(weights, emb.dtype)[..., None]
    scaled = emb * w
    prev_mean = emb.mean(axis=(1, 2), keepdims=True)
    new_mean = scaled.mean(axis=(1, 2), keepdims=True)
    # guard: near-zero signed mean -> skip renorm rather than blow up
    ratio = jnp.where(
        jnp.abs(new_mean) > 1e-7, prev_mean / new_mean, jnp.ones_like(new_mean)
    )
    return scaled * ratio


def encode_weighted(pipe, texts, **kwargs):
    """Weighted counterpart of ``TextEncodingPipeline.encode`` (flat
    mode): per-encoder weighted tokenization, forward, per-bucket
    weight assembly matching ConcatTextEncoders' seq-concat layout,
    then token-weight scaling of both embedding outputs."""
    if isinstance(texts, str):
        texts = [texts]
    module = pipe.module
    tok_outs, enc_weights = [], []
    for tok in pipe.tokenizers:
        out, w = tokenize_with_weights(tok, texts)
        tok_outs.append(out)
        enc_weights.append(w)
    emb, normed, pooled, mask = pipe.forward(tok_outs)

    # final sequence = buckets ascending, feature-concat inside a
    # bucket (shared token alignment) -> take the bucket's first
    # encoder's weights, seq-concat across buckets
    buckets: dict[int, np.ndarray] = {}
    for cfg, w in zip(module.configs, enc_weights):
        buckets.setdefault(cfg.concat_bucket, w)
    w_full = np.concatenate(
        [buckets[b] for b in sorted(buckets)], axis=1
    )
    if w_full.shape[1] != emb.shape[1]:  # defensive: layout mismatch
        raise ValueError(
            f"token-weight length {w_full.shape[1]} != encoded sequence "
            f"{emb.shape[1]} — bucket layout changed?"
        )
    emb = apply_token_weights(emb, w_full)
    normed = apply_token_weights(normed, w_full)
    return emb, normed, pooled, mask
