"""Prompt emphasis: A1111 syntax parsing, weighted tokenization,
embedding scaling, end-to-end encode path."""

import numpy as np
import pytest

from uwudiff_tpu.models.prompt_weights import (
    apply_token_weights,
    parse_weighted_prompt,
    tokenize_with_weights,
)
from uwudiff_tpu.models.text_encoders import (
    ConcatTextEncoders,
    TextEncodingPipeline,
)
from uwudiff_tpu.models.tokenizers import SimpleTokenizer


def test_parse_plain():
    assert parse_weighted_prompt("a cat") == [("a cat", 1.0)]


def test_parse_emphasis_and_explicit():
    out = parse_weighted_prompt("a (red:1.5) car")
    assert out == [("a ", 1.0), ("red", 1.5), (" car", 1.0)]
    out = parse_weighted_prompt("a (red) car")
    assert out[1][0] == "red"
    np.testing.assert_allclose(out[1][1], 1.1)


def test_parse_nesting_compounds():
    out = parse_weighted_prompt("((very)) nice")
    np.testing.assert_allclose(out[0][1], 1.1 * 1.1)
    out = parse_weighted_prompt("(outer (inner:2.0) tail)")
    # inner gets 2.0 * 1.1; outer runs get 1.1
    frags = dict((t.strip(), w) for t, w in out)
    np.testing.assert_allclose(frags["inner"], 2.2)
    np.testing.assert_allclose(frags["outer"], 1.1)
    np.testing.assert_allclose(frags["tail)" if "tail)" in frags else "tail"], 1.1)


def test_parse_deemphasis_and_escapes():
    out = parse_weighted_prompt("[dark] scene")
    np.testing.assert_allclose(out[0][1], 1 / 1.1)
    out = parse_weighted_prompt(r"a \(literal\) paren")
    assert out == [("a (literal) paren", 1.0)]


def test_parse_unbalanced_is_lenient():
    # stray closers are literal; unclosed openers emphasize the tail
    assert parse_weighted_prompt("a ) b") == [("a ) b", 1.0)]
    out = parse_weighted_prompt("a (tail")
    np.testing.assert_allclose(out[-1][1], 1.1)


def test_tokenize_with_weights_alignment():
    tok = SimpleTokenizer()
    out, w = tokenize_with_weights(tok, ["a (red:2.0) car"])
    ids = out["input_ids"][0]
    assert w.shape == (1, tok.model_max_length)
    # plain tokenization of the same words gives identical ids
    plain = tok(["a red car"])["input_ids"][0]
    np.testing.assert_array_equal(ids, plain)
    # exactly one token ("red") carries weight 2.0; BOS/EOS/pad are 1.0
    assert (w[0] == 2.0).sum() == 1
    assert w[0][0] == 1.0 and w[0][-1] == 1.0
    # the weighted position is the "red" token
    red_pos = int(np.where(w[0] == 2.0)[0][0])
    red_id = tok.tokenize("red")[0]
    assert ids[red_pos] == red_id


def test_apply_token_weights_preserves_mean():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((2, 8, 4)).astype(np.float32) + 0.3
    w = np.ones((2, 8), np.float32)
    w[:, 3] = 1.7
    out = np.asarray(apply_token_weights(emb, w))
    # renormalized: per-sample mean matches the original
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), emb.mean(axis=(1, 2)), rtol=1e-5
    )
    # weight 1 everywhere is an exact no-op
    np.testing.assert_allclose(
        np.asarray(apply_token_weights(emb, np.ones((2, 8), np.float32))),
        emb,
        rtol=1e-6,
    )


def _pipe():
    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    import jax

    tok = SimpleTokenizer()
    params = te.init(
        jax.random.PRNGKey(0), [tok(["x"], padding="max_length")]
    )["params"]
    return TextEncodingPipeline(te, params, [tok])


def test_encode_weighted_end_to_end():
    pipe = _pipe()
    emb_p, normed_p, _, mask_p = pipe.encode(["a red car"])
    emb_w, normed_w, _, mask_w = pipe.encode(
        ["a (red:1.8) car"], prompt_weighting=True
    )
    assert emb_w.shape == emb_p.shape
    np.testing.assert_array_equal(np.asarray(mask_w), np.asarray(mask_p))
    # weighting changes the conditioning
    assert np.abs(np.asarray(emb_w) - np.asarray(emb_p)).max() > 1e-6
    # weight 1.0 prompt through the weighted path == plain path
    emb_1, normed_1, _, _ = pipe.encode(
        ["a red car"], prompt_weighting=True
    )
    np.testing.assert_allclose(
        np.asarray(emb_1), np.asarray(emb_p), rtol=1e-5, atol=1e-6
    )


def test_encode_weighted_sampling_entry(tmp_path):
    # through encode_cfg_inputs (what diffusion_sampling calls)
    from uwudiff_tpu.sampling.cfg import encode_cfg_inputs

    pipe = _pipe()
    enc = encode_cfg_inputs(
        ["a (red:1.5) car"], ["(ugly:1.3)"], 64, 64, pipe,
        prompt_weighting=True,
    )
    assert enc["ctx"].shape[0] == 2  # cond + uncond


def test_parse_lone_backslash_preserved():
    assert parse_weighted_prompt(r"C:\data photo") == [
        ("C:\\data photo", 1.0)
    ]


def test_tokenize_with_weights_hf_style_tokenizer():
    """HF tokenizers' .tokenize returns token STRINGS; the weighted
    path must route them through convert_tokens_to_ids."""

    class HFStyle:
        model_max_length = 16
        bos_token_id = 1
        eos_token_id = 2
        pad_token_id = 0

        def tokenize(self, text):
            return [w + "</w>" for w in text.split()]

        def convert_tokens_to_ids(self, toks):
            return [10 + len(t) for t in toks]

    out, w = tokenize_with_weights(HFStyle(), ["a (red:2.0) car"])
    ids = out["input_ids"][0]
    assert ids[0] == 1 and 2 in ids
    assert (w[0] == 2.0).sum() == 1
    # the weighted id is "red</w>" -> 10 + 7
    pos = int(np.where(w[0] == 2.0)[0][0])
    assert ids[pos] == 17
