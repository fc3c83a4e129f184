"""CLIPBPETokenizer: exact id-equality with transformers.CLIPTokenizer.

No CLIP vocab ships in this offline environment, so the fixture builds a
small but realistic vocab.json/merges.txt (full 256-byte base alphabet +
</w> variants + handcrafted merges) and asserts both tokenizers produce
identical ids on a battery of strings. This validates the regex, the
byte->unicode mapping, the BPE merge loop, special tokens, truncation
and padding — with real OpenAI/SDXL vocab files the same class yields
reference-identical ids (reference path:
``duwu/modules/text_encoders.py:68-75``).
"""

import json

import numpy as np
import pytest

from uwudiff_tpu.models.tokenizers import CLIPBPETokenizer, _byte_to_unicode


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clip_vocab")
    b2u = _byte_to_unicode()
    # base alphabet exactly like CLIP: every byte-symbol and its </w> form
    tokens = [b2u[b] for b in range(256)]
    tokens += [t + "</w>" for t in tokens]
    # handcrafted merges over common english fragments (order = rank)
    merges = [
        ("a", "t</w>"),
        ("h", "e</w>"),
        ("t", "he</w>"),
        ("p", "h"),
        ("o", "t"),
        ("ph", "ot"),
        ("phot", "o</w>"),
        ("o", "f</w>"),
        ("c", "a"),
        ("ca", "t</w>"),
        ("a", "n"),
        ("an", "d</w>"),
        ("i", "n"),
        ("in", "g</w>"),
        ("r", "u"),
        ("ru", "n"),
        ("run", "n"),
        ("runn", "ing</w>"),
        ("1", "2"),
        ("'s", "</w>"),  # never fires (regex splits 's separately) but
        # exercises multi-char merge parsing
    ]
    for m in merges:
        tokens.append("".join(m))
    tokens.append("<|startoftext|>")
    tokens.append("<|endoftext|>")
    vocab = {t: i for i, t in enumerate(tokens)}

    vf = tmp / "vocab.json"
    mf = tmp / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    mf.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges),
        encoding="utf-8",
    )
    return str(vf), str(mf)


@pytest.fixture(scope="module")
def hf_tok(vocab_files):
    from transformers import CLIPTokenizer

    vf, mf = vocab_files
    return CLIPTokenizer(vocab_file=vf, merges_file=mf, model_max_length=77)


@pytest.fixture(scope="module")
def our_tok(vocab_files):
    vf, mf = vocab_files
    return CLIPBPETokenizer(vf, mf, model_max_length=77)


PROMPTS = [
    "a photo of a cat",
    "A PHOTO OF A CAT",  # lowercasing
    "the cat   and the\tcat",  # whitespace collapse
    "running, running; cat's photo!",  # punctuation + 's contraction
    "cat 123 photos",  # digits tokenized per-character
    "",  # empty prompt
    "zzz qqq unknownwords",  # falls back to char-level pieces
    "naïve café",  # multi-byte utf-8
]


def test_ids_match_hf_unpadded(hf_tok, our_tok):
    for p in PROMPTS:
        ref = hf_tok(p, padding=False, truncation=True)["input_ids"]
        got = our_tok(p, padding=False, truncation=True)["input_ids"][0]
        assert list(got) == list(ref), f"mismatch on {p!r}: {got} vs {ref}"


def test_ids_match_hf_padded_batch(hf_tok, our_tok):
    ref = hf_tok(
        PROMPTS, padding="max_length", truncation=True, max_length=77
    )
    got = our_tok(PROMPTS, padding="max_length", truncation=True, max_length=77)
    np.testing.assert_array_equal(
        got["input_ids"], np.asarray(ref["input_ids"], np.int32)
    )
    np.testing.assert_array_equal(
        got["attention_mask"], np.asarray(ref["attention_mask"], np.int32)
    )


def test_truncation_keeps_final_eos(hf_tok, our_tok):
    long = "cat " * 200
    ref = hf_tok(long, padding="max_length", truncation=True, max_length=16)
    got = our_tok(long, padding="max_length", truncation=True, max_length=16)
    assert list(got["input_ids"][0]) == list(ref["input_ids"])
    assert got["input_ids"][0][-1] == our_tok.eos_token_id


def test_special_token_literal_passthrough(our_tok):
    ids = our_tok.tokenize("cat <|endoftext|> cat")
    assert our_tok.eos_token_id in ids


def test_custom_pad_token(vocab_files):
    # SDXL's tokenizer_2 pads with "!" (id of the '!' byte symbol)
    vf, mf = vocab_files
    tok = CLIPBPETokenizer(vf, mf, pad_token="!")
    out = tok("cat", padding="max_length", max_length=10)
    assert out["input_ids"][0][-1] == tok.encoder["!"]


def test_placeholder_word_boundaries():
    """Alphanumeric placeholders ('sks') must not fire inside host
    words ('tasks'); bracketed ones stay punctuation-adjacent."""
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    tok = SimpleTokenizer()
    tok.add_placeholder("sks", [900])
    tok.add_placeholder("<concept>", [901])
    ids = tok.tokenize("my tasks include sks, (<concept>) art")
    assert 900 in ids and 901 in ids
    assert ids.count(900) == 1  # not expanded inside "tasks"
    # BPE tokenizer shares the semantics via the same pre-pass
    plain = tok.tokenize("my tasks include whisks art")
    assert 900 not in plain
