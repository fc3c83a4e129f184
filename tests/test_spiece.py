"""Self-contained T5 tokenizer vs the HF fast-tokenizer oracle.

Mirrors the CLIP BPE strategy (tests/test_tokenizers.py): build a
synthetic unigram SentencePiece model, load it both ways, and assert
id-for-id equality with ``transformers.T5TokenizerFast`` across
strings that exercise Viterbi ambiguity, metaspace escaping, unknown
fusing, sentinel splitting, and padding/truncation.
"""

import json

import numpy as np
import pytest

from uwudiff_tpu.models.spiece import (
    T5SPTokenizer,
    parse_sentencepiece_model,
    serialize_sentencepiece_model,
)

_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED = 1, 2, 3, 4

# (piece, score, type) in id order — scores chosen so some words favor
# one long piece and others favor multi-piece splits
_PIECES = [
    ("<pad>", 0.0, _CONTROL),
    ("</s>", 0.0, _CONTROL),
    ("<unk>", 0.0, _UNKNOWN),
    ("▁", -2.0, _NORMAL),
    ("▁the", -1.0, _NORMAL),
    ("the", -1.5, _NORMAL),
    ("▁quick", -1.2, _NORMAL),
    ("qu", -2.1, _NORMAL),
    ("ick", -1.9, _NORMAL),
    ("▁fox", -1.3, _NORMAL),
    ("f", -3.0, _NORMAL),
    ("o", -3.0, _NORMAL),
    ("x", -3.0, _NORMAL),
    ("ab", -1.0, _NORMAL),
    ("abc", -2.7, _NORMAL),
    ("bc", -1.1, _NORMAL),
    ("a", -2.0, _NORMAL),
    ("b", -2.0, _NORMAL),
    ("c", -2.0, _NORMAL),
    ("▁a", -1.8, _NORMAL),
    ("t", -3.0, _NORMAL),
    ("h", -3.0, _NORMAL),
    ("e", -3.0, _NORMAL),
    ("i", -3.0, _NORMAL),
    ("s", -3.0, _NORMAL),
    ("▁is", -1.4, _NORMAL),
    ("<extra_id_0>", 0.0, _USER_DEFINED),
    ("<extra_id_1>", 0.0, _USER_DEFINED),
]

_TEXTS = [
    "the quick fox",
    "abc",  # single-piece beats ab+c / a+bc at these scores
    "ab c abc bc",
    "thequickfox",  # no-space segmentation
    "  the   quick  fox ",  # extra-whitespace collapse
    "the\tquick\nfox",
    "the 🦊 fox",  # unknown char
    "🦊🦊 abc 🦊",  # consecutive unknowns fuse
    "the <extra_id_0> fox <extra_id_1>",
    "abc<extra_id_0>abc",  # sentinel mid-word
    "",
    "x" * 40,  # truncation
]


def _write_tokenizer_json(tmp_path):
    spec = {
        "version": "1.0",
        "added_tokens": [
            {
                "id": i,
                "content": p,
                "single_word": False,
                "lstrip": False,
                "rstrip": False,
                "normalized": False,
                "special": t == _CONTROL or t == _UNKNOWN,
            }
            for i, (p, _, t) in enumerate(_PIECES)
            if t in (_CONTROL, _UNKNOWN, _USER_DEFINED)
        ],
        "normalizer": {
            "type": "Sequence",
            "normalizers": [
                # nmt_nfkc maps control chars to space before NFKC —
                # the real T5 model encodes this in its precompiled
                # charsmap; spelled out here so the synthetic oracle
                # matches real-T5 behavior
                {
                    "type": "Replace",
                    "pattern": {"Regex": "[\\t\\n\\r\\f\\v]"},
                    "content": " ",
                },
                {"type": "NFKC"},
                {
                    "type": "Replace",
                    "pattern": {"Regex": " {2,}"},
                    "content": " ",
                },
            ],
        },
        "pre_tokenizer": {
            "type": "Metaspace",
            "replacement": "▁",
            "prepend_scheme": "first",
            "split": True,
        },
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "</s>", "type_id": 0}},
            ],
            "pair": [
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "</s>", "type_id": 0}},
                {"Sequence": {"id": "B", "type_id": 0}},
                {"SpecialToken": {"id": "</s>", "type_id": 0}},
            ],
            "special_tokens": {
                "</s>": {"id": "</s>", "ids": [1], "tokens": ["</s>"]}
            },
        },
        "decoder": {
            "type": "Metaspace",
            "replacement": "▁",
            "prepend_scheme": "first",
            "split": True,
        },
        "model": {
            "type": "Unigram",
            "unk_id": 2,
            "vocab": [[p, s] for p, s, _ in _PIECES],
        },
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(spec))
    return str(path)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    from transformers import T5TokenizerFast

    tmp_path = tmp_path_factory.mktemp("spiece")
    json_path = _write_tokenizer_json(tmp_path)
    tok = T5TokenizerFast(
        tokenizer_file=json_path,
        eos_token="</s>",
        unk_token="<unk>",
        pad_token="<pad>",
        extra_ids=0,
        model_max_length=16,
    )
    return json_path, tok


def test_protobuf_roundtrip():
    blob = serialize_sentencepiece_model(_PIECES)
    assert parse_sentencepiece_model(blob) == [
        (p, pytest.approx(s), t) for p, s, t in _PIECES
    ]


@pytest.mark.parametrize("fmt", ["json", "model"])
def test_ids_match_hf(oracle, fmt, tmp_path):
    json_path, hf = oracle
    if fmt == "json":
        mine = T5SPTokenizer(json_path, model_max_length=16)
    else:
        model_path = tmp_path / "spiece.model"
        model_path.write_bytes(serialize_sentencepiece_model(_PIECES))
        mine = T5SPTokenizer(str(model_path), model_max_length=16)

    for text in _TEXTS:
        ref = hf(
            [text],
            padding="max_length",
            truncation=True,
            max_length=16,
            return_tensors="np",
        )
        got = mine([text], padding="max_length", truncation=True)
        assert got["input_ids"].tolist() == ref["input_ids"].tolist(), (
            f"ids differ for {text!r}: "
            f"{got['input_ids'].tolist()} vs {ref['input_ids'].tolist()}"
        )
        assert (
            got["attention_mask"].tolist()
            == ref["attention_mask"].tolist()
        ), f"mask differs for {text!r}"


def test_batch_and_directory_load(oracle, tmp_path):
    json_path, hf = oracle
    (tmp_path / "spiece.model").write_bytes(
        serialize_sentencepiece_model(_PIECES)
    )
    mine = T5SPTokenizer(str(tmp_path), model_max_length=16)
    texts = ["the quick fox", "abc", ""]
    ref = hf(
        texts,
        padding="max_length",
        truncation=True,
        max_length=16,
        return_tensors="np",
    )
    got = mine(texts, padding="max_length", truncation=True)
    np.testing.assert_array_equal(got["input_ids"], ref["input_ids"])
    np.testing.assert_array_equal(
        got["attention_mask"], ref["attention_mask"]
    )


def test_padding_longest_matches_hf(oracle, tmp_path):
    """padding=True/'longest' pads to the batch longest, not max_length
    (HF semantics)."""
    json_path, hf = oracle
    (tmp_path / "spiece.model").write_bytes(
        serialize_sentencepiece_model(_PIECES)
    )
    mine = T5SPTokenizer(str(tmp_path), model_max_length=16)
    texts = ["the quick fox", "abc"]
    ref = hf(texts, padding=True, truncation=True, return_tensors="np")
    got = mine(texts, padding=True, truncation=True)
    np.testing.assert_array_equal(got["input_ids"], ref["input_ids"])
    np.testing.assert_array_equal(
        got["attention_mask"], ref["attention_mask"]
    )
    assert got["input_ids"].shape[1] < 16  # genuinely batch-longest
