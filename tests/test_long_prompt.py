"""Long-prompt chunking: token-stream windowing, comma backtrack,
device-side chunked CLIP encode, pipeline/CFG integration, weighting
composition. No reference counterpart (UwUDiff truncates at 77)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.long_prompt import (
    chunk_token_stream,
    encode_long,
    required_chunks,
    tokenize_long,
)
from uwudiff_tpu.models.text_encoders import (
    ConcatTextEncoders,
    TextEncodingPipeline,
)
from uwudiff_tpu.models.tokenizers import SimpleTokenizer

WIN = 8  # tiny CLIP window: 6 content tokens + BOS/EOS


def _pipe(window=WIN, use_pooled=True):
    te = ConcatTextEncoders.from_config(
        [(
            {"model_type": "clip", "preset": "tiny",
             "max_position_embeddings": window},
            {"use_pooled": use_pooled, "layer_idx": -2, "need_mask": True},
        )]
    )
    tok = SimpleTokenizer(model_max_length=window)
    params = te.init(jax.random.PRNGKey(0), [tok(["x"])])["params"]
    return TextEncodingPipeline(te, params, [tok]), tok


# -- chunk_token_stream ----------------------------------------------------


def test_chunk_stream_short_is_one_chunk():
    ids = [5, 6, 7]
    out = chunk_token_stream(ids, [1.0] * 3, limit=6)
    assert out == [([5, 6, 7], [1.0, 1.0, 1.0])]


def test_chunk_stream_empty_gives_one_empty_chunk():
    assert chunk_token_stream([], [], limit=6) == [([], [])]


def test_chunk_stream_splits_at_limit():
    ids = list(range(10, 24))  # 14 tokens, limit 6 -> 6+6+2
    out = chunk_token_stream(ids, [1.0] * 14, limit=6)
    assert [len(c[0]) for c in out] == [6, 6, 2]
    assert [i for c in out for i in c[0]] == ids  # nothing lost


def test_chunk_stream_comma_backtrack():
    comma = 99
    # comma at position 3 (inside the trailing backtrack window of the
    # full 6-window) -> break AFTER the comma, remainder moves over
    ids = [10, 11, 12, comma, 14, 15, 16, 17]
    out = chunk_token_stream(ids, [1.0] * 8, limit=6, comma_id=comma,
                             backtrack=4)
    assert out[0][0] == [10, 11, 12, comma]
    assert out[1][0] == [14, 15, 16, 17]


def test_chunk_stream_comma_outside_backtrack_ignored():
    comma = 99
    ids = [comma, 11, 12, 13, 14, 15, 16]
    out = chunk_token_stream(ids, [1.0] * 7, limit=6, comma_id=comma,
                             backtrack=2)
    assert out[0][0] == [comma, 11, 12, 13, 14, 15]
    assert out[1][0] == [16]


def test_chunk_stream_weights_travel_with_tokens():
    ids = list(range(10, 18))
    wts = [float(i) for i in range(8)]
    out = chunk_token_stream(ids, wts, limit=6)
    assert out[0][1] == wts[:6] and out[1][1] == wts[6:]


# -- tokenize_long ---------------------------------------------------------


def test_tokenize_long_short_prompt_matches_plain():
    tok = SimpleTokenizer(model_max_length=WIN)
    out, w, n = tokenize_long(tok, ["a cat"])
    assert n == 1
    plain = tok(["a cat"])
    np.testing.assert_array_equal(out["input_ids"], plain["input_ids"])
    np.testing.assert_array_equal(
        out["attention_mask"], plain["attention_mask"]
    )
    assert (w == 1.0).all()


def test_tokenize_long_two_windows():
    tok = SimpleTokenizer(model_max_length=WIN)
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens > 6
    out, _, n = tokenize_long(tok, [text])
    assert n == 2
    ids = out["input_ids"][0]
    assert ids.shape == (2 * WIN,)
    # each window wrapped in BOS/EOS
    assert ids[0] == tok.bos_token_id
    assert ids[7] == tok.eos_token_id
    assert ids[WIN] == tok.bos_token_id
    raw = tok.tokenize(text)
    np.testing.assert_array_equal(ids[1:7], raw[:6])
    np.testing.assert_array_equal(ids[WIN + 1 : WIN + 5], raw[6:])
    # second window: BOS + 4 tokens + EOS + 2 pads
    mask = out["attention_mask"][0]
    assert mask[WIN : 2 * WIN].sum() == 6


def test_tokenize_long_batch_pads_with_empty_windows():
    tok = SimpleTokenizer(model_max_length=WIN)
    long_text = " ".join(f"w{i}" for i in range(10))
    out, _, n = tokenize_long(tok, ["a cat", long_text])
    assert n == 2
    ids = out["input_ids"][0]
    # short prompt's second window is an EMPTY-prompt window, not zeros
    assert ids[WIN] == tok.bos_token_id
    assert ids[WIN + 1] == tok.eos_token_id
    assert out["attention_mask"][0, WIN:].sum() == 2


def test_tokenize_long_max_chunks_truncates_and_pads():
    tok = SimpleTokenizer(model_max_length=WIN)
    long_text = " ".join(f"w{i}" for i in range(20))  # needs 4 windows
    out, _, n = tokenize_long(tok, [long_text], max_chunks=2)
    assert n == 2 and out["input_ids"].shape == (1, 2 * WIN)
    out, _, n = tokenize_long(tok, ["a cat"], max_chunks=3)
    assert n == 3 and out["input_ids"].shape == (1, 3 * WIN)


def test_required_chunks():
    pipe, _ = _pipe()
    assert required_chunks(pipe, "a cat") == 1
    assert required_chunks(pipe, " ".join(f"w{i}" for i in range(10))) == 2


# -- device-side chunked encode --------------------------------------------


def test_chunked_encode_equals_per_window_encode():
    pipe, tok = _pipe()
    text = " ".join(f"w{i}" for i in range(10))
    emb, normed, pooled, mask = pipe.encode([text], long_prompt=True)
    assert emb.shape[1] == 2 * WIN and mask.shape[1] == 2 * WIN

    # oracle: encode each window independently and seq-concat
    out, _, _ = tokenize_long(tok, [text])
    ids = out["input_ids"].reshape(2, WIN)
    msk = out["attention_mask"].reshape(2, WIN)
    embs, pools = [], []
    for k in range(2):
        e, _, p, _ = pipe.forward(
            [{"input_ids": ids[k : k + 1], "attention_mask": msk[k : k + 1]}]
        )
        embs.append(np.asarray(e))
        pools.append(np.asarray(p))
    np.testing.assert_allclose(
        np.asarray(emb), np.concatenate(embs, axis=1), rtol=1e-5, atol=1e-6
    )
    # pooled comes from the FIRST window
    np.testing.assert_allclose(
        np.asarray(pooled), pools[0], rtol=1e-5, atol=1e-6
    )


def test_long_prompt_short_input_matches_plain_encode():
    pipe, _ = _pipe()
    e_plain, n_plain, p_plain, m_plain = pipe.encode(["a cat"])
    e_long, n_long, p_long, m_long = pipe.encode(["a cat"], long_prompt=True)
    np.testing.assert_allclose(
        np.asarray(e_long), np.asarray(e_plain), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_long), np.asarray(p_plain), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(m_long), np.asarray(m_plain))


def test_bad_seq_multiple_raises():
    pipe, tok = _pipe()
    ids = np.ones((1, WIN + 3), np.int32)
    mask = np.ones((1, WIN + 3), np.int32)
    with pytest.raises(ValueError, match="not a multiple"):
        pipe.forward([{"input_ids": ids, "attention_mask": mask}])


def test_long_prompt_with_weighting():
    pipe, _ = _pipe()
    words = " ".join(f"w{i}" for i in range(9))
    plain = f"{words} red"
    weighted = f"{words} (red:2.0)"
    e_plain, *_ = pipe.encode([plain], long_prompt=True)
    e_w, *_ = pipe.encode(
        [weighted], long_prompt=True, prompt_weighting=True
    )
    assert e_w.shape == e_plain.shape
    assert np.abs(np.asarray(e_w) - np.asarray(e_plain)).max() > 1e-6
    # weight-1 through the weighted path is identical
    e_1, *_ = pipe.encode([plain], long_prompt=True, prompt_weighting=True)
    np.testing.assert_allclose(
        np.asarray(e_1), np.asarray(e_plain), rtol=1e-5, atol=1e-6
    )


# -- multi-encoder stacks ---------------------------------------------------


def test_sdxl_style_stack_common_window_count():
    """Two windowed CLIPs (feature-concat bucket) + T5 (own bucket):
    the CLIPs must chunk to ONE common n; T5 keeps a single window."""
    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny",
                 "max_position_embeddings": WIN},
                {"use_pooled": False, "layer_idx": -2},
            ),
            (
                {"model_type": "clip", "preset": "tiny", "hidden_size": 48,
                 "num_heads": 2, "intermediate_size": 96,
                 "max_position_embeddings": WIN},
                {"use_pooled": True, "layer_idx": -2},
            ),
            (
                {"model_type": "t5", "preset": "tiny", "d_model": 16},
                {"concat_bucket": 1, "need_mask": True},
            ),
        ],
        zero_for_padding=False,
    )
    toks = [
        SimpleTokenizer(model_max_length=WIN),
        SimpleTokenizer(model_max_length=WIN),
        SimpleTokenizer(model_max_length=6),
    ]
    dummy = [t(["x"]) for t in toks]
    params = te.init(jax.random.PRNGKey(0), dummy)["params"]
    pipe = TextEncodingPipeline(te, params, toks)
    text = " ".join(f"w{i}" for i in range(10))  # 2 CLIP windows
    emb, normed, pooled, mask = pipe.encode([text], long_prompt=True)
    # bucket 0 seq = 2*WIN, bucket 1 (T5) seq = 6
    assert emb.shape == (1, 2 * WIN + 6, 80)
    assert pooled.shape == (1, 48)
    assert mask.shape == (1, 2 * WIN + 6)


def test_encode_cfg_inputs_long_prompt_aligns_cond_uncond():
    from uwudiff_tpu.sampling.cfg import encode_cfg_inputs

    pipe, _ = _pipe()
    long_text = " ".join(f"w{i}" for i in range(10))
    enc = encode_cfg_inputs(
        [long_text], [""], 64, 64, pipe, long_prompt=True
    )
    # cond needs 2 windows -> uncond padded to 2 EMPTY windows, one shape
    assert enc["ctx"].shape == (2, 2 * WIN, enc["ctx"].shape[-1])


def test_serving_pipeline_long_prompt_end_to_end():
    """Zero-retrace serving with long_prompt=True: a prompt beyond the
    CLIP window produces a [2*win]-token context and still samples;
    short prompts keep the single-window signature."""
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.serving import Txt2ImgPipeline
    from uwudiff_tpu.training import DMTrainer

    te = ConcatTextEncoders.from_config(
        [(
            {"model_type": "clip", "preset": "tiny",
             "max_position_embeddings": WIN},
            {"use_pooled": False, "layer_idx": -2},
        )]
    )
    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": te,
            "vae": None,
        },
        lr=1e-4,
        use_warm_up=False,
        seed=0,
    )
    trainer.tokenizers = [SimpleTokenizer(model_max_length=WIN)]
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
        * 0.1,
        "captions": ["a", "b"],
        "tokenizer_outputs": [
            trainer.tokenizers[0](["a", "b"], padding=True, truncation=True)
        ],
    }
    trainer.train_step(batch)
    pipe = Txt2ImgPipeline.from_trainer(trainer)
    long_text = " ".join(f"w{i}" for i in range(10))
    lat = pipe(
        prompt=long_text, num_steps=2, num_samples=1, width=32, height=32,
        seed=0, return_latents=True, long_prompt=True,
    )
    assert lat.shape == (1, 4, 4, 4)
    assert np.isfinite(np.asarray(lat)).all()
    # short prompt through the same pipeline still works (n=1 signature)
    lat2 = pipe(
        prompt="a cat", num_steps=2, num_samples=1, width=32, height=32,
        seed=0, return_latents=True, long_prompt=True,
    )
    assert lat2.shape == (1, 4, 4, 4)


# ---- train-time long prompts (dataset-side windows) -----------------


def test_dataset_long_prompt_chunks_shapes():
    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    tok = SimpleTokenizer(model_max_length=16)
    ds = DummyDataset(
        sample_size=(8, 8, 4), n_samples=4, tokenizers=[tok],
        caption="word " * 40, long_prompt_chunks=3,
    )
    item = ds[0]
    assert item["tokenizer_out"][0]["input_ids"].shape == (1, 3 * 16)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["tokenizer_outputs"][0]["input_ids"].shape == (2, 48)
    assert batch["tokenizer_outputs"][0]["attention_mask"].shape == (2, 48)


def test_trainer_long_prompt_first_window_consistency():
    """Window 0 of a long-prompt encode equals the single-window encode
    of the same (short) caption — CLIP windows encode independently."""
    import jax

    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    def build(chunks):
        te = ConcatTextEncoders.from_config(
            [({"model_type": "clip", "preset": "tiny"},
              {"use_pooled": False, "layer_idx": -2})]
        )
        trainer = DMTrainer(
            model_config={
                "unet": UNet2DConditionModel.from_config("tiny"),
                "te": te,
                "vae": None,
            },
            lr=1e-4, use_warm_up=False, seed=0,
        )
        ds = DummyDataset(
            sample_size=(16, 16, 4), n_samples=2,
            caption="a short caption", long_prompt_chunks=chunks,
        )
        ds.set_tokenizers(trainer.tokenizers)
        batch = ds.collate([ds[0], ds[1]])
        trainer.setup(batch)
        return trainer, batch

    t2, b2 = build(2)
    L = t2.tokenizers[0].model_max_length
    assert b2["tokenizer_outputs"][0]["input_ids"].shape[1] == 2 * L

    ctx2, _, _, _ = t2.te.apply(
        {"params": t2.frozen["te"]}, b2["tokenizer_outputs"]
    )[0], None, None, None
    t1, b1 = build(None)
    ctx1 = t1.te.apply(
        {"params": t1.frozen["te"]}, b1["tokenizer_outputs"]
    )[0]
    # same init seed -> same TE params; window 0 must match exactly
    np.testing.assert_allclose(
        np.asarray(ctx2[:, :ctx1.shape[1]]), np.asarray(ctx1),
        atol=1e-5,
    )

    # the full train step runs with the windowed batch (static shape)
    metrics, _ = t2.train_step(b2)
    assert np.isfinite(float(metrics["train/loss"]))


def test_trainer_long_prompt_caption_dropout_tiles_empty():
    """caption_dropout=1 with long-prompt batches must actually drop:
    the tiled empty encoding matches training on ""-captioned data."""
    import jax

    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    def build(caption, dropout):
        te = ConcatTextEncoders.from_config(
            [({"model_type": "clip", "preset": "tiny"},
              {"use_pooled": False, "layer_idx": -2})]
        )
        trainer = DMTrainer(
            model_config={
                "unet": UNet2DConditionModel.from_config(
                    "tiny", zero_init_stddev=-1.0
                ),
                "te": te,
                "vae": None,
            },
            lr=1e-4, use_warm_up=False, seed=0,
            caption_dropout=dropout,
        )
        ds = DummyDataset(
            sample_size=(16, 16, 4), n_samples=2,
            caption=caption, long_prompt_chunks=2,
        )
        ds.set_tokenizers(trainer.tokenizers)
        return trainer, ds.collate([ds[0], ds[1]])

    t_drop, b_drop = build("a long caption with many words", 1.0)
    l_drop = float(t_drop.train_step(b_drop)[0]["train/loss"])
    t_empty, b_empty = build("", 0.0)
    l_empty = float(t_empty.train_step(b_empty)[0]["train/loss"])
    np.testing.assert_allclose(l_drop, l_empty, rtol=1e-4)
