"""CFG-enabling caption dropout: empty-prompt swap, zero fallback for
precached ctx, off-by-default identity."""

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data import DummyDataset
from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
from uwudiff_tpu.models.unet import UNet2DConditionModel
from uwudiff_tpu.training import DMTrainer


def _trainer(**kw):
    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    return DMTrainer(
        model_config={
            # default init: the zero-family init mutes cross-attention,
            # hiding conditioning swaps from the loss
            "unet": UNet2DConditionModel.from_config(
                "tiny", zero_init_stddev=-1.0
            ),
            "te": te,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        seed=0,
        **kw,
    )


def _batch(trainer, caption="a photo of a cat", bs=4):
    ds = DummyDataset(
        sample_size=(16, 16, 4), n_samples=bs, caption=caption
    )
    ds.set_tokenizers(trainer.tokenizers)
    return ds.collate([ds[i] for i in range(bs)])


def test_dropout_one_equals_empty_prompt_training():
    """p=1: every sample trains against the EMPTY prompt — the loss
    must equal training on ""-captioned data with the same rng."""
    tr_drop = _trainer(caption_dropout=1.0)
    tr_plain = _trainer()
    rng = jax.random.PRNGKey(3)
    l_drop = tr_drop.validation_step(_batch(tr_drop), rng)[0]
    l_empty = tr_plain.validation_step(
        _batch(tr_plain, caption=""), rng
    )[0]
    l_text = tr_plain.validation_step(_batch(tr_plain), rng)[0]
    np.testing.assert_allclose(float(l_drop), float(l_empty), rtol=1e-6)
    assert abs(float(l_drop) - float(l_text)) > 1e-7


def test_dropout_zero_is_identity():
    tr0 = _trainer(caption_dropout=0.0)
    tr = _trainer()
    rng = jax.random.PRNGKey(4)
    np.testing.assert_allclose(
        float(tr0.validation_step(_batch(tr0), rng)[0]),
        float(tr.validation_step(_batch(tr), rng)[0]),
        rtol=1e-7,
    )


def test_dropout_partial_mixes_rows():
    """0 < p < 1: across many rng draws both branches occur (loss
    differs from both the all-text and all-empty extremes)."""
    tr = _trainer(caption_dropout=0.5)
    batch = _batch(tr, bs=8)
    plain = _trainer()
    batch_p = _batch(plain, bs=8)
    l_text = float(plain.validation_step(batch_p, jax.random.PRNGKey(0))[0])
    vals = [
        float(tr.validation_step(batch, jax.random.PRNGKey(i))[0])
        for i in range(4)
    ]
    assert len({round(v, 9) for v in vals}) > 1  # rng actually varies
    assert any(abs(v - l_text) > 1e-7 for v in vals)


def test_dropout_precached_ctx_zero_fallback():
    """Batches carrying precached ctx (te=None) zero the dropped rows."""
    tr = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", zero_init_stddev=-1.0
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        seed=0,
        caption_dropout=1.0,
    )
    ctx_dim = tr.unet.cross_attention_dim
    lat = (
        np.random.default_rng(0)
        .standard_normal((2, 16, 16, 4))
        .astype(np.float32)
    )
    batch = {
        "latent": lat,
        "sample": lat,  # collate convention: latent batches carry both
        "ctx": np.random.default_rng(1)
        .standard_normal((2, 7, ctx_dim))
        .astype(np.float32),
        "added_cond": {"time_ids": np.zeros((2, 6), np.float32)},
        "tokenizer_outputs": [],
    }
    tr.setup(batch)
    rng = jax.random.PRNGKey(0)
    l_drop = float(tr.validation_step(batch, rng)[0])
    zeroed = dict(batch)
    zeroed["ctx"] = np.zeros_like(batch["ctx"])
    tr2 = DMTrainer(
        model_config={"unet": tr.unet, "te": None, "vae": None},
        lr=1e-3, use_warm_up=False, seed=0,
    )
    tr2.setup(zeroed)
    l_zero = float(tr2.validation_step(zeroed, rng)[0])
    np.testing.assert_allclose(l_drop, l_zero, rtol=1e-5)
