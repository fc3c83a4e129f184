"""Text-tower import: behavioral equivalence with HF transformers.

The conditioning path's strongest numerics anchor: randomly-initialized
tiny HF ``CLIPTextModelWithProjection`` / ``T5EncoderModel`` towers are
imported through the key maps and every convention the reference gets
for free from transformers (``duwu/modules/text_encoders.py:167-186``)
is asserted to match: per-layer hidden states (``layer_idx`` indexing),
EOS pooling, final-LN re-application (``normed_embedding``), projection,
and padding-mask handling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from uwudiff_tpu.models.clip import CLIPTextModel
from uwudiff_tpu.models.t5 import T5EncoderModel
from uwudiff_tpu.models.import_torch import (
    clip_text_key_map,
    import_params,
    t5_key_map,
)

VOCAB = 1024


def _token_batch(rng, batch=2, seq=12, eos_id=None):
    """[B, L] int ids: tokens, one EOS, then padding that repeats the EOS id
    (the SD tokenizer convention) so first-vs-last EOS pooling differs."""
    n_real = [seq - 5, seq - 2]
    ids = rng.integers(1, VOCAB - 1, size=(batch, seq))
    mask = np.zeros((batch, seq), dtype=np.int64)
    eos = (VOCAB - 1) if eos_id is None else eos_id
    for b, n in enumerate(n_real):
        ids[b, n] = eos
        ids[b, n + 1:] = eos  # pad with eos id
        mask[b, : n + 1] = 1
    return ids.astype(np.int64), mask


def _import_clip(hf, ours, ids):
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return import_params(params, sd, clip_text_key_map, strict=True)


def _tiny_hf_clip(eos_token_id):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=77,
        projection_dim=16,
        hidden_act="quick_gelu",
        eos_token_id=eos_token_id,
        bos_token_id=0,
        pad_token_id=None,
    )
    torch.manual_seed(0)
    return CLIPTextModelWithProjection(cfg).eval()


def test_clip_text_matches_hf_transformers():
    """eos_token_id=2 in HF triggers the legacy argmax(input_ids) pooling —
    matching our ``eos_token_id=None`` (highest-id-is-EOS, CLIP-L) path."""
    hf = _tiny_hf_clip(eos_token_id=2)
    ours = CLIPTextModel.from_config("tiny", projection_dim=16)
    ids, mask = _token_batch(np.random.default_rng(0))

    params = _import_clip(hf, ours, ids)
    got = ours.apply({"params": params}, jnp.asarray(ids), layer_idx=-2)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), output_hidden_states=True
        )

    # hidden_states at every index (embeddings + each layer, pre-final-LN)
    assert len(got.hidden_states) == len(ref.hidden_states)
    for i, (g, r) in enumerate(zip(got.hidden_states, ref.hidden_states)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy(), atol=1e-5, rtol=1e-4, err_msg=f"layer {i}"
        )
    np.testing.assert_allclose(
        np.asarray(got.last_hidden_state),
        ref.last_hidden_state.numpy(),
        atol=1e-5, rtol=1e-4,
    )
    # embedding = hidden_states[-2], the SDXL layer_idx convention
    np.testing.assert_allclose(
        np.asarray(got.embedding), ref.hidden_states[-2].numpy(), atol=1e-5,
        rtol=1e-4,
    )
    # normed_embedding: final LN re-applied to the selected hidden state
    with torch.no_grad():
        normed_ref = hf.text_model.final_layer_norm(ref.hidden_states[-2])
    np.testing.assert_allclose(
        np.asarray(got.normed_embedding), normed_ref.numpy(), atol=1e-5,
        rtol=1e-4,
    )
    # EOS pooling + projection
    with torch.no_grad():
        pooled_ref = hf.text_model(
            input_ids=torch.from_numpy(ids)
        ).pooler_output
    np.testing.assert_allclose(
        np.asarray(got.pooler_output), pooled_ref.numpy(), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.text_embeds), ref.text_embeds.numpy(), atol=1e-5,
        rtol=1e-4,
    )


def test_clip_text_explicit_eos_first_occurrence():
    """With an explicit (non-2) eos id, HF pools at the FIRST occurrence —
    pad positions repeat the eos id, so last-occurrence pooling would
    silently pick a pad slot. Regression test for the r2->r3 fix."""
    eos_id = 7  # NOT the highest id and not 2 -> HF first-occurrence path
    hf = _tiny_hf_clip(eos_token_id=eos_id)
    ours = CLIPTextModel.from_config(
        "tiny", projection_dim=16, eos_token_id=eos_id
    )
    ids, mask = _token_batch(np.random.default_rng(1), eos_id=eos_id)

    params = _import_clip(hf, ours, ids)
    got = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids))
    np.testing.assert_allclose(
        np.asarray(got.text_embeds), ref.text_embeds.numpy(), atol=1e-5,
        rtol=1e-4,
    )


def test_clip_text_attention_mask_matches_hf():
    hf = _tiny_hf_clip(eos_token_id=2)
    ours = CLIPTextModel.from_config("tiny", projection_dim=16)
    ids, mask = _token_batch(np.random.default_rng(2))

    params = _import_clip(hf, ours, ids)
    got = ours.apply(
        {"params": params}, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        )
    np.testing.assert_allclose(
        np.asarray(got.last_hidden_state),
        ref.last_hidden_state.numpy(),
        atol=1e-5, rtol=1e-4,
    )
    # masking must actually change the result (guard against a no-op mask)
    got_nomask = ours.apply({"params": params}, jnp.asarray(ids))
    assert not np.allclose(
        np.asarray(got.last_hidden_state),
        np.asarray(got_nomask.last_hidden_state),
        atol=1e-5,
    )


def _tiny_hf_t5():
    from transformers import T5Config, T5EncoderModel as HFT5EncoderModel

    cfg = T5Config(
        vocab_size=VOCAB,
        d_model=32,
        num_layers=2,
        num_heads=2,
        d_kv=16,
        d_ff=64,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    return HFT5EncoderModel(cfg).eval()


def test_t5_encoder_matches_hf_transformers():
    hf = _tiny_hf_t5()
    ours = T5EncoderModel.from_config("tiny")
    ids, mask = _token_batch(np.random.default_rng(3), seq=20)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = import_params(params, sd, t5_key_map, strict=True)

    got = ours.apply(
        {"params": params}, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    np.testing.assert_allclose(
        np.asarray(got.last_hidden_state),
        ref.last_hidden_state.numpy(),
        atol=1e-5, rtol=1e-4,
    )
    # HF tuple: (emb, block1, ..., block_{N-1}, final_ln(block_N));
    # ours additionally keeps the pre-LN block_N output.
    for i in range(len(ref.hidden_states) - 1):
        np.testing.assert_allclose(
            np.asarray(got.hidden_states[i]),
            ref.hidden_states[i].numpy(),
            atol=1e-5, rtol=1e-4, err_msg=f"hidden state {i}",
        )
    np.testing.assert_allclose(
        np.asarray(got.hidden_states[-1]),
        ref.hidden_states[-1].numpy(),
        atol=1e-5, rtol=1e-4,
    )


def test_t5_encoder_no_mask_matches_hf():
    hf = _tiny_hf_t5()
    ours = T5EncoderModel.from_config("tiny")
    ids = np.random.default_rng(4).integers(1, VOCAB - 1, size=(2, 9))

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = import_params(params, sd, t5_key_map, strict=True)

    got = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids))
    np.testing.assert_allclose(
        np.asarray(got.last_hidden_state),
        ref.last_hidden_state.numpy(),
        atol=1e-5, rtol=1e-4,
    )
