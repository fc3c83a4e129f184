"""Tiled VAE encode/decode: normalized overlap-add windowing, batch-
folded tile decode, single-tile passthrough, serving hook. No reference
counterpart (community memory staple for large resolutions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKL.from_config("tiny")  # downscale 2
    rng = jax.random.PRNGKey(0)
    params = vae.init(
        {"params": rng}, jnp.zeros((1, 16, 16, 3)), rng
    )["params"]
    return vae, params


def test_single_tile_is_exact_passthrough(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    full = vae.apply({"params": params}, z, method=vae.decode)
    tiled = vae.apply(
        {"params": params}, z, tile=16, method=vae.decode_tiled
    )
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=0)


def test_tiled_decode_shape_and_interior(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 24, 4)) * 0.3
    full = np.asarray(vae.apply({"params": params}, z, method=vae.decode))
    tiled = np.asarray(
        vae.apply(
            {"params": params}, z, tile=16, overlap=8,
            method=vae.decode_tiled,
        )
    )
    assert tiled.shape == full.shape == (1, 48, 48, 3)
    assert np.isfinite(tiled).all()
    # seams are approximate (conv halos, per-tile GN stats) but the
    # output must stay in the same range and correlate strongly
    c = np.corrcoef(tiled.reshape(-1), full.reshape(-1))[0, 1]
    assert c > 0.98, c


def test_overlap_add_constant_field_is_exact():
    """Wherever tiles agree the normalized windowed blend is EXACT —
    a constant field reassembles exactly constant (the window and its
    normalization cancel, including at borders covered by one tile)."""
    from uwudiff_tpu.models.vae import overlap_add

    positions = [(i, j) for i in (0, 8, 16) for j in (0, 8, 16)]
    tiles = jnp.full((len(positions) * 2, 16, 16, 3), 0.7)
    out = np.asarray(overlap_add(tiles, 2, positions, (32, 32), 8))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_overlap_add_blends_disagreeing_tiles():
    """Two horizontally overlapping tiles with different values: the
    overlap region interpolates monotonically between them; regions
    covered by one tile keep its exact value."""
    from uwudiff_tpu.models.vae import overlap_add

    t = jnp.concatenate(
        [jnp.zeros((1, 8, 16, 1)), jnp.ones((1, 8, 16, 1))], axis=0
    )
    out = np.asarray(overlap_add(t, 1, [(0, 0), (0, 8)], (8, 24), 8))[0, 0, :, 0]
    np.testing.assert_allclose(out[:8], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[16:], 1.0, atol=1e-6)
    mid = out[8:16]
    assert (np.diff(mid) >= -1e-6).all()  # monotone 0 -> 1 ramp
    assert 0.0 < mid[3] < 1.0


def test_tiled_encode_matches_full_where_supported(vae_and_params):
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 48, 48, 3)) * 0.2
    full = vae.apply({"params": params}, x, method=vae.encode)
    tiled = vae.apply(
        {"params": params}, x, tile=32, overlap=16,
        method=vae.encode_tiled,
    )
    assert tiled.mean.shape == full.mean.shape == (1, 24, 24, 4)
    c = np.corrcoef(
        np.asarray(tiled.mean).reshape(-1),
        np.asarray(full.mean).reshape(-1),
    )[0, 1]
    assert c > 0.98, c
    # passthrough when the image fits one tile
    small = vae.apply(
        {"params": params}, x, tile=64, method=vae.encode_tiled
    )
    np.testing.assert_allclose(
        np.asarray(small.mean), np.asarray(full.mean), atol=0
    )


def test_tiled_decode_under_jit(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 24, 24, 4)) * 0.3

    @jax.jit
    def run(z):
        return vae.apply(
            {"params": params}, z, tile=16, overlap=8,
            method=vae.decode_tiled,
        )

    eager = vae.apply(
        {"params": params}, z, tile=16, overlap=8, method=vae.decode_tiled
    )
    np.testing.assert_allclose(
        np.asarray(run(z)), np.asarray(eager), atol=1e-5
    )


def test_serving_vae_tiling_hook():
    """from_trainer(vae_tiling=...) routes decode through the tiled
    path (shape-identical output on a big latent)."""
    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.serving import Txt2ImgPipeline
    from uwudiff_tpu.training import DMTrainer

    te = ConcatTextEncoders.from_config(
        [({"model_type": "clip", "preset": "tiny"},
          {"use_pooled": False, "layer_idx": -2})]
    )
    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config("tiny"),
            "te": te,
            "vae": AutoencoderKL.from_config("tiny"),
        },
        lr=1e-4,
        use_warm_up=False,
        seed=0,
    )
    ds = DummyDataset(sample_size=(32, 32, 3), n_samples=4)
    ds.set_tokenizers(trainer.tokenizers)
    trainer.train_step(ds.collate([ds[0], ds[1]]))
    pipe = Txt2ImgPipeline.from_trainer(trainer, vae_tiling=16)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 24, 4)) * 0.3
    out = pipe.vae_decode(z)
    assert out.shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(out)).all()
