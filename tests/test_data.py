import numpy as np
import pytest

from uwudiff_tpu.data import DataLoader, DummyDataset, TrainDataModule
from uwudiff_tpu.models.tokenizers import SimpleTokenizer


def test_dummy_dataset_and_collate():
    ds = DummyDataset(sample_size=(16, 16, 4), n_samples=6)
    ds.set_tokenizers([SimpleTokenizer(model_max_length=8)])
    batch = ds.collate([ds[i] for i in range(3)])
    assert batch["sample"].shape == (3, 16, 16, 4)
    assert batch["added_cond"]["time_ids"].shape == (3, 6)
    assert batch["tokenizer_outputs"][0]["input_ids"].shape == (3, 8)
    assert batch["captions"] == ["DUMMY TEST"] * 3


def test_dataloader_deterministic_and_resumable():
    ds = DummyDataset(sample_size=(4, 4, 1), n_samples=10)
    dl1 = DataLoader(ds, batch_size=2, seed=7)
    it = iter(dl1)
    batches = [next(it)["sample"] for _ in range(3)]
    state = dl1.state_dict()
    next_batch = next(it)["sample"]

    dl2 = DataLoader(ds, batch_size=2, seed=7)
    dl2.load_state_dict(state)
    resumed = next(iter(dl2))["sample"]
    np.testing.assert_array_equal(next_batch, resumed)


def test_dataloader_epoch_reshuffles():
    ds = DummyDataset(sample_size=(2, 2, 1), n_samples=8)
    dl = DataLoader(ds, batch_size=8, seed=0)
    it = iter(dl)
    e0 = next(it)["sample"]
    e1 = next(it)["sample"]
    assert not np.array_equal(e0, e1)
    # same content, different order
    np.testing.assert_allclose(
        np.sort(e0.reshape(8, -1), axis=0), np.sort(e1.reshape(8, -1), axis=0)
    )


def test_local_text_image_dataset(tmp_path):
    from PIL import Image

    from uwudiff_tpu.data.local import LocalTextImageDataset

    for i in range(3):
        Image.new("RGB", (20, 30), color=(i * 10, 0, 0)).save(
            tmp_path / f"img_{i}.png"
        )
        (tmp_path / f"img_{i}.txt").write_text(f"caption {i}")
    ds = LocalTextImageDataset(
        image_dir=str(tmp_path),
        image_size=(16, 16),
        tokenizers=[SimpleTokenizer(model_max_length=8)],
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["sample"].shape == (16, 16, 3)
    assert item["caption"].startswith("caption")
    assert item["sample"].min() >= -1.0 and item["sample"].max() <= 1.0


def test_latent_cache_roundtrip(tmp_path):
    import jax

    from uwudiff_tpu.data.latent_cache import CachedLatentDataset, cache_latents
    from uwudiff_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    params = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)["params"]

    ds = DummyDataset(sample_size=(16, 16, 3), n_samples=5)
    n_shards = cache_latents(
        ds, vae, params, str(tmp_path / "cache"), batch_size=2
    )
    assert n_shards == 3
    cached = CachedLatentDataset(str(tmp_path / "cache"))
    assert len(cached) == 5
    item = cached[0]
    assert item["latent"].shape == (8, 8, 4)
    batch = cached.collate([cached[i] for i in range(2)])
    assert batch["latent"].shape == (2, 8, 8, 4)
    assert "sample" in batch  # trainer setup shape probe


def test_cached_latent_training(tmp_path):
    """End-to-end: cache latents then train on them (encoder-free step)."""
    import jax
    import jax.numpy as jnp

    from uwudiff_tpu.data.latent_cache import CachedLatentDataset, cache_latents
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.models.vae import AutoencoderKL
    from uwudiff_tpu.training import DMTrainer

    vae = AutoencoderKL.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)["params"]
    ds = DummyDataset(sample_size=(16, 16, 3), n_samples=4)
    cache_latents(ds, vae, params, str(tmp_path / "c"), batch_size=4)

    cached = CachedLatentDataset(str(tmp_path / "c"))
    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        seed=0,
    )
    batch = cached.collate([cached[i] for i in range(4)])
    metrics, _ = trainer.train_step(batch)
    assert np.isfinite(metrics["train/loss"])
