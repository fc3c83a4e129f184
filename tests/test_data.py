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


def test_dataloader_per_host_shards_disjoint_and_covering():
    """Multi-host intent of the reference (per-node data independence,
    ``test_scripts/test_train.py:49-53``): identically-seeded loaders
    with different shard_id walk disjoint index sets covering the
    dataset."""
    ds = DummyDataset(sample_size=(8, 8, 3), n_samples=20)
    ds.set_tokenizers([])
    loaders = [
        DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                   shard_id=i, num_shards=2)
        for i in range(2)
    ]
    orders = [lo._order() for lo in loaders]
    assert len(orders[0]) == len(orders[1]) == 10
    assert set(map(int, orders[0])).isdisjoint(set(map(int, orders[1])))
    assert set(map(int, orders[0])) | set(map(int, orders[1])) == set(range(20))
    # per-shard epoch length reflects the shard, not the dataset
    assert len(loaders[0]) == 5
    # resume state works per shard
    it = iter(loaders[0])
    next(it), next(it)
    state = loaders[0].state_dict()
    fresh = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                       shard_id=0, num_shards=2)
    fresh.load_state_dict(state)
    assert next(iter(fresh))["sample"].shape[0] == 2
    assert fresh.batch_idx == 3  # advanced past the restored point


def test_train_data_module_shard_per_process_flag():
    dm = TrainDataModule(
        dataset_config=DummyDataset(sample_size=(8, 8, 3), n_samples=8),
        dataloader_config={
            "batch_size": 2,
            "shard_per_process": True,
        },
    )
    dm.set_tokenizers([])
    loader = dm.train_dataloader()
    # single-process run: auto-detected 1-of-1 shard
    assert loader.num_shards == 1 and loader.shard_id == 0
    assert len(loader) == 4


def test_put_batch_multihost_path_degenerate_single_process():
    """The make_array_from_process_local_data path (used verbatim on a
    real multi-host pod) must produce correctly-sharded global arrays;
    at process_count=1 it must equal the device_put path."""
    import jax
    import numpy as np

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

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
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes={"data": 2, "fsdp": 4},
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((8, 16, 16, 4)).astype(np.float32),
        "tokenizer_outputs": [],
    }
    trainer.setup(batch)
    via_multihost = trainer._put_batch_multihost(
        {"sample": batch["sample"]}
    )["sample"]
    via_put = trainer._put_batch({"sample": batch["sample"]})["sample"]
    assert via_multihost.shape == via_put.shape
    assert via_multihost.sharding == via_put.sharding
    np.testing.assert_array_equal(
        np.asarray(via_multihost), np.asarray(via_put)
    )


def test_local_class_image_dataset(tmp_path):
    """ImageNet-style folder-per-class: labels, captions, collate, and a
    class-conditional DiT train step."""
    from PIL import Image

    from uwudiff_tpu.data import LocalClassImageDataset

    rng = np.random.default_rng(0)
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    ds = LocalClassImageDataset(str(tmp_path), image_size=(8, 8))
    assert len(ds) == 4
    assert ds.num_classes == 2
    assert ds.idx_to_class == ["cat", "dog"]
    item = ds[0]
    assert item["class_label"] == 0
    assert item["caption"] == "cat"
    assert item["sample"].shape == (8, 8, 3)
    assert ds[3]["class_label"] == 1

    batch = ds.collate([ds[i] for i in range(4)])
    np.testing.assert_array_equal(batch["class_labels"], [0, 0, 1, 1])

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.dit import DiT
    from uwudiff_tpu.training import DMTrainer

    trainer = DMTrainer(
        model_config={
            "unet": DiT.from_config("tiny", in_channels=3, num_classes=2),
            "te": None,
            "vae": None,
        },
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes={"data": 1},
        seed=0,
    )
    metrics, _ = trainer.train_step(batch)
    assert np.isfinite(float(metrics["train/loss"]))


def test_caption_tag_augmentation(tmp_path):
    """shuffle_tags/keep_tokens/tag_dropout: first keep_tokens tags stay
    pinned, the rest shuffle/drop; determinism via caption_seed."""
    import numpy as np
    from PIL import Image

    from uwudiff_tpu.data.local import LocalTextImageDataset
    from uwudiff_tpu.data.utils import augment_caption

    # unit behavior
    rng = np.random.default_rng(0)
    cap = "1girl, solo, red hair, smile, outdoors"
    out = augment_caption(cap, rng, shuffle_tags=True, keep_tokens=2)
    tags = [t.strip() for t in out.split(",")]
    assert tags[:2] == ["1girl", "solo"]
    assert sorted(tags[2:]) == ["outdoors", "red hair", "smile"]
    # full dropout removes everything past the pinned head
    out = augment_caption(
        cap, np.random.default_rng(0), keep_tokens=1, tag_dropout=1.0
    )
    assert out == "1girl"
    # no-op when disabled
    assert augment_caption(cap, rng) == cap

    # dataset wiring (deterministic via caption_seed)
    img = Image.new("RGB", (8, 8), (255, 0, 0))
    p = tmp_path / "a.png"
    img.save(p)
    (tmp_path / "a.txt").write_text(cap)
    ds = LocalTextImageDataset(
        image_dir=str(tmp_path), image_size=(8, 8), native_decode=False,
        shuffle_tags=True, keep_tokens=1, caption_seed=123,
    )
    c1 = ds[0]["caption"]
    c2 = ds[0]["caption"]
    assert c1 == c2  # deterministic per index with a seed
    assert c1.split(",")[0].strip() == "1girl"
    assert sorted(t.strip() for t in c1.split(",")) == sorted(
        t.strip() for t in cap.split(",")
    )
