"""Aspect-ratio bucket training: ladder, assignment, loader, trainer."""

import numpy as np
import pytest
from PIL import Image

from uwudiff_tpu.data.aspect_buckets import (
    AspectBucketDataset,
    BucketBatchLoader,
    make_buckets,
    nearest_bucket,
)


@pytest.fixture(scope="module")
def image_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucket_imgs")
    rng = np.random.default_rng(0)
    sizes = [(100, 60), (96, 64), (60, 100), (64, 96), (80, 80), (80, 78)]
    paths = []
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        p = tmp / f"{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_make_buckets_ladder():
    buckets = make_buckets(base_resolution=1024, step=64, min_dim=512)
    assert (1024, 1024) not in buckets or True  # square allowed if exact
    for w, h in buckets:
        assert w * h <= 1024 * 1024
        assert w % 64 == 0 and h % 64 == 0
        assert 0.5 <= w / h <= 2.0
    # symmetric: every (w, h) has its transpose
    assert all((h, w) in buckets for (w, h) in buckets)
    assert (512, 1024) in buckets and (1024, 512) in buckets


def test_nearest_bucket_prefers_aspect():
    buckets = [(64, 64), (96, 64), (64, 96)]
    assert nearest_bucket(100, 60, buckets) == (96, 64)
    assert nearest_bucket(60, 100, buckets) == (64, 96)
    assert nearest_bucket(80, 80, buckets) == (64, 64)


def test_bucket_dataset_assignment_and_conditioning(image_paths):
    ds = AspectBucketDataset(
        image_paths, buckets=[(64, 64), (96, 64), (64, 96)]
    )
    ds.set_tokenizers([])
    assert ds.bucket_of(0) == (96, 64)  # 100x60 landscape
    assert ds.bucket_of(2) == (64, 96)  # 60x100 portrait
    assert ds.bucket_of(4) == (64, 64)  # square
    item = ds[0]
    assert item["sample"].shape == (64, 96, 3)  # (H, W, C) at bucket res
    # micro-conditioning: true original size, crop 0, bucket target
    np.testing.assert_array_equal(
        item["add_time_ids"], [60, 100, 0, 0, 64, 96]
    )


def test_bucket_batch_loader_static_shapes_and_resume(image_paths):
    ds = AspectBucketDataset(
        image_paths, buckets=[(64, 64), (96, 64), (64, 96)]
    )
    ds.set_tokenizers([])
    loader = BucketBatchLoader(ds, batch_size=2, seed=3, drop_last=False)
    batches = list(loader.epoch_iter())
    # every batch is single-bucket (one static shape)
    shapes = [b["sample"].shape for b in batches]
    for s in shapes:
        assert s[0] <= 2
    seen = sorted(set(s[1:3] for s in shapes))
    assert len(seen) >= 2  # multiple buckets represented
    total = sum(s[0] for s in shapes)
    assert total == len(ds)
    # resume mid-epoch
    loader2 = BucketBatchLoader(ds, batch_size=2, seed=3, drop_last=False)
    it = iter(loader2)
    first = next(it)
    state = loader2.state_dict()
    loader3 = BucketBatchLoader(ds, batch_size=2, seed=3, drop_last=False)
    loader3.load_state_dict(state)
    second_resumed = next(iter(loader3))
    second_direct = next(it)
    np.testing.assert_array_equal(
        second_resumed["sample"], second_direct["sample"]
    )


def test_trainer_over_multiple_buckets(image_paths):
    """One trainer, two bucket shapes: the jit cache compiles one step
    per resolution; params are shared (conv UNet is size-agnostic)."""
    import jax

    from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule
    from uwudiff_tpu.models.unet import UNet2DConditionModel
    from uwudiff_tpu.training import DMTrainer

    ds = AspectBucketDataset(
        image_paths[:4],  # two landscape + two portrait
        buckets=[(32, 16), (16, 32)],
    )
    ds.set_tokenizers([])
    loader = BucketBatchLoader(ds, batch_size=2, seed=0)
    trainer = DMTrainer(
        model_config={
            "unet": UNet2DConditionModel.from_config(
                "tiny", cross_attention_dim=None, in_channels=3, out_channels=3
            ),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        seed=0,
    )
    shapes_trained = set()
    for i, batch in enumerate(loader.epoch_iter()):
        metrics, _ = trainer.train_step(batch, rng=jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["train/loss"]))
        shapes_trained.add(batch["sample"].shape[1:3])
    assert len(shapes_trained) == 2, shapes_trained


def test_train_data_module_returns_bucket_loader(image_paths):
    from uwudiff_tpu.data import BucketBatchLoader, TrainDataModule

    dm = TrainDataModule(
        dataset_config={
            "_target_": "uwudiff_tpu.data.AspectBucketDataset",
            "image_paths": list(image_paths),
            "buckets": [[64, 64], [96, 64], [64, 96]],
        },
        dataloader_config={"batch_size": 2, "seed": 0},
    )
    dm.set_tokenizers([])
    loader = dm.train_dataloader()
    assert isinstance(loader, BucketBatchLoader)
    batch = next(iter(loader))
    assert batch["sample"].ndim == 4


def test_bucket_loader_per_host_sharding(image_paths):
    """Multi-host bucket sharding: every host emits the SAME bucket
    shape at the same step with disjoint rows (the contract
    ``trainer._put_batch_multihost`` needs to assemble a global batch
    without cross-host gathers); unsharded behavior is unchanged."""
    # 12 rows over the fixture's buckets: reuse paths to bulk up
    paths = list(image_paths) * 2
    buckets = [(64, 64), (96, 64), (64, 96)]
    ds = AspectBucketDataset(paths, buckets=buckets)
    ds.set_tokenizers([])

    def plan(loader):
        return loader._batches()

    shards = [
        BucketBatchLoader(ds, batch_size=2, seed=3, num_shards=2,
                          shard_id=k)
        for k in range(2)
    ]
    p0, p1 = plan(shards[0]), plan(shards[1])
    assert len(p0) == len(p1) and len(p0) > 0
    for b0, b1 in zip(p0, p1):
        assert len(b0) == len(b1) == 2
        # same bucket (static shape) on both hosts at this step
        assert ds.bucket_of(b0[0]) == ds.bucket_of(b1[0])
        # disjoint rows
        assert not (set(b0) & set(b1))
    # union covers at most the dataset, every index at most once/host
    flat0 = [i for b in p0 for i in b]
    assert len(flat0) == len(set(flat0))

    # resume state keeps working on a sharded loader
    it = iter(shards[0])
    first = next(it)
    state = shards[0].state_dict()
    resumed = BucketBatchLoader(ds, batch_size=2, seed=3, num_shards=2,
                                shard_id=0)
    resumed.load_state_dict(state)
    np.testing.assert_array_equal(
        next(iter(resumed))["sample"], next(it)["sample"]
    )

    # unsharded == num_shards=1 (identity)
    base = plan(BucketBatchLoader(ds, batch_size=2, seed=3))
    one = plan(BucketBatchLoader(ds, batch_size=2, seed=3, num_shards=1))
    assert base == one

    # guard rails
    with pytest.raises(ValueError):
        BucketBatchLoader(ds, batch_size=2, num_shards=2, drop_last=False)
    with pytest.raises(ValueError):
        BucketBatchLoader(ds, batch_size=2, num_shards=2, shard_id=2)


def test_train_data_module_sharded_bucket_loader(image_paths):
    """TrainDataModule routes shard_per_process to the bucket loader
    (the round-3 NotImplementedError stub is gone)."""
    from uwudiff_tpu.data.base import TrainDataModule

    dm = TrainDataModule(
        dataset_config={
            "_target_": "uwudiff_tpu.data.aspect_buckets."
            "AspectBucketDataset",
            "image_paths": list(image_paths),
            "buckets": [(64, 64), (96, 64), (64, 96)],
        },
        dataloader_config={
            "batch_size": 1, "shard_per_process": True, "seed": 0,
        },
    )
    loader = dm.train_dataloader()
    assert isinstance(loader, BucketBatchLoader)
    # single-process run: 1 shard, id 0
    assert loader.num_shards == 1 and loader.shard_id == 0
    assert len(loader) > 0
