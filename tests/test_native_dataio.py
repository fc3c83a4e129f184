"""Native shard-reader correctness vs numpy's own npz loading."""

import numpy as np
import pytest

pytest.importorskip("ctypes")


def _make_shards(tmp_path, n_shards=3, rows=5):
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for s in range(n_shards):
        latent = rng.standard_normal((rows, 4, 4, 2)).astype(np.float32)
        ctx = rng.standard_normal((rows, 3, 8)).astype(np.float32)
        p = tmp_path / f"shard_{s}.npz"
        np.savez(p, latent=latent, ctx=ctx)
        paths.append(str(p))
        arrays.append({"latent": latent, "ctx": ctx})
    return paths, arrays


def test_native_read_matches_numpy(tmp_path):
    from uwudiff_tpu.data.native import NativeShardReader

    paths, arrays = _make_shards(tmp_path)
    reader = NativeShardReader(paths)
    for s in range(3):
        for name in ("latent", "ctx"):
            got = reader.read(s, name)
            np.testing.assert_array_equal(got, arrays[s][name])
    shape, itemsize = reader.array_info(0, "latent")
    assert shape == (5, 4, 4, 2) and itemsize == 4
    with pytest.raises(KeyError):
        reader.array_info(0, "nope")
    reader.close()


def test_native_batch_loader(tmp_path):
    from uwudiff_tpu.data.native import NativeBatchLoader, NativeShardReader

    paths, arrays = _make_shards(tmp_path)
    reader = NativeShardReader(paths)
    # interleaved order across shards
    order = [(s, r) for r in range(5) for s in range(3)]
    loader = NativeBatchLoader(reader, "latent", order, batch_size=4,
                               n_threads=2)
    got_batches = list(loader)
    assert len(got_batches) == len(order) // 4
    flat = np.concatenate(got_batches)
    want = np.stack([arrays[s]["latent"][r] for s, r in order[: len(flat)]])
    np.testing.assert_array_equal(flat, want)
    loader.stop()
    reader.close()


def test_native_batch_loader_stress(tmp_path):
    """Many batches through a small ring with 3 threads — ordering must
    hold exactly (ring is FIFO per batch index)."""
    from uwudiff_tpu.data.native import NativeBatchLoader, NativeShardReader

    rng = np.random.default_rng(1)
    data = rng.standard_normal((64, 8)).astype(np.float32)
    p = tmp_path / "big.npz"
    np.savez(p, x=data)
    reader = NativeShardReader([str(p)])
    order = [(0, i) for i in range(64)]
    loader = NativeBatchLoader(reader, "x", order, batch_size=4, n_threads=3)
    flat = np.concatenate(list(loader))
    # the ring is strictly ordered even with 3 workers
    np.testing.assert_array_equal(flat, data)
    reader.close()


def test_cached_dataset_native_iterator(tmp_path):
    """End-to-end: cache latents -> native batch stream -> trainer batch."""
    import jax
    import jax.numpy as jnp

    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.data.latent_cache import CachedLatentDataset, cache_latents
    from uwudiff_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL.from_config("tiny")
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)["params"]
    ds = DummyDataset(sample_size=(16, 16, 3), n_samples=6)
    cache_latents(ds, vae, params, str(tmp_path / "c"), batch_size=3)
    cached = CachedLatentDataset(str(tmp_path / "c"))
    batches = list(cached.native_batch_iterator(batch_size=2, seed=0))
    assert len(batches) == 3
    assert batches[0]["latent"].shape == (2, 8, 8, 4)
    assert batches[0]["added_cond"]["time_ids"].shape == (2, 6)
