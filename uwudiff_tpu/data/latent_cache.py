"""Latent / embedding pre-caching.

The reference re-encodes frozen VAE latents and text embeddings every
step inside the hot loop (``duwu/trainer/trainer.py:238-259`` — flagged
in SURVEY.md §3.1 as the key optimization target). Here the encodes run
once, jit-batched on TPU, and the cached tensors stream straight into
the train step (the trainer recognizes ``latent``/``ctx`` batch keys and
skips the frozen encoders entirely).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.data.base import UwUBaseDataset

__all__ = ["cache_latents", "CachedLatentDataset"]


def cache_latents(
    dataset,
    vae,
    vae_params,
    out_dir: str,
    te_pipeline=None,
    batch_size: int = 16,
    vae_std: float | None = None,
    vae_mean: float = 0.0,
    seed: int = 0,
):
    """Encode every sample (and caption) once; write npz shards."""
    os.makedirs(out_dir, exist_ok=True)
    vae_std = vae_std if vae_std is not None else 1.0 / vae.scaling_factor

    @jax.jit
    def encode(x, rng):
        dist = vae.apply({"params": vae_params}, x, method=vae.encode)
        z = dist.sample(rng)
        return (z - vae_mean) / vae_std

    rng = jax.random.PRNGKey(seed)
    shard_idx = 0
    for lo in range(0, len(dataset), batch_size):
        items = [dataset[i] for i in range(lo, min(lo + batch_size, len(dataset)))]
        x = jnp.asarray(np.stack([it["sample"] for it in items]))
        # pad tail to the compiled batch shape
        n = x.shape[0]
        if n < batch_size:
            x = jnp.pad(x, [(0, batch_size - n)] + [(0, 0)] * (x.ndim - 1))
        rng, sub = jax.random.split(rng)
        latents = np.asarray(encode(x, sub))[:n]
        shard = {
            "latent": latents,
            "add_time_ids": np.stack([it["add_time_ids"] for it in items]),
        }
        captions = [it["caption"] for it in items]
        if te_pipeline is not None:
            emb, normed, pooled, mask = te_pipeline.encode(
                captions, padding=True, truncation=True
            )
            shard["ctx"] = np.asarray(emb)
            shard["normed_ctx"] = np.asarray(normed)
            if pooled is not None:
                shard["pooled"] = np.asarray(pooled)
            if mask is not None:
                shard["ctx_mask"] = np.asarray(mask)
        np.savez(os.path.join(out_dir, f"shard_{shard_idx:06d}.npz"), **shard)
        shard_idx += 1
    return shard_idx


class CachedLatentDataset(UwUBaseDataset):
    """Streams pre-encoded latents/embeddings from npz shards."""

    def __init__(self, cache_dir: str, use_normed_ctx: bool = False):
        self.files = sorted(
            os.path.join(cache_dir, f)
            for f in os.listdir(cache_dir)
            if f.endswith(".npz")
        )
        assert self.files, f"no cache shards in {cache_dir}"
        self.use_normed_ctx = use_normed_ctx
        self._index: list[tuple[int, int]] = []
        self._shard_cache: dict[int, dict] = {}
        for si, f in enumerate(self.files):
            with np.load(f) as z:
                n = z["latent"].shape[0]
            self._index.extend((si, i) for i in range(n))

    def __len__(self):
        return len(self._index)

    def _shard(self, si: int) -> dict:
        if si not in self._shard_cache:
            if len(self._shard_cache) > 4:
                self._shard_cache.pop(next(iter(self._shard_cache)))
            with np.load(self.files[si]) as z:
                self._shard_cache[si] = {k: z[k] for k in z.files}
        return self._shard_cache[si]

    def __getitem__(self, index: int) -> dict:
        si, i = self._index[index]
        shard = self._shard(si)
        item = {
            "latent": shard["latent"][i],
            "add_time_ids": shard["add_time_ids"][i],
        }
        ctx_key = "normed_ctx" if self.use_normed_ctx else "ctx"
        if ctx_key in shard:
            item["ctx"] = shard[ctx_key][i]
        for k in ("pooled", "ctx_mask"):
            if k in shard:
                item[k] = shard[k][i]
        return item

    def native_batch_iterator(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        n_threads: int = 4,
    ):
        """GIL-free prefetching batch stream via the C++ runtime
        (``native/uwu_dataio.cpp``): yields train-step-ready dict batches
        of latents (+ctx/pooled/mask when cached)."""
        from uwudiff_tpu.data.native import NativeBatchLoader, NativeShardReader

        reader = NativeShardReader(self.files)
        order = list(self._index)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        names = ["latent", "add_time_ids"]
        probe = self._shard(0)
        ctx_key = "normed_ctx" if self.use_normed_ctx else "ctx"
        extra = [k for k in (ctx_key, "pooled", "ctx_mask") if k in probe]
        loaders = {
            name: NativeBatchLoader(
                reader, name, order, batch_size, n_threads=n_threads
            )
            for name in names + extra
        }
        iters = {k: iter(v) for k, v in loaders.items()}
        try:
            while True:
                try:
                    arrays = {k: next(it) for k, it in iters.items()}
                except StopIteration:
                    break
                batch = {
                    "latent": arrays["latent"],
                    "sample": arrays["latent"],
                    "added_cond": {"time_ids": arrays["add_time_ids"]},
                    "tokenizer_outputs": [],
                }
                if ctx_key in arrays:
                    batch["ctx"] = arrays[ctx_key]
                for k in ("pooled", "ctx_mask"):
                    if k in arrays:
                        batch[k] = arrays[k]
                yield batch
        finally:
            for v in loaders.values():
                v.stop()
            reader.close()

    @staticmethod
    def collate(batch: list[dict]) -> dict:
        out = {
            "latent": np.stack([x["latent"] for x in batch]).astype(np.float32),
            "sample": np.stack([x["latent"] for x in batch]).astype(np.float32),
            "added_cond": {
                "time_ids": np.stack(
                    [x["add_time_ids"] for x in batch]
                ).astype(np.float32)
            },
            "tokenizer_outputs": [],
        }
        for k in ("ctx", "pooled", "ctx_mask"):
            if k in batch[0]:
                out[k] = np.stack([x[k] for x in batch])
        return out
