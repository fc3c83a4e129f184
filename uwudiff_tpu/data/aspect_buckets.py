"""Aspect-ratio bucket training.

Production SD training mixes aspect ratios by snapping every image to
the nearest (w, h) bucket of roughly constant pixel area and batching
within buckets — the capability behind non-square checkpoints. The
reference has no bucketing (fixed ``image_size`` per run); this module
is the TPU-first version: each bucket is a distinct static shape, the
jit cache holds one compiled train step per bucket, and the SDXL
micro-conditioning (``add_time_ids``: original size + crop + target,
``data/base.py:106`` convention) is emitted per bucket.

Pieces:
- ``make_buckets(base_resolution, ...)``: the standard bucket ladder —
  all (w, h) with w*h <= base^2, multiples of ``step``, aspect within
  ``max_aspect``.
- ``AspectBucketDataset``: wraps any path-list dataset; assigns each
  image to its nearest bucket by (log-area, log-aspect) distance and
  loads at bucket resolution.
- ``BucketBatchLoader``: deterministic shuffling batcher that yields
  single-bucket batches (shapes stay static per batch) with exact
  resume state, mirroring ``DataLoader``'s contract.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from uwudiff_tpu.data.base import UwUBaseDataset

__all__ = ["make_buckets", "AspectBucketDataset", "BucketBatchLoader"]


def make_buckets(
    base_resolution: int = 1024,
    step: int = 64,
    min_dim: int = 512,
    max_aspect: float = 2.0,
) -> list[tuple[int, int]]:
    """All (w, h) buckets with w*h <= base^2, dims multiples of
    ``step``, aspect ratio within [1/max_aspect, max_aspect]."""
    area = base_resolution * base_resolution
    buckets = set()
    w = min_dim
    while w <= area // min_dim:
        h = min(area // w // step * step, int(w * max_aspect) // step * step)
        if h >= min_dim and 1 / max_aspect <= w / h <= max_aspect:
            buckets.add((w, h))
            buckets.add((h, w))
        w += step
    return sorted(buckets)


def nearest_bucket(
    width: int, height: int, buckets: Sequence[tuple[int, int]]
) -> tuple[int, int]:
    """Log-space area+aspect distance (same metric as serving)."""
    return min(
        buckets,
        key=lambda b: abs(math.log(b[0] * b[1] / (width * height)))
        + abs(math.log((b[0] / b[1]) / (width / height))),
    )


class AspectBucketDataset(UwUBaseDataset):
    """Aspect-bucketed image dataset over a path list.

    Probes image dimensions once (native runtime when available, PIL
    otherwise), assigns each path to its nearest bucket, and loads at
    bucket resolution with SDXL micro-conditioning carrying the true
    original size.
    """

    def __init__(
        self,
        image_paths: Sequence[str],
        buckets: Sequence[tuple[int, int]] | None = None,
        base_resolution: int = 1024,
        tokenizers: Sequence = (),
        caption: str = "",
    ):
        from uwudiff_tpu.data.local import LocalImageDataset

        self.buckets = (
            [tuple(b) for b in buckets]
            if buckets is not None
            else make_buckets(base_resolution)
        )
        self.image_paths = list(image_paths)
        self.tokenizers = list(tokenizers)
        self.caption = caption
        self._inner = LocalImageDataset(
            self.image_paths, tokenizers=tokenizers, caption=caption
        )
        self.assignments: list[tuple[int, int, int, int]] = []  # (bw,bh,ow,oh)
        for p in self.image_paths:
            ow, oh = self._probe(p)
            bw, bh = nearest_bucket(ow, oh, self.buckets)
            self.assignments.append((bw, bh, ow, oh))

    @staticmethod
    def _probe(path: str) -> tuple[int, int]:
        # PIL reads only the header for .size — O(KB) per file; the
        # native probe fully decodes and is NOT suitable for scanning a
        # large corpus at init
        try:
            from PIL import Image

            with Image.open(path) as im:
                return im.size
        except Exception:
            from uwudiff_tpu.data.native_image import probe_image

            return probe_image(path)

    def set_tokenizers(self, tokenizers):
        super().set_tokenizers(tokenizers)
        self._inner.set_tokenizers(tokenizers)

    def bucket_of(self, index: int) -> tuple[int, int]:
        bw, bh, _, _ = self.assignments[index]
        return (bw, bh)

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, index: int) -> dict:
        bw, bh, ow, oh = self.assignments[index]
        self._inner.image_size = (bw, bh)
        item = self._inner[index]
        # SDXL micro-conditioning: true original size + crop + target
        item["add_time_ids"] = np.asarray(
            [oh, ow, 0, 0, bh, bw], dtype=np.float32
        )
        return item


class BucketBatchLoader:
    """Single-bucket batches with deterministic shuffle + exact resume.

    Epoch order: shuffle indices, group by bucket, emit full batches
    bucket-by-bucket in shuffled bucket order. Shapes are static within
    a batch, so each bucket compiles its train step exactly once.
    """

    def __init__(
        self,
        dataset: AspectBucketDataset,
        batch_size: int = 1,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        collate_fn=None,
        # multi-host training: host ``shard_id`` of ``num_shards`` takes
        # its slice of each bucket batch GROUP — every host sees the
        # SAME bucket (static shape) at the same step, with disjoint
        # rows, so the per-host local batches assemble into one global
        # array (``trainer._put_batch_multihost``). Group = num_shards
        # consecutive same-bucket batches; incomplete groups are
        # dropped (requires drop_last).
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or type(dataset).collate
        if num_shards > 1 and not drop_last:
            raise ValueError(
                "sharded bucket loading requires drop_last=True (every "
                "host must emit an identically-shaped batch each step)"
            )
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.num_shards = int(num_shards)
        self.shard_id = int(shard_id)
        self.epoch = 0
        self.batch_idx = 0

    def _batches(self) -> list[list[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(idx)
        by_bucket: dict[tuple[int, int], list[int]] = {}
        for i in idx:
            by_bucket.setdefault(self.dataset.bucket_of(int(i)), []).append(
                int(i)
            )
        order = list(by_bucket)
        if self.shuffle:
            rng.shuffle(order)
        group = self.batch_size * self.num_shards
        batches = []
        for b in order:
            rows = by_bucket[b]
            for lo in range(0, len(rows), group):
                chunk = rows[lo : lo + group]
                if len(chunk) == group or (
                    self.num_shards == 1 and not self.drop_last
                ):
                    # this host's slice of the group (identity when
                    # unsharded: group == batch_size, slice is all)
                    sub = chunk[
                        self.shard_id * self.batch_size:
                        (self.shard_id + 1) * self.batch_size
                    ]
                    batches.append(sub)
        return batches

    def __len__(self):
        return len(self._batches())

    def __iter__(self):
        while True:
            batches = self._batches()
            while self.batch_idx < len(batches):
                chunk = batches[self.batch_idx]
                self.batch_idx += 1
                yield self.collate_fn([self.dataset[i] for i in chunk])
            self.epoch += 1
            self.batch_idx = 0

    def epoch_iter(self):
        batches = self._batches()
        while self.batch_idx < len(batches):
            chunk = batches[self.batch_idx]
            self.batch_idx += 1
            yield self.collate_fn([self.dataset[i] for i in chunk])
        self.epoch += 1
        self.batch_idx = 0

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "batch_idx": self.batch_idx}

    def load_state_dict(self, state: dict):
        self.epoch = int(state["epoch"])
        self.batch_idx = int(state["batch_idx"])
