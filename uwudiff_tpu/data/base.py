"""Datasets + collate + data module (parity with ``duwu/data/base.py``).

TPU-first differences:
- NHWC sample layout
- collate returns a dict of fixed-shape numpy arrays (a pytree the jitted
  train step consumes directly after ``device_put`` with the batch
  sharding)
- the loader is a plain deterministic Python iterator with explicit
  ``state_dict``/``load_state_dict`` so mid-epoch resume is exact
  (the reference leans on Lightning loop surgery for this,
  ``duwu/trainer/trainer.py:217-231``)
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from uwudiff_tpu.config import instantiate_any

__all__ = ["UwUBaseDataset", "DummyDataset", "TrainDataModule", "DataLoader"]


class UwUBaseDataset:
    """Base dataset with the canonical collate (``data/base.py:9-31``)."""

    tokenizers: Sequence = ()
    # train-time long prompts: tokenize captions into this many
    # A1111-style 77-token windows ([1, n*L] ids, models/long_prompt.py
    # — ConcatTextEncoders folds the windows into the batch axis device
    # side). None = plain single-window tokenization. The count is
    # FIXED per dataset so every batch keeps one static shape.
    long_prompt_chunks: int | None = None

    def set_tokenizers(self, tokenizers):
        self.tokenizers = list(tokenizers)

    def _tokenize(self, caption: str) -> list[dict]:
        """Per-item tokenizer outputs; honors ``long_prompt_chunks``."""
        if self.long_prompt_chunks:
            from uwudiff_tpu.models.long_prompt import (
                _is_windowed,
                tokenize_long,
            )

            outs = []
            for tok in self.tokenizers:
                if _is_windowed(tok):
                    out, _w, _n = tokenize_long(
                        tok, [caption], max_chunks=self.long_prompt_chunks
                    )
                    outs.append(out)
                else:  # T5-style long-window tokenizers keep one window
                    outs.append(
                        tok(caption, padding="max_length", truncation=True)
                    )
            return outs
        return [
            tok(caption, padding="max_length", truncation=True)
            for tok in self.tokenizers
        ]

    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, index: int) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def collate(batch: list[dict]) -> dict[str, Any]:
        samples = np.stack([x["sample"] for x in batch]).astype(np.float32)
        captions = [x["caption"] for x in batch]
        add_time_ids = np.stack([x["add_time_ids"] for x in batch]).astype(
            np.float32
        )
        tokenizer_outputs = []
        for tokenizer_out in zip(*[x["tokenizer_out"] for x in batch]):
            input_ids = np.concatenate([t["input_ids"] for t in tokenizer_out])
            attention_mask = np.concatenate(
                [t["attention_mask"] for t in tokenizer_out]
            )
            tokenizer_outputs.append(
                {"input_ids": input_ids, "attention_mask": attention_mask}
            )
        out = {
            "sample": samples,
            "captions": captions,
            "tokenizer_outputs": tokenizer_outputs,
            "added_cond": {"time_ids": add_time_ids},
            "cross_attention_kwargs": {},
        }
        if "class_label" in batch[0]:  # class-conditional (DiT family)
            out["class_labels"] = np.asarray(
                [x["class_label"] for x in batch], np.int32
            )
        if "control_cond" in batch[0]:  # ControlNet hint images
            out["control_cond"] = np.stack(
                [x["control_cond"] for x in batch]
            ).astype(np.float32)
        if "ip_embed" in batch[0]:  # IP-Adapter image embeddings
            out["ip_embeds"] = np.stack(
                [x["ip_embed"] for x in batch]
            ).astype(np.float32)
        if "loss_mask" in batch[0]:  # masked loss ([H, W] in [0, 1])
            out["loss_mask"] = np.stack(
                [x["loss_mask"] for x in batch]
            ).astype(np.float32)
        return out


class DummyDataset(UwUBaseDataset):
    """Random-tensor dataset with constant caption — the fake-data fixture
    the whole pipeline smoke-tests with (``data/base.py:34-74``).

    ``sample_size`` is NHWC-style ``(H, W, C)``: (256, 256, 3) pixel or
    (32, 32, 4) latent.
    """

    def __init__(
        self,
        sample_size: tuple[int, ...] = (256, 256, 3),
        n_samples: int = 100,
        tokenizers: Sequence = (),
        caption: str = "DUMMY TEST",
        seed: int = 0,
        n_classes: int | None = None,
        # ControlNet fixtures: (H, W, C) of the pixel-space hint (e.g.
        # 8x the latent sample_size for an SD-class VAE)
        control_size: tuple[int, ...] | None = None,
        # IP-Adapter fixtures: width of the per-item image embedding
        ip_embed_dim: int | None = None,
        # masked-loss fixtures: emit a random binary [H, W] loss_mask
        with_loss_mask: bool = False,
        long_prompt_chunks: int | None = None,
        **kwargs,
    ):
        self.long_prompt_chunks = long_prompt_chunks
        self.sample_size = tuple(sample_size)
        rng = np.random.default_rng(seed)
        self.samples = [
            rng.standard_normal(self.sample_size).astype(np.float32)
            for _ in range(n_samples)
        ]
        self.tokenizers = (
            list(tokenizers) if isinstance(tokenizers, (list, tuple)) else [tokenizers]
        )
        self.caption = caption
        # class-conditional fixtures (DiT family): deterministic labels
        self.n_classes = n_classes
        self.labels = (
            rng.integers(0, n_classes, size=n_samples).astype(np.int32)
            if n_classes
            else None
        )
        self.control_size = tuple(control_size) if control_size else None
        self.controls = (
            [
                rng.standard_normal(self.control_size).astype(np.float32)
                for _ in range(n_samples)
            ]
            if self.control_size
            else None
        )
        self.ip_embeds = (
            [
                rng.standard_normal((ip_embed_dim,)).astype(np.float32)
                for _ in range(n_samples)
            ]
            if ip_embed_dim
            else None
        )
        self.loss_masks = (
            [
                (rng.random(self.sample_size[:2]) > 0.5).astype(np.float32)
                for _ in range(n_samples)
            ]
            if with_loss_mask
            else None
        )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        h = self.sample_size[0]
        w = self.sample_size[1]
        item = {
            "sample": self.samples[index],
            "caption": self.caption,
            "tokenizer_out": self._tokenize(self.caption),
            # org_h, org_w, crop_top, crop_left, target_h, target_w
            "add_time_ids": np.asarray([h, w, 0, 0, h, w], dtype=np.float32),
        }
        if self.labels is not None:
            item["class_label"] = int(self.labels[index])
        if self.controls is not None:
            item["control_cond"] = self.controls[index]
        if self.ip_embeds is not None:
            item["ip_embed"] = self.ip_embeds[index]
        if self.loss_masks is not None:
            item["loss_mask"] = self.loss_masks[index]
        return item


class DataLoader:
    """Deterministic shuffling batcher with exact resume state.

    Multi-host: ``shard_id``/``num_shards`` restrict each host to a
    disjoint slice of the (identically-seeded) shuffled index order —
    the per-host data independence the reference runs DDP with
    (``use_distributed_sampler: False``, "each node has different
    data", ``test_scripts/test_train.py:49-53``). ``batch_size`` is
    per-host; the global batch is ``batch_size * num_shards``,
    assembled on device by ``DMTrainer._put_batch`` via
    ``jax.make_array_from_process_local_data``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        collate_fn=None,
        shard_id: int | None = None,
        num_shards: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # attribute lookup (not type lookup) so datasets may override
        # collate as a bound instance method (PriorPreservationDataset)
        self.collate_fn = collate_fn or dataset.collate
        if (shard_id is None) != (num_shards is None):
            raise ValueError("shard_id and num_shards must be set together")
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0
        self.batch_idx = 0  # next batch to yield within the epoch

    def _shard_len(self) -> int:
        """Per-host shard length, truncated to the MINIMUM across hosts
        so every host sees identical epoch/batch counts — unequal
        lengths would desynchronize host epochs and break shard
        disjointness (each host would shuffle a different epoch)."""
        n = len(self.dataset)
        if self.num_shards is None:
            return n
        return n // self.num_shards

    def __len__(self):
        n = self._shard_len() // self.batch_size
        if not self.drop_last and self._shard_len() % self.batch_size:
            n += 1
        return n

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        if self.num_shards is not None:
            from uwudiff_tpu.utils import balance_sharding

            idx = list(balance_sharding(idx, self.num_shards))[self.shard_id]
            idx = idx[: self._shard_len()]  # equal length on every host
        return idx

    def __iter__(self):
        while True:
            order = self._order()
            n_batches = len(self)
            while self.batch_idx < n_batches:
                lo = self.batch_idx * self.batch_size
                hi = min(lo + self.batch_size, len(order))
                batch = [self.dataset[int(i)] for i in order[lo:hi]]
                self.batch_idx += 1
                yield self.collate_fn(batch)
            self.epoch += 1
            self.batch_idx = 0

    def epoch_iter(self):
        """Iterate the remainder of the current epoch, then stop."""
        order = self._order()
        n_batches = len(self)
        while self.batch_idx < n_batches:
            lo = self.batch_idx * self.batch_size
            hi = min(lo + self.batch_size, len(order))
            batch = [self.dataset[int(i)] for i in order[lo:hi]]
            self.batch_idx += 1
            yield self.collate_fn(batch)
        self.epoch += 1
        self.batch_idx = 0

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "batch_idx": self.batch_idx}

    def load_state_dict(self, state: dict):
        self.epoch = int(state["epoch"])
        self.batch_idx = int(state["batch_idx"])


class TrainDataModule:
    """Config-driven dataset + loader pairing (``data/base.py:77-96``)."""

    def __init__(self, dataset_config, dataloader_config=None, val_dataset_config=None):
        self.dataset_config = dataset_config
        self.dataloader_config = dict(dataloader_config or {})
        self.val_dataset_config = val_dataset_config
        self.tokenizers = None
        self.dataset = None
        self.val_dataset = None

    def set_tokenizers(self, tokenizers):
        self.tokenizers = list(tokenizers)
        if self.dataset is not None:
            self.dataset.set_tokenizers(self.tokenizers)
        if self.val_dataset is not None:
            self.val_dataset.set_tokenizers(self.tokenizers)

    def setup(self):
        if self.dataset is None:
            self.dataset = instantiate_any(self.dataset_config)
            if self.tokenizers:
                self.dataset.set_tokenizers(self.tokenizers)
        if self.val_dataset is None and self.val_dataset_config is not None:
            self.val_dataset = instantiate_any(self.val_dataset_config)
            if self.tokenizers:
                self.val_dataset.set_tokenizers(self.tokenizers)
        return self

    def train_dataloader(self) -> DataLoader:
        self.setup()
        cfg = dict(self.dataloader_config)
        cfg.pop("num_workers", None)  # accepted for config parity; unused
        from uwudiff_tpu.data.aspect_buckets import (
            AspectBucketDataset,
            BucketBatchLoader,
        )

        if isinstance(self.dataset, AspectBucketDataset):
            # bucketed datasets get the single-bucket-batch loader;
            # per-host sharding slices bucket batch GROUPS so every
            # host sees the same static shape per step with disjoint
            # rows (BucketBatchLoader num_shards/shard_id)
            if cfg.pop("shard_per_process", False):
                import jax

                cfg.setdefault("shard_id", jax.process_index())
                cfg.setdefault("num_shards", jax.process_count())
            return BucketBatchLoader(
                self.dataset, collate_fn=self.dataset.collate, **cfg
            )
        if cfg.pop("shard_per_process", False):
            # per-host disjoint shard (multi-host training); explicit
            # shard_id/num_shards in the config win over auto-detection
            import jax

            cfg.setdefault("shard_id", jax.process_index())
            cfg.setdefault("num_shards", jax.process_count())
        return DataLoader(self.dataset, collate_fn=self.dataset.collate, **cfg)

    def val_dataloader(self) -> DataLoader | None:
        self.setup()
        if self.val_dataset is None:
            return None
        cfg = dict(self.dataloader_config)
        cfg.pop("num_workers", None)
        cfg["shuffle"] = False
        return DataLoader(
            self.val_dataset, collate_fn=self.val_dataset.collate, **cfg
        )
