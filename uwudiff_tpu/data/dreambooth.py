"""DreamBooth prior-preservation data pairing.

No reference counterpart (UwUDiff has no DreamBooth path) — community
fine-tune staple. ``PriorPreservationDataset`` pairs every instance
sample with a class-prior sample in the SAME collated batch and emits a
per-sample ``loss_weight`` vector; the diffusion losses apply it as a
weighted mean (Ruiz et al. 2023: L = E_instance + w · E_prior), so one
jitted train step carries both terms with no control flow.

TPU-first shape discipline: the batch the step sees is always
``2 × batch_size`` with instance rows first — a single fixed pytree, no
per-term programs to compile.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from uwudiff_tpu.data.base import UwUBaseDataset


def _as_dataset(node: Any):
    if isinstance(node, UwUBaseDataset):
        return node
    from uwudiff_tpu.config import instantiate_any

    return instantiate_any(node)


class PriorPreservationDataset(UwUBaseDataset):
    """Pairs an instance dataset with a class-prior dataset.

    Args:
        instance: the few-shot subject dataset (config node or dataset).
        prior: the class-regularization dataset — typically images of
            the generic class, pre-generated with the base model.
        prior_weight: w in ``L = E_instance + w · E_prior``.
        seed: drives the fixed instance→prior pairing permutation
            (deterministic, so resume replays identical pairs).
    """

    def __init__(
        self,
        instance: Any,
        prior: Any,
        prior_weight: float = 1.0,
        seed: int = 0,
        **kwargs,
    ):
        self.instance = _as_dataset(instance)
        self.prior = _as_dataset(prior)
        self.prior_weight = float(prior_weight)
        rng = np.random.default_rng(seed)
        # fixed shuffled cycle over the prior set: every instance index
        # maps to a prior index; repeats only once the prior set is
        # exhausted
        n = max(len(self.instance), len(self.prior))
        reps = -(-n // len(self.prior))
        self._prior_order = np.concatenate(
            [rng.permutation(len(self.prior)) for _ in range(reps)]
        )

    def set_tokenizers(self, tokenizers):
        super().set_tokenizers(tokenizers)
        self.instance.set_tokenizers(tokenizers)
        self.prior.set_tokenizers(tokenizers)

    def __len__(self) -> int:
        return len(self.instance)

    def __getitem__(self, index: int) -> dict:
        return {
            "instance": self.instance[index],
            "prior": self.prior[int(self._prior_order[index])],
        }

    def collate(self, batch: list[dict]) -> dict[str, Any]:
        """One doubled batch: instance rows first, then their paired
        prior rows, plus the ``loss_weight`` vector the loss consumes.
        Dispatches to the instance dataset's own collate so wrapped
        datasets with different item schemas (latent caches) work."""
        items = [x["instance"] for x in batch] + [x["prior"] for x in batch]
        out = self.instance.collate(items)
        b = len(batch)
        out["loss_weight"] = np.asarray(
            [1.0] * b + [self.prior_weight] * b, np.float32
        )
        return out
