"""Orbax checkpointing: ``{state, data-iterator state, metadata}`` with
async save and sharding-aware restore.

Covers the reference's checkpoint surface (SURVEY.md §5.4): Lightning
``ModelCheckpoint`` (keep-last-k by step), mid-epoch resume fidelity
(explicit data-iterator state instead of loop surgery), and partial
state loading for model init (``duwu/loader.py:24-46`` key/prefix
extraction maps to restoring a params subtree).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        keep: int = 2,
        save_every_steps: int | None = None,
        async_save: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every_steps = save_every_steps
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def should_save(self, step: int) -> bool:
        return (
            self.save_every_steps is not None
            and step > 0
            and step % self.save_every_steps == 0
        )

    def save(self, step: int, state: Any, data_state: dict | None = None):
        args = {"state": ocp.args.StandardSave(state)}
        if data_state is not None:
            args["data"] = ocp.args.JsonSave(data_state)
        self._mgr.save(int(step), args=ocp.args.Composite(**args))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self, abstract_state: Any, step: int | None = None
    ) -> tuple[Any, dict | None]:
        """Restore with target shardings taken from ``abstract_state``
        (a pytree of jax.ShapeDtypeStruct with .sharding set)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        args = {"state": ocp.args.StandardRestore(abstract_state)}
        try:  # a checkpoint saved without iterator state has no "data"
            restored = self._mgr.restore(
                int(step),
                args=ocp.args.Composite(
                    data=ocp.args.JsonRestore(), **args
                ),
            )
        except KeyError:
            restored = self._mgr.restore(
                int(step), args=ocp.args.Composite(**args)
            )
        return restored["state"], restored.get("data")

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params_npz(path: str, params: Any):
    """Flat .npz export of a param pytree (adapter-only export parity,
    ``duwu/trainer/trainer.py:189-215``).

    npz cannot represent ml_dtypes (bfloat16 round-trips as raw ``|V2``
    void records), so non-native dtypes are stored as float32 — the
    bf16+stochastic-rounding recipe's checkpoints stay loadable."""
    import numpy as np

    def to_npz(v):
        a = np.asarray(v)
        return a.astype(np.float32) if a.dtype.kind not in "fiub" else a

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        jax.tree_util.keystr(p): to_npz(v) for p, v in flat
    }
    np.savez(path, **arrays)


def load_params_npz(path: str, target: Any, strict: bool = True) -> Any:
    """Load a flat .npz export back into the structure of ``target``.
    ``strict=False`` keeps the target's value for missing keys (new
    heads/adapters inside a pretrained tree)."""
    import numpy as np

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for p, v in flat:
        key = jax.tree_util.keystr(p)
        if key not in data:
            if not strict:
                leaves.append(v)
                continue
            raise KeyError(f"missing param {key} in {path}")
        arr = data[key]
        tgt_dtype = np.asarray(v).dtype
        if arr.dtype.kind == "V":  # legacy pre-fix file: raw bf16 bytes
            arr = arr.view(tgt_dtype)
        leaves.append(arr.reshape(v.shape).astype(tgt_dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
