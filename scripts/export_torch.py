#!/usr/bin/env python
"""Export trained params to the torch/diffusers key layout.

The inverse of the import path (``models/import_torch.py``): takes a
flat ``.npz`` produced by ``DMTrainer.export_params`` /
``save_params_npz`` and writes a state dict in diffusers naming, so
checkpoints trained here load back into the reference's ecosystem
(diffusers ``UNet2DConditionModel.load_state_dict``, ComfyUI, ...).

    python scripts/export_torch.py --params unet.npz --model unet \
        --out unet_diffusers.pt              # torch.save format
    python scripts/export_torch.py ... --out sd.safetensors
    python scripts/export_torch.py ... --out sd.npz  # numpy format
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init

_KEY_MAPS = {
    "unet": "unet_key_map",
    "vae": "vae_key_map",
    "clip_text": "clip_text_key_map",
    "clip_vision": "clip_vision_key_map",
    "t5": "t5_key_map",
    "dit": "dit_key_map",
    "flux": "flux_key_map",
    "mmdit": "mmdit_key_map",  # needs --depth (final_block placement)
}


def _tree_from_npz(data) -> dict:
    """Rebuild the nested param tree from keystr-flattened npz keys
    (``['a']['b']...`` -> {a: {b: ...}})."""
    tree: dict = {}
    for key in data.files:
        parts = re.findall(r"\['([^']+)'\]", key)
        if not parts:  # already plain path form
            parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        if arr.dtype.kind == "V":  # legacy file with raw bf16 records
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
        node[parts[-1]] = arr
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True, help=".npz from export_params")
    ap.add_argument("--model", required=True, choices=sorted(_KEY_MAPS))
    ap.add_argument("--out", required=True, help=".pt (torch.save) or .npz")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16", "bfloat16"])
    ap.add_argument(
        "--depth", type=int, default=None,
        help="total MMDiT depth (places final_block at depth-1); "
        "required for --model mmdit",
    )
    args = ap.parse_args()

    from uwudiff_tpu.models import import_torch as it

    key_map = getattr(it, _KEY_MAPS[args.model])
    if args.model == "mmdit":
        if args.depth is None:
            ap.error("--model mmdit requires --depth")
        import functools

        key_map = functools.partial(key_map, depth=args.depth)
    tree = _tree_from_npz(np.load(args.params))
    sd = it.export_params(tree, key_map, dtype=np.float32)

    if args.out.endswith(".npz"):
        if args.dtype == "bfloat16":
            # np.savez writes ml_dtypes bfloat16 as unreadable raw void
            # records — refuse rather than produce a corrupt file
            ap.error("--dtype bfloat16 requires .pt or .safetensors output")
        if args.dtype != "float32":
            sd = {k: v.astype(args.dtype) for k, v in sd.items()}
        np.savez(args.out, **sd)
    elif args.out.endswith(".safetensors"):
        import torch
        from safetensors.torch import save_file

        save_file(
            {
                k: torch.from_numpy(np.ascontiguousarray(v)).to(
                    getattr(torch, args.dtype)
                )
                for k, v in sd.items()
            },
            args.out,
        )
    else:
        import torch

        tsd = {
            k: torch.from_numpy(np.ascontiguousarray(v)).to(
                getattr(torch, args.dtype)
            )
            for k, v in sd.items()
        }
        torch.save(tsd, args.out)
    print(f"wrote {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
