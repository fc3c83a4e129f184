#!/usr/bin/env python
"""Latent-cache builder CLI: encode a dataset once (VAE latents + text
embeddings) into npz shards consumable by ``CachedLatentDataset`` and
the native C++ shard reader.

The encode-once pipeline is the TPU-first removal of the per-step
frozen VAE/TE cost baked into the reference hot loop
(``duwu/trainer/trainer.py:238-259``; SURVEY.md §7.2 item 4).

    python scripts/cache_latents.py --configs configs/demo_training.yaml \
        --out-dir /data/latents [--batch-size 16]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument(
        "--no-text", action="store_true",
        help="cache latents only (skip text-encoder embeddings)",
    )
    args = parser.parse_args()

    import jax

    from uwudiff_tpu.config import instantiate_any, load_config_files
    from uwudiff_tpu.data import TrainDataModule
    from uwudiff_tpu.data.latent_cache import cache_latents
    from uwudiff_tpu.training import DMTrainer

    config = load_config_files(args.configs)
    trainer = instantiate_any(config["trainer"])
    assert isinstance(trainer, DMTrainer), type(trainer)
    assert trainer.vae is not None, "latent caching needs a VAE"

    data_node = config["data"]
    dm = (
        data_node
        if isinstance(data_node, TrainDataModule)
        else instantiate_any(data_node)
    )
    dm.set_tokenizers(trainer.tokenizers)
    dm.setup()
    dataset = dm.dataset

    # init frozen encoder params from one example (host CPU)
    example = dataset.collate([dataset[0]])
    trainer.setup(example)

    te_pipeline = None
    if not args.no_text and trainer.te is not None:
        from uwudiff_tpu.models.text_encoders import TextEncodingPipeline

        te_pipeline = TextEncodingPipeline(
            trainer.te, trainer.frozen["te"], trainer.tokenizers
        )

    n = cache_latents(
        dataset,
        trainer.vae,
        trainer.frozen["vae"],
        args.out_dir,
        te_pipeline=te_pipeline,
        batch_size=args.batch_size,
        vae_std=trainer.vae_std,
        vae_mean=trainer.vae_mean,
    )
    print(f"wrote {n} shards to {args.out_dir}")


if __name__ == "__main__":
    main()
