#!/usr/bin/env python
"""Sampling CLI (parity with ``test_scripts/test_sampling.py``).

    python scripts/sample.py --configs configs/sampling/demo_sampling.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", required=True)
    parser.add_argument("--out-dir", default="samples")
    args = parser.parse_args()

    import jax

    from uwudiff_tpu.config import instantiate_any, load_config_files

    config = load_config_files(args.configs)

    # build the model stack via a trainer node (shares the loader path)
    trainer = instantiate_any(config["trainer"])
    sampling_cfg = dict(config.get("sampling_func", {}))
    class_conditional = "class_labels" in sampling_cfg
    # sampling needs params: initialize (or restore via run_config.ckpt)
    from uwudiff_tpu.data import DummyDataset

    ds = DummyDataset(
        sample_size=tuple(config.get("init_sample_size", (64, 64, 4))),
        n_samples=2,
        n_classes=(
            getattr(trainer.unet, "num_classes", None)
            if class_conditional
            else None
        ),
    )
    ds.set_tokenizers(trainer.tokenizers)
    trainer.setup(ds.collate([ds[0]]))

    te_pipe = None
    if trainer.te is not None:
        from uwudiff_tpu.models.text_encoders import TextEncodingPipeline

        te_pipe = TextEncodingPipeline(
            trainer.te, trainer.frozen["te"], trainer.tokenizers
        )

    unet_params = trainer.merged_unet_params()

    def unet_fn(params, x, t, ctx, mask, added):
        return trainer.unet.apply({"params": params}, x, t, ctx, mask, added)

    vae_decode = None
    if trainer.vae is not None:
        vae_params = trainer.frozen["vae"]

        def vae_decode(latents):
            return trainer.vae.apply(
                {"params": vae_params}, latents, method=trainer.vae.decode
            )

    sampling_kwargs = sampling_cfg
    sampling_kwargs.pop("_target_", None)
    # instantiate nested config nodes in either supported format (e.g.
    # internal_sampling_func: a sampler callable via _partial_: true, or
    # the {class:, factory:} layout)
    for key, val in list(sampling_kwargs.items()):
        if isinstance(val, dict) and ("_target_" in val or "class" in val):
            sampling_kwargs[key] = instantiate_any(val)

    # SD3.5 skip-layer guidance: clone the model with blocks bypassed
    # (shares the trained params; cfg.build_slg_cfg_fn combines)
    skip_layers = sampling_kwargs.pop("skip_layers", None)
    if skip_layers is not None:
        skip_unet = trainer.unet.clone(skip_layers=tuple(skip_layers))

        def unet_skip_fn(params, x, t, ctx, mask, added):
            return skip_unet.apply({"params": params}, x, t, ctx, mask, added)

        sampling_kwargs["unet_skip_fn"] = unet_skip_fn

    if "denoiser_cls" not in sampling_kwargs:
        # train/sample parameterization lock-step: RF losses sample via
        # RFDenoiser, v-prediction via VDenoiser, eps via the default
        from uwudiff_tpu.sampling import denoiser_for_loss

        sampling_kwargs["denoiser_cls"] = denoiser_for_loss(trainer.loss)

    if "init_image" in sampling_kwargs:  # img2img / inpainting branch
        from PIL import Image
        import numpy as np

        from uwudiff_tpu.sampling import image_to_image_sampling

        img = Image.open(sampling_kwargs.pop("init_image")).convert("RGB")
        init = np.asarray(img, np.float32)[None] / 127.5 - 1.0

        vae_encode = None
        if trainer.vae is not None:
            vae_params_enc = trainer.frozen["vae"]

            def vae_encode(images, rng_):
                dist = trainer.vae.apply(
                    {"params": vae_params_enc}, images,
                    method=trainer.vae.encode,
                )
                return dist.sample(rng_)

        mask_path = sampling_kwargs.pop("inpaint_mask", None)
        if isinstance(mask_path, str):
            m = Image.open(mask_path).convert("L")
            downs = (
                2 ** (len(trainer.vae.block_out_channels) - 1)
                if trainer.vae is not None else 8
            )
            m = m.resize((img.width // downs, img.height // downs))
            sampling_kwargs["inpaint_mask"] = (
                np.asarray(m, np.float32)[None, :, :, None] / 255.0
            )

        downs = (
            2 ** (len(trainer.vae.block_out_channels) - 1)
            if trainer.vae is not None else 8
        )
        images = image_to_image_sampling(
            unet_fn,
            te_pipe,
            init_image=init,
            vae_encode=vae_encode,
            vae_decode=vae_decode,
            train_schedule=trainer.loss.schedule,
            vae_std=trainer.vae_std,
            vae_mean=trainer.vae_mean,
            vae_downscale=downs,
            unet_params=unet_params,
            **sampling_kwargs,
        )
    elif class_conditional:  # DiT family: labels instead of prompts
        from uwudiff_tpu.sampling import class_conditional_sampling

        def class_unet_fn(params, x, t, labels):
            return trainer.unet.apply({"params": params}, x, t, labels)

        images = class_conditional_sampling(
            class_unet_fn,
            train_schedule=trainer.loss.schedule,
            null_label=trainer.unet.num_classes,
            vae_decode=vae_decode,
            vae_std=trainer.vae_std,
            vae_mean=trainer.vae_mean,
            unet_params=unet_params,
            **sampling_kwargs,
        )
    else:
        from uwudiff_tpu.sampling import diffusion_sampling

        images = diffusion_sampling(
            unet_fn,
            te_pipe,
            vae_decode,
            train_schedule=trainer.loss.schedule,
            vae_std=trainer.vae_std,
            vae_mean=trainer.vae_mean,
            unet_params=unet_params,
            **sampling_kwargs,
        )
    os.makedirs(args.out_dir, exist_ok=True)
    if hasattr(images, "shape"):  # latents
        import numpy as np

        np.save(os.path.join(args.out_dir, "latents.npy"), np.asarray(images))
        print(f"saved latents {images.shape} to {args.out_dir}/latents.npy")
    else:
        for i, img in enumerate(images):
            img.save(os.path.join(args.out_dir, f"sample_{i}.png"))
        print(f"saved {len(images)} images to {args.out_dir}/")


if __name__ == "__main__":
    main()
