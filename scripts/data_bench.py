#!/usr/bin/env python
"""Data-loading throughput: the native C++ decode pool vs PIL.

The input pipeline must outrun the train step (README: SDXL bs=8 needs
~15 imgs/sec/chip fed, SD1.5 bs=16 ~29) — this measures what one host
core (and the threaded pool) actually delivers through each path:

  1. native single-thread  — `decode_image` (libjpeg + resize/crop/
     normalize in C++, one call per image)
  2. PIL single-thread     — `Image.open` + `resize_and_crop_image` +
     `vae_image_preprocess` (the reference-equivalent Python path)
  3. native threaded pool  — `NativeImageLoader` (GIL-free workers,
     bounded ring, batch output)
  4. tar-shard (webdataset) — `WebDatasetTarDataset` with the native
     tar index + in-memory decode

Writes its own synthetic JPEG corpus (random noise compresses worst —
a conservative decode bound). Prints one JSON line.

Env knobs: DB_IMAGES=256 DB_SRC=768 DB_TARGET=512 DB_THREADS=4
           DB_QUALITY=90
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_IMG = int(os.environ.get("DB_IMAGES", "256"))
SRC = int(os.environ.get("DB_SRC", "768"))
TARGET = int(os.environ.get("DB_TARGET", "512"))
THREADS = int(os.environ.get("DB_THREADS", "4"))
QUALITY = int(os.environ.get("DB_QUALITY", "90"))


def make_corpus(root: str) -> list[str]:
    from PIL import Image

    rng = np.random.default_rng(0)
    # smooth noise: more realistic JPEG entropy than white noise, still
    # conservative vs photos
    base = rng.integers(0, 256, (SRC // 8, SRC // 8, 3), np.uint8)
    paths = []
    for i in range(N_IMG):
        arr = np.asarray(
            Image.fromarray(
                np.roll(base, i, axis=0)
            ).resize((SRC, SRC), Image.BILINEAR),
            np.uint8,
        )
        p = os.path.join(root, f"img_{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=QUALITY)
        paths.append(p)
    return paths


def bench(fn, n: int) -> float:
    t0 = time.time()
    fn()
    return n / (time.time() - t0)


def main():
    out = {"images": N_IMG, "src_px": SRC, "target_px": TARGET,
           "threads": THREADS}
    with tempfile.TemporaryDirectory() as root:
        paths = make_corpus(root)

        # 1. native single-thread
        try:
            from uwudiff_tpu.data.native_image import (
                NativeImageLoader,
                decode_image,
            )

            decode_image(paths[0], (TARGET, TARGET))  # build/load once

            def native_single():
                for p in paths:
                    decode_image(p, (TARGET, TARGET))

            out["native_1t_imgs_per_sec"] = round(
                bench(native_single, len(paths)), 1
            )

            # 3. native threaded pool
            def native_pool():
                loader = NativeImageLoader(
                    paths, (TARGET, TARGET), batch_size=8,
                    n_threads=THREADS,
                )
                n = 0
                for batch in loader:
                    n += batch.shape[0]
                loader.close()
                assert n == (len(paths) // 8) * 8

            out[f"native_{THREADS}t_imgs_per_sec"] = round(
                bench(native_pool, (len(paths) // 8) * 8), 1
            )
        except Exception as e:  # no toolchain/libs
            out["native_error"] = str(e)[:200]

        # 2. PIL single-thread (reference-equivalent path)
        from PIL import Image

        from uwudiff_tpu.data.utils import (
            resize_and_crop_image,
            vae_image_preprocess,
        )

        def pil_single():
            for p in paths:
                img = Image.open(p).convert("RGB")
                img = resize_and_crop_image(img, (TARGET, TARGET))
                vae_image_preprocess(img)

        out["pil_1t_imgs_per_sec"] = round(bench(pil_single, len(paths)), 1)

        # 4. tar-shard webdataset iteration (native index + mem decode)
        import tarfile

        tar_path = os.path.join(root, "shard-00000.tar")
        with tarfile.open(tar_path, "w") as tf:
            for i, p in enumerate(paths):
                tf.add(p, arcname=f"{i:06d}.jpg")

        try:
            from uwudiff_tpu.data.webdataset import WebDatasetTarDataset

            ds = WebDatasetTarDataset(
                [tar_path], image_size=(TARGET, TARGET)
            )

            def tar_iter():
                for i in range(len(ds)):
                    ds[i]

            out["tar_native_imgs_per_sec"] = round(
                bench(tar_iter, len(ds)), 1
            )
        except Exception as e:
            out["tar_error"] = str(e)[:200]

    if "native_1t_imgs_per_sec" in out:
        out["native_vs_pil"] = round(
            out["native_1t_imgs_per_sec"] / out["pil_1t_imgs_per_sec"], 2
        )
    print(json.dumps({"metric": "image decode->tensor throughput", **out}),
          flush=True)


if __name__ == "__main__":
    main()
