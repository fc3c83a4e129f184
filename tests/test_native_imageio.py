"""Native image-decode runtime vs PIL (decode, resize-crop, batching)."""

import numpy as np
import pytest
from PIL import Image

from uwudiff_tpu.data.native_image import (
    NativeImageLoader,
    decode_image,
    load_library,
    probe_image,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        # smooth gradient images: resize-filter differences stay tiny
        h, w = 96 + 16 * (i % 3), 128 + 8 * (i % 2)
        yy = np.linspace(0, 1, h)[:, None, None]
        xx = np.linspace(0, 1, w)[None, :, None]
        base = rng.uniform(0.1, 0.9, (1, 1, 3))
        img = np.clip((base + 0.4 * yy - 0.3 * xx) * 255, 0, 255).astype(
            np.uint8
        )
        p = tmp / (f"{i}.png" if i % 2 == 0 else f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_build_and_probe(image_dir):
    load_library()
    w, h = probe_image(image_dir[0])
    assert (w, h) == (128, 96)


def test_png_decode_exact_at_native_size(image_dir):
    p = image_dir[0]  # PNG, lossless
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1
    h, w = ref.shape[:2]
    got = decode_image(p, (h, w))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_jpeg_decode_close_to_pil(image_dir):
    p = image_dir[1]  # JPEG
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1
    h, w = ref.shape[:2]
    got = decode_image(p, (h, w))
    # different IDCT paths: within a couple of 8-bit levels
    assert np.abs(got - ref).max() <= 4 / 127.5


def test_resize_crop_matches_python_path(image_dir):
    from uwudiff_tpu.data.utils import resize_and_crop_image, vae_image_preprocess

    p = image_dir[0]
    target = (64, 64)  # (h, w)
    ref = vae_image_preprocess(
        resize_and_crop_image(Image.open(p).convert("RGB"), (64, 64))
    )
    got = decode_image(p, target)
    assert got.shape == ref.shape == (64, 64, 3)
    # smooth images: bilinear-area vs PIL bicubic agree closely
    assert np.abs(got - ref).mean() < 0.02
    assert np.abs(got - ref).max() < 0.12


def test_batch_loader_orders_and_shapes(image_dir):
    loader = NativeImageLoader(
        [str(p) for p in image_dir], target_hw=(48, 48), batch_size=2,
        n_threads=3,
    )
    batches = list(loader)
    loader.close()
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (2, 48, 48, 3)
        assert b.dtype == np.float32
        assert -1.0 <= b.min() and b.max() <= 1.0
    # batch order matches path order: batch 0 == individually decoded 0,1
    solo0 = decode_image(image_dir[0], (48, 48))
    np.testing.assert_allclose(batches[0][0], solo0, atol=1e-6)
