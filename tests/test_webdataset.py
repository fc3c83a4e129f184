"""WebDataset tar shards: native C++ index vs tarfile ground truth
(ustar/GNU/PAX formats, long names), member reads, key grouping,
dataset samples, collate integration. No reference counterpart (the
reference reads loose files / HF datasets only)."""

import io
import tarfile

import numpy as np
import pytest

from uwudiff_tpu.data.webdataset import (
    TarIndex,
    WebDatasetTarDataset,
    _split_key_ext,
)


def _png_bytes(w=8, h=6, color=(255, 0, 0)):
    from PIL import Image

    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _jpg_bytes(w=8, h=6, color=(0, 255, 0)):
    from PIL import Image

    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _add(tf, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def _make_shard(path, fmt, entries):
    with tarfile.open(path, "w", format=fmt) as tf:
        for name, data in entries:
            _add(tf, name, data)


_FORMATS = [
    ("ustar", tarfile.USTAR_FORMAT),
    ("gnu", tarfile.GNU_FORMAT),
    ("pax", tarfile.PAX_FORMAT),
]


@pytest.mark.parametrize("fmt_name,fmt", _FORMATS)
def test_tar_index_matches_tarfile(tmp_path, fmt_name, fmt):
    entries = [
        ("00001.png", _png_bytes()),
        ("00001.txt", b"a red square"),
        ("00002.jpg", _jpg_bytes()),
        # >100-char name exercises GNU longname / PAX path= / prefix
        ("deep/" + "d" * 96 + "/00003.png", _png_bytes(color=(0, 0, 255))),
        ("empty.txt", b""),
    ]
    shard = tmp_path / f"shard_{fmt_name}.tar"
    _make_shard(shard, fmt, entries)

    idx = TarIndex(str(shard))
    truth = {n: d for n, d in entries}
    assert sorted(idx.names) == sorted(truth)
    for i, name in enumerate(idx.names):
        assert idx.sizes[i] == len(truth[name])
        assert idx.read(i) == truth[name], name
    idx.close()


def test_tar_index_native_equals_fallback(tmp_path):
    entries = [("k.png", _png_bytes()), ("k.txt", b"cap")]
    shard = tmp_path / "s.tar"
    _make_shard(shard, tarfile.GNU_FORMAT, entries)
    nat = TarIndex(str(shard), native=True)
    py = TarIndex(str(shard), native=False)
    assert py._fallback is not None
    assert nat.names == py.names and nat.sizes == py.sizes
    for i in range(len(nat)):
        assert nat.read(i) == py.read(i)
    nat.close()
    py.close()


def test_tar_index_multi_shard(tmp_path):
    s1 = tmp_path / "a.tar"
    s2 = tmp_path / "b.tar"
    _make_shard(s1, tarfile.USTAR_FORMAT, [("1.txt", b"one")])
    _make_shard(s2, tarfile.USTAR_FORMAT, [("2.txt", b"two")])
    idx = TarIndex([str(s1), str(s2)])
    assert idx.names == ["1.txt", "2.txt"]
    assert idx.read(0) == b"one" and idx.read(1) == b"two"
    idx.close()


def test_split_key_ext():
    assert _split_key_ext("dir/abc.cls.jpg") == ("dir/abc", "cls.jpg")
    assert _split_key_ext("abc.txt") == ("abc", "txt")
    assert _split_key_ext("a/b/c.PNG")[1] == "png"


def test_webdataset_dataset_samples_and_collate(tmp_path):
    shard = tmp_path / "train-0000.tar"
    _make_shard(
        shard,
        tarfile.PAX_FORMAT,
        [
            ("00001.png", _png_bytes(color=(255, 0, 0))),
            ("00001.txt", b"a red square"),
            ("00002.jpg", _jpg_bytes(color=(0, 255, 0))),
            # no caption member -> default_caption
            ("00003.png", _png_bytes(color=(0, 0, 255))),
            ("00003.json", b"{}"),  # extra member ignored
            ("meta.json", b"{}"),  # non-image key skipped entirely
        ],
    )
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    ds = WebDatasetTarDataset(
        str(shard),
        image_size=(16, 16),
        tokenizers=[SimpleTokenizer()],
        default_caption="no caption",
    )
    assert len(ds) == 3
    s0 = ds[0]
    assert s0["sample"].shape == (16, 16, 3)
    assert s0["caption"] == "a red square"
    # red square decodes red (channel 0 high in [-1, 1])
    assert s0["sample"][..., 0].mean() > 0.8
    assert s0["sample"][..., 1].mean() < -0.8
    assert ds[1]["caption"] == "no caption"
    assert ds[2]["caption"] == "no caption"
    batch = ds.collate([ds[0], ds[1]])
    assert batch["sample"].shape == (2, 16, 16, 3)
    assert batch["tokenizer_outputs"][0]["input_ids"].shape[0] == 2


def test_webdataset_native_decode_matches_pil(tmp_path):
    shard = tmp_path / "s.tar"
    _make_shard(
        shard, tarfile.USTAR_FORMAT,
        [("x.png", _png_bytes(w=20, h=14, color=(30, 180, 240)))],
    )
    nat = WebDatasetTarDataset(str(shard), image_size=(8, 8))
    pil = WebDatasetTarDataset(
        str(shard), image_size=(8, 8), native_decode=False
    )
    a, b = nat[0]["sample"], pil[0]["sample"]
    # same preprocessing pipeline semantics; resamplers differ slightly
    np.testing.assert_allclose(a, b, atol=0.08)
