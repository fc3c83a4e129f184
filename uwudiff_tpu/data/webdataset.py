"""WebDataset-style tar-shard datasets over the native tar runtime.

Large-scale training data ships as plain tar archives ("shards") whose
members pair up by basename key — ``00001.jpg`` + ``00001.txt`` is one
sample. The reference framework has no tar path (it reads loose files /
HF datasets); this adds the production shard format on top of
``native/uwu_tario.cpp``: every shard is mmapped once, the member index
is built up front in C++, and member reads are GIL-free memcpys that
compose with the GIL-free native image decode
(``native_image.decode_image_bytes``) for true multi-threaded loading.

Python's ``tarfile`` is the automatic fallback when no toolchain is
available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Sequence

import numpy as np

from uwudiff_tpu.data.base import UwUBaseDataset

__all__ = ["TarIndex", "WebDatasetTarDataset", "load_library"]

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "uwu_tario.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB_PATH = _BUILD_DIR / "libuwu_tario.so"
_lock = threading.Lock()
_lib = None

# webdataset image member extensions (lowercase, no dot)
_IMAGE_EXTS = ("jpg", "jpeg", "png")
_CAPTION_EXTS = ("txt", "text", "caption")


def load_library() -> ctypes.CDLL:
    """Build (once) and load the native tar library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() or (
            _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
        ):
            _BUILD_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    str(_SRC), "-o", str(_LIB_PATH),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.uwu_tar_open.restype = ctypes.c_void_p
        lib.uwu_tar_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        lib.uwu_tar_count.restype = ctypes.c_int64
        lib.uwu_tar_count.argtypes = [ctypes.c_void_p]
        lib.uwu_tar_name.restype = ctypes.c_char_p
        lib.uwu_tar_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.uwu_tar_size.restype = ctypes.c_int64
        lib.uwu_tar_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.uwu_tar_shard.restype = ctypes.c_int
        lib.uwu_tar_shard.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.uwu_tar_read.restype = ctypes.c_int
        lib.uwu_tar_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.uwu_tar_close.restype = None
        lib.uwu_tar_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class _PyTarIndex:
    """tarfile fallback with the TarIndex read API (member bytes by
    flat index across shards)."""

    def __init__(self, paths: list[str]):
        import tarfile

        self.names: list[str] = []
        self.sizes: list[int] = []
        self._loc: list[tuple[int, str]] = []
        self._tars = [tarfile.open(p, "r:") for p in paths]
        for si, tf in enumerate(self._tars):
            for m in tf.getmembers():
                if m.isreg():
                    self.names.append(m.name)
                    self.sizes.append(m.size)
                    self._loc.append((si, m.name))

    def read(self, i: int) -> bytes:
        si, name = self._loc[i]
        return self._tars[si].extractfile(name).read()

    def close(self):
        for tf in self._tars:
            tf.close()


class TarIndex:
    """Member index over one or more tar shards (native; tarfile
    fallback). ``names``/``sizes`` are flat across shards in order;
    ``read(i)`` returns the member's bytes."""

    def __init__(self, paths: list[str] | str, native: bool = True):
        if isinstance(paths, (str, Path)):
            paths = [paths]
        self.paths = [str(p) for p in paths]
        self._handle = None
        self._fallback = None
        if native:
            try:
                self._lib = load_library()
                arr = (ctypes.c_char_p * len(self.paths))(
                    *[p.encode() for p in self.paths]
                )
                self._handle = self._lib.uwu_tar_open(arr, len(self.paths))
                if not self._handle:
                    raise IOError(f"cannot index tar shards {self.paths}")
            except (OSError, subprocess.CalledProcessError):
                self._handle = None
        if self._handle is None:
            self._fallback = _PyTarIndex(self.paths)
            self.names = self._fallback.names
            self.sizes = self._fallback.sizes
            return
        n = self._lib.uwu_tar_count(self._handle)
        self.names = [
            self._lib.uwu_tar_name(self._handle, i).decode()
            for i in range(n)
        ]
        self.sizes = [
            int(self._lib.uwu_tar_size(self._handle, i)) for i in range(n)
        ]

    def __len__(self) -> int:
        return len(self.names)

    def read(self, i: int) -> bytes:
        if self._fallback is not None:
            return self._fallback.read(i)
        buf = ctypes.create_string_buffer(self.sizes[i])
        rc = self._lib.uwu_tar_read(self._handle, i, buf)
        if rc != 0:
            raise IOError(f"tar read failed for member {i}")
        return buf.raw

    def close(self):
        if self._fallback is not None:
            self._fallback.close()
            self._fallback = None
        elif self._handle:
            self._lib.uwu_tar_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def _split_key_ext(name: str) -> tuple[str, str]:
    """webdataset convention: the key is everything up to the FIRST dot
    of the basename; the rest is the (possibly dotted) extension."""
    d, _, base = name.rpartition("/")
    key, _, ext = base.partition(".")
    return (f"{d}/{key}" if d else key), ext.lower()


class WebDatasetTarDataset(UwUBaseDataset):
    """Text-image samples from webdataset tar shards: members group by
    basename key; ``.jpg/.jpeg/.png`` is the image, ``.txt`` (or
    ``.text``/``.caption``) the caption. Same sample dict as
    ``LocalImageDataset`` (drop-in for the trainer/collate/aspect-bucket
    machinery)."""

    def __init__(
        self,
        shards: list[str] | str,
        image_size: tuple[int, int] = (1024, 1024),  # (W, H)
        tokenizers: Sequence = (),
        default_caption: str = "",
        native: bool = True,
        native_decode: bool = True,
    ):
        self.index = TarIndex(shards, native=native)
        self.image_size = tuple(image_size)
        self.tokenizers = list(tokenizers)
        self.default_caption = default_caption
        self.native_decode = native_decode
        self._native_ok: bool | None = None

        groups: dict[str, dict[str, int]] = {}
        order: list[str] = []
        for i, name in enumerate(self.index.names):
            key, ext = _split_key_ext(name)
            if key not in groups:
                groups[key] = {}
                order.append(key)
            groups[key][ext] = i
        self.samples: list[tuple[int, int | None]] = []  # (img_i, txt_i)
        for key in order:
            g = groups[key]
            img_i = next(
                (g[e] for e in _IMAGE_EXTS if e in g), None
            )
            if img_i is None:
                continue  # not an image sample (e.g. metadata-only key)
            txt_i = next((g[e] for e in _CAPTION_EXTS if e in g), None)
            self.samples.append((img_i, txt_i))

    def __len__(self) -> int:
        return len(self.samples)

    def _decode(self, buf: bytes) -> np.ndarray:
        w, h = self.image_size
        if self.native_decode and self._native_ok is not False:
            try:
                from uwudiff_tpu.data.native_image import decode_image_bytes

                out = decode_image_bytes(buf, (h, w))
                self._native_ok = True
                return out
            except Exception:
                if self._native_ok:  # was working: a real decode error
                    raise
                self._native_ok = False  # no toolchain/libs: PIL fallback
        import io

        from PIL import Image

        from uwudiff_tpu.data.utils import (
            resize_and_crop_image,
            vae_image_preprocess,
        )

        img = Image.open(io.BytesIO(buf)).convert("RGB")
        img = resize_and_crop_image(img, self.image_size)
        return vae_image_preprocess(img)

    def __getitem__(self, index: int) -> dict:
        img_i, txt_i = self.samples[index]
        sample = self._decode(self.index.read(img_i))
        caption = (
            self.index.read(txt_i).decode("utf-8").strip()
            if txt_i is not None
            else self.default_caption
        )
        w, h = self.image_size
        return {
            "sample": sample,
            "caption": caption,
            "tokenizer_out": self._tokenize(caption),
            "add_time_ids": np.asarray([h, w, 0, 0, h, w], dtype=np.float32),
        }
