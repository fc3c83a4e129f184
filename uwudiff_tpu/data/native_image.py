"""ctypes bindings for the native image-decoding runtime
(``native/uwu_imageio.cpp``): GIL-free JPEG/PNG decode +
resize-and-center-crop + [-1,1] normalization in C++ worker threads —
the pixel-space analogue of ``data/native.py``'s latent-shard loader
(extends the reference's PIL/torchvision loading path,
``duwu/data/text_image_local.py`` + ``data/utils.py``, into a
production decode pool).

Builds on first use with g++ against the system libjpeg/libpng; PIL
remains the fallback when a toolchain or the libraries are missing.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = [
    "load_library",
    "decode_image",
    "decode_image_bytes",
    "NativeImageLoader",
]

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "uwu_imageio.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB_PATH = _BUILD_DIR / "libuwu_imageio.so"
_lock = threading.Lock()
_lib = None


def load_library() -> ctypes.CDLL:
    """Build (once) and load the native image library."""
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
                    "g++", "-O3", "-march=native", "-funroll-loops",
                    "-shared", "-fPIC", "-std=c++17",
                    "-pthread", str(_SRC), "-o", str(_LIB_PATH),
                    "-ljpeg", "-lpng",
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.uwu_img_probe.restype = ctypes.c_int
        lib.uwu_img_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.uwu_img_load.restype = ctypes.c_int
        lib.uwu_img_load.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.uwu_img_load_mem.restype = ctypes.c_int
        lib.uwu_img_load_mem.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.uwu_imgload_start.restype = ctypes.c_void_p
        lib.uwu_imgload_start.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.uwu_imgload_next.restype = ctypes.c_int
        lib.uwu_imgload_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.uwu_imgload_stop.restype = None
        lib.uwu_imgload_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def probe_image(path: str) -> tuple[int, int]:
    """(width, height) of a JPEG/PNG without Python-side decode."""
    lib = load_library()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.uwu_img_probe(str(path).encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"cannot decode {path}")
    return w.value, h.value


def decode_image(path: str, target_hw: tuple[int, int]) -> np.ndarray:
    """One image -> [H, W, 3] float32 in [-1, 1] (decode + aspect-
    preserving resize + center crop, ``resize_and_crop_image`` +
    ``vae_image_preprocess`` semantics)."""
    lib = load_library()
    th, tw = target_hw
    out = np.empty((th, tw, 3), np.float32)
    rc = lib.uwu_img_load(
        str(path).encode(), th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"cannot decode {path}")
    return out


def decode_image_bytes(buf: bytes, target_hw: tuple[int, int]) -> np.ndarray:
    """In-memory counterpart of :func:`decode_image` (tar-shard /
    webdataset members): JPEG/PNG bytes -> [H, W, 3] float32 in
    [-1, 1]."""
    lib = load_library()
    th, tw = target_hw
    out = np.empty((th, tw, 3), np.float32)
    rc = lib.uwu_img_load_mem(
        buf, len(buf), th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError("cannot decode image bytes")
    return out


class NativeImageLoader:
    """Background-threaded batch iterator over image paths: yields
    [B, H, W, 3] float32 batches in path order while workers decode
    ahead through a bounded ring."""

    def __init__(
        self,
        paths: list[str],
        target_hw: tuple[int, int],
        batch_size: int,
        n_threads: int = 4,
    ):
        self._lib = load_library()
        self.paths = [str(p) for p in paths]
        self.th, self.tw = target_hw
        self.batch_size = batch_size
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self._keepalive = arr
        self._handle = self._lib.uwu_imgload_start(
            arr, len(self.paths), self.th, self.tw, batch_size, n_threads
        )
        self.n_batches = len(self.paths) // batch_size

    def __iter__(self):
        out = np.empty((self.batch_size, self.th, self.tw, 3), np.float32)
        while True:
            rc = self._lib.uwu_imgload_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc == 1:
                break
            if rc == -1:
                raise IOError("a decode failed inside the batch")
            yield out.copy()

    def close(self):
        if self._handle:
            self._lib.uwu_imgload_stop(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
