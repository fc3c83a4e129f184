"""ctypes bindings for the native data-loading runtime
(``native/uwu_dataio.cpp``): GIL-free multi-threaded shard reading and
batch prefetch for the latent-cache training path.

The library builds on first use with g++ (no pip deps); if a toolchain
is unavailable the pure-Python reader in ``data/latent_cache.py`` is the
fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["load_library", "NativeShardReader", "NativeBatchLoader"]

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "uwu_dataio.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB_PATH = _BUILD_DIR / "libuwu_dataio.so"
_lock = threading.Lock()
_lib = None


def load_library() -> ctypes.CDLL:
    """Build (once) and load the native library."""
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
                    "-pthread", str(_SRC), "-o", str(_LIB_PATH),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.uwu_open.restype = ctypes.c_void_p
        lib.uwu_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        lib.uwu_array_info.restype = ctypes.c_int
        lib.uwu_array_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.uwu_read.restype = ctypes.c_int
        lib.uwu_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
        ]
        lib.uwu_batch_start.restype = ctypes.c_void_p
        lib.uwu_batch_start.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.uwu_batch_next.restype = ctypes.c_int
        lib.uwu_batch_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.uwu_batch_stop.argtypes = [ctypes.c_void_p]
        lib.uwu_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


_DTYPES = {4: np.float32, 2: np.float16, 8: np.float64, 1: np.uint8}


class NativeShardReader:
    """mmap-backed reader over a set of npz shards."""

    def __init__(self, shard_paths: list[str]):
        self.lib = load_library()
        self.paths = [str(p) for p in shard_paths]
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self.handle = self.lib.uwu_open(arr, len(self.paths))
        if not self.handle:
            raise IOError(f"failed to open shards: {self.paths[:3]}...")

    def array_info(self, shard: int, name: str):
        ndim = ctypes.c_int()
        shape = (ctypes.c_int64 * 8)()
        itemsize = self.lib.uwu_array_info(
            self.handle, shard, name.encode(), ctypes.byref(ndim), shape
        )
        if itemsize < 0:
            raise KeyError(f"{name} not in shard {shard}")
        return tuple(shape[: ndim.value]), itemsize

    def read(self, shard: int, name: str) -> np.ndarray:
        shape, itemsize = self.array_info(shard, name)
        out = np.empty(shape, dtype=_DTYPES[itemsize])
        rc = self.lib.uwu_read(
            self.handle, shard, name.encode(),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise IOError(f"read failed: shard {shard} array {name}")
        return out

    def close(self):
        if self.handle:
            self.lib.uwu_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Background-threaded gather-batch iterator over one array across
    shards. ``order`` is a list of (shard_idx, row_idx) pairs."""

    def __init__(
        self,
        reader: NativeShardReader,
        name: str,
        order: list[tuple[int, int]],
        batch_size: int,
        n_threads: int = 2,
    ):
        self.reader = reader
        self.name = name
        self.batch_size = batch_size
        n = (len(order) // batch_size) * batch_size
        shard_idx = (ctypes.c_int32 * n)(*[int(o[0]) for o in order[:n]])
        row_idx = (ctypes.c_int32 * n)(*[int(o[1]) for o in order[:n]])
        shape, itemsize = reader.array_info(order[0][0], name)
        self.row_shape = shape[1:]
        self.dtype = _DTYPES[itemsize]
        self.n_batches = n // batch_size
        self.loader = reader.lib.uwu_batch_start(
            reader.handle, name.encode(), shard_idx, row_idx, n,
            batch_size, n_threads,
        )

    def __iter__(self):
        for _ in range(self.n_batches):
            out = np.empty((self.batch_size, *self.row_shape), self.dtype)
            rc = self.reader.lib.uwu_batch_next(
                self.loader, out.ctypes.data_as(ctypes.c_void_p)
            )
            if rc != 0:
                break
            yield out

    def stop(self):
        if self.loader:
            self.reader.lib.uwu_batch_stop(self.loader)
            self.loader = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
