"""ctypes binding for the C++ host batcher (native/batcher.cpp).

The reference assembles batches in torch DataLoader fork-workers
(`/root/reference/src/datamodules/base.py:14-27`); the TPU-native
equivalent is a small threaded C++ library: ``gather_rows`` copies the
selected epoch rows straight into one contiguous buffer the device DMA
reads, and ``shuffle_perm`` is a seeded Fisher-Yates permutation.

The shared library is built on first import with the in-image toolchain
(``make -C native``); when the build is impossible the module degrades to
numpy (``available()`` returns False) — same results, fewer threads.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libigmbatcher.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "batcher.cpp"
    if not src.exists():
        return False
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.igm_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
        lib.igm_gather_rows.restype = None
        lib.igm_shuffle_perm.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_uint64]
        lib.igm_shuffle_perm.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, indices: np.ndarray,
                n_threads: int = 0) -> np.ndarray:
    """dst[i] = src[indices[i]] — threaded memcpy per row; numpy fallback."""
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(src)[idx]
    src_c = np.ascontiguousarray(src)
    row_bytes = src_c.dtype.itemsize * int(np.prod(src_c.shape[1:], dtype=np.int64))
    dst = np.empty((len(idx),) + src_c.shape[1:], dtype=src_c.dtype)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.igm_gather_rows(
        src_c.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(idx)), ctypes.c_int64(row_bytes),
        ctypes.c_int32(n_threads))
    return dst


def shuffle_perm(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic Fisher-Yates permutation of [0, n)."""
    lib = _load()
    if lib is None:
        return np.random.default_rng(seed).permutation(n).astype(np.int64)
    out = np.empty((n,), dtype=np.int64)
    lib.igm_shuffle_perm(out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                         ctypes.c_int64(n), ctypes.c_uint64(seed))
    return out
