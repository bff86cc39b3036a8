"""ctypes wrapper over the native prefetching batch loader (native/loader.cc).

Replaces the reference's DataLoader worker processes (ref:utils/dataset.py)
with a C++ prefetch thread that assembles shuffled uint8 batches into
contiguous buffers while the device computes. Auto-builds the .so with the
repo Makefile on first use (g++ is in the image; pybind11 is not, hence
ctypes); falls back to a NumPy gather when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libcpgloader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.cpg_loader_create.restype = ctypes.c_void_p
    lib.cpg_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int]
    lib.cpg_loader_next.restype = ctypes.c_int
    lib.cpg_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
    lib.cpg_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeBatcher:
    """Prefetching batch iterator over in-memory (x uint8 NHWC, y int32)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 seed: int = 0, shuffle: bool = True, capacity: int = 3):
        assert x.dtype == np.uint8 and x.ndim >= 2
        # keep memmaps as-is (ascontiguousarray would pull the whole dataset
        # into RAM — the C++ side reads through the borrowed pointer, so the
        # OS pages larger-than-RAM datasets in on demand; see data/stream.py)
        self.x = x if x.flags["C_CONTIGUOUS"] else np.ascontiguousarray(x)
        y = y if y.dtype == np.int32 else y.astype(np.int32)
        self.y = y if y.flags["C_CONTIGUOUS"] else np.ascontiguousarray(y)
        self.batch_size = batch_size
        self.item_shape = x.shape[1:]
        self.item_bytes = int(np.prod(self.item_shape))
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++/make missing)")
        self._lib = lib
        self._h = lib.cpg_loader_create(
            self.x.ctypes.data_as(ctypes.c_void_p),
            self.y.ctypes.data_as(ctypes.c_void_p),
            len(self.x), self.item_bytes, batch_size, capacity, seed,
            1 if shuffle else 0)
        if not self._h:
            raise RuntimeError("cpg_loader_create failed")
        self._bx = np.empty((batch_size, *self.item_shape), np.uint8)
        self._by = np.empty((batch_size,), np.int32)

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        rc = self._lib.cpg_loader_next(
            self._h, self._bx.ctypes.data_as(ctypes.c_void_p),
            self._by.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError(f"cpg_loader_next rc={rc}")
        # copies so the caller may hold batches across next() calls
        return self._bx.copy(), self._by.copy()

    def batches(self, steps: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for _ in range(steps):
            yield self.next()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.cpg_loader_destroy(self._h)
            self._h = None

    def __del__(self):  # best effort
        try:
            self.close()
        except Exception:
            pass
