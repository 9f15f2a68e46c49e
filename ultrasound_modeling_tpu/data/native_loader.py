"""ctypes bindings for the native .npy shard loader (native/npy_loader.cpp).

Out-of-core batch assembly: memory-maps .npy shards and gathers sample rows
into a contiguous batch buffer with a C++ thread pool — the host-side runtime
piece for datasets that don't fit in HBM (the device-resident
``data.pipeline.Dataset`` covers the in-memory case).  Builds the shared
library on first use (``make -C native``); falls back to a NumPy
``np.load(mmap_mode='r')`` gather when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libuml_npy.so")

_KIND_TO_DTYPE = {
    (b"f", 4): np.float32, (b"f", 8): np.float64,
    (b"i", 4): np.int32, (b"i", 8): np.int64,
    (b"u", 1): np.uint8, (b"b", 1): np.bool_,
}


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.uml_open.restype = ctypes.c_void_p
    lib.uml_open.argtypes = [ctypes.c_char_p]
    lib.uml_ndim.restype = ctypes.c_int
    lib.uml_ndim.argtypes = [ctypes.c_void_p]
    lib.uml_dim.restype = ctypes.c_int64
    lib.uml_dim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.uml_itemsize.restype = ctypes.c_int
    lib.uml_itemsize.argtypes = [ctypes.c_void_p]
    lib.uml_kind.restype = ctypes.c_char
    lib.uml_kind.argtypes = [ctypes.c_void_p]
    lib.uml_row_bytes.restype = ctypes.c_int64
    lib.uml_row_bytes.argtypes = [ctypes.c_void_p]
    lib.uml_gather.restype = ctypes.c_int
    lib.uml_gather.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int64),
                               ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
    lib.uml_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None
_LIB_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_lib()
        _LIB_TRIED = True
    return _LIB


class NpyShard:
    """Random-access row gather over one memory-mapped .npy file."""

    def __init__(self, path: str, n_threads: int = 4,
                 force_fallback: bool = False):
        self.path = path
        self.n_threads = n_threads
        self._handle = None
        self._mmap = None
        lib = None if force_fallback else _lib()
        if lib is not None:
            handle = lib.uml_open(path.encode())
            if handle:
                ndim = lib.uml_ndim(handle)
                kind = lib.uml_kind(handle)
                item = lib.uml_itemsize(handle)
                dtype = _KIND_TO_DTYPE.get((kind, item))
                if dtype is None:
                    # dtype the gather path doesn't map (e.g. f2/c8): close
                    # the native handle and take the mmap fallback below.
                    # (_handle stays None — setting it before this check
                    # would leave a dangling pointer for gather()/close().)
                    lib.uml_close(handle)
                else:
                    self._handle = handle
                    self._libref = lib
                    self.shape = tuple(lib.uml_dim(handle, i)
                                       for i in range(ndim))
                    self.dtype = np.dtype(dtype)
                    self.native = True
                    return
        # NumPy fallback: memory-mapped load.
        self._mmap = np.load(path, mmap_mode="r")
        self.shape = self._mmap.shape
        self.dtype = self._mmap.dtype
        self.native = False

    def gather(self, indices: np.ndarray) -> np.ndarray:
        """Rows ``[len(indices), *shape[1:]]`` as a fresh contiguous array."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx),) + tuple(self.shape[1:]), self.dtype)
        if self._handle is not None:
            rc = self._libref.uml_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx), out.ctypes.data_as(ctypes.c_void_p),
                self.n_threads)
            if rc != 0:
                raise IndexError("gather index out of range")
            return out
        np.take(self._mmap, idx, axis=0, out=out)
        return out

    def close(self):
        if self._handle is not None:
            self._libref.uml_close(self._handle)
            self._handle = None
        self._mmap = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
