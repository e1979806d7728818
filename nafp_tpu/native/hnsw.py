"""ctypes wrapper for the native HNSW index (native/hnsw.cc).

API shape matches the other indexes (``add`` / ``search``); reference
parameters M=16, efConstruction=80 (get_index_faiss.py:88-96). CPU-side by
nature (graph pointer-chasing has no TPU-native form) — intended for
low-latency single-query serving, not the batch evaluation path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "hnsw.cc")
_SO = os.path.join(os.path.dirname(__file__), "_hnsw.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    # -ffast-math: the file is all dot products and comparisons (no NaN/inf
    # semantics to preserve) and it vectorizes the reduction — measured
    # 108.6 -> 17.6 ns per 128-d dot on this host. -march=native is safe:
    # a binary moved to another host fails to load and is rebuilt (below).
    subprocess.run(["g++", "-O3", "-march=native", "-ffast-math", "-shared",
                    "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _SO],
                   check=True, capture_output=True, timeout=180)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # Binary from another platform/arch: rebuild once for this host.
        _build()
        lib = ctypes.CDLL(_SO)
    lib.hnsw_create.restype = ctypes.c_void_p
    lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_uint64]
    lib.hnsw_add.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.hnsw_size.restype = ctypes.c_int
    lib.hnsw_size.argtypes = [ctypes.c_void_p]
    lib.hnsw_dim.restype = ctypes.c_int
    lib.hnsw_dim.argtypes = [ctypes.c_void_p]
    lib.hnsw_search.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int64),
                                ctypes.POINTER(ctypes.c_float)]
    lib.hnsw_add_parallel.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int, ctypes.c_int]
    lib.hnsw_save.restype = ctypes.c_int
    lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.hnsw_load.restype = ctypes.c_void_p
    lib.hnsw_load.argtypes = [ctypes.c_char_p]
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class HNSWIndex:
    def __init__(self, d: int, m: int = 16, ef_construction: int = 80,
                 ef_search: int = 64, seed: int = 0):
        self._lib = _load()
        self._h = self._lib.hnsw_create(d, m, ef_construction, seed)
        self.d = d
        self.ef_search = ef_search

    @property
    def ntotal(self) -> int:
        return self._lib.hnsw_size(self._h)

    def add(self, data: np.ndarray, threads: int = 1) -> None:
        """Bulk insert. ``threads > 1`` (or 0 = hardware concurrency) uses
        the lock-striped parallel builder — faiss parallelizes its HNSW add
        the same way. This host has one core, so the serial path is the
        measured default; the threaded path is TSan-verified in tests."""
        data = np.ascontiguousarray(data, np.float32)
        assert data.shape[1] == self.d
        ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if threads == 1:
            self._lib.hnsw_add(self._h, ptr, len(data))
        else:
            self._lib.hnsw_add_parallel(self._h, ptr, len(data), threads)

    def save(self, path: str) -> None:
        """Persist the graph + vectors (binary, versioned). The reference
        never persisted its faiss index — every eval retrained
        (eval_faiss.py:141-151); here a 500k-row build (~minutes) is paid
        once per corpus."""
        rc = self._lib.hnsw_save(self._h, path.encode())
        if rc != 0:
            raise IOError(f"hnsw_save({path}) failed with rc={rc}")

    @classmethod
    def load(cls, path: str, ef_search: int = 64) -> "HNSWIndex":
        lib = _load()
        h = lib.hnsw_load(path.encode())
        if not h:
            raise IOError(f"hnsw_load({path}) failed (missing/corrupt)")
        idx = cls.__new__(cls)
        idx._lib = lib
        idx._h = h
        idx.ef_search = ef_search
        idx.d = lib.hnsw_dim(h)   # from the file header
        return idx

    def search(self, q: np.ndarray, k: int,
               ef_search: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, np.float32)
        nq = len(q)
        ids = np.full((nq, k), -1, np.int64)
        scores = np.full((nq, k), -1e30, np.float32)
        if self.ntotal == 0:
            return scores, ids
        self._lib.hnsw_search(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq, k, ef_search or self.ef_search,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return scores, ids

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hnsw_free(self._h)
            self._h = None
