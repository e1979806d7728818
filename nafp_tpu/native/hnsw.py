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
                    "-fPIC", "-std=c++17", _SRC, "-o", _SO],
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
    lib.hnsw_search.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int64),
                                ctypes.POINTER(ctypes.c_float)]
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

    def add(self, data: np.ndarray) -> None:
        data = np.ascontiguousarray(data, np.float32)
        assert data.shape[1] == self.d
        self._lib.hnsw_add(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(data))

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
