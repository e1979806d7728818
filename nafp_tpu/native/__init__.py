"""Native (C++) runtime components, loaded via ctypes.

``wavio``: threaded PCM16 WAV segment decoder — the native replacement for
the reference's multiprocessing loader runtime. Built on first import with
g++ (cached as ``_wavio.so``); every consumer must handle ``wavio_lib()``
returning None and fall back to the pure-Python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "wavio.cc")
_SO = os.path.join(os.path.dirname(__file__), "_wavio.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no toolchain / readonly fs -> python fallback
        print(f"[native] wavio build failed ({e}); using python decoder")
        return False


def wavio_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # Incompatible binary (e.g. built on another platform/arch):
            # rebuild once for this host before giving up.
            if not _build():
                return None
            lib = ctypes.CDLL(_SO)
        lib.nafp_load_segments.restype = ctypes.c_int
        lib.nafp_load_segments.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.nafp_wav_info.restype = ctypes.c_int
        lib.nafp_wav_info.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except OSError as e:
        print(f"[native] wavio load failed ({e}); using python decoder")
    return _lib


def load_segments_native(paths, starts, seg_len: int,
                         n_threads: int = 4) -> Optional[np.ndarray]:
    """Batch-decode segments; returns (n, seg_len) float32 or None if the
    native lib is unavailable. Raises on decode failure (bad file)."""
    lib = wavio_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, seg_len), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = np.ascontiguousarray(np.asarray(starts, np.int64))
    rc = lib.nafp_load_segments(
        c_paths, c_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, seg_len, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads)
    if rc != 0:
        raise IOError(f"native decode failed for {paths[-rc - 1]!r}")
    return out


def wav_info_native(path: str):
    """(n_frames, sample_rate) via the native header parser, or None."""
    lib = wavio_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    if lib.nafp_wav_info(path.encode(), ctypes.byref(n),
                         ctypes.byref(sr)) != 0:
        raise IOError(f"bad wav: {path}")
    return int(n.value), int(sr.value)
