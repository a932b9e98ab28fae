"""ctypes wrapper for the native GF(2) eliminator (gf2_eliminate.cc)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _cache_dir() -> str:
    d = os.environ.get(
        "KMLDPC_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".cache"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise RuntimeError("native build previously failed")
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gf2_eliminate.cc")
        so = os.path.join(_cache_dir(), "libgf2_eliminate.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so + ".tmp"],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(so + ".tmp", so)
            except Exception as e:  # no toolchain / compile error -> fallback
                _build_failed = True
                raise RuntimeError(f"native build failed: {e}") from e
        lib = ctypes.CDLL(so)
        lib.gf2_systematize.restype = ctypes.c_int
        lib.gf2_systematize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return lib


def systematize(h: np.ndarray, reverse: bool) -> tuple[np.ndarray, np.ndarray, int]:
    """Drop-in for gf2.systematize_{forward,reverse}: (enc_h, perm, rank)."""
    lib = _load()
    h = np.ascontiguousarray(h, dtype=np.uint8)
    rows, cols = h.shape
    enc = np.empty((rows, cols), dtype=np.uint8)
    perm = np.empty(cols, dtype=np.int64)
    rank = lib.gf2_systematize(
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows, cols, int(reverse),
        enc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rank < 0:
        raise RuntimeError("gf2_systematize failed")
    return enc, perm, rank
