"""ctypes wrapper for the native batch cloud loader (csrc/fast_loader.cc).

Replaces per-file python ``np.fromfile`` dispatch
(utils/loading_pointclouds.py:14-48) with one threaded C++ call per
tuple batch. Builds the shared library on first use if g++ is present;
falls back silently to the numpy path otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libfastloader.so"))
_lib = None
_tried = False


def _ensure_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.abspath(os.path.join(_CSRC, "fast_loader.cc"))
    if not os.path.exists(_LIB_PATH) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", _LIB_PATH],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.load_clouds_f64.restype = ctypes.c_int
        lib.load_clouds_f64.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _ensure_lib() is not None


def load_clouds(
    paths: Sequence[str],
    n_points: int,
    normalize: bool = False,
    n_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Batch-read float64 ``.bin`` clouds.

    Returns ``(clouds (F, n_points, 3) float32,
    norm_meta (F, 4) [cx, cy, cz, scale], n_ok)``. Unreadable files
    leave zero rows (reference semantics, loading_pointclouds.py:26-30).
    """
    lib = _ensure_lib()
    assert lib is not None, "native loader unavailable"
    n = len(paths)
    out = np.zeros((n, n_points, 3), np.float32)
    meta = np.zeros((n, 4), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    n_ok = lib.load_clouds_f64(
        arr,
        n,
        n_points,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(normalize),
        n_threads,
    )
    return out, meta, int(n_ok)
