"""ctypes loader for the native preprocessing library (native/).

Builds native/libnngp_native.so on first use if a toolchain is available;
falls back silently to the NumPy implementations otherwise.  The native
fast paths cover the O(n^2) exact maxmin ordering and the sequential greedy
coloring (reference equivalents: GpGp::order_maxmin C++ and the R loop in
Scripts/Coloring.R).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnngp_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
        os.path.join(_NATIVE_DIR, "Makefile")
    ):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.maxmin_order.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.maxmin_order.restype = None
        lib.greedy_coloring.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.greedy_coloring.restype = ctypes.c_int32
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def maxmin_order_native(x: np.ndarray):
    """Native exact maxmin ordering, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    n, d = x.shape
    out = np.empty(n, dtype=np.int64)
    lib.maxmin_order(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        d,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def greedy_coloring_native(indptr: np.ndarray, indices: np.ndarray, n: int):
    """Native first-fit coloring over CSR adjacency, or None."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    out = np.empty(n, dtype=np.int32)
    lib.greedy_coloring(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
