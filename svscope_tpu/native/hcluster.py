"""ctypes loader for the sequential-order pdist kernel (native/hcluster.cpp).

Feeds models/mixture.ward_linkage: full (n, n) euclidean distance matrix
with scipy pdist's exact per-pair accumulation order (bitwise parity is
the Ward-init contract — see native/hcluster.cpp)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_REPO = os.path.dirname(os.path.dirname(_HERE))
LIB = os.path.join(_HERE, "libhcluster.so")
_SRC = os.path.join(_REPO, "native", "hcluster.cpp")

_lib = None


def ensure_lib() -> str:
    if os.path.exists(_SRC):
        if (not os.path.exists(LIB)
                or os.path.getmtime(LIB) < os.path.getmtime(_SRC)):
            # -ffp-contract=off: an FMA would skip the d*d rounding step
            # that scipy's (and the NumPy fallback's) separate ops perform
            subprocess.run(["g++", "-O3", "-march=native",
                            "-ffp-contract=off", "-shared", "-fPIC",
                            "-o", LIB, _SRC], check=True)
    if not os.path.exists(LIB):
        raise RuntimeError("libhcluster.so unavailable and source missing")
    return LIB


def lib():
    global _lib
    if _lib is None:
        l = ctypes.CDLL(ensure_lib())
        l.pdist_seq.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32]
        l.pdist_seq.restype = None
        _lib = l
    return _lib


def pdist_seq(obs: np.ndarray, n_threads: int | None = None) -> np.ndarray:
    """(n, n) euclidean distances of observation rows, scipy-sequential
    accumulation order, diagonal 0."""
    x = np.ascontiguousarray(np.asarray(obs, np.float64).T)  # (nf, n)
    nf, n = x.shape
    out = np.empty((n, n), np.float64)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1) if n >= 256 else 1
    lib().pdist_seq(x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    n, nf, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    n_threads)
    return out
