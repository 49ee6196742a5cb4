"""Native (C++) runtime components, loaded via ctypes.

libpoa.so is built from native/poa_engine.cpp; if the shared object is
missing or stale it is rebuilt on import with g++ (no pip/pybind needed).
"""
from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(__file__)
_REPO = os.path.dirname(os.path.dirname(_HERE))
LIBPOA = os.path.join(_HERE, "libpoa.so")
_SRC = os.path.join(_REPO, "native", "poa_engine.cpp")


def ensure_libpoa() -> str:
    if os.path.exists(_SRC):
        if (not os.path.exists(LIBPOA)
                or os.path.getmtime(LIBPOA) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                            "-o", LIBPOA, _SRC], check=True)
    if not os.path.exists(LIBPOA):
        raise RuntimeError("libpoa.so unavailable and source missing")
    return LIBPOA
