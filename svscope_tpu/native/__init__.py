"""Native (C++) runtime components, loaded via ctypes.

libpoa.so is built from native/poa_engine.cpp; build/load policy
(content-hash staleness, CPU-feature-gated prebuilts) is shared across
the native libs — see native/_build.py.
"""
from __future__ import annotations

import os

from ._build import ensure_lib as _ensure

_HERE = os.path.dirname(__file__)
_REPO = os.path.dirname(os.path.dirname(_HERE))
LIBPOA = os.path.join(_HERE, "libpoa.so")
_SRC = os.path.join(_REPO, "native", "poa_engine.cpp")


def ensure_libpoa() -> str:
    return _ensure(_SRC, LIBPOA)
