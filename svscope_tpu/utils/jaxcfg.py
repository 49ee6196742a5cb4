"""Shared JAX configuration: persistent compilation cache.

Mosaic/XLA compiles on the tunneled TPU backend cost tens of seconds per
kernel shape; the on-disk cache makes them one-time per machine instead of
per process.  Imported by every module that builds jitted kernels."""
from __future__ import annotations

import os

_done = False


def enable_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "SVSCOPE_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "svscope_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass
