"""Shared native-library build/load policy (round 5, ADVICE fix).

All three C++ kernels (poa_engine, bam_scan, hcluster) are built locally
with -march=native for full SIMD (the POA engine's AVX-512 path is
compile-time gated).  Two hazards with the previous per-lib loaders:

* staleness was mtime-based — unreliable after a fresh clone (checkout
  order can leave the committed .so newer than the source);
* a committed prebuilt .so from a newer CPU can SIGILL at call time on an
  older host, which a Python ``except`` cannot catch (process crash).

Policy here: rebuild whenever the source's content hash differs from the
sidecar recorded at build time (``<lib>.meta.json``).  When g++ is
unavailable, a prebuilt .so is only loaded if the sidecar's recorded CPU
feature flags are a subset of this host's (/proc/cpuinfo) — otherwise the
loader raises and the caller takes its pure-Python fallback instead of
crashing.  ``SVSCOPE_NATIVE_MARCH`` overrides the -march flag (e.g.
``x86-64-v3`` for a portable build artifact).
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess

# march=native features that matter for correctness-of-execution; anything
# the compiler used beyond this baseline set must be present on the host.
_BASELINE = {"fpu", "mmx", "sse", "sse2"}


def _src_hash(src: str) -> str:
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _host_cpu_flags() -> set[str]:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return set(line.split(":", 1)[1].split())
    except OSError:
        pass
    return set()


def _meta_path(lib: str) -> str:
    return lib + ".meta.json"


def ensure_lib(src: str, lib: str, extra_flags: tuple[str, ...] = ()) -> str:
    """Build (if needed and possible) and validate ``lib`` from ``src``.

    Returns the library path; raises RuntimeError when no safe library can
    be produced (missing toolchain + incompatible/unverifiable prebuilt).
    """
    march = os.environ.get("SVSCOPE_NATIVE_MARCH", "native")
    have_gxx = shutil.which("g++") is not None
    meta = None
    if os.path.exists(_meta_path(lib)):
        try:
            with open(_meta_path(lib)) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            meta = None
    src_ok = os.path.exists(src)
    want_hash = _src_hash(src) if src_ok else None
    host_flags = _host_cpu_flags()
    compatible = (meta is not None
                  and not (set(meta.get("cpu_flags", ())) - host_flags))
    fresh = (os.path.exists(lib) and meta is not None and compatible
             and meta.get("src_sha256") == want_hash
             and meta.get("march") == march)
    if src_ok and have_gxx and not fresh:
        # extra_flags go last so -l libraries follow the source object
        subprocess.run(["g++", "-O3", f"-march={march}", "-shared", "-fPIC",
                        "-o", lib, src, *extra_flags], check=True)
        with open(_meta_path(lib), "w") as f:
            json.dump({"src_sha256": want_hash, "march": march,
                       "cpu_flags": sorted(_host_cpu_flags() - _BASELINE)},
                      f)
        return lib
    if not os.path.exists(lib):
        raise RuntimeError(f"{lib} unavailable and cannot build "
                           f"(g++={'yes' if have_gxx else 'no'}, "
                           f"src={'yes' if src_ok else 'no'})")
    # existing lib we did not just build (prebuilt/committed, or toolchain
    # missing): refuse unless its recorded CPU features all exist here —
    # SIGILL is not catchable from Python, so "try and see" is not an
    # option.  A fresh local build recorded this host's own flags and
    # passes trivially.
    if not meta:
        raise RuntimeError(
            f"prebuilt {lib} has no build metadata; refusing to load "
            "(rebuild with g++ available, or set SVSCOPE_NATIVE_MARCH)")
    missing = set(meta.get("cpu_flags", ())) - host_flags
    if missing:
        raise RuntimeError(
            f"prebuilt {lib} needs CPU features absent on this host: "
            f"{sorted(missing)[:8]}")
    return lib
