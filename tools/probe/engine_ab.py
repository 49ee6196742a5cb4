"""Interleaved same-process A/B of two libpoa builds.

Host-speed variance on shared dev VMs (±25% minute to minute, PERF.md
§11) makes sequential benchmarks of small engine changes unreadable.
This harness loads two libpoa .so files side by side, asserts their
poa_msa_batch outputs are byte-identical on the bench-bucket workload,
and times them in strict alternation so both see the same host
conditions.  Every §12 engine change was gated through this method.

Usage:
  g++ -O3 -march=native -shared -fPIC -o /tmp/b.so native/poa_engine.cpp
  python tools/probe/engine_ab.py svscope_tpu/native/libpoa.so /tmp/b.so
"""
from __future__ import annotations

import ctypes as ct
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def _load(path: str):
    import svscope_tpu.native.poa as npoa  # noqa: F401 (argtypes helpers)
    l = ct.CDLL(path)
    l.poa_msa_batch.restype = ct.c_int
    l.poa_msa_batch.argtypes = [
        ct.c_char_p, ct.POINTER(ct.c_int64), ct.c_int64,
        ct.POINTER(ct.c_int64), ct.c_int64, ct.POINTER(ct.c_uint8),
        ct.c_int64, ct.POINTER(ct.c_int64), ct.c_int32]
    return l


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    import bench
    import svscope_tpu.native.poa as npoa

    wins = bench.make_window_payloads(128, np.random.default_rng(3))
    seq_lists = [w.sequences for w in wins]
    flat: list[bytes] = []
    win_off = np.zeros(len(seq_lists) + 1, np.int64)
    for w, seqs in enumerate(seq_lists):
        flat.extend(s.encode() for s in seqs)
        win_off[w + 1] = len(flat)
    seq_off = np.zeros(len(flat) + 1, np.int64)
    for i, b in enumerate(flat):
        seq_off[i + 1] = seq_off[i] + len(b)
    blob = b"".join(flat)
    est = max((len(s) + 2) * (2 * max(map(len, s)) + 260) for s in seq_lists)

    a, b = _load(sys.argv[1]), _load(sys.argv[2])

    def run(l):
        out = np.zeros(len(seq_lists) * est, np.uint8)
        out_len = np.zeros(len(seq_lists), np.int64)
        rc = l.poa_msa_batch(blob, npoa._i64p(seq_off), len(flat),
                             npoa._i64p(win_off), len(seq_lists),
                             npoa._u8p(out), est, npoa._i64p(out_len), 2)
        assert rc == 0, f"poa_msa_batch rc={rc}"
        return out, out_len

    run(a), run(b)                      # warm (page-in, branch history)
    ra, rb = run(a), run(b)
    identical = (ra[1] == rb[1]).all() and (ra[0] == rb[0]).all()
    ta, tb = [], []
    for _ in range(7):
        t0 = time.perf_counter(); run(a); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(b); tb.append(time.perf_counter() - t0)
    print(f"A {sys.argv[1]}: best {min(ta):.3f}s "
          f"{sorted(round(t, 3) for t in ta)}")
    print(f"B {sys.argv[2]}: best {min(tb):.3f}s "
          f"{sorted(round(t, 3) for t in tb)}")
    print(f"outputs byte-identical: {identical}")
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
