"""Round-5 plateau probe: why does the 2-chunk pipeline (1.41 s) lose to
the serial stage sum (0.64 s/chunk)?  Measures the same 256-window bench
workload under controlled variants:

  serial      chunks processed with no prefetch thread (A; B; C per chunk)
  pipe        the production pipelined path (current default)
  pipe-tN     pipelined with the native POA pool capped at N threads

Run: python tools/probe/pipeline_probe.py [--variants serial,pipe,...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench


def run_serial(wins, threads=None):
    from svscope_tpu.engine import localgraph as lg
    records = []
    for off in range(0, len(wins), lg.PIPELINE_CHUNK):
        chunk = wins[off:off + lg.PIPELINE_CHUNK]
        entries, ready = lg._stage_a(chunk, "tumor", 3, 0.05, False, threads)
        fetch = lg._dispatch_em(ready, None)
        records.extend(lg._complete_chunk(entries, ready, fetch, "tumor", 3,
                                          False, threads))
    return records


def run_pipe(wins, threads=None):
    from svscope_tpu.engine.localgraph import process_window_batch
    return process_window_batch(wins, device_poa=False, threads=threads)


def timeit(fn, wins, n=3):
    fn(wins)          # warm (compile)
    best = []
    for _ in range(n):
        t0 = time.time()
        r = fn(wins)
        best.append(time.time() - t0)
        n_som = sum(1 for x in r if str(x[9]).endswith("EMOutput"))
        assert n_som >= len(wins) * 0.8, n_som
    return min(best), best


def main():
    variants = None
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            variants = a.split("=", 1)[1].split(",")
    rng = np.random.default_rng(0)
    wins = bench.make_window_payloads(256, rng)
    table = {
        "serial": lambda w: run_serial(w),
        "serial-t2": lambda w: run_serial(w, threads=2),
        "pipe": lambda w: run_pipe(w),
        "pipe-t2": lambda w: run_pipe(w, threads=2),
        "pipe-t1": lambda w: run_pipe(w, threads=1),
        "serial-t1": lambda w: run_serial(w, threads=1),
    }
    for name in (variants or list(table)):
        best, all_t = timeit(table[name], wins)
        print(f"{name:12s} best={best:.3f}s  w/s={256/best:7.1f}  "
              f"all={[round(t,3) for t in all_t]}", flush=True)


if __name__ == "__main__":
    main()
