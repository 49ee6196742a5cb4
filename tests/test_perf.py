"""Pinned-workload perf regression guard.

The round-3 bench regressed 202.8 -> 180.8 w/s with no artifact that could
distinguish an engine regression from dev-tunnel noise.  This test pins the
CPU-backend half of that question: the identical 64-window bench workload
(bench.make_window_payloads, same RNG seed) through the production
process_window_batch, compared against a committed envelope measured on
this host class.  The CPU backend has no tunnel, so a >2.5x slowdown vs
the envelope is an engine regression, not link noise.  (The envelope is
deliberately loose — CI hosts share cores; catching order-of-magnitude
regressions like an accidentally serialized batch path is the goal, not
5% drift.  bench.py's trial_s/stages fields carry the fine-grained story.)
"""
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# committed envelope: seconds for 64 windows, CPU backend, this host class
# (re-measured 2026-08-21 after the PERF.md §12 engine rework: 0.92 s
# warm on 2 cores — was ~4.4 s; envelope keeps ~2.7x slower-host slack).
# Guard trips at 2.5x.
ENVELOPE_64_S = 2.5
GUARD_FACTOR = 2.5


def test_pinned_workload_cpu_throughput():
    import numpy as np
    import bench
    from svscope_tpu.engine.localgraph import process_window_batch

    wins = bench.make_window_payloads(64, np.random.default_rng(0))
    process_window_batch(wins, device_poa=False)        # compile warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        records = process_window_batch(wins, device_poa=False)
        best = min(best, time.time() - t0)
    n_som = sum(1 for r in records if str(r[9]).endswith("EMOutput"))
    assert n_som >= 51, f"only {n_som}/64 somatic calls"
    # two-tier wall guard: the LOOSE order-of-magnitude bound always
    # asserts (an accidentally serialized batch path is caught anywhere;
    # no plausible CI oversubscription eats 10x), while the tight
    # envelope only asserts on hosts that opt in via SVSCOPE_PERF_ASSERT=1
    # (round-4 advisor: shared CI hosts can blow a 2.5x margin with no
    # engine regression).
    loose = ENVELOPE_64_S * 10
    assert best <= loose, (
        f"pinned 64-window workload took {best:.1f}s on the CPU backend "
        f"(>10x the {ENVELOPE_64_S}s envelope) — an order-of-magnitude "
        "engine regression; see bench.py stages split to localize")
    limit = ENVELOPE_64_S * GUARD_FACTOR
    if os.environ.get("SVSCOPE_PERF_ASSERT") != "1":
        print(f"[test_perf] 64 windows in {best:.2f}s "
              f"(tight envelope {limit:.0f}s asserts with "
              "SVSCOPE_PERF_ASSERT=1)")
        return
    assert best <= limit, (
        f"pinned 64-window workload took {best:.1f}s on the CPU backend "
        f"(envelope {ENVELOPE_64_S}s x{GUARD_FACTOR}) — engine regression, "
        "not tunnel noise; see bench.py stages split to localize")
