"""End-to-end process_window_batch throughput per POA backend on the
bench workload — the data behind the engine's backend auto-policy.

    python tools/probe/e2e_probe.py [--small] [host|fused|xla|pallas ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import make_window_payloads  # noqa: E402


def main():
    n = 64 if "--small" in sys.argv else 256
    backends = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["host", "fused"]
    rng = np.random.default_rng(0)
    wins = make_window_payloads(n, rng)
    import jax
    from svscope_tpu.engine.localgraph import process_window_batch
    print("backend:", jax.default_backend())
    results = {}
    for be in backends:
        dev = False if be == "host" else be
        t0 = time.time()
        recs = process_window_batch(wins, device_poa=dev)
        cold = time.time() - t0
        n_som = sum(1 for r in recs if str(r[9]).endswith("EMOutput"))
        best = None
        for _ in range(3):
            t0 = time.time()
            recs2 = process_window_batch(wins, device_poa=dev)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[be] = (recs, best)
        print(f"{be:7s}: cold {cold:7.2f}s  warm {best:7.3f}s  "
              f"({n / best:7.1f} w/s)  somatic {n_som}/{n}")
    if len(results) > 1:
        base = results[backends[0]][0]
        for be in backends[1:]:
            same = sum(1 for a, b in zip(base, results[be][0]) if a == b)
            print(f"records {backends[0]} vs {be}: {same}/{n} identical")


if __name__ == "__main__":
    main()
