"""Measure the fused on-device MSA build against the host C++ engine on
the bench workload (256 windows, 300 bp + 2x50 flanks, 24 reads + ref).

Run on the attached chip:   python tools/probe/fused_probe.py
Run on CPU for sanity:      JAX_PLATFORMS=cpu python tools/probe/fused_probe.py --small
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import make_window_payloads  # noqa: E402
from svscope_tpu.ops.poa_batch import poa_msa_batch  # noqa: E402


def main():
    n = 64 if "--small" in sys.argv else 256
    rng = np.random.default_rng(0)
    wins = make_window_payloads(n, rng)
    jobs = [w.sequences for w in wins]

    import jax
    print("backend:", jax.default_backend(), jax.devices())

    host = None
    t0 = time.time()
    host = poa_msa_batch(jobs, use_device=False)
    t_host = time.time() - t0
    print(f"host C++      : {t_host:.3f}s  ({n / t_host:.1f} w/s)")

    t0 = time.time()
    fused = poa_msa_batch(jobs, use_device="fused")
    t_cold = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.time()
        fused = poa_msa_batch(jobs, use_device="fused")
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"fused (cold)  : {t_cold:.3f}s")
    print(f"fused (warm)  : {best:.3f}s  ({n / best:.1f} w/s)")
    same = sum(1 for a, b in zip(host, fused) if a == b)
    print(f"identical     : {same}/{n}")
    if "--xla" in sys.argv:
        t0 = time.time()
        poa_msa_batch(jobs, use_device="xla")
        print(f"xla rounds(cold): {time.time() - t0:.3f}s")
        t0 = time.time()
        poa_msa_batch(jobs, use_device="xla")
        print(f"xla rounds(warm): {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
