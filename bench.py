"""Round benchmark: batched per-window EM phasing throughput on the chip.

Workload: 512 candidate windows, each 32 reads x 128 selected MSA columns,
two planted haplotype clusters — the device half of localGraph (all K in
1..9, 20 EM iterations each, BIC selection), via em_cluster_batch exactly
as the production driver calls it.

Baseline: the reference's EMCluster (src/ReadsCluster.py) imported from
/root/reference and timed on the same windows, scaled by its 6-process
localGraph pool cap (src/SVscope.py:158-161).  Falls back to a recorded
constant when the reference isn't mounted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_WINDOWS = 512
N_READS = 32
N_FEAT = 128
BASELINE_WIN_PER_S_RECORDED = 2.2  # measured ref EMCluster*6 on this host


def make_windows(n, rng):
    feats = []
    for _ in range(n):
        a = rng.integers(0, 4, (1, N_FEAT))
        b = (a + 1 + rng.integers(0, 3, (1, N_FEAT))) % 4
        half = N_READS // 2
        x = np.concatenate([np.repeat(a, half, 0), np.repeat(b, N_READS - half, 0)])
        flip = rng.random(x.shape) < 0.03
        x = np.where(flip, rng.integers(0, 5, x.shape), x)
        feats.append(x.astype(np.int64))
    return feats


def measure_ours(feats):
    from svscope_tpu.models.mixture import MAX_BATCH, em_cluster_batch
    # warmup/compile with the same chunk shape the timed run uses
    em_cluster_batch(feats[:MAX_BATCH])
    t0 = time.time()
    res = em_cluster_batch(feats)
    dt = time.time() - t0
    assert all(r is not None for r in res)
    return len(feats) / dt


def measure_reference_baseline(feats, budget_s=60.0):
    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        return BASELINE_WIN_PER_S_RECORDED
    try:
        import matplotlib
        matplotlib.use("Agg")
        sys.path.insert(0, ref_src)
        import ReadsCluster as ref_rc
    except Exception:
        return BASELINE_WIN_PER_S_RECORDED
    finally:
        if ref_src in sys.path:
            sys.path.remove(ref_src)
    t0 = time.time()
    n_done = 0
    for x in feats:
        ref_rc.EMCluster(x, initselection=1)
        n_done += 1
        if time.time() - t0 > budget_s:
            break
    per_proc = n_done / (time.time() - t0)
    return per_proc * 6  # reference pool cap


def main():
    rng = np.random.default_rng(0)
    feats = make_windows(N_WINDOWS, rng)
    ours = measure_ours(feats)
    base = measure_reference_baseline(feats[:16])
    print(json.dumps({
        "metric": "localGraph EM phasing throughput (32x128 windows)",
        "value": round(ours, 2),
        "unit": "windows/s",
        "vs_baseline": round(ours / base, 2),
    }))


if __name__ == "__main__":
    main()
