"""Round-5 fine-grained stage timing on one 128-window chunk (threads=2).

Splits:
  A: gates | POA msa | encode+margin+featsel (per-window python)
  B: host prep+dispatch | device wait (fetch)
  C: labeling python | consensus POA | emission
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from svscope_tpu.engine import localgraph as lg
from svscope_tpu.ops.poa_batch import poa_msa_batch
from svscope_tpu.utils import seq as sq
from svscope_tpu.engine.decision import call_margin, find_non_same_site

THREADS = 2


def stage_a_split(wins):
    t0 = time.time()
    msa_jobs, pending, entries = [], [], []
    for win in wins:
        if lg._passes_gates(win, lg._read_tags(win.read_ids), "tumor"):
            pending.append(len(entries))
            msa_jobs.append(win.sequences)
        entries.append([win, None])
    t1 = time.time()
    msa_out = poa_msa_batch(msa_jobs, use_device=False, threads=THREADS)
    t2 = time.time()
    ready = []
    for ei, (_cons, msa) in zip(pending, msa_out):
        win, _ = entries[ei]
        enc = sq.encode_rows(msa)
        flank_cols = call_margin(msa[0], win.flank_5, win.flank_3)
        keep_cols = np.setdiff1d(np.arange(enc.shape[1]), flank_cols)
        td_raw = enc[1:, keep_cols]
        cutoff = max(3, enc.shape[0] * 0.05)
        feat = td_raw[:, find_non_same_site(td_raw, cutoff)]
        if feat.shape[0] != 0 and feat.shape[1] >= 10:
            entries[ei][1] = len(ready)
            ready.append((win, enc, win.read_ids, feat))
    t3 = time.time()
    return entries, ready, {"gates": t1 - t0, "poa_msa": t2 - t1,
                            "featsel": t3 - t2}


def main():
    rng = np.random.default_rng(0)
    wins = bench.make_window_payloads(128, rng)
    # warm: full pass compiles EM buckets
    e, r, _ = stage_a_split(wins)
    f = lg._dispatch_em(r, None)
    em = f()
    lg._emit_chunk(r, em, "tumor", 3, False, THREADS)

    for trial in range(3):
        entries, ready, a = stage_a_split(wins)
        t0 = time.time()
        fetch = lg._dispatch_em(ready, None)
        t1 = time.time()
        em_results = fetch()
        t2 = time.time()
        # C split
        t3 = time.time()
        recs = lg._emit_chunk(ready, em_results, "tumor", 3, False, THREADS)
        t4 = time.time()
        print(f"trial {trial}: A gates={a['gates']:.3f} poa={a['poa_msa']:.3f} "
              f"featsel={a['featsel']:.3f} | B dispatch={t1-t0:.3f} "
              f"wait={t2-t1:.3f} | C emit={t4-t3:.3f}", flush=True)

    # C sub-split on the last chunk
    jobs = []
    for (win, enc, read_ids, feat), emr in zip(ready, em_results):
        K, _, labels, *_ = emr
    t0 = time.time()
    # separate: labeling-only (run _emit_chunk with a stub poa)
    import svscope_tpu.engine.localgraph as L
    orig = L.poa_msa_batch
    calls = {}
    def counting(jobs, use_device=False, threads=None):
        t = time.time()
        out = orig(jobs, use_device=use_device, threads=threads)
        calls.setdefault("poa_s", 0.0)
        calls["poa_s"] += time.time() - t
        calls["n_jobs"] = calls.get("n_jobs", 0) + len(jobs)
        return out
    L.poa_msa_batch = counting
    t0 = time.time()
    recs = lg._emit_chunk(ready, em_results, "tumor", 3, False, THREADS)
    dt = time.time() - t0
    L.poa_msa_batch = orig
    print(f"C total={dt:.3f} consensus_poa={calls.get('poa_s',0):.3f} "
          f"python={dt-calls.get('poa_s',0):.3f} n_jobs={calls.get('n_jobs')}")


if __name__ == "__main__":
    main()
