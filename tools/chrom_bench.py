"""Chromosome-scale end-to-end harness with per-stage timings.

Synthesizes a ~2.1 Mb chromosome with 80 planted somatic SV windows plus
background coverage, writes real tumor/normal BAMs, and drives the full
pipeline (BAM scan -> window selection -> localGraph -> AlnFeature ->
merged VCF), printing wall time per stage and recall of the planted SVs.

Usage: python tools/chrom_bench.py [--mb 2.1] [--n-sv 80] [--device-poa X]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=2.1)
    ap.add_argument("--n-sv", type=int, default=80)
    ap.add_argument("--depth", type=int, default=14)
    ap.add_argument("--device-poa", default=False)
    ap.add_argument("--savedir", default=None)
    args = ap.parse_args()

    from synth import make_test_pair
    rng = np.random.default_rng(7)
    ref_len = int(args.mb * 1e6)
    sv_windows = []
    step = ref_len // (args.n_sv + 2)
    for k in range(args.n_sv):
        s = (k + 1) * step + int(rng.integers(-step // 4, step // 4))
        svtype = "INS" if k % 2 == 0 else "DEL"
        svlen = int(rng.integers(60, 200))
        sv_windows.append(dict(start=s, end=s + 100, svtype=svtype,
                               svlen=svlen, som_reads=6, depth=args.depth))
    d = args.savedir or tempfile.mkdtemp(prefix="chrombench_")
    t0 = time.time()
    ref_path, tumor, normal, _, _ = make_test_pair(
        d, seed=3, ref_len=ref_len, windows=sv_windows, bg_reads_per_10kb=6)
    print(f"[synth] {time.time()-t0:.1f}s  ref {ref_len/1e6:.1f} Mb, "
          f"{args.n_sv} SVs, depth {args.depth}")

    from svscope_tpu.native.bam import scan_with_breakpoints
    from svscope_tpu.select.windows import find_candidate_sv_windows
    from svscope_tpu.select.interaln import write_interaln_vcf
    from svscope_tpu.engine.localgraph import run_local_graph
    from svscope_tpu import cli as svcli

    t0 = time.time()
    t_table, t_bp = scan_with_breakpoints(tumor)
    n_table, n_bp = scan_with_breakpoints(normal)
    print(f"[scan] {time.time()-t0:.1f}s  tumor {len(t_table)} aln, "
          f"normal {len(n_table)} aln")

    t0 = time.time()
    paths = find_candidate_sv_windows(t_table, n_table, ref_path + ".fai",
                                      None, d, t_bp=t_bp, n_bp=n_bp)
    write_interaln_vcf(d, ref_path + ".fai", "tumor", paths)
    windows = [l for l in open(paths["somatic_bed"]).read().splitlines()
               if l.strip()]
    print(f"[select] {time.time()-t0:.1f}s  {len(windows)} candidate windows")

    t0 = time.time()
    raw = run_local_graph(windows, ref_path, [tumor], [normal], ["T1"],
                          ["N1"], d, device_poa=args.device_poa, threads=2)
    n_som = sum(1 for l in open(raw) if l.strip().endswith("EMOutput"))
    print(f"[localGraph] {time.time()-t0:.1f}s  {n_som} somatic rows")

    t0 = time.time()
    ns = argparse.Namespace(
        Reference=ref_path, Tumorbam=tumor, Normalbam=normal,
        TSampleID="T1", NSampleID="N1", savedir=d, rawBedFile=raw,
        genomeWindow=None, device_dtype="float32")
    merged = svcli.cmd_aln_feature(ns)
    print(f"[AlnFeature] {time.time()-t0:.1f}s  -> {merged}")

    # recall: planted windows hit by a somatic Raw.bed row
    som_spans = [(int(l.split("\t")[1]), int(l.split("\t")[2]))
                 for l in open(raw) if l.strip().endswith("EMOutput")]
    hit = 0
    for w in sv_windows:
        if any(s <= w["end"] and e >= w["start"] for s, e in som_spans):
            hit += 1
    print(f"[recall] {hit}/{args.n_sv} planted SV windows somatic-called")
    print(f"[dir] {d}")


if __name__ == "__main__":
    main()
