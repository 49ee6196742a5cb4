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
    # split-alignment LargeDEL events for the InterALN channel: tumor-only
    # read pairs clipped at two breakpoints ~20 kb apart
    from svscope_tpu.io.bam import (BamRecord, BamReader, BamWriter,
                                    parse_cigar_string)
    n_large = max(args.n_sv // 10, 2)
    large_bps = []
    for k in range(n_large):
        bp1 = int((k + 0.5) * (ref_len // n_large))
        bp2 = bp1 + 20_000
        large_bps.append(bp1)
        recs = []
        for i in range(6):
            j1 = bp1 + int(rng.integers(-30, 30))
            j2 = bp2 + int(rng.integers(-30, 30))
            for pos, cig in ((j1 - 400, "400M600S"), (j2, "400H600M")):
                ops, lens = parse_cigar_string(cig)
                qlen = int(sum(l for o, l in zip(ops, lens)
                               if o in (0, 1, 4, 7, 8)))
                recs.append(BamRecord(f"lg{k}r{i}", 0, 0, pos, 60, ops,
                                      lens, "A" * qlen))
        rd = BamReader(tumor)
        old = list(rd.records)
        with BamWriter(tumor, rd.references, rd.lengths) as w:
            for r in sorted(old + recs, key=lambda r: r.pos):
                w.write(r)
    # RepeatMasker bed covering every 4th planted window (the LC channel)
    repeat_bed = os.path.join(d, "repeats.bed")
    with open(repeat_bed, "w") as f:
        for w in sv_windows[::4]:
            f.write(f"chr1\t{w['start'] - 40}\t{w['end'] + 40}\n")
    print(f"[synth] {time.time()-t0:.1f}s  ref {ref_len/1e6:.1f} Mb, "
          f"{args.n_sv} SVs + {n_large} LargeDELs, depth {args.depth}")

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
                                      repeat_bed, d, t_bp=t_bp, n_bp=n_bp)
    inter = write_interaln_vcf(d, ref_path + ".fai", "tumor", paths)
    windows = [l for l in open(paths["somatic_bed"]).read().splitlines()
               if l.strip()]
    n_inter = sum(1 for l in open(inter) if not l.startswith("#"))
    n_ldel = sum(1 for l in open(inter) if "SVTYPE=LargeDEL" in l)
    print(f"[select] {time.time()-t0:.1f}s  {len(windows)} candidate "
          f"windows; InterALN {n_inter} records ({n_ldel} LargeDEL of "
          f"{n_large} planted)")

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

    t0 = time.time()
    svcli.cmd_adjust_vcf(argparse.Namespace(savedir=d))
    print(f"[adjustVCF] {time.time()-t0:.1f}s")

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
