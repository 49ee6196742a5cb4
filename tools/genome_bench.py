"""Genome-scale end-to-end benchmark: multi-chromosome, ONT-like error
profiles, planted somatic truth PLUS germline and mapping-artifact decoys
— precision AND recall, per stage, with wall times.

The round-3 harness (tools/chrom_bench.py) was recall-only on a clean
2.1 Mb chromosome; this one measures what the reference's RF filter exists
for (/root/reference/src/SVscope.py:241-339): rejecting windows that LOOK
somatic to the EM but are germline events or alignment artifacts.

Planted classes per chromosome:
  som    somatic INS/DEL: SV in a subset of tumor reads only  -> TRUTH
  germ   germline INS/DEL: SV in ALL tumor AND normal reads   -> decoy
  noise  mapping-artifact: tumor-only low-mapQ pileup with random
         scattered clips and coverage spike, no consistent SV -> decoy

Reads carry ONT-like noise: ~2% substitutions plus 1-3 bp indels at ~1%
(cigar-visible, below the 40 bp breakpoint threshold of
src/WindowSelection_v8.py:92 semantics).

Reported: candidate-window counts, Raw.bed-level and post-RF VCF-level
precision/recall vs the planted somatic truth, and per-stage wall time.

Usage: python tools/genome_bench.py [--mb-per-chrom 5] [--chroms 4]
       (defaults = the >= 20 Mb BASELINE.md configuration)
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def ont_read(rng, ref, name, a0, a1, sv=None, mapq: int = 60,
             ref_id: int = 0, sub=0.02, indel=0.01):
    """BamRecord over ref[a0:a1) with ONT-like noise: substitutions stay
    inside M ops; 1-3 bp insertions/deletions get their own cigar ops; an
    optional ("INS", pos, seq) / ("DEL", pos, len) SV is emitted exactly."""
    from svscope_tpu.io.bam import BamRecord, parse_cigar_string
    if sv is None and indel == 0:
        # fast path for the ~10^5 background reads: vectorized subs, xM
        arr = np.frombuffer(ref[a0:a1].encode(), np.uint8).copy()
        hits = np.flatnonzero(rng.random(arr.size) < sub)
        arr[hits] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, hits.size)]
        ops, lens = parse_cigar_string(f"{arr.size}M")
        return BamRecord(name, 0, ref_id, a0, mapq, ops, lens,
                         arr.tobytes().decode())
    sv_pos = sv[1] if sv else None
    seq_parts = []
    cig = []

    def emit(op, ln):
        if ln <= 0:
            return
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    p = a0
    while p < a1:
        if sv is not None and p == sv_pos:
            if sv[0] == "INS":
                seq_parts.append(sv[2])
                emit("I", len(sv[2]))
            else:
                dl = min(sv[2], a1 - p - 1)
                emit("D", dl)
                p += dl
                continue
            sv = None
        r = rng.random()
        if r < indel / 2 and a0 < p < a1 - 2:          # small insertion
            ln = int(rng.integers(1, 4))
            seq_parts.append(rand_seq(rng, ln))
            emit("I", ln)
        elif r < indel and p < a1 - 4:                 # small deletion
            ln = int(rng.integers(1, 4))
            emit("D", ln)
            p += ln
            continue
        base = ref[p]
        if rng.random() < sub:
            base = "ACGT"[int(rng.integers(0, 4))]
        seq_parts.append(base)
        emit("M", 1)
        p += 1
    cigar = "".join(f"{ln}{op}" for op, ln in cig)
    ops, lens = parse_cigar_string(cigar)
    return BamRecord(name, 0, ref_id, a0, mapq, ops, lens,
                     "".join(seq_parts))


def clip_read(rng, ref, name, pos, mapq, ref_id):
    """Artifact read: one-sided soft clip at pos (random clip content)."""
    from svscope_tpu.io.bam import BamRecord, parse_cigar_string
    ml = int(rng.integers(300, 600))
    cl = int(rng.integers(150, 400))
    left = rng.random() < 0.5
    cigar = f"{cl}S{ml}M" if left else f"{ml}M{cl}S"
    ops, lens = parse_cigar_string(cigar)
    seq = (rand_seq(rng, cl) + ref[pos:pos + ml]) if left else \
        (ref[pos:pos + ml] + rand_seq(rng, cl))
    return BamRecord(name, 0, ref_id, pos, mapq, ops, lens, seq)


def build_genome(d, n_chroms, mb, depth, rng):
    from svscope_tpu.io.bam import BamWriter
    from svscope_tpu.io.fasta import write_fasta
    clen = int(mb * 1e6)
    names = [f"chr{c + 1}" for c in range(n_chroms)]
    refs = {nm: rand_seq(rng, clen) for nm in names}
    ref_path = os.path.join(d, "ref.fa")
    write_fasta(ref_path, refs)
    truth, germline, artifacts = [], [], []
    t_recs, n_recs = [], []
    per_chrom = 16
    for ci, nm in enumerate(names):
        ref = refs[nm]
        step = clen // (per_chrom + 2)
        for k in range(per_chrom):
            s = (k + 1) * step + int(rng.integers(-step // 8, step // 8))
            e = s + 100
            mid = (s + e) // 2
            svlen = int(rng.integers(60, 200))
            svtype = "INS" if k % 2 == 0 else "DEL"
            ins = rand_seq(rng, svlen)
            cls = ("som", "som", "germ", "noise")[k % 4]
            if cls == "noise":
                # mapping-artifact: tumor-only low-mapQ pileup + clips
                artifacts.append((nm, s, e))
                for i in range(depth):
                    mq = 3 if i % 2 else 60
                    t_recs.append(ont_read(rng, ref, f"{nm}ar{k}t{i}",
                                           s - 350, e + 350, None, mq, ci))
                for i in range(6):
                    t_recs.append(clip_read(
                        rng, ref, f"{nm}cl{k}t{i}",
                        mid + int(rng.integers(-200, 200)), 60, ci))
                for i in range(depth):
                    n_recs.append(ont_read(rng, ref, f"{nm}ar{k}n{i}",
                                           s - 350, e + 350, None, 60, ci))
                continue
            m = mid + int(rng.integers(-15, 16))
            sv = ("INS", m, ins) if svtype == "INS" else \
                ("DEL", m - svlen // 2, svlen)
            if cls == "som":
                truth.append((nm, s, e, svtype, svlen))
                for i in range(depth):
                    r_sv = sv if i < 6 else None
                    jm = mid + int(rng.integers(-15, 16))
                    r_sv = (("INS", jm, ins) if svtype == "INS" else
                            ("DEL", jm - svlen // 2, svlen)) \
                        if r_sv else None
                    t_recs.append(ont_read(rng, ref, f"{nm}s{k}t{i}",
                                           s - 350, e + 350, r_sv, 60, ci))
                for i in range(depth):
                    n_recs.append(ont_read(rng, ref, f"{nm}s{k}n{i}",
                                           s - 350, e + 350, None, 60, ci))
            else:                               # germline: SV in both
                germline.append((nm, s, e, svtype, svlen))
                for i in range(depth):
                    jm = mid + int(rng.integers(-15, 16))
                    r_sv = ("INS", jm, ins) if svtype == "INS" else \
                        ("DEL", jm - svlen // 2, svlen)
                    t_recs.append(ont_read(rng, ref, f"{nm}g{k}t{i}",
                                           s - 350, e + 350, r_sv, 60, ci))
                    n_recs.append(ont_read(rng, ref, f"{nm}g{k}n{i}",
                                           s - 350, e + 350, r_sv, 60, ci))
        # background coverage at ~window depth so candidate-window COV
        # z-scores stay in the RF's trained range (a 1x background made
        # every window a 28-sigma coverage outlier the RF rejected)
        rl_lo, rl_hi = 1800, 3600
        n_bg = int(clen * depth / ((rl_lo + rl_hi) / 2))
        # planted windows already carry `depth` local reads; drop
        # background reads overlapping them so their coverage stays at
        # the genome average (the RF is coverage-z-score sensitive)
        spans = np.array([(t[1], t[2]) for t in truth + germline
                          + artifacts if t[0] == nm]
                         or [(0, 0)], np.int64)
        for sample, recs, tag in ((0, t_recs, "bt"), (1, n_recs, "bn")):
            starts = rng.integers(0, clen - rl_lo, n_bg)
            lens_r = rng.integers(rl_lo, rl_hi, n_bg)
            mqs = np.where(rng.random(n_bg) < 0.07, 3, 60)
            ends = np.minimum(starts + lens_r, clen)
            hit = ((starts[:, None] <= spans[None, :, 1] + 400)
                   & (ends[:, None] >= spans[None, :, 0] - 400)).any(1)
            for i in np.flatnonzero(~hit):
                recs.append(ont_read(rng, ref, f"{nm}{tag}{i}",
                                     int(starts[i]), int(ends[i]),
                                     None, int(mqs[i]), ci, sub=0.01,
                                     indel=0))
    tumor = os.path.join(d, "tumor.bam")
    normal = os.path.join(d, "normal.bam")
    lens = [clen] * n_chroms
    with BamWriter(tumor, names, lens) as w:
        for r in sorted(t_recs, key=lambda r: (r.ref_id, r.pos)):
            w.write(r)
    with BamWriter(normal, names, lens) as w:
        for r in sorted(n_recs, key=lambda r: (r.ref_id, r.pos)):
            w.write(r)
    return ref_path, tumor, normal, truth, germline, artifacts


def overlaps(calls, span):
    nm, s, e = span[:3]
    return any(cn == nm and cs <= e and ce >= s for cn, cs, ce in calls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb-per-chrom", type=float, default=5.0)
    ap.add_argument("--chroms", type=int, default=4)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--device-poa", default=False)
    ap.add_argument("--savedir", default=None)
    args = ap.parse_args()
    d = args.savedir or tempfile.mkdtemp(prefix="genomebench_")
    rng = np.random.default_rng(11)
    stages = {}

    t0 = time.time()
    ref_path, tumor, normal, truth, germ, arts = build_genome(
        d, args.chroms, args.mb_per_chrom, args.depth, rng)
    stages["synth"] = time.time() - t0
    gb = args.chroms * args.mb_per_chrom
    print(f"[synth] {stages['synth']:.1f}s  {args.chroms} chroms x "
          f"{args.mb_per_chrom:.0f} Mb = {gb:.0f} Mb; {len(truth)} somatic "
          f"truth, {len(germ)} germline decoys, {len(arts)} artifact decoys")

    from svscope_tpu.native.bam import scan_with_breakpoints
    from svscope_tpu.select.windows import find_candidate_sv_windows
    from svscope_tpu.select.interaln import write_interaln_vcf
    from svscope_tpu.engine.localgraph import run_local_graph
    from svscope_tpu import cli as svcli

    t0 = time.time()
    t_table, t_bp = scan_with_breakpoints(tumor)
    n_table, n_bp = scan_with_breakpoints(normal)
    stages["scan"] = time.time() - t0
    print(f"[scan] {stages['scan']:.1f}s  tumor {len(t_table)} aln, "
          f"normal {len(n_table)} aln")

    t0 = time.time()
    paths = find_candidate_sv_windows(t_table, n_table, ref_path + ".fai",
                                      None, d, t_bp=t_bp, n_bp=n_bp)
    write_interaln_vcf(d, ref_path + ".fai", "tumor", paths)
    windows = [l for l in open(paths["somatic_bed"]).read().splitlines()
               if l.strip()]
    stages["select"] = time.time() - t0
    print(f"[select] {stages['select']:.1f}s  {len(windows)} candidate "
          f"windows")

    t0 = time.time()
    raw = run_local_graph(windows, ref_path, [tumor], [normal], ["T1"],
                          ["N1"], d, device_poa=args.device_poa, threads=4)
    stages["localGraph"] = time.time() - t0
    som_rows = [l.split("\t") for l in open(raw)
                if l.strip().endswith("EMOutput")]
    som_calls = [(p[0], int(p[1]), int(p[2])) for p in som_rows]
    print(f"[localGraph] {stages['localGraph']:.1f}s  {len(som_calls)} "
          f"somatic rows")

    t0 = time.time()
    ns = argparse.Namespace(
        Reference=ref_path, Tumorbam=tumor, Normalbam=normal,
        TSampleID="T1", NSampleID="N1", savedir=d, rawBedFile=raw,
        genomeWindow=None, device_dtype="float32")
    merged = svcli.cmd_aln_feature(ns)
    stages["AlnFeature"] = time.time() - t0
    vcf_calls = []
    for l in open(merged):
        if l.startswith("#"):
            continue
        p = l.split("\t")
        info = dict(kv.split("=", 1) for kv in p[7].split(";") if "=" in kv)
        vcf_calls.append((p[0], int(p[1]),
                          int(info.get("END", int(p[1]) + 1))))
    print(f"[AlnFeature] {stages['AlnFeature']:.1f}s  {len(vcf_calls)} "
          f"VCF records")

    def pr(calls, label):
        tp = sum(1 for t in truth if overlaps(calls, t))
        germ_fp = sum(1 for g in germ if overlaps(calls, g))
        art_fp = sum(1 for a in arts if overlaps(calls, a))
        fp = sum(1 for c in calls
                 if not overlaps([(t[0], t[1], t[2]) for t in truth],
                                 (c[0], c[1], c[2])))
        prec = (len(calls) - fp) / len(calls) if calls else 1.0
        rec = tp / len(truth) if truth else 1.0
        print(f"[{label}] precision {prec:.3f} ({len(calls) - fp}/"
              f"{len(calls)} calls on truth), recall {rec:.3f} "
              f"({tp}/{len(truth)}), decoys called: germline "
              f"{germ_fp}/{len(germ)}, artifact {art_fp}/{len(arts)}")
        return prec, rec

    pr(som_calls, "Raw.bed")
    pr(vcf_calls, "mergedVCF")
    print("[stage-walls] " + " ".join(f"{k}={v:.1f}s"
                                      for k, v in stages.items()))
    print(f"[dir] {d}")


if __name__ == "__main__":
    main()
