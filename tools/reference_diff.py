"""Full-pipeline output diff vs the reference on a shared synthetic BAM pair.

BASELINE.md configs 1/3 harness: run the reference's callsomaticSV stages
(/root/reference/src/SVscope.py:341-356 — localGraph :118-183 then
AlnFeature :241-339) and this framework's CLI on the SAME tumor/normal
BAMs + window bed, and diff the outputs:

  tier 1 (localGraph): Raw.bed, row-by-row, with the two known-tolerated
    delta classes mechanically whitelisted —
      (a) EM RNG: degenerate-pi re-init draws come from different RNG
          streams by design (reference: global numpy seed 2023; here:
          per-window jax keys), so cluster *membership* is compared as
          sets-of-sets rather than by cluster order, and
      (b) spoa MSA column tie-break drift: consensus strings may differ at
          alignment-tie columns; a mismatching consensus is whitelisted
          when its edit distance to the reference consensus is <= WL_EDIT.
    Everything else — window keys, flags, cluster counts, read-ID
    membership — must be EXACT.
  tier 2 (AlnFeature): mergedSomatic.vcf records keyed by (chrom, pos):
    SVTYPE / END / SUPPORT / GT exact, RNAMES as sets, REF/ALT under the
    same consensus whitelist, ConfidenceSV within WL_PROB (it is a
    10-tree-vote fraction downstream of MisScore, which moves when a
    whitelisted consensus differs).

Requires the reference's deps — pysam + pyspoa (+ scipy/sklearn/joblib/
pandas, baked into most images) for tier 1; bedtools/bgzip/tabix/sort on
PATH and Biopython for tier 2.  This zero-egress dev image has none of
pysam/pyspoa/Biopython, so the harness cannot execute here;
tests/test_reference_parity.py::test_full_pipeline_reference_diff gates on
the imports and runs it wherever they exist.  The comparators themselves
are unit-tested in-env (test_reference_parity.py::test_diff_comparators).

Usage:  python tools/reference_diff.py [--workdir DIR] [--keep]
Exit 0 = parity within whitelists; a JSON report prints either way.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
WL_EDIT = 3          # consensus whitelist: max edit distance
WL_PROB = 0.11       # ConfidenceSV whitelist: > one RF tree vote (1/10)


# --------------------------------------------------------------------------
# comparators (pure; unit-tested in-env)
# --------------------------------------------------------------------------

def edit_distance(a: str, b: str) -> int:
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[-1] + 1,
                           prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _groups(field: str):
    """';'-joined ','-groups -> frozenset of frozensets (cluster order and
    member order are EM-label permutations, not semantic differences)."""
    if field in ("-", ""):
        return frozenset()
    return frozenset(frozenset(g.split(",")) for g in field.split(";"))


def _seqs_match(ours: str, theirs: str):
    """(equal, whitelisted): ';'-joined consensus lists compared pairwise
    after sorting (cluster order is not semantic); a pair differing by
    <= WL_EDIT edits is whitelisted (spoa MSA tie-break drift)."""
    if ours == theirs:
        return True, False
    a = sorted(ours.split(";"))
    b = sorted(theirs.split(";"))
    if a == b:                   # same content, different cluster order
        return True, False
    if len(a) != len(b):
        return False, False
    if all(x == y or edit_distance(x, y) <= WL_EDIT for x, y in zip(a, b)):
        return False, True
    return False, False


def diff_raw_bed(ours_path: str, theirs_path: str) -> dict:
    """Row-by-row Raw.bed diff (10 columns, src/DecisionMaker.py:178-190).
    Returns {'rows', 'exact', 'whitelisted', 'failures': [...]}."""
    def load(path):
        rows = {}
        with open(path) as f:
            for line in f:
                p = line.rstrip("\n").split("\t")
                if len(p) >= 10:
                    rows[(p[0], p[1], p[2])] = p
        return rows

    ours, theirs = load(ours_path), load(theirs_path)
    report = {"rows": len(theirs), "exact": 0, "whitelisted": 0,
              "failures": []}
    for key in sorted(set(ours) | set(theirs)):
        if key not in ours or key not in theirs:
            report["failures"].append(
                {"window": key, "field": "presence",
                 "ours": key in ours, "theirs": key in theirs})
            continue
        o, t = ours[key], theirs[key]
        fail = []
        wl = False
        if o[9] != t[9]:
            fail.append(("flag", o[9], t[9]))
        if (o[5], o[8]) != (t[5], t[8]):
            fail.append(("counts", (o[5], o[8]), (t[5], t[8])))
        if _groups(o[4]) != _groups(t[4]):
            fail.append(("som_reads", o[4], t[4]))
        if _groups(o[7]) != _groups(t[7]):
            fail.append(("germ_reads", o[7], t[7]))
        for col, name in ((3, "som_seq"), (6, "germ_seq")):
            eq, wled = _seqs_match(o[col], t[col])
            if not eq and not wled:
                fail.append((name, o[col][:60], t[col][:60]))
            wl |= wled
        if fail:
            report["failures"].append({"window": key, "diffs": fail})
        elif wl:
            report["whitelisted"] += 1
        else:
            report["exact"] += 1
    return report


def _vcf_records(path: str) -> dict:
    recs = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            p = line.rstrip("\n").split("\t")
            if len(p) < 8:
                continue
            info = dict(kv.split("=", 1) for kv in p[7].split(";")
                        if "=" in kv)
            recs[(p[0], p[1])] = {"id": p[2], "ref": p[3], "alt": p[4],
                                  "info": info,
                                  "rest": p[8:]}
    return recs


def diff_merged_vcf(ours_path: str, theirs_path: str) -> dict:
    """mergedSomatic.vcf record diff (src/SVscope.py:320-338 merge)."""
    ours, theirs = _vcf_records(ours_path), _vcf_records(theirs_path)
    report = {"rows": len(theirs), "exact": 0, "whitelisted": 0,
              "failures": []}
    for key in sorted(set(ours) | set(theirs)):
        if key not in ours or key not in theirs:
            report["failures"].append(
                {"record": key, "field": "presence",
                 "ours": key in ours, "theirs": key in theirs})
            continue
        o, t = ours[key], theirs[key]
        fail = []
        wl = False
        for k in ("SVTYPE", "END", "SUPPORT"):
            if o["info"].get(k) != t["info"].get(k):
                fail.append((k, o["info"].get(k), t["info"].get(k)))
        rn_o = set(o["info"].get("RNAMES", "").split(","))
        rn_t = set(t["info"].get("RNAMES", "").split(","))
        if rn_o != rn_t:
            fail.append(("RNAMES", sorted(rn_o - rn_t), sorted(rn_t - rn_o)))
        for k in ("ref", "alt"):
            eq, wled = _seqs_match(o[k], t[k])
            if not eq and not wled:
                fail.append((k, o[k][:60], t[k][:60]))
            wl |= wled
        po = o["info"].get("ConfidenceSV")
        pt = t["info"].get("ConfidenceSV")
        if po is not None and pt is not None:
            if abs(float(po) - float(pt)) > WL_PROB:
                fail.append(("ConfidenceSV", po, pt))
            elif po != pt:
                wl = True
        if fail:
            report["failures"].append({"record": key, "diffs": fail})
        elif wl:
            report["whitelisted"] += 1
        else:
            report["exact"] += 1
    return report


# --------------------------------------------------------------------------
# pipeline drivers (need the reference deps; see module docstring)
# --------------------------------------------------------------------------

def _synth_pair(d: str):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import synth
    ref_fa, t_bam, n_bam, windows, _refseq = synth.make_test_pair(d)
    import pysam
    pysam.index(t_bam)
    pysam.index(n_bam)
    wb = os.path.join(d, "windows.bed")
    with open(wb, "w") as f:
        f.write("\n".join(windows) + "\n")
    return ref_fa, t_bam, n_bam, wb


def run_ours(d, ref_fa, t_bam, n_bam, wb) -> dict:
    from svscope_tpu import cli
    savedir = os.path.join(d, "ours")
    cli.main(["callsomaticSV", "-w", wb, "-T", t_bam, "-N", n_bam,
              "-t", "S", "-n", "S", "-r", ref_fa, "-s", savedir])
    return {"raw": os.path.join(savedir, "S.vs.S.TandemRepeat.Raw.bed"),
            "vcf": os.path.join(savedir, "S.mergedSomatic.vcf"),
            "savedir": savedir}


def run_reference(d, ref_fa, t_bam, n_bam, wb, tier2: bool) -> dict:
    sys.path.insert(0, REF_SRC)
    import SVscope as ref_main
    savedir = os.path.join(d, "ref")
    os.makedirs(savedir, exist_ok=True)
    ns = argparse.Namespace(
        Tumorbam=t_bam, Normalbam=n_bam, TSampleID="S", NSampleID="S",
        Reference=ref_fa, savedir=savedir, windowBed=wb, thread="4",
        offset=50, mapQ=5, Continue=False)
    raw = ref_main.localGraph(ns)
    out = {"raw": raw, "vcf": None, "savedir": savedir}
    if tier2:
        # AlnFeature needs a genome-window bed and an InterALNSVs.vcf (the
        # window-selection stage isn't under test; give both sides the
        # same empty inter-ALN set)
        gw = os.path.join(d, "genome10kb.bed")
        if not os.path.exists(gw):
            with open(ref_fa + ".fai") as f, open(gw, "w") as g:
                for line in f:
                    chrom, ln = line.split("\t")[:2]
                    for s in range(0, int(ln), 10_000):
                        g.write(f"{chrom}\t{s}\t{min(s + 10_000, int(ln))}\n")
        open(os.path.join(savedir, "InterALNSVs.vcf"), "w").close()
        ns.genomeWindow = gw
        ns.rawBedFile = raw
        out["vcf"] = ref_main.AlnFeature(ns)
    return out


def run_harness(workdir: str | None = None, keep: bool = False) -> dict:
    d = workdir or tempfile.mkdtemp(prefix="refdiff_")
    os.makedirs(d, exist_ok=True)
    tier2 = all(shutil.which(x) for x in
                ("bedtools", "bgzip", "tabix", "sort"))
    if tier2:
        try:
            import Bio  # noqa: F401  (PairwiseCompare needs pairwise2)
        except ImportError:
            tier2 = False
    ref_fa, t_bam, n_bam, wb = _synth_pair(d)
    ours = run_ours(d, ref_fa, t_bam, n_bam, wb)
    theirs = run_reference(d, ref_fa, t_bam, n_bam, wb, tier2)
    report = {"workdir": d if keep else None,
              "tier1_raw_bed": diff_raw_bed(ours["raw"], theirs["raw"]),
              "tier2_merged_vcf": None}
    if tier2 and theirs["vcf"] and os.path.exists(ours["vcf"]):
        report["tier2_merged_vcf"] = diff_merged_vcf(ours["vcf"],
                                                     theirs["vcf"])
    if not keep and workdir is None:
        shutil.rmtree(d, ignore_errors=True)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    report = run_harness(args.workdir, args.keep)
    print(json.dumps(report, indent=1, default=str))
    t1 = report["tier1_raw_bed"]["failures"]
    t2 = (report["tier2_merged_vcf"] or {}).get("failures", [])
    sys.exit(1 if (t1 or t2) else 0)


if __name__ == "__main__":
    main()
