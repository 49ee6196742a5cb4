"""Legacy selection lineage (select/legacy) vs the reference's v1/v3
modules imported as oracles (SelectCandidateWindows.py:72-111,
SelectCandidateWindows_v3.py:89-144).  The legacy generations are part of
the reference's shipped API surface (each has a runnable main) even
though SVscope.py never imports them — SURVEY §2.1 rows v7/v3/v1."""
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/src"


def _import_ref_legacy(name):
    """Import a reference legacy module with its absent binary deps
    (pysam) stubbed — the clip classifiers themselves are pure numpy."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference snapshot not mounted")
    if "pysam" not in sys.modules:
        sys.modules["pysam"] = types.ModuleType("pysam")
    sys.path.insert(0, REF_SRC)
    try:
        return __import__(name)
    finally:
        sys.path.remove(REF_SRC)


def _random_clip_record(rng, n_frags):
    """One read's CLIP rows: parallel arrays like the reference's
    CLIPRecord tuple (chrom, refstart, readStart, readRegion, refRegion,
    strand, readID)."""
    chroms, refstarts, readstarts, rregions, frregions, strands = \
        [], [], [], [], [], []
    rpos = int(rng.integers(0, 200))
    for _ in range(n_frags):
        chrom = f"chr{int(rng.integers(1, 4))}"
        fs = int(rng.integers(1000, 100000))
        flen = int(rng.integers(200, 2000))
        rlen = int(rng.integers(200, 2000))
        # the CLIP point is one end of the fragment's read span
        left = bool(rng.random() < 0.5)
        rstart, rend = rpos, rpos + rlen
        point = rstart if left else rend
        chroms.append(chrom)
        refstarts.append(fs if left else fs + flen)
        readstarts.append(point)
        rregions.append(f"{rstart}-{rend}")
        frregions.append(f"{chrom}:{fs}-{fs + flen}")
        strands.append("+" if rng.random() < 0.7 else "-")
        gap = int(rng.integers(0, 400))
        rpos = rend + gap - (rlen if rng.random() < 0.2 else 0)
        rpos = max(rpos, 0)
    order = np.argsort(readstarts, kind="stable")
    # numpy arrays throughout: the reference classifiers fancy-index the
    # string columns (they arrive as pandas ndarrays in situ)
    return (np.array(chroms)[order],
            np.array(refstarts)[order],
            np.array(readstarts)[order],
            np.array(rregions)[order],
            np.array(frregions)[order],
            np.array(strands)[order],
            "readX")


def test_reads_clip_v2_matches_reference():
    ref = _import_ref_legacy("SelectCandidateWindows_v3")
    from svscope_tpu.select.legacy import classify_clip_pairs_v2
    rng = np.random.default_rng(5)
    n_checked = 0
    for trial in range(200):
        rec = _random_clip_record(rng, int(rng.integers(1, 7)))
        want = ref.readsCLIP2(rec)
        got = classify_clip_pairs_v2(*rec)
        assert got == want, (trial, rec, want, got)
        n_checked += len(want)
    assert n_checked > 100      # the comparison actually exercised pairs


def test_reads_clip_v1_matches_reference():
    ref = _import_ref_legacy("SelectCandidateWindows")
    from svscope_tpu.select.legacy import classify_clip_pairs_v1
    rng = np.random.default_rng(9)
    n_checked = 0
    for trial in range(200):
        rec = _random_clip_record(rng, int(rng.integers(1, 7)))
        want = ref.readsCLIP(rec)
        got = classify_clip_pairs_v1(*rec)
        assert got == want, (trial, rec, want, got)
        n_checked += len(want)
    assert n_checked > 100


def test_non_uniq_and_sort_helpers_match_reference():
    ref = _import_ref_legacy("SelectCandidateWindows_v3")
    from svscope_tpu.select.legacy import non_uniq_detail, sort_read_span
    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(1, 6))
        regs = []
        p = 0
        for _ in range(n):
            a = p + int(rng.integers(0, 100))
            b = a + int(rng.integers(10, 500))
            regs.append(f"{a}-{b}")
            p = b - int(rng.integers(0, 200))
            p = max(p, 0)
        assert non_uniq_detail(regs) == ref.NonUniqDetail(regs)
        assert (sort_read_span(regs) == ref.SortReadSpan(regs)).all()


def test_window_selection_v7_runs_and_differs_by_chrm_and_lc(tmp_path):
    """v7 = v8 minus the LC channel and minus chrM exclusion: on a
    fixture with a chrM-only candidate, v7 emits it and v8 does not."""
    from svscope_tpu.io.bam import BamWriter, BamRecord, parse_cigar_string
    from svscope_tpu.io.fasta import write_fasta
    from svscope_tpu.native.bam import scan_with_breakpoints
    from svscope_tpu.select.legacy import window_selection_v7
    from svscope_tpu.select.windows import find_candidate_sv_windows
    rng = np.random.default_rng(0)
    clen = 8000
    refs = {"chr1": "".join(rng.choice(list("ACGT"), clen)),
            "chrM": "".join(rng.choice(list("ACGT"), clen))}
    ref_path = str(tmp_path / "ref.fa")
    write_fasta(ref_path, refs)
    ins = "".join(rng.choice(list("ACGT"), 80))

    def reads(nm, rid_prefix, with_ins):
        out = []
        for i in range(8):
            mid = 4000
            base = refs[nm][2000:6000]
            if with_ins and i < 6:
                base = base[:2000] + ins + base[2000:]
            cig = (f"2000M{len(ins)}I2000M" if with_ins and i < 6
                   else "4000M")
            ops, lens = parse_cigar_string(cig)
            out.append(BamRecord(f"{rid_prefix}{i}", 0,
                                 list(refs).index(nm), 2000, 60, ops,
                                 lens, base))
        return out

    t_recs = reads("chr1", "t1_", True) + reads("chrM", "tm_", True)
    n_recs = reads("chr1", "n1_", False) + reads("chrM", "nm_", False)
    tumor = str(tmp_path / "t.bam")
    normal = str(tmp_path / "n.bam")
    with BamWriter(tumor, list(refs), [clen, clen]) as w:
        for r in sorted(t_recs, key=lambda r: (r.ref_id, r.pos)):
            w.write(r)
    with BamWriter(normal, list(refs), [clen, clen]) as w:
        for r in sorted(n_recs, key=lambda r: (r.ref_id, r.pos)):
            w.write(r)
    t_table, t_bp = scan_with_breakpoints(tumor)
    n_table, n_bp = scan_with_breakpoints(normal)

    d8 = tmp_path / "v8"
    p8 = find_candidate_sv_windows(t_table, n_table, ref_path + ".fai",
                                   None, str(d8), t_bp=t_bp, n_bp=n_bp)
    d7 = tmp_path / "v7"
    p7 = window_selection_v7(t_table, n_table, ref_path + ".fai", str(d7),
                             t_bp=t_bp, n_bp=n_bp)
    w8 = open(p8["somatic_bed"]).read()
    w7 = open(p7["somatic_bed"]).read()
    assert "chr1" in w8 and "chr1" in w7
    assert "chrM" not in w8          # v8 excludes chrM
    assert "chrM" in w7              # v7 does not
