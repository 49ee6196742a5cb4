import numpy as np
import pytest

from svscope_tpu.io import bgzf
from svscope_tpu.io.fasta import FastaFile, write_fasta
from svscope_tpu.io.bam import (AlignmentTable, BamReader, BamRecord,
                                BamWriter, parse_cigar_string, cigar_string)
from svscope_tpu.utils import seq as sq
from svscope_tpu.utils import intervals as iv


def test_bgzf_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    comp = bgzf.compress(data)
    assert bgzf.decompress(comp) == data


def test_fasta_fetch(tmp_path):
    path = str(tmp_path / "ref.fa")
    seqs = {"chr1": "ACGT" * 500, "chr2": "TTGGCCAA" * 100}
    write_fasta(path, seqs, width=37)
    fa = FastaFile(path)
    assert fa.references == ["chr1", "chr2"]
    assert fa.fetch("chr1", 0, 8) == "ACGTACGT"
    assert fa.fetch("chr1", 37, 41) == seqs["chr1"][37:41]
    assert fa.fetch("chr2", 700, 800) == seqs["chr2"][700:800]
    assert fa.fetch("chr1") == seqs["chr1"]
    assert fa.get_reference_length("chr2") == 800


def test_seq_codec():
    assert list(sq.encode("ATCG-")) == [0, 1, 2, 3, 4]
    assert sq.decode(np.array([0, 4, 1, 2, 4, 3])) == "ATCG"
    assert sq.decode(np.array([0, 4, 1]), keep_gaps=True) == "A-T"
    assert sq.reverse_complement("AACGT") == "ACGTT"


def test_cigar_roundtrip():
    ops, lens = parse_cigar_string("10M2I5D100S3H")
    assert cigar_string(ops, lens) == "10M2I5D100S3H"


def _mk_record(name, pos, cigar, seq, flag=0, mapq=60, ref_id=0):
    ops, lens = parse_cigar_string(cigar)
    return BamRecord(name, flag, ref_id, pos, mapq, ops, lens, seq)


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    recs = [
        _mk_record("r1", 100, "50M", "A" * 50),
        _mk_record("r2", 120, "10S30M10S", "C" * 50, flag=16),
        _mk_record("r3", 400, "20M5I20M", "G" * 45, mapq=3),
    ]
    with BamWriter(path, ["chr1"], [10_000]) as w:
        for r in recs:
            w.write(r)
    rd = BamReader(path)
    assert rd.references == ["chr1"]
    assert rd.lengths == [10_000]
    assert len(rd.records) == 3
    got = rd.fetch("chr1", 110, 130)
    assert {r.name for r in got} == {"r1", "r2"}
    r2 = [r for r in rd.records if r.name == "r2"][0]
    assert r2.is_reverse and r2.strand == "-"
    assert r2.cigarstring == "10S30M10S"
    assert r2.reference_end == 150
    assert r2.seq == "C" * 50


def test_query_pos_mapping():
    # 10 ref bases matched, 5-base insertion, 10 more matched
    r = _mk_record("r", 1000, "10M5I10M", "ACGTACGTAC" + "TTTTT" + "GGGGGGGGGG")
    assert r.query_pos_floor(1000) == 0
    assert r.query_pos_floor(1009) == 9
    assert r.query_pos_floor(1012) == 9 + 5 + 3
    assert r.query_pos_ceil(1010) == 15
    assert r.query_pos_ceil(1005) == 5
    # hard-clipped supplementary: query coords exclude the clip
    r2 = _mk_record("r", 1000, "100H10M", "ACGTACGTAC", flag=0x800)
    assert r2.query_pos_floor(1005) == 5
    assert r2.leading_hardclip() == 100


def test_alignment_table(tmp_path):
    path = str(tmp_path / "t.bam")
    with BamWriter(path, ["chr1", "chr2"], [10_000, 10_000]) as w:
        w.write(_mk_record("r1", 100, "50M", "A" * 50))
        w.write(_mk_record("r1", 300, "20M30S", "A" * 50, flag=0x800, ref_id=1))
        w.write(_mk_record("r2", 150, "40M", "T" * 40))
    t = AlignmentTable.from_bam(path)
    assert len(t) == 3
    idx = t.fetch_idx("chr1", 120, 160)
    assert sorted(t.name[i] for i in idx) == ["r1", "r2"]
    assert len(t.read_alignments("r1")) == 2
    assert t.spanchr_ratio(["x_tumor|r1", "x_tumor|r2"]) == 0.5
    assert np.isnan(t.spanchr_ratio(["absent"]))


def test_interval_merge():
    s = np.array([10, 30, 100, 50])
    e = np.array([20, 45, 120, 60])
    ms, me, gid, order = iv.merge(s, e, dist=0)
    assert list(ms) == [10, 30, 50, 100] and list(me) == [20, 45, 60, 120]
    ms, me, gid, order = iv.merge(s, e, dist=5)
    assert list(ms) == [10, 30, 100] and list(me) == [20, 60, 120]
    ms, me, gid, order = iv.merge(s, e, dist=10)
    assert list(ms) == [10, 100] and list(me) == [60, 120]


def test_interval_overlap():
    ai, bi, ov = iv.overlap_pairs([0, 100], [50, 200], [40, 150], [60, 400])
    assert list(ai) == [0, 1] and list(bi) == [0, 1]
    assert list(ov) == [10, 50]
    mask = iv.any_overlap_mask([0, 100], [50, 200], [40], [60], frac=0.5, reciprocal=True)
    assert list(mask) == [False, False]
    mask = iv.any_overlap_mask([35, 100], [65, 200], [40], [60], frac=0.5, reciprocal=True)
    assert list(mask) == [True, False]


def test_coverage_length():
    assert iv.coverage_length(100, 200, [50, 150], [120, 300]) == 20 + 50


def test_native_bam_scan_matches_python(tmp_path):
    from svscope_tpu.native.bam import scan_alignment_table
    path = str(tmp_path / "t.bam")
    with BamWriter(path, ["chr1", "chr2"], [10_000, 9_000]) as w:
        w.write(_mk_record("r1", 100, "50M", "A" * 50))
        w.write(_mk_record("r1", 300, "20M30S", "A" * 50, flag=0x810,
                           ref_id=1))
        w.write(_mk_record("r2", 150, "10S30M5D10M", "T" * 50, mapq=3))
    py = AlignmentTable.from_bam(path)
    cc = scan_alignment_table(path)
    assert len(py) == len(cc)
    for col in ("chrom", "start", "end", "name", "mapq", "strand_rev",
                "cigar"):
        assert (getattr(py, col) == getattr(cc, col)).all(), col


def test_lazy_bam_reader_matches_python(tmp_path):
    from svscope_tpu.native.bam import LazyBamReader
    path = str(tmp_path / "t.bam")
    with BamWriter(path, ["chr1"], [10_000]) as w:
        w.write(_mk_record("r1", 100, "30M20S", "ACGT" * 12 + "GG"))
        w.write(_mk_record("r2", 150, "50M", "T" * 50, flag=16, mapq=7))
    py = BamReader(path)
    lz = LazyBamReader(path)
    a = py.fetch("chr1", 120, 160)
    b = lz.fetch("chr1", 120, 160)
    assert sorted((r.name, r.pos, r.cigarstring, r.seq, r.flag) for r in a) \
        == sorted((r.name, r.pos, r.cigarstring, r.seq, r.flag) for r in b)
    assert lz.fetch("chrZ", 0, 10) == []


def test_lazy_reader_virtual_offsets_multiblock(tmp_path):
    """Random per-window decode through the BGZF virtual-offset index on a
    file large enough to span many blocks (records cross block borders)."""
    from svscope_tpu.native.bam import LazyBamReader
    rng = np.random.default_rng(3)
    path = str(tmp_path / "big.bam")
    n = 300
    seqs = ["".join(rng.choice(list("ACGT"), 800)) for _ in range(n)]
    with BamWriter(path, ["chr1"], [1_000_000]) as w:
        for i in range(n):
            w.write(_mk_record(f"r{i}", 1000 + i * 500, "800M", seqs[i]))
    lz = LazyBamReader(path)
    py = BamReader(path)
    for _ in range(20):
        s = int(rng.integers(0, 150_000))
        a = sorted((r.name, r.seq) for r in py.fetch("chr1", s, s + 900))
        b = sorted((r.name, r.seq) for r in lz.fetch("chr1", s, s + 900))
        assert a == b


def test_span_sites_native_matches_python(tmp_path):
    from svscope_tpu.native.bam import span_sites
    from svscope_tpu.select.windows import _read_span_sites
    cigs = ["100M", "10S80M2000D10M5S", "30I70M", "50H20M40I40M",
            "5M60D95M", "12S88M"]
    rng = np.random.default_rng(1)
    blob = "".join(cigs).encode()
    off = np.zeros(len(cigs) + 1, np.int64)
    for i, c in enumerate(cigs):
        off[i + 1] = off[i] + len(c)
    starts = rng.integers(0, 5000, len(cigs)).astype(np.int64)
    ws = starts + rng.integers(-50, 150, len(cigs))
    we = ws + rng.integers(10, 3000, len(cigs))
    s5, s3 = span_sites(blob, off[:-1], off[1:] - off[:-1], starts, ws, we)
    for i, c in enumerate(cigs):
        e5, e3 = _read_span_sites(c, int(starts[i]), int(ws[i]), int(we[i]))
        assert (s5[i], s3[i]) == (e5, e3), c


def test_corrupt_bam_inputs_error(tmp_path):
    from svscope_tpu.native.bam import scan_alignment_table, LazyBamReader
    import pytest as _pytest
    for content in (b"garbage!!", b"", b"\x1f\x8b" + b"\x00" * 8):
        f = tmp_path / "bad.bam"
        f.write_bytes(content)
        for opener in (scan_alignment_table, LazyBamReader):
            with _pytest.raises((ValueError, RuntimeError)):
                opener(str(f))


def test_overlap_pairs_brute_force_equivalence():
    from svscope_tpu.utils.intervals import overlap_pairs
    rng = np.random.default_rng(5)
    for trial in range(20):
        na, nb = rng.integers(0, 40, 2)
        a_s = rng.integers(0, 1000, na)
        a_e = a_s + rng.integers(1, 300, na)
        b_s = rng.integers(0, 1000, nb)
        b_e = b_s + rng.integers(1, 300, nb)
        ai, bi, ov = overlap_pairs(a_s, a_e, b_s, b_e)
        got = set(zip(ai.tolist(), bi.tolist()))
        want = {(i, j) for i in range(na) for j in range(nb)
                if min(a_e[i], b_e[j]) - max(a_s[i], b_s[j]) > 0}
        assert got == want, trial
        assert (ov > 0).all()


def test_cg_tag_long_cigar(tmp_path):
    """>65535-op alignments (kSmN placeholder + CG:B,I aux) parse to the
    real CIGAR in the native scanner."""
    import struct
    from svscope_tpu.io import bgzf
    from svscope_tpu.native.bam import scan_alignment_table
    # real cigar: 10M5D10M (ref span 25), stored as 20S25N + CG tag
    seq = "ACGTACGTACGTACGTACGT"          # 20 bases
    name_b = b"cgread\x00"
    real_ops = [(10, 0), (5, 2), (10, 0)]  # (len, op) with M=0, D=2
    cg_payload = b"CGBI" + struct.pack("<I", len(real_ops)) + b"".join(
        struct.pack("<I", (l << 4) | op) for l, op in real_ops)
    placeholder = struct.pack("<II", (20 << 4) | 4, (25 << 4) | 3)  # 20S 25N
    codes = {"A": 1, "C": 2, "G": 4, "T": 8}
    packed = bytearray()
    for i in range(0, len(seq), 2):
        hi = codes[seq[i]] << 4
        lo = codes[seq[i + 1]] if i + 1 < len(seq) else 0
        packed.append(hi | lo)
    body = struct.pack("<iiBBHHHiiii", 0, 500, len(name_b), 60, 0, 2, 0,
                       len(seq), -1, -1, 0)
    body += name_b + placeholder + bytes(packed) + b"\xff" * len(seq)
    body += cg_payload
    text = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:10000\n"
    out = b"BAM\x01" + struct.pack("<i", len(text)) + text.encode()
    out += struct.pack("<i", 1)
    out += struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i", 10000)
    out += struct.pack("<i", len(body)) + body
    path = str(tmp_path / "cg.bam")
    bgzf.compress_to_file(path, out)
    tab = scan_alignment_table(path)
    assert len(tab) == 1
    assert tab.cigar[0] == "10M5D10M"
    assert int(tab.end[0]) == 525


def test_lazy_reader_grows_seq_buffer(tmp_path):
    from svscope_tpu.native.bam import LazyBamReader
    n = 1_200_000
    seq = "ACGT" * (n // 4)
    path = str(tmp_path / "long.bam")
    with BamWriter(path, ["chr1"], [2 * n]) as w:
        w.write(_mk_record("ultra", 100, f"{n}M", seq))
    rd = LazyBamReader(path)
    recs = rd.fetch("chr1", 200, 300)
    assert len(recs) == 1 and recs[0].seq == seq
