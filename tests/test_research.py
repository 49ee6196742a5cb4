import numpy as np
import pytest

from svscope_tpu.viz.research import (bh_fdr, column_differential_test,
                                      consensus_by_majority,
                                      export_consensus_fasta,
                                      parse_repeatmasker_out)


def test_consensus_by_majority():
    rows = ["AC-T", "ACGT", "ACGT"]
    assert consensus_by_majority(rows) == "ACGT"
    # gap majority -> second best symbol
    rows = ["A--T", "A--T", "ACGT"]
    assert consensus_by_majority(rows) == "ACGT"


def test_bh_fdr_monotone():
    p = np.array([0.001, 0.02, 0.5, 0.9])
    q = bh_fdr(p)
    assert (np.diff(q[np.argsort(p)]) >= -1e-12).all()
    assert q.max() <= 1.0


def test_column_differential():
    rng = np.random.default_rng(0)
    som = np.zeros((8, 20), np.int64)
    germ = np.zeros((8, 20), np.int64)
    germ[:, :5] = 3  # first 5 columns differ completely
    p, q, mask = column_differential_test(som, germ)
    assert mask[:5].all()
    assert not mask[5:].any()


def test_export_consensus_fasta(tmp_path):
    raw = tmp_path / "raw.bed"
    raw.write_text("chr1\t10\t20\tACGT;TTTT\tr1\t2\tAAAA\tr2\t1\t"
                   "NormalOutput|EMOutput\n"
                   "chr1\t30\t40\t-\t-\t0\t-\t-\t0\tNormalOutput\n")
    out = tmp_path / "c.fa"
    n = export_consensus_fasta(str(raw), str(out))
    assert n == 2
    txt = out.read_text()
    assert ">chr1_10-20.som0" in txt and "TTTT" in txt


def test_parse_repeatmasker_out(tmp_path):
    p = tmp_path / "rm.out"
    p.write_text("   SW  perc\n\n"
                 " 463 1.3 0.6 1.7 chr1 10001 10468 (248945954) + "
                 "(TAACCC)n Simple_repeat 1 463 (0) 1\n")
    rows = parse_repeatmasker_out(str(p))
    assert rows == [("chr1", 10000, 10468, "Simple_repeat")]


def test_cohort_enrichment():
    from svscope_tpu.viz.research import (annotate_td_window, r_oe,
                                          som_td_cross_tab)
    ca = np.array(["HCC"] * 10 + ["LUAD"] * 10)
    rec = np.zeros(20)
    rec[:6] = 1  # 6/10 HCC positive, 0/10 LUAD
    cross = som_td_cross_tab(rec, ca)
    assert cross[0].tolist() == [6, 0] and cross[1].tolist() == [4, 10]
    roe = r_oe(cross)
    assert roe[0] == 2.0 and roe[1] == 0.0  # expected 3 each
    assert annotate_td_window(rec, ca) == "HCC"
    balanced = np.zeros(20)
    balanced[:5] = 1
    balanced[10:15] = 1  # 5/10 positive in both types: no enrichment
    assert annotate_td_window(balanced, ca) == "-"
