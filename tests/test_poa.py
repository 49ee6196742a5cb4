import numpy as np
import pytest

from svscope_tpu.ops.poa import poa


def _mutate(rng, base, n_ops):
    b = list(base)
    for _ in range(n_ops):
        i = int(rng.integers(0, len(b)))
        op = int(rng.integers(0, 3))
        if op == 0:
            b[i] = str(rng.choice(list("ACGT")))
        elif op == 1:
            b.insert(i, str(rng.choice(list("ACGT"))))
        elif len(b) > 1:
            b.pop(i)
    return "".join(b)


def test_identical_sequences():
    c, msa = poa(["ACGTACGTAA"] * 5, 1)
    assert c == "ACGTACGTAA"
    assert msa == ["ACGTACGTAA"] * 5


def test_single_sequence():
    c, msa = poa(["TTGGCC"], 1)
    assert c == "TTGGCC"
    assert msa == ["TTGGCC"]


def test_majority_snp_consensus():
    seqs = ["ACGTACGT", "ACGAACGT", "ACGAACGT", "ACGAACGT"]
    c, msa = poa(seqs, 1)
    assert c == "ACGAACGT"
    assert all(len(r) == len(msa[0]) for r in msa)


def test_insertion_columns():
    seqs = ["ACGTACGT", "ACGTTTTACGT", "ACGTTTTACGT", "ACGTTTTACGT"]
    c, msa = poa(seqs, 1)
    assert len(msa[0]) == 11
    assert msa[0].replace("-", "") == seqs[0]
    assert c == "ACGTTTTACGT"


def test_deletion_columns():
    seqs = ["ACGTACGTACGT", "ACGTGT", "ACGTGT"]
    c, msa = poa(seqs, 1)
    for s, row in zip(seqs, msa):
        assert row.replace("-", "") == s


def test_empty_sequence_row():
    c, msa = poa(["ACGT", "", "ACGT"], 1)
    assert msa[1] == "-" * len(msa[0])
    assert msa[0].replace("-", "") == "ACGT"


def test_degap_invariant_random():
    rng = np.random.default_rng(7)
    for trial in range(5):
        base = "".join(rng.choice(list("ACGT"), 120))
        seqs = [base] + [_mutate(rng, base, 6) for _ in range(8)]
        c, msa = poa(seqs, 1)
        assert len({len(r) for r in msa}) == 1
        for s, row in zip(seqs, msa):
            assert row.replace("-", "") == s
        assert set(c) <= set("ACGT")


def test_structured_insertion_phasing():
    """Half the reads carry a 12bp insertion — MSA must keep the inserted
    block in dedicated columns so feature selection can see it."""
    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("ACGT"), 80))
    ins = base[:40] + "TTAGGGTTAGGG" + base[40:]
    seqs = [base] + [ins] * 4 + [base] * 4
    c, msa = poa(seqs, 1)
    width = len(msa[0])
    assert width >= len(ins)
    ins_cols = [j for j in range(width) if msa[0][j] == "-"]
    assert len(ins_cols) >= 10
    for r in msa[1:5]:
        assert sum(r[j] != "-" for j in ins_cols) >= 10


def test_nonoverlapping_divergent():
    c, msa = poa(["AAAA", "GGGG", "AAAA"], 1)
    for s, row in zip(["AAAA", "GGGG", "AAAA"], msa):
        assert row.replace("-", "") == s
    assert c == "AAAA"


def test_oracle_fallback_when_native_unavailable(monkeypatch):
    """poa_msa_batch degrades to the NumPy oracle (output-identical) when
    the native engine cannot load — wheel install on an ISA-gated host
    (svscope_tpu/native/poa.py::native_available)."""
    import svscope_tpu.native.poa as npoa
    import svscope_tpu.ops.poa_batch as pb
    from svscope_tpu.ops.poa import poa

    monkeypatch.setattr(npoa, "_available", False)
    seqs = ["ACGTACGTAC", "ACGTTACGTAC", "ACGTACGTAC"]
    out = pb.poa_msa_batch([seqs], use_device=False)
    assert out[0] == poa(seqs, 1)
