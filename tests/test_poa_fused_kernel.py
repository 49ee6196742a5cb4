"""Parity for the fully fused Pallas round kernel (ops/poa_fused_kernel):
alignment + traceback + graph fusion on-core, driven by the 'pk' engine of
the on-device MSA build.  Oracle: ops.poa.poa — the spoa-parity NumPy
reference for the hot loop #1 (/root/reference/src/DataScanner.py:207).

Interpreter mode on CPU (the kernel's access patterns are the compiled
ops/poa_pallas patterns; interpret pins the semantics).  Windows are kept
to one small (R, L, N) bucket so the CPU interpret cost stays bounded.
"""
import random

import numpy as np
import pytest

from svscope_tpu.ops.poa import poa
from svscope_tpu.ops import poa_fused as pf


@pytest.fixture
def pk_engine(monkeypatch):
    monkeypatch.setenv("SVSCOPE_FUSED_ENGINE", "pk")


def mutate(rng, s, sub, ins, dele):
    out = []
    for ch in s:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(rng.choice("ACGT"))
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append(rng.choice("ACGT"))
    return "".join(out)


def window(rng, nreads, L, div):
    ref = "".join(rng.choice("ACGT") for _ in range(L))
    sv = "".join(rng.choice("ACGT") for _ in range(rng.randint(4, 10)))
    reads = []
    for i in range(nreads - 1):
        base = ref[:L // 2] + sv + ref[L // 2:] if i % 2 == 0 else ref
        reads.append(mutate(rng, base, div, div / 2, div / 2))
    return [ref] + reads


def test_pk_edge_cases_exact(pk_engine):
    windows = [
        ["ACGT"],
        ["ACGT", "ACGT", "ACGT"],
        ["ACGT", "", "AGT"],
        ["", "ACGTA"],                 # graph inits on the second read
        ["A", "T"],
        ["ACGTACGT", "TGCATGCA"],
        [],
        ["", ""],
    ]
    got = pf.fused_msa_batch(windows)
    for seqs, g in zip(windows, got):
        assert g == poa(seqs, 1), seqs


def test_pk_randomized_windows_exact(pk_engine):
    rng = random.Random(20260821)
    windows = [window(rng, rng.randint(3, 6), rng.randint(12, 40),
                      rng.choice([0.02, 0.1, 0.25]))
               for _ in range(12)]
    got = pf.fused_msa_batch(windows)
    for i, seqs in enumerate(windows):
        assert got[i] == poa(seqs, 1), f"window {i}"


def test_pk_overflow_falls_back_to_host(pk_engine):
    # fully divergent reads blow the node estimate -> in-kernel overflow
    # flag -> transparent host fallback with exact results
    rng = random.Random(3)
    seqs = ["".join(rng.choice("ACGT") for _ in range(60))
            for _ in range(16)]
    got = pf.fused_msa_batch([seqs])
    assert got[0] == poa(seqs, 1)


def test_pk_matches_xla_engine_state():
    """Full state-level agreement between the 'pk' and 'xla' builds on the
    active rows (inactive rows may differ: masked kernel writes land on
    the trash row by design)."""
    import jax
    rng = random.Random(7)
    wins = [window(rng, 4, 24, 0.1) for _ in range(8)]
    ncap, r_max, l_max, B = 65, 4, 48, 8
    seqs_a = np.zeros((B, r_max, l_max), np.uint8)
    lens_a = np.zeros((B, r_max), np.int32)
    nseq_a = np.zeros(B, np.int32)
    for bi, w in enumerate(wins):
        nseq_a[bi] = len(w)
        for ri, s in enumerate(w):
            c = pf.CODE_OF[np.frombuffer(s.encode(), np.uint8)]
            seqs_a[bi, ri, :len(c)] = c
            lens_a[bi, ri] = len(c)
    base = jax.device_get(pf._build_batch(
        seqs_a, lens_a, nseq_a, ncap=ncap, r_max=r_max, l_max=l_max,
        engine="xla"))
    got = jax.device_get(pf._build_batch(
        seqs_a, lens_a, nseq_a, ncap=ncap, r_max=r_max, l_max=l_max,
        engine="pk", interpret=True))
    nn = np.asarray(base[2])
    assert (np.asarray(got[2]) == nn).all()
    for name, ai, bi_ in (("chars", 0, 0), ("group_min", 1, 1)):
        for b in range(B):
            a = np.asarray(base[ai][b])[:nn[b]]
            g = np.asarray(got[bi_][b])[:nn[b]]
            assert (a == g).all(), (name, b)
    for name, idx in (("path", 3), ("order", 4), ("back_buf", 5),
                      ("back_start", 6), ("fwd_buf", 7), ("fwd_cnt", 8),
                      ("overflow", 9)):
        np.testing.assert_array_equal(np.asarray(base[idx]),
                                      np.asarray(got[idx]), err_msg=name)
