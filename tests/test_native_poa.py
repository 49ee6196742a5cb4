"""Native C++ POA engine (native/poa_engine.cpp) vs the NumPy oracle
(ops/poa.py) — the randomized parity soak for the production default engine
of hot loop #1 (reference src/DataScanner.py:207: spoa's per-window POA).

MSA + consensus equality over a full randomized build transitively pins
down alignment, tie-breaks, fusion and column layout; stress cases cover
homopolymers, short tandem repeats, tiny/empty inputs; the batch entry
point must agree with the per-window engine.
"""
import numpy as np
import pytest

from svscope_tpu.ops.poa import poa

native = pytest.importorskip("svscope_tpu.native.poa")


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


def _random_window(rng):
    L = int(rng.integers(8, 180))
    base = "".join(rng.choice(list("ACGT"), L))
    n_reads = int(rng.integers(2, 10))
    seqs = [base]
    for _ in range(n_reads):
        kind = int(rng.integers(0, 4))
        if kind == 0:                      # light noise
            seqs.append(_mutate(rng, base, int(rng.integers(0, 6))))
        elif kind == 1:                    # insertion carrier
            mid = int(rng.integers(0, L))
            ins = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 30))))
            seqs.append(_mutate(rng, base[:mid] + ins + base[mid:], 2))
        elif kind == 2:                    # deletion carrier
            a = int(rng.integers(0, L))
            d = int(rng.integers(1, max(2, L // 3)))
            seqs.append(_mutate(rng, base[:a] + base[a + d:], 2))
        else:                              # heavy divergence
            seqs.append(_mutate(rng, base, int(rng.integers(8, 20))))
    return seqs


def test_native_matches_oracle_randomized_soak():
    rng = np.random.default_rng(42)
    for t in range(50):
        seqs = _random_window(rng)
        c_np, m_np = poa(seqs, 1)
        c_cc, m_cc = native.poa_native(seqs)
        assert m_cc == m_np, f"window {t}: MSA mismatch"
        assert c_cc == c_np, f"window {t}: consensus mismatch"


def test_native_stress_cases():
    cases = [
        ["AAAAAAAAAA", "AAAAAAA", "AAAAAAAAAAAAA"],        # homopolymer
        ["ACACACACAC", "ACACAC", "ACACACACACACAC"],        # dinucleotide TR
        ["ACGTACGTACGT", "ACGTACGT", "ACGT"],              # unit-repeat
        ["A", "A", "A"],                                   # tiny
        ["A", "C"],                                        # all-mismatch
        ["ACGT", "", "ACG"],                               # empty row mid
        ["", "ACGT"],                                      # empty row first
        ["GATTACA"],                                       # single sequence
    ]
    for seqs in cases:
        assert native.poa_native(seqs) == poa(seqs, 1), seqs


def test_native_batch_matches_per_window():
    rng = np.random.default_rng(7)
    wins = [_random_window(rng) for _ in range(12)]
    batch = native.poa_msa_batch_native(wins, threads=4)
    for w, seqs in enumerate(wins):
        c, msa = native.poa_native(seqs)
        assert batch[w] == (c, msa), f"window {w}"


def test_native_pack_shape_consistency():
    """pack() feeds the device aligners: counts and in-degree must agree
    with the graph, preds must be valid earlier ranks, chars in alphabet."""
    rng = np.random.default_rng(9)
    for _ in range(10):
        seqs = _random_window(rng)
        g = native.NativePoaGraph()
        for s in seqs:
            g.add_sequence(s)
        n = g.n_nodes()
        p_max = max(g.max_indegree(), 1)
        packed = g.pack(n + 4, p_max)
        assert packed is not None
        chars, preds, sinks, n_used, nor = packed
        assert int(n_used) == n
        r = np.arange(n + 4)[:, None]
        valid = preds >= 0
        assert (preds[valid] < np.broadcast_to(r, preds.shape)[valid]).all()
        assert sinks[:n].any() or n == 0


def test_incremental_topo_order_per_step():
    """The C++ engine maintains aligned groups incrementally (gids claimed
    equal to from-scratch discovery order — native/poa_engine.cpp Graph);
    this pins the invariant directly: after EVERY sequence add, the
    native rank (poa_pack node_of_rank) equals the NumPy oracle's
    from-scratch topo_order, node id by node id."""
    import numpy as np
    from svscope_tpu.ops.poa import PoaGraph, _fused_path
    from svscope_tpu.native.poa import NativePoaGraph

    rng = np.random.default_rng(4242)
    for trial in range(12):
        L = int(rng.integers(8, 60))
        unit = "".join(rng.choice(list("ACGT"), max(2, L // 7)))
        ref = ((unit * 40)[:L] if trial % 3 == 0
               else "".join(rng.choice(list("ACGT"), L)))
        gp, gn = PoaGraph(), NativePoaGraph()
        first = True
        for r in range(6):
            b = list(ref)
            for _ in range(int(rng.integers(0, max(2, L // 5)))):
                p = int(rng.integers(0, len(b)))
                op = rng.random()
                if op < 0.4:
                    b[p] = str(rng.choice(list("ACGT")))
                elif op < 0.7 and len(b) > 2:
                    del b[p]
                else:
                    b.insert(p, str(rng.choice(list("ACGT"))))
            seq = "".join(b)
            if first:
                prev = -1
                for ch in seq:
                    cur = gp._add_node(ch)
                    if prev >= 0:
                        gp._add_edge(prev, cur)
                    prev = cur
                gp.seq_begin.append(0)
                first = False
            else:
                _fused_path(gp, gp.align(seq), seq)
            gn.add_sequence(seq)
            packed = gn.pack(gp.n_nodes() + 8)
            assert packed is not None
            chars, preds, sinks, n, node_of_rank = packed
            oracle_order = gp.topo_order()
            assert int(n) == gp.n_nodes()
            assert list(node_of_rank[:n]) == oracle_order, \
                f"trial {trial} read {r}: incremental rank != oracle"
