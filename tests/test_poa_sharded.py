"""Column-sharded wavefront POA vs the host aligner (PoaGraph.align).

Runs on the conftest 8-virtual-device CPU mesh; alignment pairs and the
full MSA must be identical to the single-device path, including tie-break
order.  This is the oversized-window ("long context") path of SURVEY.md §5.
"""
import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from svscope_tpu.ops.poa import PoaGraph, poa
from svscope_tpu.ops.poa_sharded import align_sharded, poa_msa_sharded


def _mesh(n=None):
    devs = np.array(jax.devices()[: (n or len(jax.devices()))])
    return Mesh(devs, ("sp",))


def _noisy_reads(rng, ref, n_reads, n_edits, ins=None):
    reads = []
    for r in range(n_reads):
        b = list(ref if ins is None or r % 2 else
                 ref[: len(ref) // 2] + ins + ref[len(ref) // 2:])
        for _ in range(n_edits):
            p = int(rng.integers(1, len(b) - 1))
            op = int(rng.integers(0, 3))
            if op == 0:
                b[p] = str(rng.choice(list("ACGT")))
            elif op == 1:
                b.insert(p, str(rng.choice(list("ACGT"))))
            else:
                b.pop(p)
        reads.append("".join(b))
    return reads


@pytest.mark.parametrize("seed,ref_len", [(0, 120), (1, 300), (2, 75)])
def test_align_sharded_matches_host(seed, ref_len):
    rng = np.random.default_rng(seed)
    ref = "".join(rng.choice(list("ACGT"), ref_len))
    reads = _noisy_reads(rng, ref, 6, 5,
                         ins="".join(rng.choice(list("ACGT"), 40)))
    mesh = _mesh()
    g = PoaGraph()
    # build the graph with a few sequences via the host path, then align
    # each subsequent read both ways and compare pair-for-pair
    poa_ref = poa([ref] + reads[:3], 1)  # warms nothing; host oracle below
    del poa_ref
    from svscope_tpu.ops.poa import _fused_path
    first = True
    for s in [ref] + reads[:3]:
        if first:
            prev = -1
            for ch in s:
                cur = g._add_node(ch)
                if prev >= 0:
                    g._add_edge(prev, cur)
                prev = cur
            g.seq_begin.append(0)
            first = False
        else:
            _fused_path(g, g.align(s), s)
    for s in reads[3:]:
        host = g.align(s)
        dev, _score = align_sharded(g, s, mesh)
        assert dev == host


def test_poa_msa_sharded_matches_host_msa():
    rng = np.random.default_rng(7)
    ref = "".join(rng.choice(list("ACGT"), 200))
    reads = _noisy_reads(rng, ref, 8, 4,
                         ins="".join(rng.choice(list("ACGT"), 30)))
    seqs = [ref] + reads
    cons_host, msa_host = poa(seqs, 1)
    cons_dev, msa_dev = poa_msa_sharded(seqs, _mesh())
    assert msa_dev == msa_host
    assert cons_dev == cons_host


def test_align_sharded_small_mesh_and_short_read():
    rng = np.random.default_rng(3)
    ref = "".join(rng.choice(list("ACGT"), 64))
    g = PoaGraph()
    prev = -1
    for ch in ref:
        cur = g._add_node(ch)
        if prev >= 0:
            g._add_edge(prev, cur)
        prev = cur
    g.seq_begin.append(0)
    short = ref[5:20]
    mesh = _mesh(2)
    dev, score = align_sharded(g, short, mesh)
    host = g.align(short)
    assert dev == host


def test_device_batch_routes_oversize_through_sharded(monkeypatch):
    """Windows beyond the device buckets align via the sharded wavefront
    (not the host fallback) when an oversize mesh is given, and the MSA is
    identical to the host engine's."""
    from svscope_tpu.ops import poa_batch as pb
    rng = np.random.default_rng(9)
    ref = "".join(rng.choice(list("ACGT"), 150))
    reads = _noisy_reads(rng, ref, 5, 3)
    seqs = [ref] + reads
    host = pb.poa_msa_batch([seqs], use_device=False)
    # shrink the ladders so this window is "oversized" for the batch path
    monkeypatch.setattr(pb, "N_LADDER", (64,))
    monkeypatch.setattr(pb, "L_LADDER", (64,))
    calls = {"n": 0}
    real = pb._oversize_sharded

    def counting(g, seq, mesh, axis):
        calls["n"] += 1
        return real(g, seq, mesh, axis)

    monkeypatch.setattr(pb, "_oversize_sharded", counting)
    dev = pb.poa_msa_batch([seqs], use_device=True, oversize_mesh=_mesh())
    assert calls["n"] == len(reads)          # every round went sharded
    assert dev[0][1] == host[0][1]
    assert dev[0][0] == host[0][0]


def test_host_mode_routes_giant_windows_to_wavefront(monkeypatch):
    """poa_msa_batch in HOST mode sends windows whose reads exceed the
    device buckets through the sharded wavefront when a default oversize
    mesh is configured (CLI --oversize-sharded)."""
    from svscope_tpu.ops import poa_batch as pb
    rng = np.random.default_rng(13)
    ref = "".join(rng.choice(list("ACGT"), 180))
    giant = [ref] + _noisy_reads(rng, ref, 4, 3)
    small_ref = "".join(rng.choice(list("ACGT"), 60))
    small = [small_ref] + _noisy_reads(rng, small_ref, 3, 2)
    expected = pb.poa_msa_batch([giant, small], use_device=False)
    monkeypatch.setattr(pb, "L_LADDER", (64,))   # 'giant' now over-bucket
    calls = {"n": 0}
    real = pb._oversize_sharded

    def counting(g, seq, mesh, axis):
        calls["n"] += 1
        return real(g, seq, mesh, axis)

    monkeypatch.setattr(pb, "_oversize_sharded", counting)
    pb.set_default_oversize_mesh(_mesh())
    try:
        out = pb.poa_msa_batch([giant, small], use_device=False)
    finally:
        pb.set_default_oversize_mesh(None)
    assert calls["n"] == len(giant) - 1
    assert out[0] == expected[0]
    assert out[1] == expected[1]


@pytest.mark.parametrize("n_dev", [2, 8])
def test_banded_traceback_matches_full(n_dev):
    """The dirless path (H-resident, on-demand direction blocks) must walk
    the exact same alignment as the full direction-plane fetch, on a
    branch-heavy graph with tiny blocks to force many block crossings."""
    rng = np.random.default_rng(31 + n_dev)
    ref = "".join(rng.choice(list("ACGT"), 130))
    g = PoaGraph()
    from svscope_tpu.ops.poa import _fused_path
    prev = -1
    for ch in ref:
        cur = g._add_node(ch)
        if prev >= 0:
            g._add_edge(prev, cur)
        prev = cur
    g.seq_begin.append(0)
    for s in _noisy_reads(rng, ref, 6, 20,
                          ins="".join(rng.choice(list("ACGT"), 25))):
        _fused_path(g, g.align(s), s)
    mesh = _mesh(n_dev)
    for L in (64, 97, 130):
        read = "".join(rng.choice(list("ACGT"), 15)) + ref[:max(L - 15, 5)]
        host = g.align(read)
        for kb in ((8, 8), (16, 32), (512, 512)):
            dev, score = align_sharded(g, read, mesh, traceback="banded",
                                       tb_block=kb)
            assert dev == host, (n_dev, L, kb)
        full, fscore = align_sharded(g, read, mesh, traceback="full")
        assert full == host and fscore == score


def test_banded_msa_matches_host(monkeypatch):
    """Whole-window MSA with every round forced through the banded
    (dirless) traceback equals the host engine's MSA."""
    import svscope_tpu.ops.poa_sharded as ps
    rng = np.random.default_rng(41)
    ref = "".join(rng.choice(list("ACGT"), 220))
    seqs = [ref] + _noisy_reads(rng, ref, 7, 5,
                                ins="".join(rng.choice(list("ACGT"), 35)))
    cons_host, msa_host = poa(seqs, 1)
    monkeypatch.setattr(ps, "FULL_DIRS_CELL_LIMIT", 0)   # 'auto' -> banded
    monkeypatch.setattr(ps, "TB_BLOCK_R", 64)
    monkeypatch.setattr(ps, "TB_BLOCK_C", 64)
    cons_dev, msa_dev = poa_msa_sharded(seqs, _mesh())
    assert msa_dev == msa_host
    assert cons_dev == cons_host


def test_design_point_4k_tandem_repeat_banded_auto(monkeypatch):
    """The oversized-window path at its design point: a ~4k-node tandem-
    repeat graph vs a >4k bp read on the 8-device mesh, with enough cells
    that traceback='auto' crosses FULL_DIRS_CELL_LIMIT and takes the
    block-recompute (H-resident) path.  Asserts (a) the auto switch really
    engaged, (b) alignment parity with the host aligner, (c) the O(N/kr +
    L/kc) direction-block fetch bound that makes the dirless design scale
    (32k x 32k windows without a quarter-GB device->host transfer)."""
    import svscope_tpu.ops.poa_sharded as ps
    from svscope_tpu.ops.poa import _fused_path
    rng = np.random.default_rng(0)
    unit = "".join(rng.choice(list("ACGT"), 60))
    ref = (unit * 70)[:3900]                     # tandem-repeat reference
    g = PoaGraph()
    prev = -1
    for ch in ref:
        cur = g._add_node(ch)
        if prev >= 0:
            g._add_edge(prev, cur)
        prev = cur
    g.seq_begin.append(0)

    def noisy(s, ne):
        b = list(s)
        for _ in range(ne):
            p = int(rng.integers(1, len(b) - 1))
            op = int(rng.integers(0, 3))
            if op == 0:
                b[p] = str(rng.choice(list("ACGT")))
            elif op == 1:
                b.insert(p, str(rng.choice(list("ACGT"))))
            else:
                b.pop(p)
        return "".join(b)

    for _ in range(2):                           # branch the graph
        s = noisy(ref, 50)
        _fused_path(g, g.align(s), s)
    n = g.n_nodes()
    assert 3900 <= n <= 4096, n                  # n_max bucket = 4096
    read = noisy(ref, 60) + noisy(unit * 5, 10)  # > 4096 bp
    assert len(read) > 4096
    mesh = _mesh(8)
    # the auto threshold must be crossed at these shapes
    n_max = max(256, 1 << (n - 1).bit_length())
    l_bucket = max(256, 1 << max(len(read) - 1, 1).bit_length())
    block = -(-(l_bucket + 1) // 8)
    assert n_max * block * 8 > ps.FULL_DIRS_CELL_LIMIT
    calls = {"n": 0}
    real = ps._dir_block

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(ps, "_dir_block", counting)
    dev, _score = align_sharded(g, read, mesh, traceback="auto")
    assert calls["n"] > 0, "auto did not take the block-recompute path"
    bound = n // ps.TB_BLOCK_R + len(read) // ps.TB_BLOCK_C + 2
    assert calls["n"] <= bound, (calls["n"], bound)
    assert dev == g.align(read)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_align_sharded_block_boundary_stress(n_dev):
    """Highly divergent reads (dense bubbles, multi-pred nodes) with read
    lengths chosen so seq_len lands on/next to block edges; every mesh
    width must reproduce the host alignment exactly."""
    rng = np.random.default_rng(20 + n_dev)
    ref = "".join(rng.choice(list("ACGT"), 90))
    g = PoaGraph()
    from svscope_tpu.ops.poa import _fused_path
    prev = -1
    for ch in ref:
        cur = g._add_node(ch)
        if prev >= 0:
            g._add_edge(prev, cur)
        prev = cur
    g.seq_begin.append(0)
    # very noisy reads -> branch-heavy graph with long-range predecessors
    for s in _noisy_reads(rng, ref, 6, 25):
        _fused_path(g, g.align(s), s)
    mesh = _mesh(n_dev)
    # block = ceil((l_bucket+1)/D); probe lengths around multiples of it
    for L in (63, 64, 65, 89, 90, 107, 128):
        read = "".join(rng.choice(list("ACGT"), 20)) + ref[:max(L - 20, 5)]
        host = g.align(read)
        dev, _ = align_sharded(g, read, mesh)
        assert dev == host, (n_dev, L)
