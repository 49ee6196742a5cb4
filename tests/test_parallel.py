import os

import numpy as np
import pytest

from svscope_tpu.parallel.shard import (merge_shards, run_local_graph_sharded,
                                        shard_records)

from synth import make_test_pair


def test_shard_records_partition():
    recs = [f"chr1\t{i}\t{i+10}" for i in range(100)]
    parts = [shard_records(recs, p, 4, block=8) for p in range(4)]
    joined = sorted(sum(parts, []))
    assert joined == sorted(recs)          # exact partition
    assert all(len(p) > 0 for p in parts)  # balanced-ish


def test_sharded_local_graph_matches_single(tmp_path):
    d = str(tmp_path)
    ref, tumor, normal, recs, _ = make_test_pair(d, seed=4)
    single_dir = os.path.join(d, "single")
    from svscope_tpu.engine.localgraph import run_local_graph
    single = run_local_graph(recs, ref, [tumor], [normal], ["S"], ["S"],
                             single_dir, offset=50)
    shard_dir = os.path.join(d, "sharded")
    # simulate two hosts sequentially
    run_local_graph_sharded(recs, ref, [tumor], [normal], ["S"], ["S"],
                            shard_dir, process_index=1, process_count=2,
                            merge=False, offset=50)
    out = run_local_graph_sharded(recs, ref, [tumor], [normal], ["S"], ["S"],
                                  shard_dir, process_index=0,
                                  process_count=2, merge=True, offset=50)
    assert open(out).read() == open(single).read()


def test_graft_dryrun_8_devices():
    import __graft_entry__ as ge
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)


def test_sharded_em_collectives_equal_unsharded():
    """psum-decomposed EM over mp=4 == the same scan on one device."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from svscope_tpu.parallel.mesh import (make_example_batch, make_mesh,
                                           sharded_em_step)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    devs = np.array(jax.devices()[:8])
    mesh_wide = Mesh(devs.reshape(2, 4), ("dp", "mp"))
    mesh_flat = Mesh(devs[:2].reshape(2, 1), ("dp", "mp"))
    batch, n_reads, nf = 4, 16, 12
    args_np = make_example_batch(batch, n_reads, nf, seed=3)
    outs = []
    for mesh in (mesh_wide, mesh_flat):
        put = lambda a, spec: jax.device_put(jnp.asarray(a),
                                             NamedSharding(mesh, spec))
        args = (put(args_np[0], P("dp", "mp", None, None)),
                put(args_np[1], P("dp", "mp")),
                put(args_np[2], P("dp", "mp", None)),
                put(args_np[3], P("dp", None)),
                put(args_np[4], P("dp")))
        gamma, lik = sharded_em_step(mesh)(*args)
        outs.append((np.array(gamma), np.array(lik)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-5)


def test_process_window_batch_dp_mesh_identical():
    """Production multi-chip: the REAL engine path (45-slot folded EM +
    consensus emission) over an 8-device ("dp",) mesh must emit records
    identical to the single-device run, with sharding actually engaged."""
    import bench
    from svscope_tpu.engine.localgraph import process_window_batch
    from svscope_tpu.parallel import dataparallel as dpm
    rng = np.random.default_rng(5)
    wins = bench.make_window_payloads(24, rng)
    try:
        dpm.set_data_mesh(None)
        base = process_window_batch(wins)
        dpm.set_data_mesh(dpm.make_dp_mesh(8))
        out = process_window_batch(wins)
        assert dpm.LAST_DISPATCH["sharded"]
        assert dpm.LAST_DISPATCH["n_shards"] == 8
    finally:
        dpm.set_data_mesh(None)
    assert out == base


def test_mp_read_parallel_em_identical():
    """Read-parallel (mp) EM: a 500-read window (above MP_READ_THRESHOLD)
    scatters its READ axis over the 8-device mesh — SURVEY §5's Ulysses
    analog — and must select the same K, labels and (to fp reduction
    order) BICs as the unsharded folded EM."""
    import jax
    import svscope_tpu.models.mixture as mx
    from svscope_tpu.parallel import dataparallel as dpm
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)

    def win(n1, n2, nf):
        a = rng.integers(0, 4, (1, nf))
        b = (a + 1 + rng.integers(0, 3, (1, nf))) % 4
        x = np.concatenate([np.repeat(a, n1, 0), np.repeat(b, n2, 0)])
        flip = rng.random(x.shape) < 0.03
        return np.where(flip, rng.integers(0, 5, x.shape), x).astype(np.int8)

    # 500-read window (the selection cap), a small window (normal path)
    # and a 300-read window, mixed in one dispatch
    feats = [win(250, 250, 40), win(6, 6, 18), win(150, 150, 64)]
    for labels_only in (True, False):
        base = mx.em_cluster_batch_dispatch(feats, labels_only=labels_only,
                                            dtype=np.float64)()
        assert not mx.LAST_MP_DISPATCH["used"]
        try:
            dpm.set_data_mesh(dpm.make_dp_mesh(8))
            got = mx.em_cluster_batch_dispatch(
                feats, labels_only=labels_only, dtype=np.float64)()
            assert mx.LAST_MP_DISPATCH["used"]
            assert mx.LAST_MP_DISPATCH["n_shards"] == 8
            assert mx.LAST_MP_DISPATCH["n_windows"] == 2   # windows 0 and 2
        finally:
            dpm.set_data_mesh(None)
        for i, (b, g) in enumerate(zip(base, got)):
            assert g[0] == b[0], (labels_only, i)          # K
            assert (g[2] == b[2]).all(), (labels_only, i)  # labels
            np.testing.assert_allclose(g[6], b[6], rtol=1e-9)  # BICs


def test_poa_device_rounds_dp_mesh_identical():
    """Device POA rounds (XLA aligner) with the batch axis sharded over the
    8-device mesh: MSAs and consensuses identical to unsharded."""
    from svscope_tpu.ops.poa_batch import poa_msa_batch
    from svscope_tpu.parallel import dataparallel as dpm
    rng = np.random.default_rng(6)
    jobs = []
    for w in range(10):
        base = "".join(rng.choice(list("ACGT"), 60))
        reads = [base]
        for _ in range(3):
            b = list(base)
            for _ in range(3):
                b[int(rng.integers(0, len(b)))] = str(rng.choice(list("ACGT")))
            reads.append("".join(b))
        jobs.append(reads)
    try:
        dpm.set_data_mesh(None)
        base_out = poa_msa_batch(jobs, use_device="xla")
        dpm.set_data_mesh(dpm.make_dp_mesh(8))
        out = poa_msa_batch(jobs, use_device="xla")
        assert dpm.LAST_DISPATCH["sharded"]
    finally:
        dpm.set_data_mesh(None)
    assert out == base_out


def test_real_jax_distributed_two_processes(tmp_path):
    """REAL multi-process run: two OS processes joined through
    jax.distributed.initialize (CPU backend, 2 local devices each —
    4 global), each running its block-cyclic shard of the window stream
    through the full engine with its own per-host dp mesh; host 0 merges.
    Output must equal the single-process run byte-for-byte."""
    import socket
    import subprocess
    import sys
    d = str(tmp_path)
    ref, tumor, normal, recs, _ = make_test_pair(d, seed=4)
    wb = os.path.join(d, "windows.bed")
    open(wb, "w").write("\n".join(recs) + "\n")
    single_dir = os.path.join(d, "single")
    from svscope_tpu.engine.localgraph import run_local_graph
    single = run_local_graph(recs, ref, [tumor], [normal], ["S"], ["S"],
                             single_dir, offset=50)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    dist_dir = os.path.join(d, "dist")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "dist_worker.py")
    env = dict(os.environ,
               PYTHONPATH=repo + ":" + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), "2", str(port), ref, tumor,
         normal, wb, dist_dir], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    merged = os.path.join(
        dist_dir, os.path.basename(single))
    assert open(merged).read() == open(single).read()
