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
