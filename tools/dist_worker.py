"""One process of a real jax.distributed localGraph run (test harness for
parallel/shard.py; see tests/test_parallel.py::
test_real_jax_distributed_two_processes).

argv: process_id num_processes coord_port reference tumor_bam normal_bam
      window_bed savedir
"""
import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    idx, n, port, ref, tumor, normal, wb, savedir = sys.argv[1:9]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from svscope_tpu.parallel.shard import (init_distributed,
                                            run_local_graph_sharded)
    pi, pc = init_distributed(f"localhost:{port}", int(n), int(idx))
    assert (pi, pc) == (int(idx), int(n)), (pi, pc)
    assert len(jax.devices()) == int(n) * len(jax.local_devices())
    recs = [l for l in open(wb).read().splitlines() if l.strip()]
    out = run_local_graph_sharded(recs, ref, [tumor], [normal], ["S"],
                                  ["S"], savedir, merge=(pi == 0),
                                  offset=50)
    print(f"proc {pi}/{pc}: done, merged={out}")


if __name__ == "__main__":
    main()
