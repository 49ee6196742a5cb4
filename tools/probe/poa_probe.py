"""Apportion the Pallas POA kernel's wall time across suspects.

Loads ops/poa_pallas.py as source, applies a variant's text patch, execs
it as a standalone module, and times the roofline workload (256 windows x
512 nodes x 450 bp, 15% branch rows).  Variants other than `full`/`notb`
produce WRONG alignments — timing only.

  full     unmodified kernel
  notb     traceback walk skipped (DP + direction stores kept)
  nodirs   traceback AND direction-plane stores removed (pure DP)
  nopfx    prefix-max replaced by one max step (timing only)
  nochsk   per-row ch/snk SMEM scalar reads replaced by constants
  chain    all-chain graph batch (branch-free kernel specialization)

Usage: python tools/probe/poa_probe.py <variant> [reps]
"""
import os
import sys
import time
import types

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

import numpy as np

VARIANTS = {
    "full": [],
    "notb": [(
        "    _, _, kv, an, asx = jax.lax.while_loop(tb_cond, tb_body, st0)",
        "    _iv0, _jv0, kv, an, asx = st0")],
    "nodirs": [(
        "        h_s[pl.ds(i, 1)] = hrow.reshape(1, W, l1)\n"
        "        d_s[pl.ds(r, 1)] = dirrow.reshape(1, W, l1)",
        "        h_s[pl.ds(i, 1)] = hrow.reshape(1, W, l1)"),
        (
        "    _, _, kv, an, asx = jax.lax.while_loop(tb_cond, tb_body, st0)",
        "    _iv0, _jv0, kv, an, asx = st0")],
    "nopfx": [(
        "def _prefix_max(v):\n    s = 1\n    while s < v.shape[-1]:\n"
        "        v = jnp.maximum(v, _roll_right(v, s, NEG))\n        s *= 2\n"
        "    return v",
        "def _prefix_max(v):\n"
        "    return jnp.maximum(v, _roll_right(v, 1, NEG))")],
    "nochsk": [(
        "        ch = jnp.stack([chars_ref[k, r] for k in range(W)])"
        ".reshape(W, 1)\n"
        "        snk = jnp.stack([sinks_ref[k, r] for k in range(W)])"
        ".reshape(W, 1)",
        "        ch = jnp.full((W, 1), 65, jnp.int32)\n"
        "        snk = jnp.ones((W, 1), jnp.int32)")],
    "chain": [],
}

def load_variant(name):
    src = open(os.path.join(ROOT, "svscope_tpu/ops/poa_pallas.py")).read()
    # run standalone: absolute imports instead of package-relative
    src = src.replace("from ..utils.jaxcfg import enable_cache",
                      "from svscope_tpu.utils.jaxcfg import enable_cache")
    src = src.replace("from ..parallel.dataparallel import data_mesh",
                      "from svscope_tpu.parallel.dataparallel import "
                      "data_mesh")
    for old, new in VARIANTS[name]:
        assert old in src, f"patch anchor missing for {name}"
        src = src.replace(old, new)
    mod = types.ModuleType(f"poa_pallas_{name}")
    mod.__file__ = f"<variant:{name}>"
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pp = load_variant(variant)
    rng = np.random.default_rng(0)
    B, nb, lb, nn_true, sl = 256, 512, 512, 500, 450
    chars = rng.integers(65, 69, (B, nb)).astype(np.uint8)
    preds = np.full((B, nb, 8), -1, np.int32)
    for r in range(1, nb):
        preds[:, r, 0] = r - 1
    if variant != "chain":
        rs = rng.choice(np.arange(2, nb), int(0.15 * nb), replace=False)
        preds[:, rs, 1] = 0
    sinks = np.zeros((B, nb), bool)
    sinks[:, nn_true - 1] = True
    nn = np.full(B, nn_true, np.int32)
    seqs = rng.integers(65, 69, (B, lb)).astype(np.uint8)
    ln = np.full(B, sl, np.int32)
    cells = float(B) * nn_true * sl
    run = lambda: [np.asarray(o) for o in pp.align_batch_pallas(
        chars, preds, sinks, nn, seqs, ln, lb)]
    t0 = time.time()
    run()
    print(f"{variant}: first call (compile) {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    print(f"{variant}: {dt * 1000:.1f} ms/call, {cells / dt / 1e9:.3f} GCUPS")


if __name__ == "__main__":
    main()
