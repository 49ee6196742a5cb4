"""Minimal-kernel probe of Mosaic's int16 vector support on the attached
TPU — the gate for ops/poa_pallas.align_batch_pallas(int16_mode=True).

Round-4's PERF.md §7 recorded "Rotate with non-32-bit data" as THE int16
blocker.  Round 5 implemented the sanctioned workarounds (widen-for-
rotate, payload-layout-born masks, max+eq ordered compares — all
interpret-exact, see poa_pallas's int16 shims) and each fix surfaced the
next limitation.  This probe demonstrates every one in a five-line
kernel, independent of our DP code:

  roll16      pltpu.roll on int16            -> "Rotate with non-32-bit data"
  le16        x <= y (ordered compare)       -> "Target does not support this comparison"
  max16       jnp.maximum on int16 INPUTS    -> "failed to legalize arith.maxsi"
  eq16        x == y                         -> OK
  where_i32m  int32-born mask, int16 payload -> OK at the native (16, 128)
              tile; the production kernel's (16, 65) shapes still hit
              "Invalid relayout ... i1" (shape/layout-dependent)

Run it after a libtpu upgrade: when all rows print OK, flip the
int16_mode gate (TODO.md) and measure the row-stream delta with
tools/attached_bench.py (which auto-tries int16).

Measured 2026-08-21 on TPU v5 lite, libtpu in-image: eq16 + where_i32m
OK, le16/max16/roll16 FAIL — int16 support on this target is partial in
ways that defeat any arithmetic DP kernel, not just the rotate.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(op):
    def k(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        if op == "eq16":
            o_ref[:] = jnp.where(x == y, x, y)
        elif op == "le16":
            o_ref[:] = jnp.where(x <= y, x, y)
        elif op == "max16":
            o_ref[:] = jnp.maximum(x, y)
        elif op == "roll16":
            o_ref[:] = pltpu.roll(x, 1, axis=1)
        elif op == "where_i32m":
            m = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) >= 3
            o_ref[:] = jnp.where(m, x, y)
    return k


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    x = (np.arange(16 * 128, dtype=np.int16).reshape(16, 128) % 100)
    y = x[:, ::-1].copy()
    ok = []
    for op in ("eq16", "le16", "max16", "roll16", "where_i32m"):
        try:
            out = pl.pallas_call(
                make_kernel(op),
                out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int16))(x, y)
            np.asarray(out)
            print(f"{op:12s} OK")
            ok.append(op)
        except Exception as exc:
            key = [l for l in str(exc).splitlines()
                   if "Mosaic failed" in l or "does not support" in l]
            print(f"{op:12s} FAIL: {(key or [str(exc)])[0][-90:]}")
    if len(ok) == 5:
        print("\nALL OK: this libtpu legalizes the int16 op set — flip the "
              "int16_mode gate (TODO.md) and run tools/attached_bench.py")


if __name__ == "__main__":
    main()
