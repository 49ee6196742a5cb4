"""Micro-kernel ladder: per-row cost of each ingredient of the POA DP loop.

Each variant runs the same (grid=32, W=8, N=512 rows, l1=513 lanes)
iteration structure with a subset of the real kernel's work:

  loop      carried (W, l1) add only — pure fori_loop overhead
  store     + dynamic-index store into the (N+1, W, l1) VMEM scratch
  pfx       + the 10-step roll/max prefix scan
  chmask    + the O(N)-per-row ch/snk masked sums
  row       the full chain-row update (sub, diag/up, prefix, dirs) + store

Usage: python tools/probe/row_probe.py <variant> [reps]
"""
import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

import numpy as np
from svscope_tpu.utils.jaxcfg import enable_cache

enable_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, NROWS, LM = 8, 512, 512
L1 = LM + 1
NEG = np.int32(-(2 ** 29))
GAP = -8


def _roll_right(v, s, fill):
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(j >= s, pltpu.roll(v, s, axis=1), fill)


def _prefix_max(v):
    s = 1
    while s < v.shape[-1]:
        v = jnp.maximum(v, _roll_right(v, s, NEG))
        s *= 2
    return v


def make_kernel(variant):
    def kernel(chars_ref, seq_ref, out_ref, h_s):
        j = jax.lax.broadcasted_iota(jnp.int32, (W, L1), 1)
        jn = jax.lax.broadcasted_iota(jnp.int32, (W, NROWS), 1)
        seq = seq_ref[:]
        chars = chars_ref[:]
        decay = GAP * j

        def row(i, h):
            r = i - 1
            if variant == "loop":
                return h + 1
            if variant == "store":
                h = h + 1
                h_s[pl.ds(i, 1)] = h.reshape(1, W, L1)
                return h
            if variant == "pfx":
                h = _prefix_max(h + 1)
                h_s[pl.ds(i, 1)] = h.reshape(1, W, L1)
                return h
            if variant == "chmask":
                ch = jnp.sum(chars * (jn == r).astype(jnp.int32), axis=1,
                             keepdims=True, dtype=jnp.int32)
                h = _prefix_max(h + ch)
                h_s[pl.ds(i, 1)] = h.reshape(1, W, L1)
                return h
            # full chain row: sub, diag/up, prefix chain, then store
            ch = jnp.sum(chars * (jn == r).astype(jnp.int32), axis=1,
                         keepdims=True, dtype=jnp.int32)
            sub = jnp.where(seq == ch, 5, -4)
            diag = jnp.where(j >= 1, _roll_right(h, 1, NEG) + sub, NEG)
            up = h + GAP
            base = jnp.where(j == 0, up, jnp.maximum(diag, up))
            H = _prefix_max(base - decay) + decay
            diag_ok = H == diag
            up_ok = H == up
            d16 = jnp.full((W, L1), 16, jnp.int32)
            _dir = jnp.where(diag_ok, 0, jnp.where(up_ok, 8, d16))
            h_s[pl.ds(i, 1)] = (H + _dir * 0).reshape(1, W, L1)
            return H

        h0 = jnp.where(j <= 450, GAP * j, NEG)
        hN = jax.lax.fori_loop(jnp.int32(1), jnp.int32(NROWS + 1), row, h0)
        out_ref[:] = hN

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run_padded(chars, seqs, variant):
    B = chars.shape[0]
    return pl.pallas_call(
        make_kernel(variant),
        grid=(B // W,),
        in_specs=[
            pl.BlockSpec((W, NROWS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, L1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, L1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NROWS + 1, W, L1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(chars, seqs)


def main():
    variant = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    B = 256
    rng = np.random.default_rng(0)
    chars = jnp.asarray(rng.integers(65, 69, (B, NROWS)).astype(np.int32))
    seqs = jnp.asarray(rng.integers(65, 69, (B, L1)).astype(np.int32))
    t0 = time.time()
    np.asarray(run_padded(chars, seqs, variant))
    print(f"{variant}: compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        np.asarray(run_padded(chars, seqs, variant))
    dt = (time.time() - t0) / reps
    rows = (B // W) * NROWS
    print(f"{variant}: {dt * 1000:.1f} ms/call, {dt / rows * 1e6:.2f} us/row")


if __name__ == "__main__":
    main()
