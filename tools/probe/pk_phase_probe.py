"""pk engine per-kernel phase measurement with DEVICE-RESIDENT inputs.

Round-5 verdict task 3: PERF.md §9 invalidated the round-4 probe
attributions (they measured tunnel transfer of host-resident inputs, not
kernels).  This probe applies §9's artifact-free method to the split pk
kernels:

  1. RECORD: run the real pk build (bench-bucket windows) once, with the
     round loop also stacking every round's true operand tensors and
     pre-round state (the glue is the shared ops/poa_fused._pk_round_prep,
     so the recorded operands are bit-identical to production's).
  2. REPLAY: three jitted loops over the recorded rounds — glue-only
     (prep recomputed, no kernels), glue+A (align+traceback), and
     glue+A+B (fusion too, state threaded) — each ONE dispatch, inputs
     already on device, repeated and min-timed.  Phase costs come from
     differences: A = (glue+A) - glue, B = (glue+A+B) - (glue+A).

Prints per-phase seconds per round and per 8-window build, the implied
pk windows/s/chip, and the share of each phase.

Usage: python tools/probe/pk_phase_probe.py [--b 64] [--reads 24]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from svscope_tpu.ops import poa_fused as pf
from svscope_tpu.ops.poa_fused_kernel import (GS_LANES, L_GC, L_GM, L_PN,
                                              align_tb_call, fusion_call,
                                              fused_round_call)
from svscope_tpu.ops.poa_fused import MAX_PREDS, _pk_round_prep


def bench_arrays(b: int, n_reads: int):
    import bench
    wins = bench.make_window_payloads(b, np.random.default_rng(0),
                                      n_reads=n_reads)
    seq_lists = [w.sequences for w in wins]
    r_max = max(len(s) for s in seq_lists)
    l_max = 512
    seqs = np.zeros((b, r_max, l_max), np.uint8)
    lens = np.zeros((b, r_max), np.int32)
    for i, sl in enumerate(seq_lists):
        for r, s in enumerate(sl):
            e = s.encode()[:l_max]
            seqs[i, r, :len(e)] = np.frombuffer(e, np.uint8)
            lens[i, r] = len(e)
    n_seqs = np.array([len(sl) for sl in seq_lists], np.int32)
    return seqs, lens, n_seqs, r_max, l_max


def make_record(ncap: int, r_max: int, l_max: int):
    @jax.jit
    def record(seqs, lens, n_seqs):
        B = seqs.shape[0]
        P = MAX_PREDS
        gs0 = jnp.zeros((B, ncap, GS_LANES), jnp.int32)
        gs0 = gs0.at[..., L_PN:L_PN + P].set(-1)
        gs0 = gs0.at[..., L_GC:L_GC + 8].set(-1)
        gs0 = gs0.at[..., L_GM].set(
            jnp.arange(ncap, dtype=jnp.int32)[None, :])
        rec_gs = jnp.zeros((r_max, B, ncap, GS_LANES), jnp.int32)
        rec_nn = jnp.zeros((r_max, B, 1), jnp.int32)
        rec_tc = jnp.zeros((r_max, B, 1), jnp.int32)
        st0 = (jnp.zeros((B, 1), jnp.int32), jnp.zeros((B, 1), jnp.int32),
               jnp.zeros((B, 1), jnp.int32), gs0, rec_gs, rec_nn, rec_tc)

        def body(r, st):
            nn, tctr, ovf, gs, rgs, rnn, rtc = st
            rgs = rgs.at[r].set(gs)
            rnn = rnn.at[r].set(nn)
            rtc = rtc.at[r].set(tctr)
            seq = seqs[:, r].astype(jnp.int32)
            slen = lens[:, r].astype(jnp.int32)
            ops, cyclic = _pk_round_prep(gs, nn, seq, slen, ncap, l_max)
            (chars_r, sink_r, predp, chain_all, chainw32, gminr, seqv,
             lb, nn_eff) = ops
            ovf = ovf | cyclic.astype(jnp.int32).reshape(B, 1)
            nn, tctr, ovf, gs, _path = fused_round_call(
                chars_r, sink_r, predp, chain_all, chainw32, gminr, seqv,
                seq, lb, nn_eff, nn, tctr, ovf, gs,
                ncap=ncap, n_max=ncap, l_max=l_max)
            return nn, tctr, ovf, gs, rgs, rnn, rtc

        rounds = jnp.max(jnp.asarray(n_seqs, jnp.int32))
        out = jax.lax.fori_loop(jnp.int32(0), rounds, body, st0)
        return out[4], out[5], out[6], rounds
    return record


def make_replay(ncap: int, r_max: int, l_max: int, phase: str):
    """phase: 'glue' | 'gA' | 'gAB' — one jitted loop over all recorded
    rounds, state-threaded so nothing can be hoisted."""
    @jax.jit
    def replay(rec_gs, rec_nn, rec_tc, seqs, lens, rounds):
        B = seqs.shape[0]

        def body(r, acc):
            gs = rec_gs[r]
            nn = rec_nn[r]
            tctr = rec_tc[r]
            seq = seqs[:, r].astype(jnp.int32)
            slen = lens[:, r].astype(jnp.int32)
            ops, _cyc = _pk_round_prep(gs, nn, seq, slen, ncap, l_max)
            (chars_r, sink_r, predp, chain_all, chainw32, gminr, seqv,
             lb, nn_eff) = ops
            if phase == "glue":
                return acc + jnp.sum(chars_r[:, 0]) + jnp.sum(sink_r[:, 0])
            an, asx, ke = align_tb_call(chars_r, sink_r, predp, chain_all,
                                        chainw32, seqv, lb, nn_eff,
                                        n_max=ncap, l_max=l_max)
            if phase == "gA":
                return acc + jnp.sum(ke[:, 0])
            ovf0 = jnp.zeros((B, 1), jnp.int32)
            nn2, tc2, _o, gs2, _p = fusion_call(
                an, asx, ke, gminr, seq, nn, tctr, ovf0, gs,
                ncap=ncap, n_max=ncap, l_max=l_max)
            return acc + jnp.sum(nn2[:, 0]) + jnp.sum(gs2[:, 0, 0])

        return jax.lax.fori_loop(jnp.int32(0), rounds, body,
                                 jnp.int32(0))
    return replay


def timed(fn, args, n=3):
    np.asarray(fn(*args))            # compile + first run
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--reads", type=int, default=24)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    seqs, lens, n_seqs, r_max, l_max = bench_arrays(args.b, args.reads)
    ncap = 1025                       # production bench bucket
    B = args.b
    print(f"workload: B={B} reads={args.reads} r_max={r_max} "
          f"ncap={ncap} l_max={l_max}")

    # full production build end-to-end (one dispatch) for the headline
    dev = jax.device_put((seqs, lens, n_seqs))
    full = jax.jit(functools.partial(pf._build_batch_impl_pk, ncap=ncap,
                                     r_max=r_max, l_max=l_max,
                                     interpret=False))
    t_full = timed(lambda *a: full(*a)[2], dev)
    print(f"[full build] {t_full:.3f} s for {B} windows "
          f"-> {B / t_full:.1f} w/s/chip")

    rec = make_record(ncap, r_max, l_max)
    t0 = time.time()
    rec_gs, rec_nn, rec_tc, rounds = rec(*dev)
    rec_gs.block_until_ready()
    print(f"[record] {time.time() - t0:.1f} s "
          f"(state {rec_gs.nbytes / 1e6:.0f} MB on device)")
    rargs = (rec_gs, rec_nn, rec_tc, dev[0], dev[1], rounds)

    walls = {}
    for phase in ("glue", "gA", "gAB"):
        walls[phase] = timed(make_replay(ncap, r_max, l_max, phase), rargs)
    R = int(np.asarray(rounds))
    a_s = walls["gA"] - walls["glue"]
    b_s = walls["gAB"] - walls["gA"]
    print(f"[phases] rounds={R}  glue={walls['glue']:.3f}s  "
          f"A(DP+tb)={a_s:.3f}s  B(fusion)={b_s:.3f}s  "
          f"(replay gAB={walls['gAB']:.3f}s vs full {t_full:.3f}s)")
    per8 = 8 / B
    print(f"[per 8-window build] glue={walls['glue'] * per8 * 1e3:.0f} ms  "
          f"A={a_s * per8 * 1e3:.0f} ms  B={b_s * per8 * 1e3:.0f} ms")
    tot = walls["gAB"]
    for k, v in (("glue", walls["glue"]), ("A", a_s), ("B", b_s)):
        print(f"[share] {k}: {100 * v / tot:.0f}%")


if __name__ == "__main__":
    main()
