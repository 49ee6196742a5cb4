"""Measured (not projected) attached-chip POA kernel throughput.

Round-5 verdict task 4: every prior attached-chip number was projected by
subtracting tunnel costs from tunneled measurements (docs/PERF.md §3/§8).
This tool measures the per-round DP kernel itself by amortizing the
dispatch: k kernel invocations run INSIDE one jitted lax.fori_loop, with
a data dependence between iterations (each round rewrites one base of the
query from the previous round's score) so XLA cannot hoist or CSE the
body.  kernel-only wall = (t[k=1+K] - t[k=1]) / K — both ends of the
difference carry the same one-dispatch + one-fetch tunnel cost, so the
difference is pure device execution regardless of link quality.

Reports per engine (pallas int32 / pallas int16 / xla):
  * per-call kernel wall for a (B, N, L) per-round bucket
  * GCUPS (useful cells = sum(n_nodes x seq_len)) and padded GCUPS
  * implied per-round-path windows/s/chip: a W-window MSA build is
    ~R sequential rounds, so w/s = B / (R * t_kernel) with zero link cost
    (attached) — the number PERF.md §8 projected from subtraction
  * the auto-policy check: per-round wall vs the 2 ms dispatch budget
    (engine/localgraph.ATTACHED_LATENCY_S) that gates device POA on.

Usage: python tools/attached_bench.py [--b 64] [--reps 32] [--skip-int16]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_round_workload(b: int, rng):
    """Pack B mid-build graphs (bench-bucket windows after ~12 reads) +
    the next read to align — the exact per-round kernel input."""
    import bench
    from svscope_tpu.native.poa import NativePoaGraph
    from svscope_tpu.ops import poa_device as pdev
    wins = bench.make_window_payloads(b, rng)
    N, L = 512, 512
    chars = np.zeros((b, N), np.uint8)
    preds = np.full((b, N, pdev.MAX_PREDS), -1, np.int32)
    sinks = np.zeros((b, N), bool)
    nn = np.zeros(b, np.int32)
    seqs = np.zeros((b, L), np.uint8)
    lens = np.zeros(b, np.int32)
    for i, w in enumerate(wins):
        g = NativePoaGraph()
        for s in w.sequences[:13]:
            g.add_sequence(s)
        packed = g.pack(N, pdev.MAX_PREDS)
        assert packed is not None, "bench window exceeded the bucket"
        c, p, s_, n, _nor = packed
        chars[i], preds[i], sinks[i], nn[i] = c, p, s_, n
        nxt = w.sequences[13]
        seqs[i, :len(nxt)] = np.frombuffer(nxt.encode(), np.uint8)
        lens[i] = len(nxt)
    return chars, preds, sinks, nn, seqs, lens, N, L


def prep_pallas(chars, preds, sinks, nn, seqs, lens, N, L,
                int16_mode: bool):
    """align_batch_pallas's host prep, kept separate so the jitted loop
    sees device-resident operands only.  chain_all is grid-step shaped,
    so it depends on the kernel's window-per-step count (8 int32 / 16
    int16)."""
    from svscope_tpu.ops import poa_pallas as pp
    b = chars.shape[0]
    seqs_sh = np.full((b, L + 1), 255, np.int32)
    seqs_sh[:, 1:seqs.shape[1] + 1] = seqs
    nn2 = nn.astype(np.int32).reshape(b, 1)
    lb = lens.astype(np.int32).reshape(b, 1)
    chainw = pp.chain_flags(preds, nn2)
    wn = pp.W16 if int16_mode else pp.W
    chain_all = (chainw.reshape(b // wn, wn, N).all(axis=1)
                 .astype(np.int32).reshape(b // wn, 1, N))
    preds2 = np.where(preds < 0, preds[:, :, :1], preds)
    return (chars.astype(np.int32), sinks.astype(np.int32), preds2,
            seqs_sh, lb, nn2, chain_all, bool(chainw.all()))


def k_loop_pallas(k: int, n_max: int, l_max: int, chain_only: bool,
                  int16_mode: bool):
    from svscope_tpu.ops import poa_pallas as pp
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(chars, sinks, preds, seqs_sh, lb, nn, chain_all):
        def body(_, carry):
            seqs_i, acc = carry
            _an, _asp, _ke, sc = pp._align_batch_padded(
                chars, sinks, preds, seqs_i, lb, nn, chain_all,
                n_max, l_max, False, chain_only, int16_mode)
            # serialize iterations: next query depends on this score
            seqs_i = seqs_i.at[:, 1].set(65 + (sc[:, 0] & 3))
            return seqs_i, acc + sc[:, 0]
        _, acc = jax.lax.fori_loop(
            0, k, body,
            (seqs_sh, jnp.zeros(seqs_sh.shape[0], jnp.int32)))
        return acc
    return run


def k_loop_xla(k: int, l_max: int):
    from svscope_tpu.ops import poa_device as pdev
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(chars, preds, sinks, nn, seqs, lens):
        def body(_, carry):
            seqs_i, acc = carry
            _an, _asp, _ke, sc = pdev.align_batch(
                chars, preds, sinks, nn, seqs_i, lens, l_max)
            seqs_i = seqs_i.at[:, 0].set((65 + (sc & 3)).astype(seqs_i.dtype))
            return seqs_i, acc + sc
        _, acc = jax.lax.fori_loop(
            0, k, body, (seqs, jnp.zeros(seqs.shape[0], jnp.int32)))
        return acc
    return run


def timed(fn, args, label):
    import jax
    t0 = time.time()
    out = np.asarray(fn(*args))
    t_first = time.time() - t0          # compile + run + fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best, t_first, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--skip-int16", action="store_true")
    args = ap.parse_args()
    import jax
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    chars, preds, sinks, nn, seqs, lens, N, L = build_round_workload(
        args.b, rng)
    cells = float((nn.astype(np.int64) * lens).sum())
    pad_cells = float(args.b) * N * L
    print(f"workload: B={args.b} bucket N={N} L={L}  useful cells/call "
          f"{cells/1e6:.1f} M (padded {pad_cells/1e6:.1f} M)")

    import jax.numpy as jnp
    results = {}
    # ---- pallas int32 (and optionally int16) ----
    modes = [("pallas-int32", False)]
    if not args.skip_int16:
        modes.append(("pallas-int16", True))
    for label, i16 in modes:
        host = prep_pallas(chars, preds, sinks, nn, seqs, lens, N, L, i16)
        chain_only = host[-1]
        dev = jax.device_put(host[:-1])
        try:
            f1 = k_loop_pallas(1, N, L, chain_only, i16)
            fk = k_loop_pallas(1 + args.reps, N, L, chain_only, i16)
            t1, c1, o1 = timed(f1, dev, label)
            tk, ck, ok = timed(fk, dev, label)
        except Exception as exc:
            print(f"[{label}] FAILED: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:150]}")
            continue
        per_call = (tk - t1) / args.reps
        results[label] = per_call
        print(f"[{label}] compile {c1:.1f}s/{ck:.1f}s  t(k=1) {t1*1e3:.1f} "
              f"ms  t(k={1+args.reps}) {tk*1e3:.1f} ms  "
              f"kernel {per_call*1e3:.2f} ms/call  "
              f"{cells/per_call/1e9:.2f} GCUPS "
              f"({pad_cells/per_call/1e9:.2f} padded)")

    # ---- XLA aligner ----
    devx = jax.device_put((chars.astype(np.int32), preds,
                           sinks.astype(np.int32), nn.astype(np.int32),
                           seqs.astype(np.int32), lens.astype(np.int32)))
    try:
        f1 = k_loop_xla(1, L)
        fk = k_loop_xla(1 + args.reps, L)
        t1, c1, _ = timed(f1, devx, "xla")
        tk, ck, _ = timed(fk, devx, "xla")
        per_call = (tk - t1) / args.reps
        results["xla"] = per_call
        print(f"[xla] compile {c1:.1f}s/{ck:.1f}s  t(k=1) {t1*1e3:.1f} ms  "
              f"t(k={1+args.reps}) {tk*1e3:.1f} ms  "
              f"kernel {per_call*1e3:.2f} ms/call  "
              f"{cells/per_call/1e9:.2f} GCUPS "
              f"({pad_cells/per_call/1e9:.2f} padded)")
    except Exception as exc:
        print(f"[xla] FAILED: {type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:150]}")

    # ---- implications ----
    R = 24          # reads per bench window => rounds per MSA build
    for label, per_call in results.items():
        wps = args.b / (R * per_call)
        print(f"[attached w/s] {label}: {wps:.0f} windows/s/chip on the "
              f"per-round path (B={args.b}, {R} rounds, zero link cost)")
    if results:
        best = min(results.values())
        from svscope_tpu.engine.localgraph import ATTACHED_LATENCY_S
        print(f"[auto-policy] per-round kernel wall {best*1e3:.2f} ms vs "
              f"{ATTACHED_LATENCY_S*1e3:.0f} ms dispatch budget: device "
              f"path viable when round-trip <= "
              f"{best*1e3:.1f}+{ATTACHED_LATENCY_S*1e3:.0f} ms")


if __name__ == "__main__":
    main()
