"""Isolate the pk kernel's fusion-loop cost on real graph states.

docs/PERF.md §8's addendum: four op-level optimizations left the pk wall
at 3.46 s, implying ~31 us per while-loop iteration where a small-state
micro-benchmark measures 1.8 us.  This probe runs ONLY the fusion section
(verbatim semantics of ops/poa_fused_kernel's fuse_body) against graph
states and alignments replayed from the NumPy oracle at a real mid-build
round, with SVSCOPE_FB bisect variants:

  full      the whole body
  nowrite   all gs/path writes dropped (reads + logic only)
  noread    VMEM reads replaced by constants (logic + writes on row 0)
  logic     no VMEM traffic at all (pure scalar/extract logic)
  empty     counter-only loop

Usage: python tools/probe/fusebody_probe.py [variants...]
"""
from __future__ import annotations

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svscope_tpu.ops.poa_fused_kernel import (GS_LANES, L_CH, L_GC, L_GM,
                                              L_PN, L_PT, L_PW, MAX_PREDS,
                                              W, _exs, _exw)

NCAP = 1025
L_MAX = 512
OUT_LEN = NCAP - 1 + L_MAX


def build_states():
    """Real mid-build graph states + round-13 alignments from the oracle."""
    from bench import make_window_payloads
    from svscope_tpu.ops.poa import PoaGraph, _fused_path
    wins = make_window_payloads(8, np.random.default_rng(0))
    jobs = [w.sequences for w in wins]
    gs = np.zeros((W, NCAP, GS_LANES), np.int32)
    gs[..., L_PN:L_PN + 8] = -1
    gs[..., L_GC:L_GC + 8] = -1
    gs[..., L_GM] = np.arange(NCAP)
    an = np.full((OUT_LEN, W), -2, np.int32)
    asx = np.full((OUT_LEN, W), -2, np.int32)
    seqs5 = np.zeros((W, L_MAX), np.int32)
    order = np.zeros((W, NCAP), np.int32)
    gminr = np.zeros((W, NCAP), np.int32)
    nn = np.zeros((W, 1), np.int32)
    code = {c: i for i, c in enumerate("ACGTN")}
    for w, seqs in enumerate(jobs):
        g = PoaGraph()
        for s in seqs[:13]:
            if not s or g.n_nodes() == 0:
                prev = -1
                for ch in s:
                    cur = g._add_node(ch)
                    if prev >= 0:
                        g._add_edge(prev, cur)
                    prev = cur
                g.seq_begin.append(0)
            else:
                _fused_path(g, g.align(s), s)
        n = g.n_nodes()
        nn[w, 0] = n
        grp, _ = g._columns()
        colmin = {}
        for v in range(n):
            colmin[grp[v]] = min(colmin.get(grp[v], v), v)
        for v in range(n):
            gs[w, v, L_CH] = code[g.chars[v]]
            gs[w, v, L_GM] = colmin[grp[v]]
        # gchar: member by base (one member per base per column)
        for v in range(n):
            gs[w, colmin[grp[v]], L_GC + code[g.chars[v]]] = v
        for v in range(n):
            for k, p in enumerate(g.in_edges[v][:8]):
                gs[w, v, L_PN + k] = p
                gs[w, v, L_PW + k] = g.edge_w.get((p, v), 1)
                gs[w, v, L_PT + k] = k
        topo = g.topo_order()
        rank = {v: i for i, v in enumerate(topo)}
        for i, v in enumerate(topo):
            order[w, i] = v
            gminr[w, i] = colmin[grp[v]]
        s13 = jobs[w][13]
        for i, ch in enumerate(s13[:L_MAX]):
            seqs5[w, i] = code[ch]
        aln = g.align(s13)
        k0 = OUT_LEN - len(aln)
        for k, (node, spos) in enumerate(aln):
            an[k0 + k, w] = rank[node] if node >= 0 else -1
            asx[k0 + k, w] = spos
    return gs, an, asx, seqs5, order, gminr, nn


def make_kernel(variant: str):
    def kernel(an_ref, as_ref, seqs_ref, order_ref, gminr_ref, nn_ref,
               gs_in, nn_out, gs_out, path_ref):
        gs_out[:] = gs_in[:]
        path_ref[:] = jnp.zeros(path_ref.shape, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, GS_LANES), 1)
        lpath = jax.lax.broadcasted_iota(jnp.int32, (1, L_MAX), 1)
        trash = NCAP - 1
        n_max = NCAP

        def _getW(ref, row_idx, l):
            return _exs(ref[pl.ds(row_idx, 1), :], l)

        for w in range(W):
            def fuse_cond(st):
                return st[0] < OUT_LEN

            if variant == "noveccarry":
                def nv_cond(st):
                    return st[0] < OUT_LEN

                def nv_body(st):
                    k, prev, nn_c, tc, ovf = st
                    return (k + 1, prev, nn_c, tc + 1, ovf)

                out = jax.lax.while_loop(
                    nv_cond, nv_body,
                    (jnp.int32(OUT_LEN - 480), jnp.int32(-1), nn_ref[w, 0],
                     jnp.int32(0), jnp.int32(0) > 1))
                nn_out[w, 0] = out[3]
                continue

            def fuse_body(st):
                k, prev, nn_c, tc, ovf, path_w = st
                if variant == "empty":
                    return (k + 1, prev, nn_c, tc + 1, ovf, path_w)
                if variant == "scal16":
                    # scalar-heavy body, no vector work beyond the carry
                    return (k + 1, prev + seqs_ref[w, k % L_MAX], nn_c,
                            tc + 1, ovf, path_w)
                aspv = _getW(as_ref, k, w) if variant != "logic" \
                    else (k % 400)
                anv = _getW(an_ref, k, w) if variant != "logic" \
                    else (k % 700)
                valid = aspv >= 0
                sposc = jnp.clip(aspv, 0, L_MAX - 1)
                c5 = seqs_ref[w, sposc]
                has_node = valid & (anv >= 0)
                anc = jnp.clip(anv, 0, n_max - 1)
                gid_old = gminr_ref[w, anc]
                if variant in ("noread", "logic"):
                    pre = jnp.where(has_node & (c5 > 2), anc, -1)
                else:
                    grow = gs_out[w, pl.ds(jnp.clip(
                        jnp.where(has_node, gid_old, 0), 0, trash), 1),
                        :].reshape(1, GS_LANES)
                    pre = jnp.where(has_node, _exs(grow, L_GC + c5), -1)
                creator = valid & (pre < 0)
                newid = jnp.minimum(nn_c, jnp.int32(trash))
                cur = jnp.where(creator, newid, pre)
                gid = jnp.where(has_node, gid_old, newid)
                if variant not in ("nowrite", "noread", "logic"):
                    @pl.when(creator)
                    def _():
                        mrow = gs_out[w, pl.ds(newid, 1), :]
                        minit = ((lane == L_CH) | (lane == L_GM)
                                 | ((lane == L_GC + c5) & (gid == newid)))
                        mval = jnp.where(lane == L_CH, c5,
                                         jnp.where(lane == L_GM, gid,
                                                   newid))
                        gs_out[w, pl.ds(newid, 1), :] = jnp.where(
                            minit, mval, mrow)
                nn_c = jnp.minimum(nn_c + creator.astype(jnp.int32),
                                   jnp.int32(trash))
                add_e = valid & (prev >= 0)
                curc = jnp.clip(cur, 0, trash)
                if variant in ("noread", "logic"):
                    has_e = add_e & (c5 < 3)
                    slot = jnp.clip(c5, 0, MAX_PREDS - 1)
                    w_old = tc
                    newe = add_e & (~has_e)
                else:
                    crow = gs_out[w, pl.ds(curc, 1), :].reshape(
                        1, GS_LANES)
                    pn_lane = (lane >= L_PN) & (lane < L_PN + MAX_PREDS)
                    ehit = pn_lane & (crow == prev)
                    has_e = add_e & jnp.any(ehit)
                    eslot = jnp.clip(
                        jnp.min(jnp.where(ehit, lane, MAX_PREDS)) - L_PN,
                        0, MAX_PREDS - 1)
                    nvalid = jnp.sum(
                        (pn_lane & (crow >= 0)).astype(jnp.int32),
                        dtype=jnp.int32)
                    newe = add_e & (~has_e) & (nvalid < MAX_PREDS)
                    slot = jnp.where(has_e, eslot,
                                     jnp.clip(nvalid, 0, MAX_PREDS - 1))
                    w_old = _exs(crow, L_PW + slot)
                if variant not in ("nowrite", "logic"):
                    @pl.when(has_e | newe)
                    def _():
                        crow2 = gs_out[w, pl.ds(curc, 1), :]
                        em = ((lane == L_PN + slot) | (lane == L_PW + slot)
                              | ((lane == L_PT + slot) & newe))
                        ev = jnp.where(lane == L_PN + slot, prev,
                                       jnp.where(lane == L_PW + slot,
                                                 jnp.where(has_e,
                                                           w_old + 1, 1),
                                                 tc))
                        gs_out[w, pl.ds(curc, 1), :] = jnp.where(em, ev,
                                                                 crow2)
                tc = tc + newe.astype(jnp.int32)
                path_w = jnp.where(valid & (lpath == sposc), cur, path_w)
                prev = jnp.where(valid, cur, prev)
                return (k + 1, prev, nn_c, tc, ovf, path_w)

            st = (jnp.int32(OUT_LEN - 480), jnp.int32(-1), nn_ref[w, 0],
                  jnp.int32(0), jnp.int32(0) > 1,
                  jnp.full((1, L_MAX), -1, jnp.int32))
            _k, _p, nn_f, tc_f, _o, path_w = jax.lax.while_loop(
                fuse_cond, fuse_body, st)
            path_ref[pl.ds(w, 1), :] = path_w
            nn_out[w, 0] = nn_f
    return kernel


def run(variant, args):
    gs, an, asx, seqs5, order, gminr, nn = args
    sm, vm = pltpu.SMEM, pltpu.VMEM
    bs = pl.BlockSpec
    f = pl.pallas_call(
        make_kernel(variant),
        in_specs=[bs(memory_space=vm), bs(memory_space=vm),
                  bs(memory_space=sm), bs(memory_space=sm),
                  bs(memory_space=sm), bs(memory_space=sm),
                  bs(memory_space=vm)],
        out_specs=[bs(memory_space=sm), bs(memory_space=vm),
                   bs(memory_space=vm)],
        out_shape=[jax.ShapeDtypeStruct((W, 1), jnp.int32),
                   jax.ShapeDtypeStruct((W, NCAP, GS_LANES), jnp.int32),
                   jax.ShapeDtypeStruct((W, L_MAX), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    jf = jax.jit(lambda *a: f(*a))
    # device-resident inputs: re-shipping the 4.2 MB gs from numpy every
    # call costs ~40 ms on the tunnel and WAS the first version's entire
    # measurement (empty == full was transfer, not loop cost)
    inp = jax.device_put((an, asx, seqs5, order, gminr, nn, gs))
    np.asarray(jf(*inp)[0])
    t0 = time.time()
    for _ in range(10):
        r = jf(*inp)
    np.asarray(r[0])
    dt = (time.time() - t0) / 10
    iters = 480 * W
    print(f"{variant:8s}: {dt*1000:7.2f} ms/call  "
          f"{dt*1e6/iters:6.2f} us/iter", flush=True)


def main():
    variants = sys.argv[1:] or ["empty", "logic", "noread", "nowrite",
                                "full"]
    print("backend:", jax.default_backend(), flush=True)
    args = build_states()
    for v in variants:
        try:
            run(v, args)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
