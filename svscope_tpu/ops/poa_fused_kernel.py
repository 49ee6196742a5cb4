"""Pallas TPU kernel: one fused MSA round — alignment, traceback AND graph
fusion on-core.

Round 3's fused on-device build (ops/poa_fused) made the whole MSA build
one device program, but docs/PERF.md §5 measured the XLA formulation
element-ops-bound at production shapes (~2 w/s vs ~850 w/s host C++): the
per-round traceback (batched while over scalar gathers from the big H) and
the vectorized fusion (segment/cumsum/scatter cascades over ncap*ALPHA key
spaces) dominate.  This kernel moves both INTO the wavefront kernel, where
they are cheap:

  * the DP row loop is the existing hand-lowered wavefront
    (ops/poa_pallas._poa_kernel): 8 windows per grid step, every row
    update an (8, L+1) VPU op, H + direction planes VMEM-resident;
  * traceback is a per-window SCALAR walk over the VMEM direction plane
    (path length ~L steps of a few masked-lane extracts each — no batched
    while machinery, no (W, out_len) masked vector writes);
  * fusion is the HOST algorithm verbatim (ops/poa.py fusion semantics):
    a sequential per-window walk over the ~L alignment entries, updating
    the graph state in place with row-granular VMEM read-modify-writes.
    Sequential scalar work is exactly what the XLA formulation could not
    express cheaply — on-core it is tens of ops per entry with no
    dispatch, gather-lowering or scatter-keyspace costs.

Graph state stays in HBM between rounds (the jitted round loop in
ops/poa_fused passes it straight back in), so the host still touches the
device exactly twice per bucket chunk.  The canonical group-Kahn re-rank
(alignment-order parity + final MSA column order) remains the XLA
`_toposort` between rounds.

MEMORY LAYOUT (the part Mosaic dictates): VMEM lane dims pad to 128, so
separate (W, ncap, 8) planes for preds/weights/stamps/gchar cost 16x
their size and 15 of them OOM the 128 MB VMEM (measured: 168 MB for the
bench bucket).  All mutable graph state is therefore ONE lane-structured
(W, ncap, 128) int32 array `gs` — per node row: lanes [0,8) pred node
ids, [8,16) pred weights, [16,24) pred stamps, [24,32) column-member-by-
base (gchar, 5 used), lane 32 char, 33 group id, 34 out-degree.  One row
read serves a whole fusion step; writes are single-row RMWs with lane
masks.  The rank-space pred table is packed 16 nodes per 128-lane row
((W, ceil(n_max/16), 128), a pure XLA reshape).  The per-round path
output is a single (l_max, B) block with a constant index map,
accumulated across grid steps (each step owns its 8 lanes).

Every access pattern here (SMEM scalar reads at traced indices, VMEM
dynamic-sublane row reads/writes, masked-lane extracts) is one already
exercised by the compiled ops/poa_pallas kernel.  Parity:
tests/test_poa_fused_kernel.py runs the full build against ops/poa.poa in
interpreter mode on CPU.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.jaxcfg import enable_cache

enable_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MATCH = 5
MISMATCH = -4
GAP = -8
NEG = np.int32(-(2 ** 29))
W = 8
MAX_PREDS = 8
# fusion-loop unroll (entries per while iteration).  The round-5 phase
# probe (tools/probe/pk_phase_probe + fusebody_probe) measured the
# while-loop's FIXED cost at ~0.8 us/iteration vs ~0.55 us of real body
# work — the loop tax, not VMEM traffic, dominates, so unrolling pays
# almost linearly until the tax is amortized.  Env knob for probes.
import os as _os
FUSE_UNROLL = int(_os.environ.get("SVSCOPE_PK_UNROLL", "8"))
# fusion engine: "lockstep" (default, W-joint — §10's lever) or "seq"
# (the sequential per-window baseline, kept for parity bisects)
FUSION_ENGINE = _os.environ.get("SVSCOPE_PK_FUSION", "lockstep")
ALPHA5 = 5
GS_LANES = 128
# gs lane-field offsets
L_PN = 0      # pred node ids      [0, 8)
L_PW = 8      # pred weights       [8, 16)
L_PT = 16     # pred stamps        [16, 24)
L_GC = 24     # gchar by base      [24, 32), 5 used
L_CH = 32     # node char
L_GM = 33     # group (column) id
L_OD = 34     # out-degree


def _roll_right(v, s, fill):
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(j >= s, pltpu.roll(v, s, axis=1), fill)


def _prefix_max(v):
    s = 1
    while s < v.shape[-1]:
        v = jnp.maximum(v, _roll_right(v, s, NEG))
        s *= 2
    return v


def _exs(row, idx):
    """Scalar row[0, idx] via a masked lane sum (no unaligned scalar load)."""
    io = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.sum(jnp.where(io == idx, row, 0), dtype=row.dtype)


def _exw(col, w):
    io = jax.lax.broadcasted_iota(jnp.int32, col.shape, 0)
    return jnp.sum(jnp.where(io == w, col, 0), dtype=col.dtype)


def _pk_row(predsr_ref, w: int, r):
    """(1, 128) packed pred row holding nodes [16*(r>>4), +16); node r's
    8 slots live at lanes (r & 15)*8 .. +8."""
    r32 = jnp.asarray(r, jnp.int32)
    return predsr_ref[w, pl.ds(r32 // 16, 1), :].reshape(1, GS_LANES)


def _pk_slot(prow, r, p):
    """Rank of pred slot p of node-rank r from its packed row."""
    r32 = jnp.asarray(r, jnp.int32)
    return _exs(prow, (r32 % 16) * 8 + jnp.asarray(p, jnp.int32))


def _align_tb_kernel(
        charsr_ref, sinksr_ref, predsr_ref, chain_ref, chainw_ref,
        seqv_ref, lb_ref, nn_eff_ref,
        an_ref, as_ref, ke_ref,
        h_s, d_s,
        *, n_max: int, l_max: int, out_len: int):
    """Round kernel A: DP wavefront + W-joint traceback.

    Split from the fusion kernel during the §8 bottleneck hunt; the
    actual wall turned out to be the XLA canonical sort, not kernel
    co-residency (docs/PERF.md §9 tells the full story), but the split
    is kept: each kernel compiles faster, profiles independently, and
    the fusion kernel measures at its 1.4 us/entry floor here."""
    l1 = l_max + 1
    j = jax.lax.broadcasted_iota(jnp.int32, (W, l1), 1)
    j1 = j[0:1]
    lb_v = jnp.stack([lb_ref[k, 0] for k in range(W)]).reshape(W, 1)
    nn_v = jnp.stack([nn_eff_ref[k, 0] for k in range(W)]).reshape(W, 1)
    nn_max_t = jnp.max(nn_v)
    seq = seqv_ref[:]
    decay = GAP * j

    # ---- phase 1: DP wavefront (ops/poa_pallas._poa_kernel row loop) ----
    h0 = jnp.where(j <= lb_v, GAP * j, NEG)
    h_s[0] = h0

    def pred_h(pr, w):
        prc = jnp.maximum(pr, -1) + 1
        return h_s[pl.ds(prc, 1), pl.ds(w, 1), :].reshape(1, l1)

    def row(i, carry):
        hprev, bval, brank = carry
        r = i - 1
        ch = jnp.stack([charsr_ref[k, r] for k in range(W)]).reshape(W, 1)
        snk = jnp.stack([sinksr_ref[k, r] for k in range(W)]).reshape(W, 1)
        sub = jnp.where(seq == ch, MATCH, MISMATCH)
        jvalid = (j >= 1) & (j <= lb_v)
        node_ok = r < nn_v

        def finish(mp):
            diag = jnp.where(jvalid, _roll_right(mp, 1, NEG) + sub, NEG)
            up = mp + GAP
            base = jnp.where(j == 0, up, jnp.maximum(diag, up))
            base = jnp.where(j <= lb_v, base, NEG)
            H = _prefix_max(base - decay) + decay
            return jnp.where(node_ok, H, NEG), diag, up

        def chain_path(_):
            hrow, diag, up = finish(hprev)
            diag_ok = (hrow == diag) & jvalid
            up_ok = hrow == up
            d16 = jnp.full((W, l1), 16, jnp.int32)
            return hrow, jnp.where(diag_ok, 0, jnp.where(up_ok, 8, d16))

        def mixed_path(_):
            # PER-WINDOW chain dispatch: with 8 windows AND'd, 29% of
            # rows took the all-gather path on real noisy graphs while
            # only 6% of (window, row) pairs actually branch (measured);
            # gathering only for true branch windows cuts the dominant
            # dynamic-read traffic ~4x.  Payload row 0 = the max-plus mp
            # row; rows 1..P = per-slot pred rows for the direction pass
            # (chain windows carry broadcast hprev there, selected away).
            payloads = []
            for w in range(W):
                def branch_w(_):
                    prow = _pk_row(predsr_ref, w, r)
                    rows_w = [pred_h(_pk_slot(prow, r, p), w)
                              for p in range(MAX_PREDS)]
                    acc = rows_w[0]
                    for p in range(1, MAX_PREDS):
                        acc = jnp.maximum(acc, rows_w[p])
                    return jnp.concatenate([acc] + rows_w, axis=0)

                def chain_w(_):
                    return jnp.broadcast_to(hprev[w:w + 1, :],
                                            (MAX_PREDS + 1, l1))

                payloads.append(jax.lax.cond(chainw_ref[w, r] > 0,
                                             chain_w, branch_w, 0))
            mp = jnp.concatenate([pay[0:1] for pay in payloads], axis=0)
            hrow, diag_c, up_c = finish(mp)
            dirs = []
            for w in range(W):
                hw = hrow[w:w + 1, :]
                subw = sub[w:w + 1, :]
                lbw = lb_ref[w, 0]
                jv = (j1 >= 1) & (j1 <= lbw)
                d_diag = jnp.full((1, l1), -1, jnp.int32)
                d_up = jnp.full((1, l1), -1, jnp.int32)
                for p in reversed(range(MAX_PREDS)):
                    v = payloads[w][p + 1:p + 2]
                    uok = hw == v + GAP
                    dok = (hw == _roll_right(v, 1, NEG) + subw) & jv
                    d_up = jnp.where(uok, 8 + p, d_up)
                    d_diag = jnp.where(dok, p, d_diag)
                d_br = jnp.where(d_diag >= 0, d_diag,
                                 jnp.where(d_up >= 0, d_up, 16))
                dc_ok = (hw == diag_c[w:w + 1]) & jv
                uc_ok = hw == up_c[w:w + 1]
                d_ch = jnp.where(dc_ok, 0, jnp.where(uc_ok, 8, 16))
                dirs.append(jnp.where(chainw_ref[w, r] > 0, d_ch, d_br))
            return hrow, jnp.concatenate(dirs, axis=0)

        hrow, dirrow = jax.lax.cond(chain_ref[0, 0, r] > 0,
                                    chain_path, mixed_path, 0)
        h_s[pl.ds(i, 1)] = hrow.reshape(1, W, l1)
        d_s[pl.ds(r, 1)] = dirrow.reshape(1, W, l1)
        endv = jnp.sum(jnp.where(j == lb_v, hrow, 0), axis=1,
                       keepdims=True, dtype=jnp.int32)
        better = (snk > 0) & node_ok & (endv > bval)
        bval = jnp.where(better, endv, bval)
        brank = jnp.where(better, r, brank)
        return hrow, bval, brank

    bval0 = jnp.full((W, 1), NEG, jnp.int32)
    brank0 = jnp.zeros((W, 1), jnp.int32)
    _, bval, brank = jax.lax.fori_loop(
        jnp.int32(1), (nn_max_t + 1).astype(jnp.int32), row,
        (h0, bval0, brank0))

    # ---- phase 2: W-joint traceback (value state, stored at the end) ----
    io_out = jax.lax.broadcasted_iota(jnp.int32, (W, out_len), 1)
    lane128w = jax.lax.broadcasted_iota(jnp.int32, (W, GS_LANES), 1)

    def tb_cond(st):
        iv, jv, kv, _an, _as = st
        return ((jv > 0) & (kv >= 0)).any()

    def tb_body(st):
        iv, jv, kv, an, asx = st
        active = (jv > 0) & (kv >= 0)                    # (W, 1)
        rr = jnp.maximum(iv - 1, 0)                      # (W, 1)
        drows = jnp.concatenate(
            [d_s[pl.ds(_exw(rr, w), 1), pl.ds(w, 1), :].reshape(1, l1)
             for w in range(W)], axis=0)                 # (W, l1)
        d = jnp.sum(jnp.where(j == jv, drows, 0), axis=1, keepdims=True,
                    dtype=jnp.int32)
        code = jnp.where(iv == 0, 16, d)                 # (W, 1)
        is_left = code == 16
        is_up = (code >= 8) & (code < 16)
        p = jnp.where(is_left, 0, code & 7)
        prows = jnp.concatenate(
            [_pk_row(predsr_ref, w, _exw(rr, w)) for w in range(W)],
            axis=0)                                      # (W, 128)
        lpos = (rr % 16) * 8 + p                         # (W, 1)
        pr = jnp.sum(jnp.where(lane128w == lpos, prows, 0), axis=1,
                     keepdims=True, dtype=jnp.int32)
        write = active & (io_out == kv)
        an = jnp.where(write, jnp.where(is_left, -1, iv - 1), an)
        asx = jnp.where(write, jnp.where(is_up, -1, jv - 1), asx)
        iv = jnp.where(active, jnp.where(is_left, iv, pr + 1), iv)
        jv = jnp.where(active, jnp.where(is_up, jv, jv - 1), jv)
        kv = jnp.where(active, kv - 1, kv)
        return (iv, jv, kv, an, asx)

    def tb_body2(st):
        return tb_body(tb_body(st))

    i0 = jnp.where(nn_v > 0, brank + 1, 0)
    st_tb = (i0, lb_v, jnp.full((W, 1), out_len - 1, jnp.int32),
             jnp.full((W, out_len), -2, jnp.int32),
             jnp.full((W, out_len), -2, jnp.int32))
    _iv, _jv, kv, an, asx = jax.lax.while_loop(tb_cond, tb_body2, st_tb)
    an_ref[:] = an
    as_ref[:] = asx
    for w in range(W):
        ke_ref[w, 0] = _exw(kv, w)


def _fusion_kernel_lockstep(
        an_ref, as_ref, ne_ref, gminr_ref, seqs_ref,
        nn_in, tctr_in, ovf_in, gs_in,
        nn_out, tctr_out, ovf_out, gs_out, path_ref,
        *, n_max: int, l_max: int, out_len: int):
    """Round kernel B, W-joint: all 8 windows of the grid step fuse their
    alignments in LOCKSTEP — one entry per window per iteration, with
    per-window `active` masks (the round-4 traceback treatment applied to
    fusion).  The sequential variant's wall was the per-entry serial
    dependency chain (~0.8 us/iteration even EMPTY — §10); lockstep runs
    eight independent chains per iteration, so the fixed latency
    amortizes 8x while the semantics stay the host algorithm's
    (ops/poa.py), window by window.

    an/as arrive LEFT-ALIGNED (entry j of every window at index j — the
    glue rolls them by k_end+1) and blocked as (W, out_len/128, 128) so
    the per-iteration entry extract is a one-vreg masked sum against a
    VMEM-resident 128-lane block instead of a 12-vreg sweep.
    ne_ref (W, 1): per-window entry counts."""
    trash = gs_out.shape[1] - 1
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (W, GS_LANES), 1)
    lpath = jax.lax.broadcasted_iota(jnp.int32, (W, l_max), 1)
    lblk = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    pn_lane = (lane_w >= L_PN) & (lane_w < L_PN + MAX_PREDS)
    gs_out[:] = gs_in[:]
    ne_v = jnp.stack([ne_ref[k, 0] for k in range(W)]).reshape(W, 1)
    ne_max = jnp.max(ne_v)
    # the creator's target row `newid` has never been written (nn is
    # monotonic across rounds), so its pre-write content is the known
    # init pattern — no read-back needed
    mrow_known_base = jnp.where(
        pn_lane | ((lane_w >= L_GC) & (lane_w < L_GC + 8)),
        jnp.int32(-1), jnp.int32(0))

    def it_body(it, st):
        prev, nn_c, tc, ovf, path_w = st
        blk = it // 128
        off = it % 128
        an_b = an_ref[:, pl.ds(blk, 1), :].reshape(W, 128)
        as_b = as_ref[:, pl.ds(blk, 1), :].reshape(W, 128)
        hit = lblk == off
        aspv = jnp.sum(jnp.where(hit, as_b, 0), axis=1, keepdims=True,
                       dtype=jnp.int32)                    # (W, 1)
        anv = jnp.sum(jnp.where(hit, an_b, 0), axis=1, keepdims=True,
                      dtype=jnp.int32)
        valid = (it < ne_v) & (aspv >= 0)    # -1 graph gap, -2 pad
        sposc = jnp.clip(aspv, 0, l_max - 1)
        anc = jnp.clip(anv, 0, n_max - 1)
        c5 = jnp.stack([seqs_ref[w, _exw(sposc, w)]
                        for w in range(W)]).reshape(W, 1)
        gid_old = jnp.stack([gminr_ref[w, _exw(anc, w)]
                             for w in range(W)]).reshape(W, 1)
        has_node = valid & (anv >= 0)
        rowsel = jnp.clip(jnp.where(has_node, gid_old, 0), 0, trash)
        grows = jnp.concatenate(
            [gs_out[w, pl.ds(_exw(rowsel, w), 1), :]
             for w in range(W)], axis=0)                   # (W, GS_LANES)
        pre_raw = jnp.sum(jnp.where(lane_w == L_GC + c5, grows, 0),
                          axis=1, keepdims=True, dtype=jnp.int32)
        pre = jnp.where(has_node, pre_raw, -1)
        creator = valid & (pre < 0)
        ovf = ovf | (creator & (nn_c >= trash)).astype(jnp.int32)
        newid = jnp.minimum(nn_c, jnp.int32(trash))
        cur = jnp.where(creator, newid, pre)
        gid = jnp.where(has_node, gid_old, newid)
        # creator row value, fully in registers (see mrow_known_base)
        minit = ((lane_w == L_CH) | (lane_w == L_GM)
                 | ((lane_w == L_GC + c5) & (gid == newid)))
        mval = jnp.where(lane_w == L_CH, c5,
                         jnp.where(lane_w == L_GM, gid, newid))
        mrow_known = jnp.where(lane_w == L_GM, newid, mrow_known_base)
        crow_new = jnp.where(minit, mval, mrow_known)      # (W, GS_LANES)
        # column-join value reuses the already-read group row
        jrow = jnp.where(lane_w == L_GC + c5, newid, grows)
        for w in range(W):
            creator_w = _exw(creator.astype(jnp.int32), w) > 0

            @pl.when(creator_w)
            def _(w=w):
                gs_out[w, pl.ds(_exw(newid, w), 1), :] = crow_new[w:w + 1]

            @pl.when(creator_w
                     & (_exw(has_node.astype(jnp.int32), w) > 0))
            def _(w=w):
                gs_out[w, pl.ds(_exw(jnp.clip(gid, 0, trash), w), 1), :] \
                    = jrow[w:w + 1]

        nn_c = jnp.minimum(nn_c + creator.astype(jnp.int32),
                           jnp.int32(trash))
        # edge prev -> cur; rows read AFTER the creator writes (cur may
        # BE the new node)
        add_e = valid & (prev >= 0)
        curc = jnp.clip(cur, 0, trash)
        crows = jnp.concatenate(
            [gs_out[w, pl.ds(_exw(curc, w), 1), :]
             for w in range(W)], axis=0)                   # (W, GS_LANES)
        ehit = pn_lane & (crows == prev)
        has_e = add_e & jnp.any(ehit, axis=1, keepdims=True)
        eslot = jnp.clip(
            jnp.min(jnp.where(ehit, lane_w, MAX_PREDS), axis=1,
                    keepdims=True) - L_PN, 0, MAX_PREDS - 1)
        nvalid = jnp.sum((pn_lane & (crows >= 0)).astype(jnp.int32),
                         axis=1, keepdims=True, dtype=jnp.int32)
        ovf_e = add_e & (~has_e) & (nvalid >= MAX_PREDS)
        newe = add_e & (~has_e) & (~ovf_e)
        slot = jnp.where(has_e, eslot, jnp.clip(nvalid, 0, MAX_PREDS - 1))
        w_old = jnp.sum(jnp.where(lane_w == L_PW + slot, crows, 0),
                        axis=1, keepdims=True, dtype=jnp.int32)
        em = ((lane_w == L_PN + slot) | (lane_w == L_PW + slot)
              | ((lane_w == L_PT + slot) & newe))
        ev = jnp.where(lane_w == L_PN + slot, prev,
                       jnp.where(lane_w == L_PW + slot,
                                 jnp.where(has_e, w_old + 1, 1), tc))
        erow = jnp.where(em, ev, crows)
        wr_e = (has_e | newe).astype(jnp.int32)
        for w in range(W):
            @pl.when(_exw(wr_e, w) > 0)
            def _(w=w):
                gs_out[w, pl.ds(_exw(curc, w), 1), :] = erow[w:w + 1]

        tc = tc + newe.astype(jnp.int32)
        ovf = ovf | ovf_e.astype(jnp.int32)
        path_w = jnp.where(valid & (lpath == sposc), cur, path_w)
        prev = jnp.where(valid, cur, prev)
        return prev, nn_c, tc, ovf, path_w

    nn0 = jnp.stack([nn_in[k, 0] for k in range(W)]).reshape(W, 1)
    tc0 = jnp.stack([tctr_in[k, 0] for k in range(W)]).reshape(W, 1)
    ov0 = jnp.stack([ovf_in[k, 0] for k in range(W)]).reshape(W, 1)
    st0 = (jnp.full((W, 1), -1, jnp.int32), nn0, tc0, ov0,
           jnp.full((W, l_max), -1, jnp.int32))
    prev, nn_f, tc_f, ovf_f, path_w = jax.lax.fori_loop(
        jnp.int32(0), ne_max, it_body, st0)
    path_ref[:] = path_w
    for w in range(W):
        nn_out[w, 0] = _exw(nn_f, w)
        tctr_out[w, 0] = _exw(tc_f, w)
        ovf_out[w, 0] = jnp.where(_exw(ovf_f, w) > 0, 1, 0)


def _fusion_kernel(
        an_ref, as_ref, ke_ref, gminr_ref, seqs_ref,
        nn_in, tctr_in, ovf_in, gs_in,
        nn_out, tctr_out, ovf_out, gs_out, path_ref,
        *, n_max: int, l_max: int, out_len: int):
    """Round kernel B: sequential per-window graph fusion (the host
    algorithm, ops/poa.py semantics, row-for-row with ops/poa_fused's
    vectorized XLA version).  ~3 dynamic VMEM row accesses per entry;
    kept as the parity/bisect baseline for the lockstep kernel
    (SVSCOPE_PK_FUSION=seq) — see _fusion_kernel_lockstep."""
    for w in range(W):
        nn_out[w, 0] = nn_in[w, 0]
        tctr_out[w, 0] = tctr_in[w, 0]
        ovf_out[w, 0] = ovf_in[w, 0]
    gs_out[:] = gs_in[:]
    ncap = gs_out.shape[1]
    trash = ncap - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, GS_LANES), 1)
    lpath = jax.lax.broadcasted_iota(jnp.int32, (1, l_max), 1)
    for w in range(W):
        an_w = an_ref[w:w + 1, :]
        as_w = as_ref[w:w + 1, :]
        k_end = ke_ref[w, 0]

        def fuse_cond(st):
            return st[0] < out_len

        def fuse_body(st):
            k, prev, nn_c, tc, ovf, path_w = st
            aspv = _exs(as_w, k)
            anv = _exs(an_w, k)
            # k >= out_len guards the unrolled sub-steps: a no-lane-match
            # masked extract returns 0, which would read as a valid entry
            valid = (k < out_len) & (aspv >= 0)   # -1 graph gap, -2 pad
            sposc = jnp.clip(aspv, 0, l_max - 1)
            c5 = seqs_ref[w, sposc]
            has_node = valid & (anv >= 0)
            anc = jnp.clip(anv, 0, n_max - 1)
            gid_old = gminr_ref[w, anc]        # pre-round gmin by rank
            grow = gs_out[w, pl.ds(jnp.clip(jnp.where(has_node, gid_old,
                                                      0), 0, trash), 1),
                          :].reshape(1, GS_LANES)
            pre = jnp.where(has_node, _exs(grow, L_GC + c5), -1)
            creator = valid & (pre < 0)
            ovf = ovf | (creator & (nn_c >= trash))
            newid = jnp.minimum(nn_c, jnp.int32(trash))
            cur = jnp.where(creator, newid, pre)
            gid = jnp.where(has_node, gid_old, newid)

            @pl.when(creator)
            def _():
                mrow = gs_out[w, pl.ds(newid, 1), :]
                minit = ((lane == L_CH) | (lane == L_GM)
                         | ((lane == L_GC + c5) & (gid == newid)))
                mval = jnp.where(lane == L_CH, c5,
                                 jnp.where(lane == L_GM, gid, newid))
                gs_out[w, pl.ds(newid, 1), :] = jnp.where(minit, mval,
                                                          mrow)

            @pl.when(creator & has_node)       # joins an existing column
            def _():
                gidc = jnp.clip(gid, 0, trash)
                grow2 = gs_out[w, pl.ds(gidc, 1), :]
                gs_out[w, pl.ds(gidc, 1), :] = jnp.where(
                    lane == L_GC + c5, newid, grow2)

            nn_c = jnp.minimum(nn_c + creator.astype(jnp.int32),
                               jnp.int32(trash))

            # edge prev -> cur (at most one new in-edge per entry); the
            # row read happens AFTER the creator writes (cur may BE the
            # new node)
            add_e = valid & (prev >= 0)
            curc = jnp.clip(cur, 0, trash)
            crow = gs_out[w, pl.ds(curc, 1), :].reshape(1, GS_LANES)
            pn_lane = (lane >= L_PN) & (lane < L_PN + MAX_PREDS)
            ehit = pn_lane & (crow == prev)
            has_e = add_e & jnp.any(ehit)
            eslot = jnp.clip(jnp.min(jnp.where(ehit, lane, MAX_PREDS))
                             - L_PN, 0, MAX_PREDS - 1)
            nvalid = jnp.sum((pn_lane & (crow >= 0)).astype(jnp.int32),
                             dtype=jnp.int32)
            ovf_e = add_e & (~has_e) & (nvalid >= MAX_PREDS)
            newe = add_e & (~has_e) & (~ovf_e)
            slot = jnp.where(has_e, eslot,
                             jnp.clip(nvalid, 0, MAX_PREDS - 1))
            w_old = _exs(crow, L_PW + slot)

            @pl.when(has_e | newe)
            def _():
                em = ((lane == L_PN + slot) | (lane == L_PW + slot)
                      | ((lane == L_PT + slot) & newe))
                ev = jnp.where(lane == L_PN + slot, prev,
                               jnp.where(lane == L_PW + slot,
                                         jnp.where(has_e, w_old + 1, 1),
                                         tc))
                gs_out[w, pl.ds(curc, 1), :] = jnp.where(em, ev, crow)

            tc = tc + newe.astype(jnp.int32)
            ovf = ovf | ovf_e
            path_w = jnp.where(valid & (lpath == sposc), cur, path_w)
            prev = jnp.where(valid, cur, prev)
            return k + 1, prev, nn_c, tc, ovf, path_w

        def fuse_body4(st):
            for _ in range(FUSE_UNROLL):  # loop-tax unroll (see module doc)
                st = fuse_body(st)
            return st

        st_f = (k_end + 1, jnp.int32(-1), nn_in[w, 0], tctr_in[w, 0],
                ovf_in[w, 0] > 0, jnp.full((1, l_max), -1, jnp.int32))
        _k, _prev, nn_f, tc_f, ovf_f, path_w = jax.lax.while_loop(
            fuse_cond, fuse_body4, st_f)
        path_ref[pl.ds(w, 1), :] = path_w
        nn_out[w, 0] = nn_f
        tctr_out[w, 0] = tc_f
        ovf_out[w, 0] = ovf_f.astype(jnp.int32)


def _pk_out_len(n_max: int, l_max: int) -> int:
    # max path entries = (n_max - 1 active nodes) + l_max bases; for the
    # production bucket that is 1024 + 512 = 12 x 128 exactly — the +1 of
    # the naive n_max + l_max would drag a 13th tail vreg through every
    # masked alignment-value extract in the fusion loop
    return n_max - 1 + l_max


@functools.partial(
    jax.jit,
    static_argnames=("n_max", "l_max", "interpret"))
def align_tb_call(charsr, sinksr, predsr, chain, chainw, seqv, lb, nn_eff,
                  *, n_max: int, l_max: int, interpret: bool = False):
    """Round kernel A alone: DP wavefront + W-joint traceback.
    Returns (an, asx, ke).  Separately callable for phase profiling
    (tools/probe/pk_phase_probe) and composed by fused_round_call."""
    B = charsr.shape[0]
    out_len = _pk_out_len(n_max, l_max)
    l1 = l_max + 1
    n16 = predsr.shape[1]
    grid = (B // W,)
    sm = pltpu.SMEM
    vm = pltpu.VMEM
    bs = pl.BlockSpec
    return pl.pallas_call(
        functools.partial(_align_tb_kernel, n_max=n_max, l_max=l_max,
                          out_len=out_len),
        grid=grid,
        in_specs=[
            bs((W, n_max), lambda i: (i, 0), memory_space=sm),    # charsr
            bs((W, n_max), lambda i: (i, 0), memory_space=sm),    # sinksr
            bs((W, n16, GS_LANES), lambda i: (i, 0, 0),
               memory_space=vm),                                  # predsr
            bs((1, 1, n_max), lambda i: (i, 0, 0),
               memory_space=sm),                                  # chain
            bs((W, n_max), lambda i: (i, 0), memory_space=sm),    # chainw
            bs((W, l1), lambda i: (i, 0), memory_space=vm),       # seqv
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # lb
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # nn_eff
        ],
        out_specs=[
            bs((W, out_len), lambda i: (i, 0), memory_space=vm),  # an
            bs((W, out_len), lambda i: (i, 0), memory_space=vm),  # asx
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # k_end
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_len), jnp.int32),
            jax.ShapeDtypeStruct((B, out_len), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_max + 1, W, l1), jnp.int32),   # H
            pltpu.VMEM((n_max, W, l1), jnp.int32),       # directions
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(charsr, sinksr, predsr, chain, chainw, seqv, lb, nn_eff)


@functools.partial(
    jax.jit,
    static_argnames=("ncap", "n_max", "l_max", "interpret"))
def fusion_call(an, asx, ke, gminr, seqs5, nn, tctr, ovf, gs, *,
                ncap: int, n_max: int, l_max: int,
                interpret: bool = False):
    """Round kernel B alone: W-joint lockstep graph fusion over computed
    alignments (SVSCOPE_PK_FUSION=seq selects the sequential baseline).
    Returns (nn, tctr, ovf, gs, path)."""
    B = an.shape[0]
    out_len = _pk_out_len(n_max, l_max)
    grid = (B // W,)
    sm = pltpu.SMEM
    vm = pltpu.VMEM
    bs = pl.BlockSpec
    if FUSION_ENGINE != "seq":
        # left-align each window's entries (entry j at index j) and block
        # the alignment buffers 128-wide for the lockstep kernel's cheap
        # per-iteration extract
        ne = (out_len - 1 - ke[:, 0]).astype(jnp.int32).reshape(B, 1)
        shift = (ke[:, 0] + 1).astype(jnp.int32)
        an_l = jax.vmap(lambda a, s: jnp.roll(a, -s))(an, shift)
        as_l = jax.vmap(lambda a, s: jnp.roll(a, -s))(asx, shift)
        nblk = -(-out_len // 128)
        pad = nblk * 128 - out_len
        if pad:
            fill = jnp.full((B, pad), -2, jnp.int32)
            an_l = jnp.concatenate([an_l, fill], axis=1)
            as_l = jnp.concatenate([as_l, fill], axis=1)
        an_b = an_l.reshape(B, nblk, 128)
        as_b = as_l.reshape(B, nblk, 128)
        return pl.pallas_call(
            functools.partial(_fusion_kernel_lockstep, n_max=n_max,
                              l_max=l_max, out_len=out_len),
            grid=grid,
            in_specs=[
                bs((W, nblk, 128), lambda i: (i, 0, 0),
                   memory_space=vm),                              # an_b
                bs((W, nblk, 128), lambda i: (i, 0, 0),
                   memory_space=vm),                              # as_b
                bs((W, 1), lambda i: (i, 0), memory_space=sm),    # ne
                bs((W, n_max), lambda i: (i, 0), memory_space=sm),  # gminr
                bs((W, l_max), lambda i: (i, 0), memory_space=sm),  # seqs5
                bs((W, 1), lambda i: (i, 0), memory_space=sm),    # nn
                bs((W, 1), lambda i: (i, 0), memory_space=sm),    # tctr
                bs((W, 1), lambda i: (i, 0), memory_space=sm),    # ovf
                bs((W, ncap, GS_LANES), lambda i: (i, 0, 0),
                   memory_space=vm),                              # gs
            ],
            out_specs=[
                bs((W, 1), lambda i: (i, 0), memory_space=sm),
                bs((W, 1), lambda i: (i, 0), memory_space=sm),
                bs((W, 1), lambda i: (i, 0), memory_space=sm),
                bs((W, ncap, GS_LANES), lambda i: (i, 0, 0),
                   memory_space=vm),
                bs((W, l_max), lambda i: (i, 0), memory_space=vm),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, ncap, GS_LANES), jnp.int32),
                jax.ShapeDtypeStruct((B, l_max), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(an_b, as_b, ne, gminr, seqs5, nn, tctr, ovf, gs)
    return pl.pallas_call(
        functools.partial(_fusion_kernel, n_max=n_max, l_max=l_max,
                          out_len=out_len),
        grid=grid,
        in_specs=[
            bs((W, out_len), lambda i: (i, 0), memory_space=vm),  # an
            bs((W, out_len), lambda i: (i, 0), memory_space=vm),  # asx
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # k_end
            bs((W, n_max), lambda i: (i, 0), memory_space=sm),    # gminr
            bs((W, l_max), lambda i: (i, 0), memory_space=sm),    # seqs5
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # nn
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # tctr
            bs((W, 1), lambda i: (i, 0), memory_space=sm),        # ovf
            bs((W, ncap, GS_LANES), lambda i: (i, 0, 0),
               memory_space=vm),                                  # gs
        ],
        out_specs=[
            bs((W, 1), lambda i: (i, 0), memory_space=sm),
            bs((W, 1), lambda i: (i, 0), memory_space=sm),
            bs((W, 1), lambda i: (i, 0), memory_space=sm),
            bs((W, ncap, GS_LANES), lambda i: (i, 0, 0),
               memory_space=vm),
            bs((W, l_max), lambda i: (i, 0), memory_space=vm),    # path
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, ncap, GS_LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, l_max), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(an, asx, ke, gminr, seqs5, nn, tctr, ovf, gs)


@functools.partial(
    jax.jit,
    static_argnames=("ncap", "n_max", "l_max", "interpret"))
def fused_round_call(charsr, sinksr, predsr, chain, chainw, gminr,
                     seqv, seqs5, lb, nn_eff, nn, tctr, ovf, gs, *,
                     ncap: int, n_max: int, l_max: int,
                     interpret: bool = False):
    """One fused round over a (B, ...) batch; B must be a multiple of 8.

    TWO pallas_calls per round — align+traceback (align_tb_call), then
    fusion (fusion_call); split during the §8-§9 bottleneck hunt and kept
    as separately callable phases for profiling (docs/PERF.md §10) and
    faster compiles — the round-4 wall itself was the XLA canonical sort,
    fixed in ops/poa_fused._toposort, docs/PERF.md §9.

    gs: (B, ncap, 128) lane-structured graph state (see module doc).
    predsr: (B, ceil(n_max/16), 128) packed rank-space pred table.
    gminr: (B, n_max) pre-round group ids in RANK space (fusion's match
    lookup; never rewritten for existing nodes, so SMEM-safe).
    Returns (nn, tctr, ovf, gs, path) with path (B, l_max)."""
    an, asx, ke = align_tb_call(charsr, sinksr, predsr, chain, chainw,
                                seqv, lb, nn_eff, n_max=n_max,
                                l_max=l_max, interpret=interpret)
    return fusion_call(an, asx, ke, gminr, seqs5, nn, tctr, ovf, gs,
                       ncap=ncap, n_max=n_max, l_max=l_max,
                       interpret=interpret)
