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
  * fusion is the HOST algorithm verbatim (ops/poa.py::_fused_path
    semantics): a sequential per-window walk over the ~L alignment
    entries, updating the graph state (chars, preds, weights, stamps,
    column membership) in place with row-granular VMEM read-modify-writes.
    Sequential scalar work is exactly what the XLA formulation could not
    express cheaply — on-core it is tens of ops per entry with no
    dispatch, gather-lowering or scatter-keyspace costs.

Graph state stays in HBM between rounds (the jitted round loop in
ops/poa_fused passes it straight back in), so the host still touches the
device exactly twice per bucket chunk.  The canonical group-Kahn re-rank
(alignment-order parity + final MSA column order) remains the XLA
`_toposort` between rounds — sequential-per-group in nature, it is the one
piece the VPU formulation does not improve; see docs/PERF.md §6.

Layouts (per grid step, W = 8 windows; node-ID space for state, rank
space for the DP — the per-round `order`/`rank` arrays translate):

  mutable state   pred/predw/predt (W, ncap, P) VMEM, gchar (W, ncap, 5)
                  VMEM — row reads/writes at [w, id, :];
                  chars/gmin/outdeg (ncap, W) VMEM — lane-masked row RMW;
                  nn/tctr/ovf (W, 1) SMEM scalars
  DP inputs       rank-space chars/sinks (W, N) SMEM scalar reads,
                  preds (W, N, P) VMEM, chain flags SMEM — identical to
                  ops/poa_pallas; order (W, N) SMEM maps rank -> node id
  outputs         state copies (kernel copies inputs forward, then
                  mutates) + per-round (l_max, W) fused node-id path

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
ALPHA5 = 5
GC_PAD = 8           # gchar lane padding (VMEM rows like the pred tables)


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


def _set_lane(ref, row_idx, lane, val):
    """ref[row_idx, lane] = val on a (rows, W) VMEM ref: row RMW with a
    lane mask (dynamic-lane scalar stores are not lowerable; row ops are)."""
    row = ref[pl.ds(row_idx, 1), :]
    io = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    ref[pl.ds(row_idx, 1), :] = jnp.where(io == lane, val, row)


def _get_lane(ref, row_idx, lane):
    return _exs(ref[pl.ds(row_idx, 1), :], lane)


def _set_slot(ref, w: int, row_idx, slot, val):
    """ref[w, row_idx, slot] = val on a (W, ncap, P) VMEM ref."""
    row = ref[w, pl.ds(row_idx, 1), :]
    io = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    ref[w, pl.ds(row_idx, 1), :] = jnp.where(io == slot, val, row)


def _fused_round_kernel(
        # rank-space DP inputs (read-only)
        charsr_ref, sinksr_ref, predsr_ref, chain_ref, order_ref,
        seqv_ref, seqs_ref, lb_ref, nn_eff_ref,
        # state inputs (copied forward then mutated on the out refs)
        nn_in, tctr_in, ovf_in, pred_in, predw_in, predt_in, gchar_in,
        chars_in, gmin_in, outdeg_in,
        # outputs
        nn_out, tctr_out, ovf_out, pred_out, predw_out, predt_out,
        gchar_out, chars_out, gmin_out, outdeg_out, path_ref,
        # scratch
        h_s, d_s, an_s, as_s,
        *, n_max: int, l_max: int, out_len: int):
    l1 = l_max + 1
    j = jax.lax.broadcasted_iota(jnp.int32, (W, l1), 1)
    j1 = j[0:1]
    lb_v = jnp.stack([lb_ref[k, 0] for k in range(W)]).reshape(W, 1)
    nn_v = jnp.stack([nn_eff_ref[k, 0] for k in range(W)]).reshape(W, 1)
    nn_max_t = jnp.max(nn_v)
    seq = seqv_ref[:]
    decay = GAP * j

    # ---- copy state forward (outputs are the mutation targets) ----
    for w in range(W):
        nn_out[w, 0] = nn_in[w, 0]
        tctr_out[w, 0] = tctr_in[w, 0]
        ovf_out[w, 0] = ovf_in[w, 0]
    pred_out[:] = pred_in[:]
    predw_out[:] = predw_in[:]
    predt_out[:] = predt_in[:]
    gchar_out[:] = gchar_in[:]
    chars_out[:] = chars_in[:]
    gmin_out[:] = gmin_in[:]
    outdeg_out[:] = outdeg_in[:]
    path_ref[:] = jnp.full((l_max, W), -1, jnp.int32)
    an_s[:] = jnp.full((out_len, W), -2, jnp.int32)
    as_s[:] = jnp.full((out_len, W), -2, jnp.int32)

    # ---- phase 1: DP wavefront (ops/poa_pallas._poa_kernel row loop) ----
    h0 = jnp.where(j <= lb_v, GAP * j, NEG)
    h_s[0] = h0

    def pred_h(pv, p, w):
        pr = _exs(pv, p)
        prc = jnp.maximum(pr, -1) + 1
        v = h_s[pl.ds(prc, 1), pl.ds(w, 1), :].reshape(1, l1)
        return v, pr

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

        def branch_path(_):
            pred_rows, accs = [], []
            for w in range(W):
                pv = predsr_ref[w, r, :].reshape(1, MAX_PREDS)
                rows_w = [pred_h(pv, p, w)[0] for p in range(MAX_PREDS)]
                acc = rows_w[0]
                for p in range(1, MAX_PREDS):
                    acc = jnp.maximum(acc, rows_w[p])
                pred_rows.append(rows_w)
                accs.append(acc)
            hrow, _diag, _up = finish(jnp.concatenate(accs, axis=0))
            dirs = []
            for w in range(W):
                hw = hrow[w:w + 1, :]
                subw = sub[w:w + 1, :]
                lbw = lb_ref[w, 0]
                jv = (j1 >= 1) & (j1 <= lbw)
                d_diag = jnp.full((1, l1), -1, jnp.int32)
                d_up = jnp.full((1, l1), -1, jnp.int32)
                for p in reversed(range(MAX_PREDS)):
                    v = pred_rows[w][p]
                    uok = hw == v + GAP
                    dok = (hw == _roll_right(v, 1, NEG) + subw) & jv
                    d_up = jnp.where(uok, 8 + p, d_up)
                    d_diag = jnp.where(dok, p, d_diag)
                dirs.append(jnp.where(d_diag >= 0, d_diag,
                                      jnp.where(d_up >= 0, d_up, 16)))
            return hrow, jnp.concatenate(dirs, axis=0)

        hrow, dirrow = jax.lax.cond(chain_ref[0, 0, r] > 0,
                                    chain_path, branch_path, 0)
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

    # ---- phase 2+3 per window: scalar traceback, then scalar fusion.
    # All ref writes are unconditional row read-modify-writes whose lane
    # mask folds in the write gate — no ref effects inside cond/when branches
    # (the only control flow around stores is fori/while, the patterns the
    # compiled ops/poa_pallas kernel already exercises).
    ncap = pred_out.shape[1]
    trash = ncap - 1

    def _set_lane_if(ref, row_idx, lane, val, gate):
        row = ref[pl.ds(row_idx, 1), :]
        io = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        ref[pl.ds(row_idx, 1), :] = jnp.where((io == lane) & gate, val, row)

    def _set_slot_if(ref, w, row_idx, slot, val, gate):
        row = ref[w, pl.ds(row_idx, 1), :]
        io = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        ref[w, pl.ds(row_idx, 1), :] = jnp.where((io == slot) & gate, val,
                                                 row)

    for w in range(W):
        lb_w = lb_ref[w, 0]
        nn_w = nn_eff_ref[w, 0]

        # -- traceback: end -> start over the direction plane, writing the
        # right-aligned (node_rank, seq_pos) pairs exactly like the host
        # walk (ops/poa_device._align_one).  An empty graph (nn == 0 with
        # a non-empty read) starts at the virtual row and emits the
        # all-gap alignment, which IS the chain init.
        def tb_body(st):
            i, jv, k = st
            rr = jnp.maximum(i - 1, 0)
            drow = d_s[pl.ds(rr, 1), pl.ds(w, 1), :].reshape(1, l1)
            code = jnp.where(i == 0, 16, _exs(drow, jv))
            is_left = code == 16
            is_up = (code >= 8) & (code < 16)
            p = jnp.where(is_left, 0, code & 7)
            prow = predsr_ref[w, rr, :].reshape(1, MAX_PREDS)
            pr = _exs(prow, p)
            _set_lane(an_s, k, w, jnp.where(is_left, -1, i - 1))
            _set_lane(as_s, k, w, jnp.where(is_up, -1, jv - 1))
            i = jnp.where(is_left, i, pr + 1)
            jv = jnp.where(is_up, jv, jv - 1)
            return i, jv, k - 1

        def tb_cond(st):
            _i, jv, k = st
            return (jv > 0) & (k >= 0)

        i0 = jnp.where(nn_w > 0, _exw(brank, w) + 1, 0)
        jax.lax.while_loop(tb_cond, tb_body,
                           (i0, jnp.where(lb_w > 0, lb_w, 0),
                            jnp.int32(out_len - 1)))

        # -- fusion: the host algorithm (ops/poa.py fusion semantics,
        # row-for-row with ops/poa_fused._fuse_alignment): walk entries
        # left -> right, match into columns via gchar, create nodes and
        # edges, record the read's node path.  Walk starts at the first
        # written entry (k_end + 1 == out_len - emitted) and runs while
        # k < out_len — trip count is the real path length, not out_len.
        def fuse_cond(st):
            k = st[0]
            return k < out_len

        def fuse_body(st):
            k, prev, nn_c, tc, ovf = st
            asp = _get_lane(as_s, k, w)
            an = _get_lane(an_s, k, w)
            valid = asp >= 0                     # -1 graph gap, -2 pad
            sposc = jnp.clip(asp, 0, l_max - 1)
            c5 = seqs_ref[w, sposc]
            node = jnp.where(valid & (an >= 0),
                             order_ref[w, jnp.clip(an, 0, n_max - 1)], -1)
            gid_old = _get_lane(gmin_out, jnp.clip(node, 0, trash), w)
            grow = gchar_out[w, pl.ds(jnp.clip(gid_old, 0, trash), 1),
                             :].reshape(1, GC_PAD)
            pre = jnp.where(node >= 0, _exs(grow, c5), -1)
            creator = valid & (pre < 0)
            ovf = ovf | (creator & (nn_c >= trash))
            newid = jnp.minimum(nn_c, jnp.int32(trash))
            cur = jnp.where(creator, newid, pre)
            gid = jnp.where(node >= 0, gid_old, newid)
            _set_lane_if(chars_out, newid, w, c5, creator)
            _set_lane_if(gmin_out, newid, w, gid, creator)
            _set_slot_if(gchar_out, w, jnp.clip(gid, 0, trash), c5, newid,
                         creator)
            nn_c = jnp.minimum(nn_c + creator.astype(jnp.int32),
                               jnp.int32(trash))

            # edge prev -> cur (at most one new in-edge per entry)
            add_e = valid & (prev >= 0)
            curc = jnp.clip(cur, 0, trash)
            erow = pred_out[w, pl.ds(curc, 1), :].reshape(1, MAX_PREDS)
            ehit = (erow == prev) & add_e
            has_e = jnp.any(ehit)
            io8 = jax.lax.broadcasted_iota(jnp.int32, ehit.shape, 1)
            eslot = jnp.min(jnp.where(ehit, io8, MAX_PREDS))
            nvalid = jnp.sum((erow >= 0).astype(jnp.int32),
                             dtype=jnp.int32)
            ovf_e = add_e & (~has_e) & (nvalid >= MAX_PREDS)
            newe = add_e & (~has_e) & (~ovf_e)
            slot = jnp.where(has_e, eslot,
                             jnp.clip(nvalid, 0, MAX_PREDS - 1))
            wrow = predw_out[w, pl.ds(curc, 1), :].reshape(1, MAX_PREDS)
            w_old = _exs(wrow, slot)
            gate_e = has_e | newe
            _set_slot_if(pred_out, w, curc, slot, prev, gate_e)
            _set_slot_if(predw_out, w, curc, slot,
                         jnp.where(has_e, w_old + 1, 1), gate_e)
            _set_slot_if(predt_out, w, curc, slot, tc, newe)
            prevc = jnp.clip(prev, 0, trash)
            od = _get_lane(outdeg_out, prevc, w)
            _set_lane_if(outdeg_out, prevc, w, od + 1, newe)
            tc = tc + newe.astype(jnp.int32)
            ovf = ovf | ovf_e
            _set_lane_if(path_ref, sposc, w, cur, valid)
            prev = jnp.where(valid, cur, prev)
            return k + 1, prev, nn_c, tc, ovf

        # entries are right-aligned with -2 padding before them; the walk
        # starts at 0 and skips pads (~6 ops each) — the real path begins
        # at out_len - (lb + graph-gap count) and dominates the trip
        _k, _prev, nn_f, tc_f, ovf_f = jax.lax.while_loop(
            fuse_cond, fuse_body,
            (jnp.int32(0), jnp.int32(-1), nn_in[w, 0], tctr_in[w, 0],
             ovf_in[w, 0] > 0))
        nn_out[w, 0] = nn_f
        tctr_out[w, 0] = tc_f
        ovf_out[w, 0] = ovf_f.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("ncap", "n_max", "l_max", "interpret"))
def fused_round_call(charsr, sinksr, predsr, chain, order, seqv, seqs5,
                     lb, nn_eff, nn, tctr, ovf, pred, predw, predt, gchar,
                     chars_t, gmin_t, outdeg_t, *, ncap: int, n_max: int,
                     l_max: int, interpret: bool = False):
    """One fused round over a (B, ...) batch; B must be a multiple of 8.

    State layouts (XLA side): pred/predw/predt (B, ncap, P); gchar
    (B, ncap, 5); chars_t/gmin_t/outdeg_t TRANSPOSED (ncap, B); scalars
    (B, 1).  Returns the mutated state + the round's (l_max, B) path."""
    B = charsr.shape[0]
    out_len = n_max + l_max
    l1 = l_max + 1
    kernel = functools.partial(_fused_round_kernel, n_max=n_max,
                               l_max=l_max, out_len=out_len)
    grid = (B // W,)
    sm = pltpu.SMEM
    vm = pltpu.VMEM
    bs = pl.BlockSpec
    in_specs = [
        bs((W, n_max), lambda i: (i, 0), memory_space=sm),        # charsr
        bs((W, n_max), lambda i: (i, 0), memory_space=sm),        # sinksr
        bs((W, n_max, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),                                      # predsr
        bs((1, 1, n_max), lambda i: (i, 0, 0), memory_space=sm),  # chain
        bs((W, n_max), lambda i: (i, 0), memory_space=sm),        # order
        bs((W, l1), lambda i: (i, 0), memory_space=vm),           # seqv
        bs((W, l_max), lambda i: (i, 0), memory_space=sm),        # seqs5
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # lb
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # nn_eff
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # nn
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # tctr
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # ovf
        bs((W, ncap, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),                                      # pred
        bs((W, ncap, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),                                      # predw
        bs((W, ncap, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),                                      # predt
        bs((W, ncap, GC_PAD), lambda i: (i, 0, 0),
           memory_space=vm),                                      # gchar
        bs((ncap, W), lambda i: (0, i), memory_space=vm),         # chars_t
        bs((ncap, W), lambda i: (0, i), memory_space=vm),         # gmin_t
        bs((ncap, W), lambda i: (0, i), memory_space=vm),         # outdeg_t
    ]
    out_specs = [
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # nn
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # tctr
        bs((W, 1), lambda i: (i, 0), memory_space=sm),            # ovf
        bs((W, ncap, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),
        bs((W, ncap, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),
        bs((W, ncap, MAX_PREDS), lambda i: (i, 0, 0),
           memory_space=vm),
        bs((W, ncap, GC_PAD), lambda i: (i, 0, 0), memory_space=vm),
        bs((ncap, W), lambda i: (0, i), memory_space=vm),
        bs((ncap, W), lambda i: (0, i), memory_space=vm),
        bs((ncap, W), lambda i: (0, i), memory_space=vm),
        bs((l_max, W), lambda i: (0, i), memory_space=vm),        # path
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, ncap, MAX_PREDS), jnp.int32),
        jax.ShapeDtypeStruct((B, ncap, MAX_PREDS), jnp.int32),
        jax.ShapeDtypeStruct((B, ncap, MAX_PREDS), jnp.int32),
        jax.ShapeDtypeStruct((B, ncap, GC_PAD), jnp.int32),
        jax.ShapeDtypeStruct((ncap, B), jnp.int32),
        jax.ShapeDtypeStruct((ncap, B), jnp.int32),
        jax.ShapeDtypeStruct((ncap, B), jnp.int32),
        jax.ShapeDtypeStruct((l_max, B), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_max + 1, W, l1), jnp.int32),   # H
            pltpu.VMEM((n_max, W, l1), jnp.int32),       # directions
            pltpu.VMEM((out_len, W), jnp.int32),         # aln nodes
            pltpu.VMEM((out_len, W), jnp.int32),         # aln spos
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(charsr, sinksr, predsr, chain, order, seqv, seqs5, lb, nn_eff,
      nn, tctr, ovf, pred, predw, predt, gchar, chars_t, gmin_t, outdeg_t)
