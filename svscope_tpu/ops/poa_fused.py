"""Fully on-device POA MSA build: graph fusion as a jitted device program.

The per-round device POA path (ops/poa_batch._device_round) pays one
host<->device round trip per read: pack graphs, align the round's reads on
the device, fetch alignments, fuse on the host in C++.  docs/PERF.md
measured that on a tunneled chip this dispatch chain — not the DP kernel —
dominates the device path (~25 ms per round trip, R rounds per window
batch), which is why the engine's backend policy prefers host C++ except
on attached-grade links.

This module removes the round trips: the ENTIRE iterative MSA build —
group-aware topological re-ranking, graph-vs-read NW alignment, and graph
fusion, for every read round — runs as ONE jitted XLA program, vmapped
over windows.  Host touches the device exactly twice per window batch:
one device_put of the encoded reads and one device_get of the final graph
(chars, groups, per-read node paths, consensus walk).  Everything the
reference's hot loop #1 does per window (spoa's poa(seqs, 1),
src/DataScanner.py:207,213 and src/DecisionMaker.py:160,171) happens on
the accelerator with *windows* as the parallel axis.

Semantics are identical to ops/poa.poa (the spoa-parity NumPy oracle) and
the C++ engine — same scoring (m=5, n=-4, g=-8), the same group-aware
Kahn order (aligned columns adjacent, min-group-id heap), the same
fusion rules (first matching column member in insertion order), and the
same consensus tie-breaks (first-max in-edge per slot order, first-max
score node in rank order, earliest-created out-edge among (weight, score)
maxima) — tested row-for-row in tests/test_poa_fused.py.

Device-side data layout per window (node-id space, padded to `ncap` rows
with row ncap-1 as a write sink for masked updates; bases are 5-letter
codes ACGTN -> 0..4, other characters fall back to the host engine):

  chars      (ncap,)    node base code
  pred_node  (ncap, P)  in-edge tails in insertion order (-1 pad)
  pred_w     (ncap, P)  in-edge weights
  pred_t     (ncap, P)  in-edge creation stamps (out-edge insertion order)
  group_char (ncap, 5)  per COLUMN id: the member node carrying each base
                        (column members have distinct bases by
                        construction, so matching is one gather)
  group_min  (ncap,)    column id == smallest member node id
  path       (R, L)     per (read, base) fused node id (MSA row source)

Fusion of one alignment is fully VECTORIZED (no per-entry loop): within a
round the fused nodes are pairwise distinct (an intra-column edge can
never arise, so an alignment never revisits a column), hence matching,
node allocation (first entry per (column, base) key creates, later ones
reuse), edge appends (at most one new in-edge per node per round) and
path writes are one-shot segment/cumsum ops plus unique-index scatters.

Windows whose graph outgrows the bucket (nodes, in-degree > P, or a
would-be cycle) raise a per-window overflow flag and are transparently
re-run on the host C++ engine.
"""
from __future__ import annotations

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.jaxcfg import enable_cache

enable_cache()

from .poa_device import MAX_PREDS, _align_one

log = logging.getLogger("svscope_tpu.poa_fused")

ALPHA5 = 5               # base codes: ACGTN -> 0..4
CODE_OF = np.full(256, 255, np.uint8)
for _i, _b in enumerate(b"ACGTN"):
    CODE_OF[_b] = _i
DECODE = np.frombuffer(b"ACGTN", np.uint8)
BIG = np.int32(1 << 30)
R_LADDER = (4, 8, 16, 32, 64, 128, 256, 512)
N_LADDER = (128, 256, 512, 1024, 2048, 3072)
L_LADDER = (64, 128, 256, 512, 1024, 2048)
B_LADDER = (8, 32, 128, 256)
# cap on the alignment DP's (B, ncap+1, L+1) int32 H matrix
H_BYTES_CAP = 1 << 30


def _toposort_ref(pred_node, group_min, n_nodes, ncap: int):
    """Group-aware Kahn order, identical to PoaGraph.topo_order: aligned
    columns emit adjacently (members in node-id order), groups selected by
    smallest group id among the ready set.  Returns (order, rank, cyclic):
    order = node ids in rank order (inactive ids trailing).

    Literal one-group-per-iteration transcription — the oracle for
    _toposort's batched-prefix placement (see tests/test_poa_fused.py)."""
    ids = jnp.arange(ncap, dtype=jnp.int32)
    active = ids < n_nodes
    pnc = jnp.clip(pred_node, 0, ncap - 1)
    pg = group_min[pnc]
    own = group_min[:, None]

    def cond(st):
        placed, _rank, _pos, it = st
        return jnp.any(~placed) & (it < ncap)

    def body(st):
        placed, rank, pos, it = st
        # a node is unblocked when every pred is placed or in its own group
        pok = (pred_node < 0) | placed[pnc] | (pg == own)
        node_ok = jnp.all(pok, axis=1).astype(jnp.int32)
        grp_ok = jax.ops.segment_min(node_ok, group_min, num_segments=ncap)
        selectable = active & ~placed & (grp_ok[group_min] > 0)
        gsel = jnp.min(jnp.where(selectable, group_min, BIG))
        chosen = selectable & (group_min == gsel)
        idx = jnp.cumsum(chosen, dtype=jnp.int32) - 1
        rank = jnp.where(chosen, pos + idx, rank)
        pos = pos + jnp.sum(chosen, dtype=jnp.int32)
        return placed | chosen, rank, pos, it + 1

    placed0 = ~active
    rank0 = jnp.full((ncap,), BIG, jnp.int32)
    placed, rank, _pos, _it = jax.lax.while_loop(
        cond, body, (placed0, rank0, jnp.int32(0), jnp.int32(0)))
    cyclic = jnp.any(~placed)
    order = jnp.argsort(rank).astype(jnp.int32)   # stable: id order on ties
    return order, rank, cyclic


import os as _os

# profiling knob (tools/probe only): skip the canonical sort and use the
# identity order — results are WRONG; isolates the sort's share of wall
_ABLATE_SORT = bool(_os.environ.get("SVSCOPE_FUSED_NOSORT"))
# probe knob: force every row down the cheap chain path in the pk build.
# Read ONCE at import (like _ABLATE_SORT): the flag is baked into the
# traced program, so toggling the env var mid-process would otherwise
# silently reuse the previously compiled variant (jit cache key does not
# include it).
_ABLATE_PK_DPC = _os.environ.get("SVSCOPE_PK_ABLATE") == "dpc"


def _toposort(pred_node, group_min, n_nodes, ncap: int):
    """_toposort_ref's exact order with batched placement: each iteration
    places the maximal gid-consecutive RUN of groups instead of one group.

    Kahn with a min-gid heap picks group g* = min ready gid, then the next
    pick is again the min ready gid, and so on.  Claim: the whole prefix
    {unplaced groups g >= g* in gid order whose unplaced blockers all lie
    in [g*, g)} is placed consecutively in gid order by sequential Kahn.
    Proof sketch: the prefix contains EVERY unplaced group in the gid
    interval, so each element's blockers are earlier prefix members; by
    induction element i is ready at its turn and is the minimum (all
    smaller unplaced gids are already placed; groups outside the prefix
    are > it).  Any group newly readied mid-prefix has gid outside
    [g*, prefix end] and cannot preempt.  A backbone chain therefore
    places in ONE iteration (iterations ~ #order-violating back edges —
    fusion-created nodes with edges into smaller-gid columns — instead of
    #groups)."""
    ids = jnp.arange(ncap, dtype=jnp.int32)
    active = ids < n_nodes
    if _ABLATE_SORT:
        rank = jnp.where(active, ids, BIG)
        return ids, rank, jnp.bool_(False)
    is_grp = active & (group_min == ids)          # column founders
    pnc = jnp.clip(pred_node, 0, ncap - 1)
    tails_g = group_min[pnc]                      # (ncap, P) blocker gids
    heads_g = jnp.broadcast_to(group_min[:, None], tails_g.shape)
    ev_static = (pred_node >= 0) & active[:, None] & (tails_g != heads_g)
    iota = ids
    # Group-level blocker MATRIX, built once per call: Mblk[b, h] = 1 iff
    # some edge makes group b a blocker of group h.  The while body then
    # computes per-group min/max UNPLACED blocker gids as masked
    # (ncap, ncap) sweeps — pure VPU streaming with NO gathers, scatters
    # or segment ops in the loop.  The previous formulations (per-
    # iteration segment_min over the edge list, then a member-table
    # gather) both cost ~1.6 ms PER ITERATION — a real fused build runs
    # ~1,700 sort iterations, which made the canonical re-rank 70-80% of
    # the whole on-device build (docs/PERF.md §9); the sweep form costs
    # the one-time scatter below plus ~tens of us per iteration.
    Mblk = jnp.zeros((ncap, ncap), jnp.int8)
    Mblk = Mblk.at[tails_g.ravel(), heads_g.ravel()].max(
        ev_static.ravel().astype(jnp.int8))
    Mblk = Mblk > 0
    # BIT-PACK the blocker axis (round 5): the while body's min/max
    # sweeps read the whole (ncap, ncap) matrix per iteration — 67 MB per
    # 64-window batch, ~50 iterations/round — which made the sort 74% of
    # the glue (0.49 s of the 1.9 s build, §10).  Packing blockers into
    # uint32 words cuts the per-iteration traffic 32x; per-word min/max
    # blocker gids come from clz of the word (and of its lowest set bit).
    nw = -(-ncap // 32)
    pad_b = nw * 32 - ncap
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (jnp.pad(Mblk, ((0, pad_b), (0, 0))).astype(jnp.uint32)
            .reshape(nw, 32, ncap) << shifts[None, :, None]
            ).sum(axis=1, dtype=jnp.uint32)       # (nw, ncap)
    widx32 = jnp.arange(nw, dtype=jnp.int32)[:, None] * 32

    def cond(st):
        grp_placed, _itp, it, stuck = st
        return jnp.any(is_grp & ~grp_placed) & ~stuck & (it < ncap)

    def step(st):
        grp_placed, it_placed, it, stuck = st
        upw = (jnp.pad(~grp_placed, (0, pad_b)).astype(jnp.uint32)
               .reshape(nw, 32) << shifts[None, :]
               ).sum(axis=1, dtype=jnp.uint32)    # packed unplaced mask
        act = bits & upw[:, None]                 # (nw, ncap) uint32
        nz = act != jnp.uint32(0)
        # highest/lowest set bit per word via clz (clz(0)=32 -> masked)
        hb = 31 - jax.lax.clz(act.astype(jnp.int32))
        low = act & (~act + jnp.uint32(1))        # x & -x
        lb = 31 - jax.lax.clz(low.astype(jnp.int32))
        bmax = jnp.max(jnp.where(nz, widx32 + hb, -1), axis=0)
        bmin = jnp.min(jnp.where(nz, widx32 + lb, BIG), axis=0)
        unplaced = is_grp & ~grp_placed
        ready = unplaced & (bmax < 0)
        gstar = jnp.min(jnp.where(ready, ids, BIG))
        C = unplaced & ((bmax < 0) | ((bmin >= gstar) & (bmax < ids)))
        transparent = ~unplaced | (ids < gstar)
        # prefix-AND as a single min-reduction: chain_ok(g) <=> no
        # failing index <= g <=> g < first failing index (the cumprod
        # scan this replaces lowered to ~10 sub-kernels per iteration)
        first_fail = jnp.min(jnp.where(C | transparent, BIG, ids))
        place_g = unplaced & (ids >= gstar) & C & (ids < first_fail)
        # record the placement ITERATION per GROUP; the node-level
        # expansion (a (ncap,) gather) runs ONCE after the loop — the
        # in-loop per-iteration gather was the body's dominant cost
        # (the §9 lesson again: gathers inside while loops serialize)
        it_placed = jnp.where(place_g, it, it_placed)
        cnt = jnp.sum(place_g, dtype=jnp.int32)
        return (grp_placed | place_g, it_placed, it + 1, cnt == 0)

    # (a 2-step unroll of the Kahn body was tried and reverted: 57 ->
    # 68 ms — iterations are sweep-work-bound, not loop-overhead-bound,
    # so the unroll only added tail waste)
    st0 = (jnp.zeros((ncap,), bool), jnp.full((ncap,), BIG, jnp.int32),
           jnp.int32(0), jnp.bool_(False))
    grp_placed, it_g, _it, _stuck = jax.lax.while_loop(cond, step, st0)
    cyclic = jnp.any(is_grp & ~grp_placed)
    it_placed = it_g[group_min]               # group -> node, one gather
    # lexicographic (iteration, gid, id): iterations and gids fit one
    # int32 key (ncap <= 3074 -> it*ncap+gid < 2^24); stable argsort
    # breaks the remaining ties by node id — exactly members-in-id-order
    placed_node = active & grp_placed[group_min] & (it_placed < BIG)
    key = jnp.where(placed_node, it_placed * ncap + group_min, BIG)
    order = jnp.argsort(key).astype(jnp.int32)
    rank = jnp.zeros((ncap,), jnp.int32).at[order].set(iota)
    return order, rank, cyclic


def _ranked_view(chars, pred_node, n_nodes, order, rank, ncap: int):
    """Rank-space packed graph for the aligner: chars/preds/sinks with
    row == topological rank (ops/poa_device.pack_graph equivalent)."""
    chars_r = chars[order]
    pn = pred_node[order]
    preds_r = jnp.where(pn >= 0, rank[jnp.clip(pn, 0, ncap - 1)], -1)
    valid_rows = (jnp.arange(ncap, dtype=jnp.int32) < n_nodes)[:, None]
    vals = ((pred_node >= 0) & valid_rows).astype(jnp.int32).ravel()
    outdeg = jax.ops.segment_sum(
        vals, jnp.clip(pred_node, 0, ncap - 1).ravel(), num_segments=ncap)
    sink_r = (outdeg == 0)[order]
    return chars_r, preds_r, sink_r


def _fuse_alignment(aln_nodes, aln_spos, order, seq, chars, pred_node,
                    pred_w, pred_t, group_char, group_min, n_nodes, t_ctr,
                    overflow, *, ncap: int, l_max: int):
    """Vectorized fusion of one window's alignment into its graph state.

    No per-entry loop: within a round the fused nodes are pairwise
    distinct (an intra-column edge cannot arise, so an alignment never
    revisits a column), hence matching, allocation, edge appends and path
    writes are one-shot segment/cumsum ops plus unique-index scatters.
    Returns the new state plus the read's (l_max,) node path."""
    P = MAX_PREDS
    out_len = ncap + l_max
    trash = ncap - 1
    n_max = ncap - 1
    kk = jnp.arange(out_len, dtype=jnp.int32)
    KEYCAP = ncap * ALPHA5

    valid = aln_spos >= 0               # real base entries (pads -2,
    sposc = jnp.clip(aln_spos, 0, l_max - 1)      # graph-gaps -1 skip)
    c5 = seq[sposc]                     # (out_len,) base codes
    node = jnp.where(valid & (aln_nodes >= 0),
                     order[jnp.clip(aln_nodes, 0, ncap - 1)], -1)
    gid = group_min[jnp.clip(node, 0, ncap - 1)]
    # match = the column member carrying this base (distinct bases per
    # column => membership is all that matters, not scan order)
    pre = jnp.where(node >= 0,
                    group_char[jnp.clip(gid, 0, ncap - 1), c5], -1)
    matched = valid & (pre >= 0)
    isnew = valid & ~matched
    join = isnew & (node >= 0)          # joins an existing column
    # first entry per (column, base) key creates the node; later
    # entries of the same key reuse it (the host scan's behavior when
    # a same-round node already joined the column)
    keyc = jnp.where(join, gid * ALPHA5 + c5, KEYCAP)
    firstk = jax.ops.segment_min(jnp.where(join, kk, BIG), keyc,
                                 num_segments=KEYCAP + 1)
    is_first = join & (firstk[keyc] == kk)
    creator = is_first | (isnew & (node < 0))
    new_idx = jnp.cumsum(creator, dtype=jnp.int32) - 1
    n_new = jnp.sum(creator, dtype=jnp.int32)
    ovf_n = n_nodes + n_new > n_max
    cur_created = jnp.clip(n_nodes + new_idx, 0, trash)
    id_of_key = jnp.full((KEYCAP + 1,), trash, jnp.int32)
    id_of_key = id_of_key.at[jnp.where(is_first, keyc, KEYCAP)].set(
        cur_created, unique_indices=True)
    cur = jnp.where(matched, pre,
                    jnp.where(creator, cur_created, id_of_key[keyc]))
    cur = jnp.where(valid, cur, -1)
    # prev chain: the previous valid entry's node
    lastk = jax.lax.cummax(jnp.where(valid, kk, -1))
    lastk = jnp.concatenate([jnp.full((1,), -1, jnp.int32), lastk[:-1]])
    prev = jnp.where(lastk >= 0, cur[jnp.clip(lastk, 0, out_len - 1)], -1)
    add_e = valid & (prev >= 0)
    curc = jnp.clip(cur, 0, ncap - 1)
    # edge prev->cur: all fused nodes of one round are distinct, so at
    # most ONE new in-edge lands per node — scatter rows are unique
    slots = pred_node[curc]             # (out_len, P) pre-round rows
    ehit = slots == prev[:, None]
    has_e = add_e & jnp.any(ehit, axis=1)
    eslot = jnp.argmax(ehit, axis=1).astype(jnp.int32)[:, None]
    nvalid = jnp.sum(slots >= 0, axis=1, dtype=jnp.int32)
    ovf_e = add_e & ~has_e & (nvalid >= P)
    wslot = jnp.where(has_e, eslot[:, 0], jnp.clip(nvalid, 0, P - 1))
    newe = add_e & ~has_e & ~ovf_e
    ew_old = jnp.take_along_axis(pred_w[curc], eslot, 1)[:, 0]
    et_old = jnp.take_along_axis(pred_t[curc], eslot, 1)[:, 0]
    wval = jnp.where(has_e, ew_old + 1, 1)
    tval = jnp.where(has_e, et_old,
                     t_ctr + jnp.cumsum(newe, dtype=jnp.int32) - 1)
    # unique_indices: real rows are pairwise distinct (distinct cur
    # per round); masked entries all collapse onto the trash row,
    # whose content is never read — racing writes there are harmless
    erow = jnp.where(add_e & ~ovf_e, curc, trash)
    pred_node = pred_node.at[erow, wslot].set(
        jnp.where(add_e, prev, -1), unique_indices=True)
    pred_w = pred_w.at[erow, wslot].set(wval, unique_indices=True)
    pred_t = pred_t.at[erow, wslot].set(tval, unique_indices=True)
    t_ctr = t_ctr + jnp.sum(newe, dtype=jnp.int32)
    # new node init (unique ids; (column, base) keys unique)
    nrow = jnp.where(creator, cur_created, trash)
    chars = chars.at[nrow].set(c5, unique_indices=True)
    new_gid = jnp.where(node >= 0, gid, cur_created)
    group_min = group_min.at[nrow].set(new_gid, unique_indices=True)
    gcrow = jnp.where(creator, jnp.clip(new_gid, 0, ncap - 1), trash)
    group_char = group_char.at[gcrow, c5].set(cur_created,
                                              unique_indices=True)
    # bookkeeping (alignment seq positions are unique)
    path_row = jnp.full((l_max + 1,), -1, jnp.int32)
    path_row = path_row.at[jnp.where(valid, sposc, l_max)].set(
        cur, unique_indices=True)
    n_nodes = jnp.minimum(n_nodes + n_new, jnp.int32(n_max))
    overflow = overflow | ovf_n | jnp.any(ovf_e)
    return (chars, pred_node, pred_w, pred_t, group_char, group_min,
            n_nodes, t_ctr, overflow, path_row[:l_max])


def _pallas_align_round(chars_r, preds_r, sink_r, n_eff, seqs_r, slen_eff,
                        ncap: int, l_max: int, interpret: bool):
    """One batched alignment round through the Pallas wavefront kernel
    (ops/poa_pallas) — same right-aligned output convention as _align_one,
    with the host-side packing of align_batch_pallas done in-program."""
    from .poa_pallas import _align_batch_padded
    B, W = chars_r.shape[0], 8
    ri = jnp.arange(ncap, dtype=jnp.int32)[None, :]
    single = preds_r[:, :, 1] < 0
    first_prev = preds_r[:, :, 0] == ri - 1
    root0 = (ri == 0) & (preds_r[:, :, 0] < 0)
    inactive = ri >= n_eff[:, None]
    chainw = (single & (first_prev | root0)) | inactive
    chain_all = (chainw.reshape(B // W, W, ncap).all(axis=1)
                 .astype(jnp.int32).reshape(B // W, 1, ncap))
    predsp = jnp.where(preds_r < 0, preds_r[:, :, :1], preds_r)
    seqs_sh = jnp.full((B, l_max + 1), 255, jnp.int32)
    seqs_sh = seqs_sh.at[:, 1:].set(seqs_r)
    an, asp, _ke, _sc = _align_batch_padded(
        chars_r.astype(jnp.int32), sink_r.astype(jnp.int32), predsp,
        seqs_sh, slen_eff.reshape(B, 1).astype(jnp.int32),
        n_eff.reshape(B, 1).astype(jnp.int32), chain_all,
        ncap, l_max, interpret, False)
    return an, asp


def _build_batch_impl(seqs, lens, n_seqs, ncap: int, r_max: int,
                      l_max: int, engine: str, interpret: bool):
    """Batch-level build: the round loop runs over the whole window batch
    so the per-round alignment can be ONE Pallas grid call (VMEM-resident
    H, W-joint register traceback) instead of a vmapped XLA walk whose
    per-step scalar gathers from the big H dominate wall time (measured:
    one aligned round at the bench bucket cost ~12 s under vmap)."""
    B = seqs.shape[0]
    out_len = ncap + l_max
    kk = jnp.arange(out_len, dtype=jnp.int32)[None, :]
    sortv = jax.vmap(lambda p, g, n: _toposort(p, g, n, ncap))
    viewv = jax.vmap(
        lambda c, p, n, o, rk: _ranked_view(c, p, n, o, rk, ncap))
    fusev = jax.vmap(
        functools.partial(_fuse_alignment, ncap=ncap, l_max=l_max))
    alignv = jax.vmap(
        lambda c, p, s, n, q, sl: _align_one(c, p, s, n, q, sl, l_max))

    def round_body(r, st):
        (chars, pred_node, pred_w, pred_t, group_char, group_min, n_nodes,
         t_ctr, overflow, path) = st
        seq = seqs[:, r].astype(jnp.int32)          # (B, l_max)
        slen = lens[:, r]                           # (B,)
        order, rank, cyclic = sortv(pred_node, group_min, n_nodes)
        chars_r, preds_r, sink_r = viewv(chars, pred_node, n_nodes, order,
                                         rank)
        empty = n_nodes == 0
        # empty read OR empty graph: zero rows/columns -> immediate exit
        slen_eff = jnp.where(empty, 0, slen)
        n_eff = jnp.where(slen > 0, n_nodes, 0)
        if engine == "pallas":
            aln_nodes, aln_spos = _pallas_align_round(
                chars_r, preds_r, sink_r, n_eff, seq, slen_eff, ncap,
                l_max, interpret)
        else:
            aln_nodes, aln_spos, _k, _s = alignv(chars_r, preds_r, sink_r,
                                                 n_eff, seq, slen_eff)
        # empty graph: the "alignment" is all-gap — fusing it IS chain init
        g0 = (out_len - slen)[:, None]
        use_gap = (empty & (slen > 0))[:, None]
        aln_nodes = jnp.where(use_gap, jnp.where(kk >= g0, -1, -2),
                              aln_nodes)
        aln_spos = jnp.where(use_gap, jnp.where(kk >= g0, kk - g0, -2),
                             aln_spos)
        overflow = overflow | cyclic
        (chars, pred_node, pred_w, pred_t, group_char, group_min, n_nodes,
         t_ctr, overflow, path_row) = fusev(
            aln_nodes, aln_spos, order, seq, chars, pred_node, pred_w,
            pred_t, group_char, group_min, n_nodes, t_ctr, overflow)
        path = path.at[:, r].set(path_row)
        return (chars, pred_node, pred_w, pred_t, group_char, group_min,
                n_nodes, t_ctr, overflow, path)

    P = MAX_PREDS
    st0 = (jnp.zeros((B, ncap), jnp.int32),
           jnp.full((B, ncap, P), -1, jnp.int32),
           jnp.zeros((B, ncap, P), jnp.int32),
           jnp.zeros((B, ncap, P), jnp.int32),
           jnp.full((B, ncap, ALPHA5), -1, jnp.int32),
           jnp.broadcast_to(jnp.arange(ncap, dtype=jnp.int32),
                            (B, ncap)),
           jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
           jnp.zeros((B,), bool),
           jnp.full((B, r_max, l_max), -1, jnp.int32))
    rounds = jnp.max(jnp.asarray(n_seqs, jnp.int32))
    (chars, pred_node, pred_w, pred_t, group_char, group_min, n_nodes,
     t_ctr, overflow, path) = jax.lax.fori_loop(
        jnp.int32(0), rounds, round_body, st0)
    order, _rank, cyclic = sortv(pred_node, group_min, n_nodes)
    overflow = overflow | cyclic
    consv = jax.vmap(
        lambda c, pn, pw, pt, nn, o: _consensus_walk(c, pn, pw, pt, nn, o,
                                                     ncap))
    back_buf, back_start, fwd_buf, fwd_cnt = consv(
        chars, pred_node, pred_w, pred_t, n_nodes, order)
    return (chars, group_min, n_nodes, path, order, back_buf, back_start,
            fwd_buf, fwd_cnt, overflow)


def _pk_round_prep(gs, nn, seq, slen, ncap: int, l_max: int):
    """XLA glue of one pk round: graph state -> the operand tuple of
    fused_round_call's two kernels (canonical group-Kahn re-rank +
    rank-space gathers + chain flags + query staging).  Factored out of
    the round loop so tools/probe/pk_phase_probe can record real per-
    round operands and replay each kernel phase in isolation.

    Returns ((chars_r, sink_r, pred_packed, chain_all, chainw32, gminr,
    seqv, lb, nn_eff), cyclic)."""
    from .poa_fused_kernel import L_CH, L_GM, L_PN
    B = gs.shape[0]
    P = MAX_PREDS
    n16 = -(-ncap // 16)
    sortv = jax.vmap(lambda p, g, n: _toposort(p, g, n, ncap))
    take = jax.vmap(lambda a, o: a[o])
    pred = gs[..., L_PN:L_PN + P]
    order, rank, cyclic = sortv(pred, gs[..., L_GM], nn[:, 0])
    rank_of = jax.vmap(
        lambda rk, p: jnp.where(p >= 0, rk[jnp.clip(p, 0, ncap - 1)],
                                -1))(rank, pred)      # id->rank per slot
    chars_r = take(gs[..., L_CH], order)
    preds_r = take(rank_of, order)
    gminr = take(gs[..., L_GM], order)
    # sinks from out-degrees (XLA segment sum; the kernel no longer
    # tracks out-degree — one less RMW per fused entry)
    ids = jnp.arange(ncap, dtype=jnp.int32)

    def outdeg_of(pred_b, nn_b):
        vals = ((pred_b >= 0)
                & (ids[:, None] < nn_b)).astype(jnp.int32).ravel()
        return jax.ops.segment_sum(
            vals, jnp.clip(pred_b, 0, ncap - 1).ravel(),
            num_segments=ncap)
    outdeg = jax.vmap(outdeg_of)(pred, nn[:, 0])
    sink_r = take((outdeg == 0).astype(jnp.int32), order)
    nn_eff = jnp.where(slen > 0, nn[:, 0], 0)
    ri = jnp.arange(ncap, dtype=jnp.int32)[None, :]
    single = preds_r[:, :, 1] < 0
    first_prev = preds_r[:, :, 0] == ri - 1
    root0 = (ri == 0) & (preds_r[:, :, 0] < 0)
    inactive = ri >= nn_eff[:, None]
    chainw = (single & (first_prev | root0)) | inactive
    chain_all = (chainw.reshape(B // 8, 8, ncap).all(axis=1)
                 .astype(jnp.int32).reshape(B // 8, 1, ncap))
    chainw32 = chainw.astype(jnp.int32)
    if _ABLATE_PK_DPC:
        # probe: force every row down the cheap chain path
        chain_all = jnp.ones_like(chain_all)
        chainw32 = jnp.ones_like(chainw32)
    # pad slots duplicate slot 0 (unconditional branch-row gathers),
    # then pack 16 rank-rows per 128-lane row (a pure reshape)
    predsp = jnp.where(preds_r < 0, preds_r[:, :, :1], preds_r)
    pad_rows = n16 * 16 - ncap
    if pad_rows:
        predsp = jnp.concatenate(
            [predsp, jnp.full((B, pad_rows, P), -1, jnp.int32)],
            axis=1)
    pred_packed = predsp.reshape(B, n16, 16 * P)
    seqv = jnp.full((B, l_max + 1), 255, jnp.int32)
    seqv = seqv.at[:, 1:].set(seq)
    return (chars_r, sink_r, pred_packed, chain_all, chainw32, gminr,
            seqv, slen.reshape(B, 1), nn_eff.reshape(B, 1)), cyclic


def _build_batch_impl_pk(seqs, lens, n_seqs, ncap: int, r_max: int,
                         l_max: int, interpret: bool):
    """Round loop for the 'pk' engine: alignment + traceback + FUSION all
    inside one Pallas kernel per round (ops/poa_fused_kernel) — graph
    state lives in the kernel's lane-structured (B, ncap, 128) layout and
    stays device-resident; XLA keeps only the canonical group-Kahn
    re-rank and the rank-space gathers.  Output tuple identical to
    _build_batch_impl (same emission path, tested identical)."""
    from .poa_fused_kernel import (GS_LANES, L_CH, L_GC, L_GM, L_PN,
                                   L_PT, L_PW, fused_round_call)
    B = seqs.shape[0]
    P = MAX_PREDS
    sortv = jax.vmap(lambda p, g, n: _toposort(p, g, n, ncap))

    def round_body(r, st):
        nn, tctr, ovf, gs, path = st
        seq = seqs[:, r].astype(jnp.int32)            # (B, l_max)
        slen = lens[:, r].astype(jnp.int32)
        ops, cyclic = _pk_round_prep(gs, nn, seq, slen, ncap, l_max)
        (chars_r, sink_r, pred_packed, chain_all, chainw32, gminr, seqv,
         lb, nn_eff) = ops
        ovf = ovf | cyclic.astype(jnp.int32).reshape(B, 1)
        nn, tctr, ovf, gs, path_round = fused_round_call(
            chars_r, sink_r, pred_packed, chain_all, chainw32,
            gminr, seqv, seq, lb, nn_eff,
            nn, tctr, ovf, gs, ncap=ncap, n_max=ncap, l_max=l_max,
            interpret=interpret)
        path = path.at[:, r].set(path_round)
        return nn, tctr, ovf, gs, path

    gs0 = jnp.zeros((B, ncap, GS_LANES), jnp.int32)
    gs0 = gs0.at[..., L_PN:L_PN + P].set(-1)
    gs0 = gs0.at[..., L_GC:L_GC + 8].set(-1)
    gs0 = gs0.at[..., L_GM].set(
        jnp.arange(ncap, dtype=jnp.int32)[None, :])
    st0 = (jnp.zeros((B, 1), jnp.int32), jnp.zeros((B, 1), jnp.int32),
           jnp.zeros((B, 1), jnp.int32), gs0,
           jnp.full((B, r_max, l_max), -1, jnp.int32))
    rounds = jnp.max(jnp.asarray(n_seqs, jnp.int32))
    nn, tctr, ovf, gs, path = jax.lax.fori_loop(
        jnp.int32(0), rounds, round_body, st0)
    chars = gs[..., L_CH]
    group_min = gs[..., L_GM]
    pred = gs[..., L_PN:L_PN + P]
    predw = gs[..., L_PW:L_PW + P]
    predt = gs[..., L_PT:L_PT + P]
    n_nodes = nn[:, 0]
    order, _rank, cyclic = sortv(pred, group_min, n_nodes)
    overflow = (ovf[:, 0] > 0) | cyclic
    consv = jax.vmap(
        lambda c, pn, pw, pt, nnx, o: _consensus_walk(c, pn, pw, pt, nnx,
                                                      o, ncap))
    back_buf, back_start, fwd_buf, fwd_cnt = consv(
        chars, pred, predw, predt, n_nodes, order)
    return (chars, group_min, n_nodes, path, order, back_buf, back_start,
            fwd_buf, fwd_cnt, overflow)


def _consensus_walk(chars, pred_node, pred_w, pred_t, n_nodes, order,
                    ncap: int):
    """Heaviest-bundle consensus node path (PoaGraph.consensus semantics):
    scan scores in rank order, walk back over best in-edges from the
    first max-score node, extend forward over heaviest out-edges."""
    P = MAX_PREDS
    ids = jnp.arange(ncap, dtype=jnp.int32)
    valid_e = (pred_node >= 0) & (ids[:, None] < n_nodes)
    pnc = jnp.clip(pred_node, 0, ncap - 1)

    # ---- score/best_in scan in rank order ----
    # lexicographic (weight, tail score) with first-max slot tie-break;
    # weight <= n_seqs (<=2^10), score <= sum of path weights (<2^21)
    def sc_step(carry, i):
        score, best_in = carry
        v = order[i]
        vc = jnp.clip(v, 0, ncap - 1)
        vmask = valid_e[vc]
        sc = score[pnc[vc]]
        key = jnp.where(vmask, pred_w[vc] * (1 << 21) + sc, -1)
        b = jnp.argmax(key).astype(jnp.int32)
        has = jnp.any(vmask)
        score = score.at[vc].set(jnp.where(has, pred_w[vc, b] + sc[b], 0))
        best_in = best_in.at[vc].set(jnp.where(has, pred_node[vc, b], -1))
        return (score, best_in), None

    (score, best_in), _ = jax.lax.scan(
        sc_step, (jnp.zeros((ncap,), jnp.int32),
                  jnp.full((ncap,), -1, jnp.int32)),
        jnp.arange(ncap, dtype=jnp.int32))

    # first max-score node in rank order
    s_ord = jnp.where(jnp.arange(ncap) < n_nodes,
                      score[jnp.clip(order, 0, ncap - 1)], -1)
    vmax = order[jnp.argmax(s_ord).astype(jnp.int32)]
    vmax = jnp.where(n_nodes > 0, vmax, -1)

    # ---- per-node best out-edge (max (weight, head score), earliest
    # creation among ties == Python max over insertion-ordered out_edges)
    heads = jnp.broadcast_to(ids[:, None], (ncap, P)).ravel()
    tails = pnc.ravel()
    ve = valid_e.ravel()
    key1 = jnp.where(ve, pred_w.ravel() * (1 << 21) + score[heads], -1)
    mx = jax.ops.segment_max(key1, tails, num_segments=ncap)
    match = ve & (key1 == mx[tails])
    tcap = ncap * P
    tmv = jnp.clip(pred_t.ravel(), 0, tcap - 1)
    tkey = jnp.where(match, tmv, BIG)
    tmn = jax.ops.segment_min(tkey, tails, num_segments=ncap)
    time_head = jnp.full((tcap + 1,), -1, jnp.int32)
    time_head = time_head.at[jnp.where(ve, tmv, tcap)].set(heads)
    best_out = jnp.where(tmn < BIG, time_head[jnp.clip(tmn, 0, tcap)], -1)

    # ---- backward walk (includes vmax), buffer filled right-to-left ----
    def bcond(st):
        v, idx, _buf = st
        return (v >= 0) & (idx >= 0)     # idx bound: cycle safety net

    def bbody(st):
        v, idx, buf = st
        buf = buf.at[jnp.clip(idx, 0, ncap - 1)].set(v)
        return best_in[jnp.clip(v, 0, ncap - 1)], idx - 1, buf

    _v, idxf, back_buf = jax.lax.while_loop(
        bcond, bbody, (vmax, jnp.int32(ncap - 1),
                       jnp.full((ncap,), -1, jnp.int32)))
    back_start = jnp.maximum(idxf + 1, 0)

    # ---- forward extension from vmax ----
    def fcond(st):
        v, cnt, _buf = st
        return ((v >= 0) & (cnt < ncap)     # cnt bound: cycle safety net
                & (best_out[jnp.clip(v, 0, ncap - 1)] >= 0))

    def fbody(st):
        v, cnt, buf = st
        nv = best_out[jnp.clip(v, 0, ncap - 1)]
        buf = buf.at[jnp.clip(cnt, 0, ncap - 1)].set(nv)
        return nv, cnt + 1, buf

    _v, fwd_cnt, fwd_buf = jax.lax.while_loop(
        fcond, fbody, (vmax, jnp.int32(0),
                       jnp.full((ncap,), -1, jnp.int32)))
    return back_buf, back_start, fwd_buf, fwd_cnt


@functools.partial(jax.jit, static_argnames=("ncap", "r_max", "l_max",
                                              "engine", "interpret"))
def _build_batch(seqs, lens, n_seqs, *, ncap: int, r_max: int, l_max: int,
                 engine: str = "xla", interpret: bool = False):
    if engine == "pk":
        return _build_batch_impl_pk(seqs, lens, n_seqs, ncap, r_max, l_max,
                                    interpret)
    return _build_batch_impl(seqs, lens, n_seqs, ncap, r_max, l_max,
                             engine, interpret)


def _pick_engine(ncap: int, l_max: int) -> str:
    """Engine policy: on an accelerator, the fully fused round kernel
    ('pk' — alignment + traceback + fusion on-core, ops/poa_fused_kernel)
    whenever its VMEM planes fit; vmapped XLA otherwise.  'pk' strictly
    dominates the per-round-'pallas' variant (same DP kernel, minus the
    XLA traceback/fusion machinery PERF.md §5 isolated as the cost), so
    'pallas' remains only as an explicit probe/test engine."""
    import jax as _jax
    if _jax.default_backend() == "cpu":
        return "xla"
    # H + direction planes dominate; the graph-state blocks add ~2 MB
    vmem = 2 * (ncap + 1) * 8 * (l_max + 1) * 4 + 4 * 1024 * 1024
    return "pk" if vmem <= 100 * 1024 * 1024 else "xla"


def _dispatch_build(seqs_a, lens_a, nseq_a, *, ncap: int, r_max: int,
                    l_max: int, engine: str | None = None,
                    interpret: bool = False):
    """Place one bucket chunk and run _build_batch under the data mesh.

    A raw pallas_call cannot be auto-partitioned by GSPMD, so with a mesh
    installed the 'pallas' engine runs under shard_map over the dp axis
    (each device builds its local window slice; the per-round kernel needs
    the local batch to be a multiple of its 8-window grid step).  When the
    batch does not divide mesh*8, the build keeps the mesh but drops to
    the 'xla' engine, which GSPMD partitions along the window axis."""
    from ..parallel.dataparallel import data_mesh, shard_batch
    if engine is None:
        engine = (_os.environ.get("SVSCOPE_FUSED_ENGINE")    # probe knob
                  or _pick_engine(ncap, l_max))
    if engine in ("pallas", "pk") and jax.default_backend() == "cpu":
        interpret = True               # pallas_call needs interpret on CPU
    mesh, axis = data_mesh()
    b = int(seqs_a.shape[0])
    if engine in ("pallas", "pk") and mesh is not None:
        n = int(mesh.shape[axis])
        if b % (n * 8) == 0 and b // n >= 8:
            from jax.sharding import PartitionSpec as P
            try:
                from jax import shard_map
            except ImportError:              # pragma: no cover
                from jax.experimental.shard_map import shard_map
            in_specs = (P(axis, None, None), P(axis, None), P(axis))
            out_specs = (P(axis, None), P(axis, None), P(axis),
                         P(axis, None, None), P(axis, None), P(axis, None),
                         P(axis), P(axis, None), P(axis), P(axis))
            dev = shard_batch((seqs_a, lens_a, nseq_a))
            impl = (functools.partial(_build_batch_impl_pk, ncap=ncap,
                                      r_max=r_max, l_max=l_max,
                                      interpret=interpret)
                    if engine == "pk" else
                    functools.partial(_build_batch_impl, ncap=ncap,
                                      r_max=r_max, l_max=l_max,
                                      engine="pallas", interpret=interpret))
            fn = shard_map(impl, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
            return jax.jit(fn)(*dev)
        # the requested kernel engine cannot shard this batch; make the
        # downgrade visible — a probe/bench run forcing the engine via
        # SVSCOPE_FUSED_ENGINE would otherwise silently measure 'xla'
        if _os.environ.get("SVSCOPE_FUSED_ENGINE"):
            raise RuntimeError(
                f"SVSCOPE_FUSED_ENGINE={engine!r} cannot run: batch {b} "
                f"does not divide mesh({n})*8; refusing to silently "
                "measure the 'xla' engine instead")
        log.info("fused build: %r engine needs batch %% (mesh*8) == 0 "
                 "(batch %d, mesh %d); using 'xla' for this chunk",
                 engine, b, n)
        engine = "xla"
    return _build_batch(*shard_batch((seqs_a, lens_a, nseq_a)),
                        ncap=ncap, r_max=r_max, l_max=l_max, engine=engine,
                        interpret=interpret)


def _bucket(x, ladder):
    for b in ladder:
        if x <= b:
            return b
    return None


def _emit_window(chars, group_min, n_nodes, path, order, back_buf,
                 back_start, fwd_buf, fwd_cnt, n_seqs: int):
    """(consensus, msa_rows) from one fetched window state (NumPy)."""
    n = int(n_nodes)
    if n == 0:
        return "", ["" for _ in range(n_seqs)]
    order_n = order[:n]
    gm_ord = group_min[order_n]
    uniq, first = np.unique(gm_ord, return_index=True)
    colrank = np.empty(len(uniq), np.int64)
    colrank[np.argsort(first, kind="stable")] = np.arange(len(uniq))
    col_of_gm = np.zeros(group_min.shape[0], np.int64)
    col_of_gm[uniq] = colrank
    ncol = len(uniq)
    rows = []
    for r in range(n_seqs):
        rowbuf = np.full(ncol, ord("-"), np.uint8)
        p = path[r]
        nodes = p[p >= 0]
        rowbuf[col_of_gm[group_min[nodes]]] = DECODE[chars[nodes]]
        rows.append(rowbuf.tobytes().decode())
    cons_nodes = np.concatenate([back_buf[int(back_start):],
                                 fwd_buf[:int(fwd_cnt)]])
    consensus = DECODE[chars[cons_nodes]].tobytes().decode()
    return consensus, rows


def _estimate_nodes(seqs: list[str]) -> int:
    """Bucket guess for the final node count: backbone plus headroom for
    per-read novel bases.  Overflow falls back to the host engine, so the
    guess only trades a rare re-run against padding waste."""
    lmax = max(len(s) for s in seqs)
    return lmax + max(32, lmax // 2) + 4 * len(seqs)


def fused_msa_batch(seq_lists: list[list[str]], max_batch: int | None = None):
    """spoa-equivalent poa(seqs, 1) over many windows with the whole MSA
    build on-device: 2 transfers per (bucket, chunk) instead of 2 per read
    round.  Returns [(consensus, msa_rows)] per window, identical to
    ops.poa.poa / the host C++ engine (tested)."""
    out: list = [None] * len(seq_lists)
    groups: dict[tuple[int, int, int], list[int]] = {}
    fallback: list[int] = []
    encoded: dict[int, list[np.ndarray]] = {}
    for i, seqs in enumerate(seq_lists):
        if not seqs or all(len(s) == 0 for s in seqs):
            out[i] = ("", ["" for _ in seqs])
            continue
        rb = _bucket(len(seqs), R_LADDER)
        lb = _bucket(max(len(s) for s in seqs), L_LADDER)
        nb = _bucket(_estimate_nodes(seqs), N_LADDER)
        if rb is None or lb is None or nb is None:
            fallback.append(i)
            continue
        codes = [CODE_OF[np.frombuffer(s.encode(), np.uint8)] for s in seqs]
        if any((c == 255).any() for c in codes):    # non-ACGTN base
            fallback.append(i)
            continue
        encoded[i] = codes
        groups.setdefault((rb, lb, nb), []).append(i)
    for (rb, lb, nb), idxs in groups.items():
        ncap = nb + 1
        bmem = max(8, H_BYTES_CAP // ((ncap + 1) * (lb + 1) * 4))
        # multiple of 8: the Pallas round packs 8 windows per grid step
        bcap = max(8, (min(max_batch or B_LADDER[-1], bmem) // 8) * 8)
        eng = (_os.environ.get("SVSCOPE_FUSED_ENGINE")
               or _pick_engine(ncap, lb))
        if eng == "pk" and rb > R_LADDER[0]:
            # cap the chunk so one device call stays well under ~30 s —
            # tunneled workers kill longer calls (observed: pre-sort-fix
            # 128-window calls crashed the worker).  At the post-fix rate
            # (~55 ms/window at production shapes, docs/PERF.md §9) a
            # 64-window call runs ~3.5 s.
            bcap = min(bcap, 64)
        for off in range(0, len(idxs), bcap):
            chunk = idxs[off:off + bcap]
            # multiple of 8 always (the Pallas round packs 8 windows per
            # grid step); chunks past B_LADDER[-1] round up, not truncate
            b_pad = _bucket(len(chunk), B_LADDER) or -(-len(chunk) // 8) * 8
            b_pad = min(b_pad, bcap) if b_pad > len(chunk) else b_pad
            seqs_a = np.zeros((b_pad, rb, lb), np.uint8)
            lens_a = np.zeros((b_pad, rb), np.int32)
            nseq_a = np.zeros(b_pad, np.int32)
            for bi, wi in enumerate(chunk):
                nseq_a[bi] = len(seq_lists[wi])
                for ri, c in enumerate(encoded[wi]):
                    seqs_a[bi, ri, :len(c)] = c
                    lens_a[bi, ri] = len(c)
            # one transfer; with a data mesh installed the window axis
            # shards across chips (windows independent -> SPMD; the xla
            # engine partitions under GSPMD, the pallas engine under
            # shard_map — see _dispatch_build)
            res = jax.device_get(_dispatch_build(
                seqs_a, lens_a, nseq_a, ncap=ncap, r_max=rb, l_max=lb))
            (chars, group_min, n_nodes, path, order, back_buf, back_start,
             fwd_buf, fwd_cnt, overflow) = res
            for bi, wi in enumerate(chunk):
                if overflow[bi]:
                    fallback.append(wi)
                    continue
                out[wi] = _emit_window(
                    chars[bi], group_min[bi], n_nodes[bi], path[bi],
                    order[bi], back_buf[bi], back_start[bi], fwd_buf[bi],
                    fwd_cnt[bi], len(seq_lists[wi]))
    if fallback:
        log.info("fused POA: %d/%d windows overflowed the device bucket; "
                 "host C++ fallback", len(fallback), len(seq_lists))
        if len(fallback) > 1:      # threaded host engine, like host mode
            from ..native.poa import poa_msa_batch_native
            for i, r in zip(fallback,
                            poa_msa_batch_native(
                                [seq_lists[i] for i in fallback])):
                out[i] = r
        else:
            from ..native.poa import poa_native
            out[fallback[0]] = poa_native(seq_lists[fallback[0]])
    return out
