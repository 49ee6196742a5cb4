"""Pallas TPU kernel: batched POA graph-vs-sequence alignment.

The device half of the POA subsystem (SURVEY.md §2.3 row 1: spoa's per-
window partial-order alignment is the reference's #1 hot loop).  Same
recurrence, scoring and tie-breaks as ops/poa_device.align_batch (the pure
XLA aligner) and native/poa_engine.cpp — NW semantics, m=5 n=-4 g=-8,
diag > graph-gap > seq-gap traceback with predecessors in insertion order —
hand-lowered for the TPU:

  * 8 windows per grid step: every DP row update is an (8, L+1) VPU op —
    the *window* axis fills the sublanes, exactly the batching thesis of
    the TPU design (windows, not cores, are the parallel axis).
  * The full H matrix and a direction plane live in VMEM scratch
    ((N+1) x 8 x (L+1) int32 each) — the v5e has >100 MB VMEM, so graphs
    up to ~1500 nodes x 1024 bp reads fit without rematerialization.
  * The in-row gap chain H[i,j] = max(base[j], H[i,j-1]+g) is a prefix max
    of (base[j] - g*j) via log2(L) roll-and-max steps (no serial scan).
  * Chain rows (single predecessor == previous rank — the overwhelmingly
    common case in a POA graph of similar sequences) use the carried
    previous row; branch rows gather predecessor rows from the H scratch
    per window, gated by scalar chain flags (all-window flags prefetched
    to SMEM; per-window flags derived from the predecessor table).
  * Directions (pred-slot | move) are computed vectorially against the
    finished row, so traceback is a short data-dependent loop; Mosaic
    requires 128-aligned lane addressing, so traceback keeps the output
    rows in vector registers (masked-select writes) and extracts scalars
    by masked sums — no unaligned scalar memory ops anywhere.

Output convention matches align_batch: right-aligned (node_rank, seq_pos)
pairs with -1 for gaps, -2 padding, k_end pointing one before the first
entry, plus the best-sink score.  Parity: tests/test_poa_pallas.py runs
this kernel against the XLA aligner and the native engine on randomized
graphs (interpreter mode on CPU, compiled on TPU).
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
W = 8               # windows per grid step (sublane count, int32 tile)
W16 = 16            # windows per grid step for the int16 variant: int16
                    # tiles are (16, 128), so 16 sublanes must be filled
                    # for the halved vreg traffic to materialize
NEG16 = np.int16(-20000)   # int16 sentinel; legit scores are bounded by
                           # -8*(n_max + l_max) >= -16384 at the gated
                           # shapes (n_max, l_max <= 1024), so additions
                           # like NEG16 + GAP never wrap
MAX_PREDS = 8


# int16 lowering shims (round-5 verdict task 5).  Three distinct Mosaic/
# v5e limitations block the naive int16 kernel, each with a value-exact
# workaround:
#   1. "Rotate with non-32-bit data": widen to int32 ONLY for the rotate.
#   2. "Invalid relayout ... i1": masks must be BORN in the payload's
#      layout — int16 selects need masks from int16-typed comparisons.
#   3. "Target does not support this comparison": ordered int16 compares
#      (<, <=) don't lower; int16 == and max DO, so a<=b is rewritten as
#      max(a,b)==b (exact for integers).
# int32 operands keep the native ops throughout.

def _le(a, b):
    """a <= b with int16-lowerable ops (max+eq) when operands are int16."""
    if jnp.asarray(a).dtype == jnp.int16:
        return jnp.maximum(a, b) == b
    return a <= b


def _ge(a, b):
    if jnp.asarray(a).dtype == jnp.int16:
        return jnp.maximum(a, b) == a
    return a >= b


def _roll_right(v, s, fill):
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1).astype(v.dtype)
    if v.dtype == jnp.int16:
        r = pltpu.roll(v.astype(jnp.int32), s, axis=1).astype(jnp.int16)
    else:
        r = pltpu.roll(v, s, axis=1)
    return jnp.where(_ge(j, jnp.asarray(s, v.dtype)), r, fill)


def _prefix_max(v, neg=NEG):
    s = 1
    while s < v.shape[-1]:
        v = jnp.maximum(v, _roll_right(v, s, neg))
        s *= 2
    return v


def _exs(row, idx):
    """Scalar row[0, idx] via a masked lane sum (no unaligned scalar load)."""
    io = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.sum(jnp.where(io == idx, row, 0), dtype=row.dtype)


def _exw(col, w):
    """Scalar col[w, 0] from a (W, 1) value via a masked sublane sum."""
    io = jax.lax.broadcasted_iota(jnp.int32, col.shape, 0)
    return jnp.sum(jnp.where(io == w, col, 0), dtype=col.dtype)


def _poa_kernel(chars_ref, sinks_ref, preds_ref, seq_ref, lb_ref, nn_ref,
                chain_ref, an_ref, as_ref, ke_ref, sc_ref,
                h_s, d_s, *, n_max: int, l_max: int, out_len: int,
                chain_only: bool, wn: int = W, sdt=jnp.int32,
                neg=NEG):
    l1 = l_max + 1
    j = jax.lax.broadcasted_iota(jnp.int32, (wn, l1), 1)
    lb_v = jnp.stack([lb_ref[k, 0] for k in range(wn)]).reshape(wn, 1)
    nn_v = jnp.stack([nn_ref[k, 0] for k in range(wn)]).reshape(wn, 1)
    nn_max = jnp.max(nn_v)
    neg = jnp.asarray(neg, sdt)
    # sdt-typed twins of the masks' operands: i1 vectors must be BORN in
    # the payload layout (int16 relayout of an int32-born mask is
    # unimplemented in current Mosaic); identity casts for int32
    jm = j.astype(sdt)
    lb_m = lb_v.astype(sdt)
    nn_m = nn_v.astype(sdt)
    seq = seq_ref[:].astype(sdt)                      # (wn, l1), lane0 junk
    decay = (jnp.asarray(GAP, sdt) * jm)

    h0 = jnp.where(_le(jm, lb_m), decay, neg)
    h_s[0] = h0

    def preds_row(w, r):
        """(1, P) predecessor ranks of node rank r in window w.

        Host-side packing pads empty slots with slot 0's rank (see
        align_batch_pallas), so every slot is a valid gather — branch rows
        run 8 unconditional gathers instead of per-window lax.conds, and
        duplicate-slot matches are harmless because the direction loop
        processes slot 0 last (lowest slot always wins ties)."""
        return preds_ref[w, r, :].reshape(1, MAX_PREDS)

    def pred_h(pv, p, w):
        """(pred DP row, pred rank) for slot p from a (1, P) rank row."""
        pr = _exs(pv, p)
        prc = jnp.maximum(pr, -1) + 1
        v = h_s[pl.ds(prc, 1), pl.ds(w, 1), :].reshape(1, l1)
        return v, pr

    def row(i, carry):
        hprev, bval, brank = carry
        r = i - 1
        # per-row node char + sink flag: 2x8 scalar SMEM reads (the
        # previous (W, n_max) masked-sum formulation cost O(W*N) vector
        # work per row — O(W*N^2) over the kernel)
        ch = jnp.stack([chars_ref[k, r]
                        for k in range(wn)]).reshape(wn, 1).astype(sdt)
        snk = jnp.stack([sinks_ref[k, r]
                         for k in range(wn)]).reshape(wn, 1)
        sub = jnp.where(seq == ch, jnp.asarray(MATCH, sdt),
                        jnp.asarray(MISMATCH, sdt))   # (wn, l1)
        jvalid = _ge(jm, jnp.asarray(1, sdt)) & _le(jm, lb_m)
        node_ok = r < nn_v                            # (wn, 1), int32-born
        # sdt-born twin; int16 0-d scalars cannot be materialized by
        # Mosaic, so r is broadcast as an int32 ARRAY before the cast
        node_ok_m = _le(jnp.full((wn, 1), r, jnp.int32).astype(sdt),
                        nn_m - 1)

        def finish(mp):
            """(hrow, diag, up) from the max-plus predecessor row."""
            diag = jnp.where(jvalid, _roll_right(mp, 1, neg) + sub, neg)
            up = mp + jnp.asarray(GAP, sdt)
            base = jnp.where(jm == 0, up, jnp.maximum(diag, up))
            base = jnp.where(_le(jm, lb_m), base, neg)
            H = _prefix_max(base - decay, neg) + decay
            return jnp.where(node_ok_m, H, neg), diag, up

        # directions against the finished row: diag preds in order, then
        # graph-gap preds in order, then seq-gap (left) — the reference
        # tie-break (ops/poa.py, native/poa_engine.cpp traceback)
        def chain_path(_):
            hrow, diag, up = finish(hprev)
            diag_ok = (hrow == diag) & jvalid
            up_ok = hrow == up
            d16 = jnp.full((wn, l1), 16, sdt)
            return hrow, jnp.where(diag_ok, jnp.asarray(0, sdt),
                                   jnp.where(up_ok, jnp.asarray(8, sdt),
                                             d16))

        def branch_path(_):
            # ONE gather per (window, pred slot), reused by both the
            # max-plus recurrence and the direction pass.  Pad slots
            # duplicate slot 0 (host packing) so every gather is valid;
            # slot 0 is processed last in the direction merge, so
            # duplicate matches collapse to the lowest slot.
            pred_rows, accs = [], []
            for w in range(wn):
                pv = preds_row(w, r)
                rows_w = [pred_h(pv, p, w)[0] for p in range(MAX_PREDS)]
                acc = rows_w[0]
                for p in range(1, MAX_PREDS):
                    acc = jnp.maximum(acc, rows_w[p])
                pred_rows.append(rows_w)
                accs.append(acc)
            hrow, _diag, _up = finish(jnp.concatenate(accs, axis=0))
            dirs = []
            for w in range(wn):
                hw = hrow[w:w + 1, :]
                subw = sub[w:w + 1, :]
                jv = jvalid[w:w + 1, :]
                # first-matching diag and up slots tracked separately,
                # then merged by priority
                d_diag = jnp.full((1, l1), -1, sdt)
                d_up = jnp.full((1, l1), -1, sdt)
                for p in reversed(range(MAX_PREDS)):
                    v = pred_rows[w][p]
                    uok = hw == v + jnp.asarray(GAP, sdt)
                    dok = (hw == _roll_right(v, 1, neg) + subw) & jv
                    d_up = jnp.where(uok, jnp.asarray(8 + p, sdt), d_up)
                    d_diag = jnp.where(dok, jnp.asarray(p, sdt), d_diag)
                dirs.append(jnp.where(_ge(d_diag, jnp.asarray(0, sdt)),
                                      d_diag,
                                      jnp.where(_ge(d_up,
                                                    jnp.asarray(0, sdt)),
                                                d_up,
                                                jnp.asarray(16, sdt))))
            return hrow, jnp.concatenate(dirs, axis=0)

        if chain_only:
            # branch-free variant: the dispatcher proved every row of
            # every window in the batch is a chain row (round 1 of the
            # MSA build aligns against the linear backbone), so the whole
            # DP is carried-row NW — no cond, no gathers.
            hrow, dirrow = chain_path(0)
        else:
            hrow, dirrow = jax.lax.cond(chain_ref[0, 0, r] > 0,
                                        chain_path, branch_path, 0)

        h_s[pl.ds(i, 1)] = hrow.reshape(1, wn, l1)
        d_s[pl.ds(r, 1)] = dirrow.reshape(1, wn, l1)

        # best-sink tracking at column seq_len (strict > keeps the first
        # max — the XLA aligner's argmax tie-break in rank order)
        # Mosaic has no int16 reductions; the per-window end column is a
        # scalar anyway — mask in sdt layout, then reduce in int32
        endv = jnp.sum(jnp.where(jm == lb_m, hrow,
                                 jnp.asarray(0, sdt)).astype(jnp.int32),
                       axis=1, keepdims=True, dtype=jnp.int32)
        better = (snk > 0) & node_ok & (endv > bval)
        bval = jnp.where(better, endv, bval)
        brank = jnp.where(better, r, brank)
        return hrow, bval, brank

    bval0 = jnp.full((wn, 1), jnp.int32(neg), jnp.int32)
    brank0 = jnp.zeros((wn, 1), jnp.int32)
    _, bval, brank = jax.lax.fori_loop(
        jnp.int32(1), (nn_max + 1).astype(jnp.int32), row,
        (h0, bval0, brank0))

    # W-joint traceback: all 8 windows walk simultaneously — one
    # while_loop of max(path_len) steps with (W, .) vector state instead
    # of 8 sequential loops of ~N+L steps each (8x fewer iterations, and
    # every masked update fills all sublanes).  Finished windows freeze
    # via the `active` mask; their kv at freeze time is k_end.
    io_out = jax.lax.broadcasted_iota(jnp.int32, (wn, out_len), 1)
    jp = jax.lax.broadcasted_iota(jnp.int32, (wn, MAX_PREDS), 1)
    for w in range(wn):
        sc_ref[w, 0] = _exw(bval, w)

    def tb_cond(st):
        iv, jv, kv, _an, _as = st
        return ((jv > 0) & (kv >= 0)).any()

    def tb_body(st):
        iv, jv, kv, an, asx = st
        active = (jv > 0) & (kv >= 0)                    # (W, 1)
        rr = jnp.maximum(iv - 1, 0)                      # (W, 1)
        drows = jnp.concatenate(
            [d_s[pl.ds(_exw(rr, w), 1), pl.ds(w, 1), :].reshape(1, l1)
             for w in range(wn)], axis=0).astype(jnp.int32)  # (wn, l1)
        d = jnp.sum(jnp.where(j == jv, drows, 0),
                    axis=1, keepdims=True, dtype=jnp.int32)
        code = jnp.where(iv == 0, 16, d)                 # (W, 1)
        is_left = code == 16
        is_up = (code >= 8) & (code < 16)
        p = jnp.where(is_left, 0, code & 7)
        prows = jnp.concatenate(
            [preds_ref[w, _exw(rr, w), :].reshape(1, MAX_PREDS)
             for w in range(wn)], axis=0)                # (wn, P)
        pr = jnp.sum(jnp.where(jp == p, prows, 0), axis=1, keepdims=True,
                     dtype=jnp.int32)
        write = active & (io_out == kv)
        an = jnp.where(write, jnp.where(is_left, -1, iv - 1), an)
        asx = jnp.where(write, jnp.where(is_up, -1, jv - 1), asx)
        iv = jnp.where(active, jnp.where(is_left, iv, pr + 1), iv)
        jv = jnp.where(active, jnp.where(is_up, jv, jv - 1), jv)
        kv = jnp.where(active, kv - 1, kv)
        return (iv, jv, kv, an, asx)

    st0 = (brank + 1, lb_v, jnp.full((wn, 1), out_len - 1, jnp.int32),
           jnp.full((wn, out_len), -2, jnp.int32),
           jnp.full((wn, out_len), -2, jnp.int32))
    _, _, kv, an, asx = jax.lax.while_loop(tb_cond, tb_body, st0)
    an_ref[:] = an
    as_ref[:] = asx
    for w in range(wn):
        ke_ref[w, 0] = _exw(kv, w)


@functools.partial(jax.jit,
                   static_argnames=("n_max", "l_max", "interpret",
                                    "chain_only", "int16_mode"))
def _align_batch_padded(chars, sinks, preds, seqs_sh, lb, nn, chain,
                        n_max: int, l_max: int, interpret: bool = False,
                        chain_only: bool = False, int16_mode: bool = False):
    B = chars.shape[0]
    out_len = n_max + l_max
    l1 = l_max + 1
    # int16 variant: 16 windows per grid step fill the (16, 128) int16
    # tile, so every DP row op moves HALF the vregs of the int32 kernel.
    # Gated by the caller to n_max, l_max <= 1024 (score bounds).
    wn = W16 if int16_mode else W
    sdt = jnp.int16 if int16_mode else jnp.int32
    neg = NEG16 if int16_mode else NEG
    kernel = functools.partial(_poa_kernel, n_max=n_max, l_max=l_max,
                               out_len=out_len, chain_only=chain_only,
                               wn=wn, sdt=sdt, neg=neg)
    grid = (B // wn,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wn, n_max), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),        # chars (scalars)
            pl.BlockSpec((wn, n_max), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),        # sinks (scalars)
            pl.BlockSpec((wn, n_max, MAX_PREDS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # preds
            pl.BlockSpec((wn, l1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # seqs (shifted)
            pl.BlockSpec((wn, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),        # seq_len
            pl.BlockSpec((wn, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),        # n_nodes
            pl.BlockSpec((1, 1, n_max), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),        # chain (all-w)
        ],
        out_specs=[
            pl.BlockSpec((wn, out_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wn, out_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wn, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((wn, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_len), jnp.int32),   # aln_nodes
            jax.ShapeDtypeStruct((B, out_len), jnp.int32),   # aln_spos
            jax.ShapeDtypeStruct((B, 1), jnp.int32),         # k_end
            jax.ShapeDtypeStruct((B, 1), jnp.int32),         # score
        ],
        scratch_shapes=[
            pltpu.VMEM((n_max + 1, wn, l1), sdt),            # H
            pltpu.VMEM((n_max, wn, l1), sdt),                # directions
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(chars, sinks, preds, seqs_sh, lb, nn, chain)


def chain_flags(preds: np.ndarray, n_nodes: np.ndarray):
    """Per-window 'chain row' flags from packed preds.

    A rank r is a chain row in window w when its predecessor set is exactly
    {r-1} (or r == 0 with no predecessors, whose pred row is the virtual
    row), or the rank is past the window's node count."""
    B, N, P = preds.shape
    r = np.arange(N)[None, :]
    single = preds[:, :, 1] == -1
    first_prev = preds[:, :, 0] == r - 1
    root0 = (r == 0) & (preds[:, :, 0] == -1)
    inactive = r >= np.asarray(n_nodes).reshape(B, 1)
    return ((single & (first_prev | root0)) | inactive).astype(np.int32)


def align_batch_pallas(chars, preds, is_sink, n_nodes, seqs, seq_lens,
                       l_max: int, interpret: bool = False,
                       int16_mode: bool = False):
    """Drop-in for ops.poa_device.align_batch with the Pallas kernel.

    chars (B, N) uint8; preds (B, N, P<=8) int32; is_sink (B, N) bool;
    n_nodes (B,); seqs (B, L) uint8; seq_lens (B,).
    int16_mode: run the (16, 128)-tile int16 variant — half the vreg
    traffic per DP row op; requires N, l_max <= 1024 so scores stay
    within the NEG16 sentinel bound.
    Returns (aln_nodes, aln_spos, k_end, score) — k_end/score shaped (B,)."""
    chars = np.asarray(chars)
    preds = np.asarray(preds, np.int32)
    B, N = chars.shape
    if int16_mode and (N > 1024 or l_max > 1024):
        raise ValueError(f"int16 mode needs N, l_max <= 1024 "
                         f"(got {N}, {l_max})")
    wn = W16 if int16_mode else W
    if preds.shape[2] < MAX_PREDS:
        preds = np.concatenate(
            [preds, np.full((B, N, MAX_PREDS - preds.shape[2]), -1,
                            np.int32)], axis=2)
    elif preds.shape[2] > MAX_PREDS:
        raise ValueError(f"in-degree bucket {preds.shape[2]} > {MAX_PREDS}")
    pad = (-B) % wn
    if pad:
        rep = lambda x: np.concatenate([x] + [x[:1]] * pad, axis=0)
        chars, preds = rep(chars), rep(preds)
        is_sink, n_nodes = rep(np.asarray(is_sink)), rep(np.asarray(n_nodes))
        seqs, seq_lens = rep(np.asarray(seqs)), rep(np.asarray(seq_lens))
    Bp = chars.shape[0]
    seqs_sh = np.full((Bp, l_max + 1), 255, np.int32)
    seqs_sh[:, 1:np.asarray(seqs).shape[1] + 1] = seqs
    nn = np.asarray(n_nodes, np.int32).reshape(Bp, 1)
    lb = np.asarray(seq_lens, np.int32).reshape(Bp, 1)
    chainw = chain_flags(preds, nn)
    chain_all = (chainw.reshape(Bp // wn, wn, N).all(axis=1)
                 .astype(np.int32).reshape(Bp // wn, 1, N))
    # after chain detection: pad empty slots with slot 0's rank so branch
    # rows gather unconditionally (duplicate matches collapse to slot 0)
    preds = np.where(preds < 0, preds[:, :, :1], preds)
    chain_only = bool(chainw.all())
    host = (chars.astype(np.int32), np.asarray(is_sink).astype(np.int32),
            preds, seqs_sh, lb, nn, chain_all)
    from ..parallel.dataparallel import data_mesh
    mesh, axis = data_mesh()
    if mesh is not None and Bp % (int(mesh.shape[axis]) * wn) == 0:
        # data-parallel across chips: each device runs the kernel on its
        # local W-multiple slice of the window batch (shard_map — a Pallas
        # grid cannot be auto-partitioned by sharded inputs alone)
        from jax.sharding import NamedSharding, PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:                      # pragma: no cover
            from jax.experimental.shard_map import shard_map
        specs = tuple(P(axis, *([None] * (a.ndim - 1))) for a in host)
        dev = jax.device_put(host, tuple(NamedSharding(mesh, s)
                                         for s in specs))
        fn = shard_map(
            functools.partial(_align_batch_padded, n_max=N, l_max=l_max,
                              interpret=interpret, chain_only=chain_only,
                              int16_mode=int16_mode),
            mesh=mesh, in_specs=specs,
            out_specs=tuple(P(axis, None) for _ in range(4)),
            check_vma=False)   # pallas_call out_shapes carry no vma info
        an, asp, ke, sc = fn(*dev)
    else:
        dev = jax.device_put(host)               # 1 transfer
        an, asp, ke, sc = _align_batch_padded(*dev, N, l_max, interpret,
                                              chain_only, int16_mode)
    return an[:B], asp[:B], ke[:B, 0], sc[:B, 0]
