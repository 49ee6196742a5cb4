"""Batched global-alignment statistics on device (MisScore kernel).

The AlnFeature stage's hot loop #5 is Biopython's global alignment over
somatic x germline consensus pairs (src/PairwiseCompare.py:19-30; SURVEY.md
§3).  MisScore needs (matches, align_len) of ONE optimal alignment under
the traceback preference diag > up > left — not just the score — so the
kernel forward-propagates the traceback choice: at every cell the
tie-break is decided locally (diagonal wins ties, then up, then left), and
(matches, len) accumulate along the chosen-predecessor chain.  This
reproduces ops/nw.nw_align_stats exactly (tested) without materializing H
or walking back.

Row recurrence (vectorized over the j axis, scanned over i):
  diag/up candidates -> in-row gap chain via associative cummax of
  (base[j] + j) -> selection flags -> left-run resolution with an
  index-cummax + gather (M/A copied from the run head).

Shipped as a jitted XLA kernel batched over padded pairs; the same body
runs as a Pallas kernel when ops/nw_pallas.py is available.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.jaxcfg import enable_cache

enable_cache()

from .nw import MATCH, MISMATCH, GAP

NEG = jnp.int32(-(2 ** 29))


def _row_scan(a_codes, b_codes, la, lb, l_max: int):
    """Stats for one pair; a (l_max,), b (l_max,) uint8; la/lb true lens."""
    j = jnp.arange(l_max + 1, dtype=jnp.int32)
    jvalid = j[1:] <= lb

    h0 = jnp.where(j <= lb, GAP * j, NEG).astype(jnp.int32)
    m0 = jnp.zeros(l_max + 1, jnp.int32)
    a0 = jnp.where(j <= lb, j, 0).astype(jnp.int32)

    def row(carry, i):
        H_p, M_p, A_p = carry
        ch = a_codes[i]
        valid_i = i < la
        sub = jnp.where(b_codes == ch, MATCH, MISMATCH).astype(jnp.int32)
        ismatch = (b_codes == ch).astype(jnp.int32)
        diag = jnp.where(jvalid, H_p[:-1] + sub, NEG)
        up = H_p[1:] + GAP
        base = jnp.maximum(diag, up)
        base_full = jnp.concatenate([(H_p[0] + GAP)[None], base])
        # H[j] = max(base_full[j], H[j-1] + GAP): cummax of base_full - GAP*j
        decay = GAP * j
        H = jax.lax.associative_scan(jnp.maximum, base_full - decay) + decay
        diag_sel = jnp.concatenate([jnp.array([False]),
                                    (H[1:] == diag) & jvalid])
        up_sel = jnp.concatenate([jnp.array([True]),
                                  (~diag_sel[1:]) & (H[1:] == up)])
        left_sel = ~(diag_sel | up_sel)
        # left runs copy (M, A) from the run head
        src = jnp.where(left_sel, jnp.int32(-1), j)
        head = jax.lax.associative_scan(jnp.maximum, src)
        M_cand = jnp.where(diag_sel,
                           jnp.concatenate([jnp.zeros(1, jnp.int32),
                                            M_p[:-1] + ismatch]),
                           M_p)  # up case: M_p[j]
        A_cand = jnp.where(diag_sel,
                           jnp.concatenate([jnp.zeros(1, jnp.int32),
                                            A_p[:-1] + 1]),
                           A_p + 1)
        M = M_cand[head]
        A = A_cand[head] + (j - head)
        H = jnp.where(valid_i, H, H_p)
        M = jnp.where(valid_i, M, M_p)
        A = jnp.where(valid_i, A, A_p)
        return (H, M, A), None

    (H, M, A), _ = jax.lax.scan(row, (h0, m0, a0),
                                jnp.arange(l_max, dtype=jnp.int32))
    return H[lb], M[lb], A[lb]


@functools.partial(jax.jit, static_argnames=("l_max",))
def nw_stats_batch(a_codes, b_codes, la, lb, l_max: int):
    """(scores, matches, align_lens) for padded pairs.

    a_codes/b_codes (B, l_max) uint8 ascii; la/lb (B,) true lengths."""
    return jax.vmap(_row_scan, in_axes=(0, 0, 0, 0, None))(
        a_codes, b_codes, la, lb, l_max)


def misscore_batch(pairs: list[tuple[str, str]], l_buckets=(128, 256, 512,
                                                            1024, 2048, 4096)):
    """MisScores for (som, germ) pairs via the device kernel; falls back to
    the host DP for oversized pairs."""
    from .nw import nw_align_stats
    out = np.zeros(len(pairs), np.int64)
    groups: dict[int, list[int]] = {}
    for i, (a, b) in enumerate(pairs):
        mx = max(len(a), len(b))
        lb = next((x for x in l_buckets if mx <= x), None)
        if lb is None:
            _, m, al = nw_align_stats(a, b)
            out[i] = al - m
        else:
            groups.setdefault(lb, []).append(i)
    for lbk, idxs in groups.items():
        B = len(idxs)
        ac = np.zeros((B, lbk), np.uint8)
        bc = np.zeros((B, lbk), np.uint8)
        la = np.zeros(B, np.int32)
        lbn = np.zeros(B, np.int32)
        for k, i in enumerate(idxs):
            a, b = pairs[i]
            ac[k, :len(a)] = np.frombuffer(a.encode(), np.uint8)
            bc[k, :len(b)] = np.frombuffer(b.encode(), np.uint8)
            la[k], lbn[k] = len(a), len(b)
        _s, m, al = nw_stats_batch(jnp.asarray(ac), jnp.asarray(bc),
                                   jnp.asarray(la), jnp.asarray(lbn), lbk)
        m = np.array(m)
        al = np.array(al)
        for k, i in enumerate(idxs):
            out[i] = int(al[k]) - int(m[k])
    return out
