"""Pallas TPU kernel: batched global-alignment statistics.

Same recurrence and outputs as ops/nw_batch (score, matches, align_len
under the diag > up > left traceback preference), hand-lowered for the
TPU vector unit:

  * 8 pairs per grid step — every row update is an (8, L) VPU op
  * DP rows live in VMEM scratch across the row loop
  * the in-row gap chain H[j] = max(base[j], H[j-1]+GAP) is a prefix max
    of (base[j] - GAP*j) via log2(L) roll-and-max steps
  * left-run propagation of (matches, align_len) is a gather-free
    "last-set-wins" prefix scan (same log-step rolls)

No lane-crossing gathers, no transposes — the whole row update stays on
the VPU; parity with the host DP is exact (tests/test_nw_kernels.py).
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

from .nw import GAP, MATCH, MISMATCH

NEG = np.int32(-(2 ** 29))
SUBBLOCK = 8   # pairs per grid step


def _roll_right(v, s, fill):
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(j >= s, pltpu.roll(v, s, axis=1), fill)


def _prefix_max(v):
    s = 1
    while s < v.shape[-1]:
        v = jnp.maximum(v, _roll_right(v, s, NEG))
        s *= 2
    return v


def _last_set_scan(val, is_set):
    s = 1
    while s < val.shape[-1]:
        val = jnp.where(is_set > 0, val, _roll_right(val, s, 0))
        is_set = jnp.maximum(is_set, _roll_right(is_set, s, 0))
        s *= 2
    return val


def _nw_kernel(a_ref, b_ref, la_ref, lb_ref, score_ref, m_ref, al_ref,
               h_s, m_s, a_s, l_max: int):
    l1 = l_max + 1
    j = jax.lax.broadcasted_iota(jnp.int32, (SUBBLOCK, l1), 1)
    jb = jax.lax.broadcasted_iota(jnp.int32, (SUBBLOCK, l_max), 1)
    la_v = jnp.stack([la_ref[k, 0] for k in range(SUBBLOCK)]
                     ).reshape(SUBBLOCK, 1)
    lb_v = jnp.stack([lb_ref[k, 0] for k in range(SUBBLOCK)]
                     ).reshape(SUBBLOCK, 1)
    b = b_ref[:]
    zcol = jnp.zeros((SUBBLOCK, 1), jnp.int32)

    h_s[:] = jnp.where(j <= lb_v, GAP * j, NEG)
    m_s[:] = jnp.zeros((SUBBLOCK, l1), jnp.int32)
    a_s[:] = jnp.where(j <= lb_v, j, 0)

    def row(i, _):
        H_p = h_s[:]
        M_p = m_s[:]
        A_p = a_s[:]
        ch = jnp.sum(a_ref[:] * (jb == i).astype(jnp.int32), axis=1,
                     keepdims=True)                     # (8, 1)
        ismatch_b = (b == ch).astype(jnp.int32)         # (8, l_max)
        sub_b = jnp.where(ismatch_b > 0, MATCH, MISMATCH)
        Hp_shift = _roll_right(H_p, 1, NEG)
        sub = jnp.concatenate([zcol, sub_b], axis=1)
        ismatch = jnp.concatenate([zcol, ismatch_b], axis=1)
        jvalid = (j >= 1) & (j <= lb_v)
        diag = jnp.where(jvalid, Hp_shift + sub, NEG)
        up = H_p + GAP
        base = jnp.where(j == 0, up, jnp.maximum(diag, up))
        decay = GAP * j
        H = _prefix_max(base - decay) + decay
        diag_sel = (H == diag) & jvalid
        up_sel = ((~diag_sel) & (H == up)) | (j == 0)
        nonleft = diag_sel | up_sel
        M_cand = jnp.where(diag_sel, _roll_right(M_p, 1, 0) + ismatch, M_p)
        A_cand = jnp.where(diag_sel, _roll_right(A_p, 1, 0) + 1, A_p + 1)
        nl = nonleft.astype(jnp.int32)
        M = _last_set_scan(jnp.where(nonleft, M_cand, 0), nl)
        A = _last_set_scan(jnp.where(nonleft, A_cand - j, 0), nl) + j
        ok = i < la_v
        h_s[:] = jnp.where(ok, H, H_p)
        m_s[:] = jnp.where(ok, M, M_p)
        a_s[:] = jnp.where(ok, A, A_p)
        return 0

    jax.lax.fori_loop(0, l_max, row, 0)
    sel = (j == lb_v).astype(jnp.int32)
    h_at = jnp.sum(h_s[:] * sel, axis=1)
    m_at = jnp.sum(m_s[:] * sel, axis=1)
    a_at = jnp.sum(a_s[:] * sel, axis=1)
    for k in range(SUBBLOCK):
        score_ref[k, 0] = h_at[k]
        m_ref[k, 0] = m_at[k]
        al_ref[k, 0] = a_at[k]


@functools.partial(jax.jit, static_argnames=("l_max", "interpret"))
def _nw_stats_pallas_padded(a_codes, b_codes, la, lb, l_max: int,
                            interpret: bool = False):
    B = a_codes.shape[0]
    l1 = l_max + 1
    kernel = functools.partial(_nw_kernel, l_max=l_max)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B // SUBBLOCK,),
        in_specs=[
            pl.BlockSpec((SUBBLOCK, l_max), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBBLOCK, l_max), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBBLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBBLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBBLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBBLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBBLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUBBLOCK, l1), jnp.int32),
            pltpu.VMEM((SUBBLOCK, l1), jnp.int32),
            pltpu.VMEM((SUBBLOCK, l1), jnp.int32),
        ],
    )(a_codes.astype(jnp.int32), b_codes.astype(jnp.int32),
      la.astype(jnp.int32).reshape(-1, 1), lb.astype(jnp.int32).reshape(-1, 1))


def nw_stats_pallas(a_codes, b_codes, la, lb, l_max: int,
                    interpret: bool = False):
    """(scores, matches, align_lens) for padded pairs via the Pallas
    kernel; the batch is padded up to a multiple of 8 pairs.  interpret=True
    runs the kernel body under the Pallas interpreter (CPU CI parity).

    Mosaic compile time grows sharply with l_max on the tunneled backend
    (L=128 ~1 min, cached on disk afterwards; L=512 pathological), so the
    kernel is capped at L<=256 — ops/nw_batch covers longer pairs."""
    if l_max > 256:
        raise ValueError("nw_stats_pallas supports l_max <= 256; use "
                         "ops.nw_batch.nw_stats_batch for longer pairs")
    B = int(a_codes.shape[0])
    pad = (-B) % SUBBLOCK
    if pad:
        rep = lambda x: jnp.concatenate(
            [jnp.asarray(x)] + [jnp.asarray(x[:1])] * pad, axis=0)
        a_codes, b_codes = rep(a_codes), rep(b_codes)
        la, lb = rep(la), rep(lb)
    s, m, al = _nw_stats_pallas_padded(jnp.asarray(a_codes),
                                       jnp.asarray(b_codes),
                                       jnp.asarray(la), jnp.asarray(lb),
                                       l_max, interpret)
    return s[:B, 0], m[:B, 0], al[:B, 0]
