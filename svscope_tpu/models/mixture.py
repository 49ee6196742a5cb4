"""Categorical (multinomial) mixture model over the 5-letter MSA alphabet,
fit by EM with BIC model selection — the phasing core of the per-window
engine.

Re-designs reference src/ReadsCluster.py as batched, jittable JAX:
  * E-step (gamma_updating, src/ReadsCluster.py:132-155): per-column one-hot
    dot products against log-theta — a single (N, nf*5) @ (nf*5, K) matmul
    (MXU-friendly), followed by the reference's safe-exp reciprocal-sum
    normalization gamma_I = 1/sum_j exp(clip(M_j - M_I, -700, 700)).
  * M-step (pitheta_updating, :162-188): gamma^T one-hot counts; on a
    degenerate pi (pi*N < 1 or NaN) the parameters re-initialize to uniform
    pi + Dirichlet(1) theta (reference drew from the globally seeded numpy
    RNG; here a jax.random key is threaded per run — cluster-label parity is
    the contract, not bit-exact RNG streams).
  * EM (:190-209): hierarchical init -> E -> 20x(M -> E), no convergence
    test, per-step expected-complete log-likelihood (loglik, :104-122).
  * BIC (:211-219): 2*sum(lik) - n_theta*log(N) with the zero-count
    parameter correction (EMCluster, :225-234).
  * Model selection (EMCluster, :221-277): K in [1, min(9, N-1)], up to 5
    retries on NaN BIC, argmax BIC, and the K=1->2 tie-break when
    BIC_1 - BIC_2 <= nf*log(N).

All K runs execute in parallel (vmap over a padded K axis with cluster-slot
masks); windows batch over a leading axis with padded reads/features.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.cluster.hierarchy import linkage, fcluster

ALPHA = 5          # alphabet size {A,T,C,G,-}
MAX_K = 9          # reference max cluster count (src/ReadsCluster.py:221)
NSTEP = 20         # fixed EM iterations (src/ReadsCluster.py:190)
PAD_CODE = 5       # feature pad: one-hot(5, num_classes=5) == zeros
EPS = 1e-10
NEG_BIG = -1e30


# ---------------------------------------------------------------------------
# Hierarchical initialization (host side, tiny: N <= 500)
# ---------------------------------------------------------------------------

def pairwise_identity(seqdatamx: np.ndarray) -> np.ndarray:
    """Per-pair fraction of identical columns, diag=1.

    Mirrors CallDistance/pariwiseDistance (src/ReadsCluster.py:44-59): the
    value is a *similarity* though the reference names it a distance; the
    Ward init consumes the square matrix as an observation matrix — both
    quirks are replicated because they shape the initial clustering.
    """
    x = np.asarray(seqdatamx)
    nf = max(x.shape[1], 1)
    eq = (x[:, None, :] == x[None, :, :]).sum(axis=2) / nf
    out = eq.astype(np.float64)
    np.fill_diagonal(out, 1.0)
    return out


def ward_init_labels(seqdatamx: np.ndarray, kmax: int) -> np.ndarray:
    """(kmax, N) int labels in 0..K-1 for K = 1..kmax from Ward linkage.

    scipy.linkage receives the (N, N) similarity matrix as raw observations,
    exactly like the reference (src/ReadsCluster.py:242-243).
    """
    n = seqdatamx.shape[0]
    labels = np.zeros((kmax, n), np.int32)
    if n >= 2:
        sim = pairwise_identity(seqdatamx)
        Z = linkage(sim, "ward")
        for k in range(2, kmax + 1):
            if k > n:
                break
            labels[k - 1] = fcluster(Z, k, criterion="maxclust") - 1
    return labels


# ---------------------------------------------------------------------------
# Jitted EM core
# ---------------------------------------------------------------------------

def _m_step(gamma, x_oh, read_mask, n_true, nf, key, kmask):
    """pi/theta update with degenerate-pi Dirichlet re-init."""
    K = gamma.shape[1]
    gamma = gamma * read_mask[:, None]
    pi = gamma.sum(axis=0) / n_true
    counts = jnp.einsum("nk,nfa->kfa", gamma, x_oh)
    denom = gamma.sum(axis=0)[:, None, None]
    theta = counts / jnp.where(denom == 0, 1.0, denom)
    bad = (jnp.where(kmask, pi, 1.0) * n_true < 1).any() | jnp.isnan(pi).any()
    # Dirichlet(ones(5)) re-init, masked cluster slots excluded from `bad`
    gam = jax.random.gamma(key, jnp.ones((K, nf, ALPHA), dtype=gamma.dtype))
    dirich = gam / gam.sum(axis=-1, keepdims=True)
    pi = jnp.where(bad, jnp.full_like(pi, 1.0 / jnp.maximum(kmask.sum(), 1)), pi)
    theta = jnp.where(bad, dirich, theta)
    return pi, theta


def _e_step(pi, theta, x_flat, kmask):
    """Returns (gamma, margin_log) with the reference's reciprocal-sum."""
    theta_c = jnp.clip(theta, EPS, 1 - EPS)
    logt = jnp.log(theta_c).reshape(theta.shape[0], -1)  # (K, nf*5)
    M = x_flat @ logt.T  # (N, K)
    M = M + jnp.log(jnp.clip(pi, EPS, 1 - EPS))[None, :]
    M = jnp.where(kmask[None, :], M, NEG_BIG)
    diff = jnp.clip(M[:, :, None] - M[:, None, :], -700.0, 700.0)  # [n, j, I]
    denom = jnp.exp(diff).sum(axis=1)  # sum_j exp(M_j - M_I)
    gamma = 1.0 / denom
    gamma = jnp.where(kmask[None, :], gamma, 0.0)
    return gamma, M


def _loglik(pi, theta, gamma, x_oh, read_mask):
    """Expected complete-data log-lik per read (src/ReadsCluster.py:104-122)."""
    theta_c = jnp.clip(theta, EPS, 1 - EPS)
    per_k = jnp.einsum("nfa,kfa->nk", x_oh, jnp.log(theta_c))
    per_k = per_k + jnp.log(jnp.clip(pi, EPS, 1 - EPS))[None, :]
    lik = (per_k * gamma).sum(axis=1)
    return lik * read_mask


def em_run(x_oh, read_mask, gamma0, kmask, n_true, key, nsteps: int = NSTEP):
    """One EM run for one (window, K): init E-step then nsteps x (M, E).

    x_oh: (N, nf, 5) one-hot (pad rows/cols all-zero)
    gamma0: (N, Kmax) one-hot hard labels from Ward init
    kmask: (Kmax,) bool of active cluster slots
    Returns (pi, theta, gamma, lik_per_read).
    """
    nf = x_oh.shape[1]
    x_flat = x_oh.reshape(x_oh.shape[0], -1)
    keys = jax.random.split(key, nsteps + 1)
    pi0, theta0 = _m_step(gamma0, x_oh, read_mask, n_true, nf, keys[0], kmask)
    gamma, _ = _e_step(pi0, theta0, x_flat, kmask)

    def step(carry, k):
        gamma = carry
        pi, theta = _m_step(gamma, x_oh, read_mask, n_true, nf, k, kmask)
        gamma, _ = _e_step(pi, theta, x_flat, kmask)
        lik = _loglik(pi, theta, gamma * read_mask[:, None], x_oh, read_mask)
        return gamma, (pi, theta, lik)

    gamma, (pis, thetas, liks) = jax.lax.scan(step, gamma, keys[1:])
    return pis[-1], thetas[-1], gamma, liks[-1]


def _bic(lik_sum, n_true, nf_true, k, zero_param_num):
    n_theta = (k - 1) + k * nf_true * (ALPHA - 1) - zero_param_num
    return 2.0 * lik_sum - n_theta * jnp.log(n_true)


def _em_all_k_core(x_oh, read_mask, gamma0_all, kmask_all, n_true, nf_true,
                   zero_param_num, keys, nsteps: int = NSTEP):
    """vmap EM over the K axis for one window.

    gamma0_all: (MAX_K, N, MAX_K); kmask_all: (MAX_K, MAX_K); keys: (MAX_K,)
    Returns (bics, gammas, pis, thetas).
    """
    run = jax.vmap(lambda g0, km, key: em_run(x_oh, read_mask, g0, km,
                                              n_true, key, nsteps))
    pis, thetas, gammas, liks = run(gamma0_all, kmask_all, keys)
    ks = kmask_all.sum(axis=1)
    bics = jax.vmap(_bic, in_axes=(0, None, None, 0, None))(
        liks.sum(axis=1), n_true, nf_true, ks, zero_param_num)
    return bics, gammas, pis, thetas


_em_all_k = functools.partial(jax.jit, static_argnames=("nsteps",))(_em_all_k_core)

# batched over a leading window axis (windows padded to one shape bucket)
_em_all_k_batch = functools.partial(jax.jit, static_argnames=("nsteps",))(
    jax.vmap(_em_all_k_core, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)))


def zero_param_count(seqdatamx: np.ndarray) -> int:
    """Number of (symbol, column) cells with zero count
    (src/ReadsCluster.py:225-234)."""
    x = np.asarray(seqdatamx)
    counts = np.stack([(x == a).sum(axis=0) for a in range(ALPHA)])
    return int((counts == 0).sum())


def _bucket(x: int, ladder=(8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)):
    for b in ladder:
        if x <= b:
            return b
    return x


def _prepare_window(x: np.ndarray, max_c: int, n_pad: int, nf_pad: int):
    """Host-side prep of one window for the jitted EM: one-hot matrix,
    Ward-init hard assignments for every K, masks and counts."""
    n, nf = x.shape
    kmax_excl = min(max_c + 1, n)
    n_k = max(kmax_excl - 1, 1)
    hard = ward_init_labels(x, min(n_k, MAX_K))
    x_oh = np.zeros((n_pad, nf_pad, ALPHA), dtype=np.float64)
    valid = x < ALPHA
    idx = np.where(valid)
    x_oh[idx[0], idx[1], x[valid]] = 1.0
    gamma0_all = np.zeros((MAX_K, n_pad, MAX_K), np.float64)
    kmask_all = np.zeros((MAX_K, MAX_K), bool)
    for ki in range(n_k):
        kmask_all[ki, :ki + 1] = True
        gamma0_all[ki, np.arange(n), hard[ki]] = 1.0
    read_mask = np.zeros(n_pad, np.float64)
    read_mask[:n] = 1.0
    return x_oh, read_mask, gamma0_all, kmask_all, n_k, zero_param_count(x)


def _select_result(x, bics, gammas, pis, thetas, n_k):
    """BIC argmax + K=1->2 tie-break + slicing, shared by single/batch."""
    n, nf = x.shape
    bics = np.array(bics, np.float64)
    bics[n_k:] = np.nan
    sel = int(np.nanargmax(bics))
    k_sel = sel + 1
    if k_sel == 1 and n_k >= 2 and (bics[0] - bics[1] <= nf * np.log(n)):
        sel, k_sel = 1, 2
    gamma = np.array(gammas[sel], np.float64)[:n, :k_sel]
    theta = np.array(thetas[sel], np.float64)[:k_sel]
    pi = np.array(pis[sel], np.float64)[:k_sel]
    labels = np.argmax(gamma, axis=1)
    return [k_sel, x, labels, theta, gamma, pi, bics[:n_k]]


def em_cluster_batch(feats: list[np.ndarray], max_c: int = MAX_K,
                     seed: int = 2023, dtype=jnp.float32, nsteps: int = NSTEP):
    """Batched EMCluster over many windows.

    Windows are grouped into (reads, features) shape buckets; each bucket is
    one vmapped device call over (window, K, EM-scan) — the TPU throughput
    path for localGraph.  Per-window results are identical to em_cluster.
    """
    results: list = [None] * len(feats)
    groups: dict[tuple[int, int], list[int]] = {}
    for i, x in enumerate(feats):
        key = (_bucket(x.shape[0]), _bucket(x.shape[1]))
        groups.setdefault(key, []).append(i)
    base_key = jax.random.PRNGKey(seed)
    cast = lambda a: jnp.asarray(np.stack(a), dtype=dtype)
    for (n_pad, nf_pad), idxs in groups.items():
        xs, rms, g0s, kms, nks, zps, ns, nfs = [], [], [], [], [], [], [], []
        for i in idxs:
            x = np.asarray(feats[i])
            x_oh, rm, g0, km, n_k, zpn = _prepare_window(x, max_c, n_pad, nf_pad)
            xs.append(x_oh); rms.append(rm); g0s.append(g0); kms.append(km)
            nks.append(n_k); zps.append(float(zpn))
            ns.append(float(x.shape[0])); nfs.append(float(x.shape[1]))
        # same per-window key schedule as em_cluster (seed-deterministic and
        # independent of batch composition)
        one = jax.random.split(base_key, MAX_K)
        keys = jnp.broadcast_to(one, (len(idxs),) + one.shape)
        bics_b, gammas_b, pis_b, thetas_b = _em_all_k_batch(
            cast(xs), cast(rms), cast(g0s), jnp.asarray(np.stack(kms)),
            jnp.asarray(np.array(ns), dtype=dtype),
            jnp.asarray(np.array(nfs), dtype=dtype),
            jnp.asarray(np.array(zps), dtype=dtype), keys, nsteps)
        bics_b = np.array(bics_b)
        gammas_b = np.array(gammas_b)
        pis_b = np.array(pis_b)
        thetas_b = np.array(thetas_b)
        for bi, i in enumerate(idxs):
            results[i] = _select_result(np.asarray(feats[i]), bics_b[bi],
                                        gammas_b[bi], pis_b[bi], thetas_b[bi],
                                        nks[bi])
    return results


def em_cluster(seqdatamx: np.ndarray, max_c: int = MAX_K, seed: int = 2023,
               dtype=jnp.float32, nsteps: int = NSTEP, pad_shapes: bool = True):
    """EMCluster equivalent (src/ReadsCluster.py:221-277).

    Returns [K, seqdatamx, labels, theta, gamma, pi, bic_list] like the
    reference.  Host wrapper around the jitted all-K batch; the engine's
    batched path calls _em_all_k directly on padded window batches.

    pad_shapes: pad (reads, features) up to power-of-two buckets so the jit
    cache stays small across windows of varying size; padding is exact
    (masked rows, zero one-hots) — results are unchanged.
    """
    x = np.asarray(seqdatamx)
    n, nf = x.shape
    n_pad = _bucket(n) if pad_shapes else n
    nf_pad = _bucket(nf) if pad_shapes else nf
    x_oh, read_mask, gamma0_all, kmask_all, n_k, zpn = _prepare_window(
        x, max_c, n_pad, nf_pad)
    keys = jax.random.split(jax.random.PRNGKey(seed), MAX_K)
    cast = lambda a: jnp.asarray(a, dtype=dtype)
    bics, gammas, pis, thetas = _em_all_k(
        cast(x_oh), cast(read_mask), cast(gamma0_all),
        jnp.asarray(kmask_all), jnp.asarray(float(n), dtype=dtype),
        jnp.asarray(float(nf), dtype=dtype), jnp.asarray(float(zpn), dtype=dtype),
        keys, nsteps)
    return _select_result(x, np.array(bics), np.array(gammas), np.array(pis),
                          np.array(thetas), n_k)
