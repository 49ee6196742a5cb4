"""Random-forest confidence filter as vectorized XLA tree traversal.

The reference loads a frozen sklearn RandomForestClassifier and calls
predict_proba/predict on the 10-feature window table
(src/SVscope.py:309-315).  Here the 10 trees live as flattened arrays
(children, split feature, threshold, leaf class counts — extracted by
tools/extract_rf.py) padded to a common node count, and prediction is a
fixed-depth gather loop vmapped over (tree, sample): each step moves every
cursor one level down; leaves self-loop, so `max_depth` iterations suffice.
This runs entirely on device — no sklearn in the serving path.

predict_proba parity with sklearn is exact: per-tree leaf class counts are
normalized then averaged (tested against a freshly trained forest in
tests/test_forest.py).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

ARTIFACT = os.path.join(os.path.dirname(__file__), "rf_artifact.npz")


class Forest:
    def __init__(self, left, right, feature, threshold, value, classes,
                 feature_names=None):
        # all padded to (n_trees, max_nodes)
        self.left = left
        self.right = right
        self.feature = feature
        self.threshold = threshold
        self.value = value  # (n_trees, max_nodes, n_classes)
        self.classes = classes
        self.feature_names = feature_names
        self.max_depth = int(_forest_depth(left, right))

    @classmethod
    def from_npz(cls, path: str = ARTIFACT) -> "Forest":
        z = np.load(path, allow_pickle=False)
        n = int(z["n_trees"])
        counts = [len(z[f"t{i}_left"]) for i in range(n)]
        mx = max(counts)
        left = np.full((n, mx), -1, np.int32)
        right = np.full((n, mx), -1, np.int32)
        feat = np.full((n, mx), -2, np.int32)
        thr = np.zeros((n, mx), np.float64)
        val = np.zeros((n, mx, z["t0_value"].shape[-1]), np.float64)
        for i in range(n):
            c = counts[i]
            left[i, :c] = z[f"t{i}_left"]
            right[i, :c] = z[f"t{i}_right"]
            feat[i, :c] = z[f"t{i}_feature"]
            thr[i, :c] = z[f"t{i}_threshold"]
            val[i, :c] = z[f"t{i}_value"]
        names = None
        if "feature_names" in z.files:
            names = [str(x) for x in z["feature_names"]]
        return cls(left, right, feat, thr, val, np.asarray(z["classes"]), names)

    @classmethod
    def from_sklearn(cls, model) -> "Forest":
        trees = [e.tree_ for e in model.estimators_]
        mx = max(t.node_count for t in trees)
        n = len(trees)
        ncls = model.n_classes_
        left = np.full((n, mx), -1, np.int32)
        right = np.full((n, mx), -1, np.int32)
        feat = np.full((n, mx), -2, np.int32)
        thr = np.zeros((n, mx), np.float64)
        val = np.zeros((n, mx, ncls), np.float64)
        for i, t in enumerate(trees):
            c = t.node_count
            left[i, :c] = t.children_left
            right[i, :c] = t.children_right
            feat[i, :c] = t.feature
            thr[i, :c] = t.threshold
            val[i, :c] = t.value[:, 0, :]
        return cls(left, right, feat, thr, val, np.asarray(model.classes_))

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        if getattr(self, "_dev", None) is None:
            # one batched transfer, cached: per-array puts each pay a
            # device round trip
            self._dev = jax.device_put((self.left, self.right, self.feature,
                                        self.threshold, self.value))
        probs = _forest_proba(*self._dev, jnp.asarray(X), self.max_depth)
        return np.asarray(probs)

    def predict(self, X: np.ndarray) -> np.ndarray:
        proba = self.predict_proba(X)
        return self.classes[np.argmax(proba, axis=1)]


def _forest_depth(left, right) -> int:
    depth = 0
    for t in range(left.shape[0]):
        def rec(node, d):
            if node < 0 or left[t][node] < 0:
                return d
            return max(rec(left[t][node], d + 1), rec(right[t][node], d + 1))
        depth = max(depth, rec(0, 0))
    return depth


@functools.partial(jax.jit, static_argnames=("max_depth",))
def _forest_proba(left, right, feature, threshold, value, X, max_depth: int):
    n_trees = left.shape[0]

    def one_tree(tl, tr, tf, tt, tv, x):
        def step(node, _):
            leaf = tl[node] < 0
            f = jnp.maximum(tf[node], 0)
            go_left = x[f] <= tt[node]
            nxt = jnp.where(leaf, node, jnp.where(go_left, tl[node], tr[node]))
            return nxt, None
        node, _ = jax.lax.scan(step, jnp.int32(0), None, length=max_depth)
        counts = tv[node]
        return counts / counts.sum()

    per_sample = jax.vmap(
        lambda x: jax.vmap(one_tree, in_axes=(0, 0, 0, 0, 0, None))(
            left, right, feature, threshold, value, x).mean(axis=0))
    return per_sample(X)
