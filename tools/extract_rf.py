"""Extract the reference's frozen random-forest confidence model into
flattened arrays.

The artifact RandomForest.1218.WholeData8-2.FinalModel.joblib (reference
src/SVscope.py:309-313) is a sklearn-1.0.2 RandomForestClassifier whose
pickled Tree dtype is incompatible with the installed sklearn; we intercept
the Tree construction during unpickling and capture the raw node arrays
(left/right children, split feature, threshold, leaf class counts) — the
learned parameters, which models/forest.py traverses as a vectorized XLA
gather loop.

Usage: python tools/extract_rf.py [joblib_path] [out_npz]
"""
from __future__ import annotations

import sys
import warnings

import numpy as np

DEFAULT_SRC = ("/root/reference/src/"
               "RandomForest.1218.WholeData8-2.FinalModel.joblib")
DEFAULT_OUT = "svscope_tpu/models/rf_artifact.npz"

FEATURES = ["COV_Tumor", "mapQ_Tumor", "COV_Normal", "mapQ_Normal",
            "ABSMisScore", "chromSpan_Tumor", "chromSpan_Normal",
            "AdaptRatio_T", "AdaptRatio_N", "SupportReadSpanRatio"]


class _TreeStub:
    def __init__(self, *a):
        pass

    def __setstate__(self, state):
        self.state = state


def extract(src: str = DEFAULT_SRC, out: str = DEFAULT_OUT) -> str:
    import joblib
    import joblib.numpy_pickle as jnp_

    orig = jnp_.NumpyUnpickler.find_class

    def find_class(self, module, name):
        if module == "sklearn.tree._tree" and name == "Tree":
            return _TreeStub
        return orig(self, module, name)

    jnp_.NumpyUnpickler.find_class = find_class
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            model = joblib.load(src)
    finally:
        jnp_.NumpyUnpickler.find_class = orig
    d = model.__dict__
    arrays = {}
    n_trees = len(d["estimators_"])
    for i, est in enumerate(d["estimators_"]):
        st = est.tree_.state
        nodes = st["nodes"]
        arrays[f"t{i}_left"] = nodes["left_child"].astype(np.int32)
        arrays[f"t{i}_right"] = nodes["right_child"].astype(np.int32)
        arrays[f"t{i}_feature"] = nodes["feature"].astype(np.int32)
        arrays[f"t{i}_threshold"] = nodes["threshold"].astype(np.float64)
        # (n_nodes, 1, n_classes) class counts at each node
        arrays[f"t{i}_value"] = st["values"].astype(np.float64)[:, 0, :]
    arrays["n_trees"] = np.array(n_trees)
    arrays["classes"] = np.asarray(d["classes_"])
    arrays["feature_names"] = np.array(FEATURES)
    np.savez_compressed(out, **arrays)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    print(extract(src, out))
