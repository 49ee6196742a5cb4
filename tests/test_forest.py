import numpy as np
import pytest

from svscope_tpu.models.forest import Forest


def test_matches_sklearn_predict_proba():
    from sklearn.ensemble import RandomForestClassifier
    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 10))
    y = (X[:, 0] + X[:, 3] * 0.5 + rng.normal(0, 0.3, 300)) > 0
    m = RandomForestClassifier(n_estimators=10, criterion="entropy",
                               max_depth=32, min_samples_split=64,
                               min_samples_leaf=8, max_features="log2",
                               random_state=42).fit(X, y)
    f = Forest.from_sklearn(m)
    Xt = rng.normal(size=(50, 10))
    np.testing.assert_allclose(f.predict_proba(Xt), m.predict_proba(Xt),
                               atol=1e-12)
    assert (f.predict(Xt) == m.predict(Xt)).all()


def test_frozen_artifact_loads():
    f = Forest.from_npz()
    assert f.left.shape[0] == 10       # 10 trees (src/SVscope.py RF params)
    assert list(f.classes) == [False, True]
    assert f.feature_names[0] == "COV_Tumor"
    assert f.feature_names[-1] == "SupportReadSpanRatio"
    X = np.array([[1.0, 0.1, 1.0, 0.1, 60.0, 0.0, 0.0, 0.9, 0.9, 0.0],
                  [-5.0, 0.9, -5.0, 0.9, 3.0, 0.8, 0.8, 0.05, 0.05, 0.9]])
    p = f.predict_proba(X)
    assert p.shape == (2, 2)
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-9)
    np.testing.assert_allclose(f.predict_proba(X), p, atol=0)  # deterministic
    assert set(f.predict(X)) <= {False, True}
