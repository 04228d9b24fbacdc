"""PCA power iteration vs a local NumPy replica (exact same FLOP
order) and vs numpy.linalg.eigh (approximate agreement on the dominant
eigenpair)."""

import numpy as np

from lib_gdal_spark.operators.pca import pca_top_component, text_features
from lib_gdal_spark.session import local_df

TEXTS = [
    "The quick brown Fox JUMPED over 42 lazy dogs, obviously!",
    "data data data 123 456 789 DATA.",
    "a tiny e-less text?!",
    "Everything everywhere, all else being equal; sevenexes: eeee.",
    "MiXeD CaSe with Punctuation... and spaces   here.",
    "plain words only here nothing special",
] * 5


def _docs(spark):
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    return local_df(spark, rows, "doc_id long, text string")


def _feat_local(t):
    import re
    return [len(t),
            len(t) - len(t.replace(" ", "")),
            len(re.findall(r"[0-9]", t)),
            len(re.findall(r"[A-Z]", t)),
            len(re.findall(r"[.,!?;:]", t)),
            len(t) - len(t.replace("e", ""))]


def test_features_match_local(spark):
    got = {r["doc_id"]: [r[f"f{i}"] for i in range(1, 7)]
           for r in text_features(_docs(spark)).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _feat_local(t), t


def _cov_int(fm):
    n = fm.shape[0]
    s = fm.sum(axis=0)
    q = fm.T @ fm
    return n * q - np.outer(s, s)


def test_power_iteration_flop_replica(spark):
    r = pca_top_component(_docs(spark), iters=24).first()
    fm = np.array([_feat_local(t) for t in TEXTS], dtype=np.int64)
    c = _cov_int(fm).astype(np.float64)
    v = np.ones(6)
    for _ in range(24):
        # same left-to-right fold as the Spark expression
        w = np.array([sum(c[a][b] * v[b] for b in range(6))
                      for a in range(6)])
        nrm = 0.0
        for a in range(6):
            nrm = nrm + w[a] * w[a]
        nrm = np.sqrt(nrm)
        v = w / nrm
    assert r["eig"] == nrm
    for a in range(6):
        assert r[f"v{a + 1}"] == v[a]


def test_agrees_with_eigh(spark):
    r = pca_top_component(_docs(spark), iters=24).first()
    fm = np.array([_feat_local(t) for t in TEXTS], dtype=np.float64)
    c = _cov_int(np.array([_feat_local(t) for t in TEXTS],
                          dtype=np.int64)).astype(np.float64)
    evals, evecs = np.linalg.eigh(c)
    lam, vec = evals[-1], evecs[:, -1]
    if vec.sum() < 0:
        vec = -vec
    assert abs(r["eig"] - lam) / lam < 1e-6
    got = np.array([r[f"v{a}"] for a in range(1, 7)])
    assert np.allclose(got, vec, atol=1e-5)
    # explained ratio is a sane fraction of total variance
    assert 0.3 < r["explained"] <= 1.0
