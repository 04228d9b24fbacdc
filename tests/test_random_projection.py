"""JL sign random projection (operators/ann.random_projection)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.ann import jl_sign_matrix, random_projection


def test_matches_numpy_and_preserves_distances(spark):
    rng = np.random.default_rng(13)
    d, k, n = 64, 32, 40
    X = rng.normal(size=(n, d))
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, X))}),
        schema="vec_id long, embedding array<double>")
    rows = random_projection(emb, k=k).collect()
    Y = np.zeros((n, k))
    for r in rows:
        Y[r["id"], r["j"]] = r["v"]
    S = jl_sign_matrix(d, k)
    ref = (X @ S.T) / np.sqrt(k)
    assert np.abs(Y - np.round(ref, 6)).max() < 2e-6
    # JL property: squared pairwise distances preserved in expectation;
    # with k=32 the median distortion stays modest
    d0 = np.linalg.norm(X[:, None] - X[None, :], axis=2)[
        np.triu_indices(n, 1)]
    d1 = np.linalg.norm(Y[:, None] - Y[None, :], axis=2)[
        np.triu_indices(n, 1)]
    ratio = d1 / d0
    assert 0.8 < np.median(ratio) < 1.2
    assert (np.abs(ratio - 1) < 0.6).all()


def test_sign_matrix_deterministic():
    a = jl_sign_matrix(64, 16)
    b = jl_sign_matrix(64, 16)
    assert np.array_equal(a, b)
    assert set(np.unique(a)) == {-1.0, 1.0}
    # roughly balanced signs
    assert 0.4 < (a > 0).mean() < 0.6
