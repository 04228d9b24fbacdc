"""Hilbert-curve clustering keys (functions/cells.py)."""

import numpy as np

from lib_gdal_spark.functions.cells import (
    hilbert_d2xy, hilbert_xy2d, with_hilbert,
)
from lib_gdal_spark.session import local_df


def test_bijection_and_adjacency():
    order = 7
    n = 1 << order
    d = np.arange(n * n, dtype=np.int64)
    x, y = hilbert_d2xy(d, order)
    assert np.array_equal(hilbert_xy2d(x, y, order), d)
    # the Hilbert property: every curve step is grid-adjacent
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()


def test_locality_beats_zorder():
    """Mean |key delta| between grid neighbors is finite and small for
    Hilbert (adjacent cells share long key prefixes more often)."""
    order = 6
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    h = hilbert_xy2d(gx.ravel(), gy.ravel(), order).reshape(n, n)
    dh = np.abs(np.diff(h, axis=1)).mean()
    assert dh < n * n / 8  # z-order's mean row-neighbor jump is ~n^2/4


def test_with_hilbert_dataframe(spark):
    df = local_df(spark, [(0.0, 0.0), (0.001, 0.0), (120.0, 45.0)],
                  "lon string, lat string").selectExpr(
        "cast(lon as double) lon", "cast(lat as double) lat")
    rows = with_hilbert(df, order=12).collect()
    keys = [r["hkey"] for r in rows]
    assert len(set(keys)) >= 2 and all(k >= 0 for k in keys)
    # near-identical points get near keys
    assert abs(keys[0] - keys[1]) < 1000
