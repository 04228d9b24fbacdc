"""Theil-Sen median slope (operators/spatialstats.theil_sen)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.spatialstats import theil_sen


def _cells(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["gx", "gy", "tbin", "x"]),
        schema="gx int, gy int, tbin int, x long")


def test_linear_series_recovers_slope(spark):
    rows = [(0, 0, t, 3 * t + 7) for t in range(1, 11)]
    got = theil_sen(_cells(spark, rows)).first()
    assert got["n_bins"] == 10 and got["n_pairs"] == 45
    assert abs(got["slope"] - 3.0) < 1e-12


def test_outlier_robust_and_matches_numpy(spark):
    rng = np.random.default_rng(41)
    rows = []
    for cell in range(4):
        xs = [2 * t + int(rng.integers(-3, 4)) for t in range(12)]
        xs[5] = 500  # gross outlier
        rows += [(cell, 0, t + 1, xs[t]) for t in range(12)]
    got = {(r["gx"], r["gy"]): r["slope"]
           for r in theil_sen(_cells(spark, rows)).collect()}
    for cell in range(4):
        sub = [(t, x) for g, _, t, x in rows if g == cell]
        slopes = sorted((xj - xi) / (tj - ti)
                        for i, (ti, xi) in enumerate(sub)
                        for tj, xj in sub[i + 1:])
        m = len(slopes)
        ref = (slopes[m // 2] if m % 2 else
               (slopes[m // 2 - 1] + slopes[m // 2]) / 2)
        assert abs(got[(cell, 0)] - ref) < 1e-9
        assert abs(got[(cell, 0)] - 2.0) < 1.0  # outlier shrugged off
