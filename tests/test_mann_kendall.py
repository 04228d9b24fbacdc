"""Mann-Kendall per-cell trend (operators/spatialstats.mann_kendall)."""

import math

import pandas as pd

from lib_gdal_spark.operators.spatialstats import mann_kendall


def mk_brute(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n) for j in range(i + 1, n)
    )
    ties = {}
    for v in xs:
        ties[v] = ties.get(v, 0) + 1
    tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    if var <= 0 or s == 0:
        return s, 0.0
    return s, (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var)


def _cells(spark, series):
    rows = []
    for (gx, gy), xs in series.items():
        for t, x in enumerate(xs):
            rows.append((gx, gy, t, x))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["gx", "gy", "tbin", "x"]))


def test_matches_bruteforce(spark):
    series = {
        (0, 0): [1, 2, 3, 4, 5, 6, 7, 8],          # strictly increasing
        (1, 0): [8, 7, 6, 5, 4, 3, 2, 1],          # strictly decreasing
        (2, 0): [5, 5, 5, 5, 5],                    # all tied
        (3, 0): [3, 1, 4, 1, 5, 9, 2, 6, 5, 3],     # noisy
        (4, 0): [2, 2, 3, 3, 4, 4, 5, 5],           # ties + trend
        (5, 0): [7],                                # single bin
    }
    got = {(r.gx, r.gy): r for r in mann_kendall(_cells(spark, series)).collect()}
    assert len(got) == len(series)
    for key, xs in series.items():
        s, z = mk_brute(xs)
        r = got[key]
        assert r.n_bins == len(xs)
        assert r.s == s, (key, r.s, s)
        assert abs(r.z - round(z, 8)) < 1e-12, (key, r.z, z)
    assert got[(0, 0)].trend == "increasing"
    assert got[(1, 0)].trend == "decreasing"
    assert got[(2, 0)].trend == "no_trend"
    assert got[(5, 0)].trend == "no_trend" and got[(5, 0)].s == 0


def test_missing_bins_use_present_count(spark):
    # bins need not be contiguous: n counts present rows only
    df = _cells(spark, {(0, 0): [1, 3]})
    df = df.union(df.sparkSession.createDataFrame(
        pd.DataFrame([(0, 0, 9, 5)], columns=["gx", "gy", "tbin", "x"])))
    r = mann_kendall(df).collect()[0]
    assert r.n_bins == 3 and r.s == 3
