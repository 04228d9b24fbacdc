"""Exact distributed quantiles: convention, duplicates, refinement."""

import math

from lib_gdal_spark.operators import quantiles as Q


def _disc(vals, q):
    """Type-1 discrete quantile (DuckDB quantile_disc)."""
    s = sorted(vals)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def _run(spark, vals, qs, **kw):
    d = spark.createDataFrame([(float(v),) for v in vals], "x double")
    return {r["q"]: r["value"]
            for r in Q.exact_quantiles(d, "x", qs, **kw).collect()}


def test_quantiles_match_reference_convention(spark):
    vals = [((i * 2654435761) % 100003) / 7.0 - 5000 for i in range(2000)]
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0]
    # final_limit=50 forces several refinement passes
    out = _run(spark, vals, qs, final_limit=50, buckets=64)
    for q in qs:
        assert out[q] == _disc(vals, q), q


def test_quantiles_massive_duplicates(spark):
    # 10k copies of 3 values: histogram cells stop shrinking -> exercises
    # the re-tighten path and the per-value terminal
    vals = [1.5] * 10000 + [2.5] * 10000 + [99.0] * 5
    out = _run(spark, vals, [0.25, 0.5, 0.75, 0.9999, 1.0],
               final_limit=10, buckets=16)
    vals_sorted_mid = _disc(vals, 0.5)   # k0 = 10002 -> the 2.5 block
    assert out[0.25] == 1.5 and out[0.5] == vals_sorted_mid == 2.5
    assert out[0.75] == 2.5 and out[1.0] == 99.0
    assert out[0.9999] == _disc(vals, 0.9999) == 99.0


def test_quantiles_with_nulls_and_constant(spark):
    d = spark.createDataFrame(
        [(None,), (4.25,), (None,), (4.25,)], "x double")
    out = {r["q"]: r["value"]
           for r in Q.exact_quantiles(d, "x", [0.5]).collect()}
    assert out[0.5] == 4.25
    empty = spark.createDataFrame([(None,)], "x double")
    row = Q.exact_quantiles(empty, "x", [0.5]).collect()[0]
    assert row["value"] is None


def test_quantiles_outlier_skew(spark):
    # one huge outlier makes the first histogram put ~everything in cell
    # 0 -> the selected cell shrinks by re-histogramming, still exact
    vals = [float(i % 97) for i in range(5000)] + [1e300]
    out = _run(spark, vals, [0.5, 1.0], final_limit=20, buckets=32)
    assert out[0.5] == _disc(vals, 0.5)
    assert out[1.0] == 1e300
