"""Jenks natural breaks (operators/stats.jenks_breaks)."""

import itertools

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.stats import jenks_breaks
from lib_gdal_spark.sources import rasters as RS


def _tiles(spark, arr):
    h, w = arr.shape
    rows = RS.tiles_from_array("t", arr.astype(float),
                               (0, 1, 0, h, 0, -1), tile=16)
    return spark.createDataFrame(pd.DataFrame(rows),
                                 schema=RS.RASTER_SCHEMA)


def _brute_best(values_counts, k):
    vals = sorted(values_counts)
    n = len(vals)

    def sse(seg):
        tot = sum(values_counts[v] for v in seg)
        s = sum(v * values_counts[v] for v in seg)
        s2 = sum(v * v * values_counts[v] for v in seg)
        return float(s2) - (float(s) * float(s)) / float(tot)

    best = (float("inf"), None)
    for cuts in itertools.combinations(range(1, n), k - 1):
        bounds = [0, *cuts, n]
        tot = sum(sse(vals[bounds[i]:bounds[i + 1]]) for i in range(k))
        if tot < best[0]:
            best = (tot, bounds)
    return best


def test_separated_clusters_found_exactly(spark):
    # three well-separated value clusters -> breaks must land between
    rng = np.random.default_rng(33)
    arr = rng.choice([1, 2, 3, 50, 51, 52, 200, 201, 202],
                     size=(32, 32)).astype(float)
    out = {r["cls"]: r for r in jenks_breaks(_tiles(spark, arr),
                                             k=3).collect()}
    assert out[1]["upper"] == 3 and out[2]["upper"] == 52
    assert out[3]["upper"] == 202
    assert sum(r["n_pixels"] for r in out.values()) == 1024


def test_matches_bruteforce_partition(spark):
    rng = np.random.default_rng(35)
    arr = rng.integers(0, 14, size=(24, 24)).astype(float)
    vc = {}
    for v in arr.ravel():
        vc[int(v)] = vc.get(int(v), 0) + 1
    out = sorted((r["cls"], r["lower"], r["upper"], r["n_pixels"],
                  r["sse"]) for r in
                 jenks_breaks(_tiles(spark, arr), k=4).collect())
    best_cost, bounds = _brute_best(vc, 4)
    vals = sorted(vc)
    got_cost = sum(r[4] for r in out)
    assert abs(got_cost - best_cost) < 1e-5
    for c in range(4):
        lo, hi = bounds[c], bounds[c + 1]
        assert out[c][1] == vals[lo] and out[c][2] == vals[hi - 1]
        assert out[c][3] == sum(vc[v] for v in vals[lo:hi])
