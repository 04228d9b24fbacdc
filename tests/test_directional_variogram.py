"""Directional semivariogram (spatialstats.directional_variogram)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.spatialstats import directional_variogram


def test_detects_anisotropy(spark):
    # v depends ONLY on x: N-S pairs (sector 2) have gamma ~ 0,
    # E-W pairs (sector 0) carry all the variance
    rows = [(y * 40 + x, x * 3, y * 3, x % 13)
            for x in range(40) for y in range(40)]
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "x", "y", "v"]),
        schema="pid long, x long, y long, v long")
    out = directional_variogram(pts, max_dist=30.0, n_bins=3).collect()
    g = {}
    for r in out:
        g.setdefault(r["sector"], []).append((r["bin"], r["gamma"],
                                              r["n_pairs"]))
    ns = sum(x[1] * x[2] for x in g[2]) / sum(x[2] for x in g[2])
    ew = sum(x[1] * x[2] for x in g[0]) / sum(x[2] for x in g[0])
    # the N-S sector still admits pairs up to 22.5 deg off vertical
    # (nonzero dx), so ns > 0 — but the anisotropy ordering must hold
    assert ew > 2.0 * ns and ew > 10.0


def test_sector_assignment_matches_numpy(spark):
    rng = np.random.default_rng(73)
    rows = [(i, int(x), int(y), int(v)) for i, (x, y, v) in
            enumerate(zip(rng.integers(0, 60, 150),
                          rng.integers(0, 60, 150),
                          rng.integers(0, 20, 150)))]
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "x", "y", "v"]),
        schema="pid long, x long, y long, v long")
    got = {(r["sector"], r["bin"]): (r["n_pairs"], r["gamma"]) for r in
           directional_variogram(pts, max_dist=20.0, n_bins=4).collect()}
    ref = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            _, xa, ya, va = rows[i]
            _, xb, yb, vb = rows[j]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 == 0 or d2 >= 400:
                continue
            az = np.degrees(np.arctan2(yb - ya, xb - xa))
            az = az + 180.0 if az < 0 else az
            az = 0.0 if az == 180.0 else az
            sec = int(((az + 22.5) % 180.0) // 45.0)
            b = int(np.sqrt(d2) // 5.0)
            k = (sec, b)
            n, s = ref.get(k, (0, 0))
            ref[k] = (n + 1, s + (va - vb) ** 2)
    for k, (n, s) in ref.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - s / (2 * n)) < 1e-6
    assert set(got) == set(ref)
