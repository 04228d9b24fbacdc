"""Bivariate Ripley cross-K and Clark-Evans NN index
(operators/spatialstats.cross_k / clark_evans)."""

import math

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.spatialstats import clark_evans, cross_k


def _df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(pts, columns=["pid", "x", "y"]),
        schema="pid long, x double, y double")


def test_cross_k_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    a = [(i, x, y) for i, (x, y) in
         enumerate(rng.uniform(0, 30, size=(80, 2)))]
    b = [(100 + i, x, y) for i, (x, y) in
         enumerate(rng.uniform(0, 30, size=(60, 2)))]
    got = {r["r"]: (r["n_pairs"], r["k_ab"]) for r in
           cross_k(_df(spark, a), _df(spark, b), [1.0, 3.0],
                   area=900.0, cell=3.0).collect()}
    pa = np.array([(x, y) for _, x, y in a])
    pb = np.array([(x, y) for _, x, y in b])
    d = np.hypot(pa[:, None, 0] - pb[None, :, 0],
                 pa[:, None, 1] - pb[None, :, 1])
    for r in (1.0, 3.0):
        n_pairs = int((d < r).sum())
        k = 900.0 * n_pairs / (80 * 60)
        assert got[r][0] == n_pairs
        assert abs(got[r][1] - k) < 1e-8


def test_clark_evans_regular_vs_clustered(spark):
    # 10x10 unit lattice in a 10x10 window: dispersed, R well above 1
    grid = [(i, float(i % 10), float(i // 10)) for i in range(100)]
    r_grid = clark_evans(_df(spark, grid), area=100.0, cell=2.0).first()
    assert abs(r_grid["mean_nn"] - 1.0) < 1e-9
    assert r_grid["r_index"] > 1.5
    # 100 points jammed into a corner blob: clustered, R well below 1
    rng = np.random.default_rng(7)
    blob = [(i, x, y) for i, (x, y) in
            enumerate(rng.uniform(0, 1, size=(100, 2)))]
    r_blob = clark_evans(_df(spark, blob), area=100.0, cell=2.0).first()
    assert r_blob["r_index"] < 0.5
    assert r_blob["z"] < -10.0


def test_clark_evans_escalation_exact(spark):
    # NN distances far above the initial cell: forces the doubling
    # rounds (and the broadcast tail for the farthest pair); result must
    # equal the brute-force mean regardless of the escalation path.
    rng = np.random.default_rng(11)
    xy = rng.uniform(0, 1000, size=(12, 2))
    pts = [(i, x, y) for i, (x, y) in enumerate(xy)]
    got = clark_evans(_df(spark, pts), area=1e6, cell=1.0,
                      max_doublings=3).first()
    d = np.hypot(xy[:, None, 0] - xy[None, :, 0],
                 xy[:, None, 1] - xy[None, :, 1])
    np.fill_diagonal(d, np.inf)
    mean_nn = np.round(d.min(axis=1) * 1e6).sum() / 12 / 1e6
    assert got["n"] == 12
    assert abs(got["mean_nn"] - round(mean_nn, 9)) < 1e-9
    exp = 0.5 * math.sqrt(1e6 / 12)
    assert abs(got["expected_nn"] - round(exp, 9)) < 1e-9
    assert abs(got["r_index"] - round(got["mean_nn"] / exp, 6)) < 1e-5
