"""Difference-in-differences (operators/events.did_estimator)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.events import did_estimator


def _panel(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["unit", "treated", "period", "y"]),
        schema="unit long, treated int, period int, y long")


def test_known_effect_recovered(spark):
    rng = np.random.default_rng(59)
    rows = []
    uid = 0
    # control: 10 -> 12 (trend +2); treated: 10 -> 17 (trend + effect 5)
    for treated, base_post in ((0, 12), (1, 17)):
        for _ in range(200):
            noise = int(rng.integers(-2, 3))
            rows.append((uid, treated, 0, 10 + noise))
            rows.append((uid, treated, 1, base_post + noise))
            uid += 1
    got = did_estimator(_panel(spark, rows)).first()
    assert abs(got["did"] - 5.0) < 1e-9   # common noise cancels exactly
    assert got["n_t0"] == 200 and got["n_c1"] == 200
    assert got["t"] > 10


def test_matches_numpy_cells(spark):
    rng = np.random.default_rng(61)
    rows = []
    for i in range(300):
        t, p = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        rows.append((i, t, p, int(rng.integers(0, 50))))
    got = did_estimator(_panel(spark, rows)).first()
    df = pd.DataFrame(rows, columns=["unit", "t", "p", "y"])
    m = {(t, p): g["y"].mean() for (t, p), g in df.groupby(["t", "p"])}
    v = {(t, p): g["y"].var(ddof=1) / len(g)
         for (t, p), g in df.groupby(["t", "p"])}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    se = np.sqrt(sum(v.values()))
    assert abs(got["did"] - did) < 1e-8
    assert abs(got["se"] - se) < 1e-8
