"""Local Geary's c (operators/spatialstats.local_geary)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.spatialstats import local_geary


def test_matches_numpy_definition(spark):
    rng = np.random.default_rng(67)
    rows = [(gx, gy, int(rng.integers(1, 30)))
            for gx in range(6) for gy in range(5)]
    cells = spark.createDataFrame(
        pd.DataFrame(rows, columns=["gx", "gy", "x"]),
        schema="gx int, gy int, x long")
    got = {(r["gx"], r["gy"]): r for r in
           local_geary(cells, queen=True).collect()}
    xs = {(gx, gy): x for gx, gy, x in rows}
    vals = np.array([x for _, _, x in rows], dtype=float)
    n, m = len(vals), vals.mean()
    m2 = ((vals - m) ** 2).sum() / n
    for (gx, gy), x in xs.items():
        nb = [xs[(gx + dx, gy + dy)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (dx, dy) != (0, 0) and (gx + dx, gy + dy) in xs]
        zi = (x - m) / np.sqrt(m2)
        ci = sum(((x - m) / np.sqrt(m2) - (xj - m) / np.sqrt(m2)) ** 2
                 for xj in nb)
        g = got[(gx, gy)]
        assert g["deg"] == len(nb)
        assert abs(g["ci"] - ci) < 1e-6, (gx, gy)
        assert abs(g["e_ci"] - len(nb) * 2 * n / (n - 1)) < 1e-6
        assert g["cluster"] == ("similar" if ci < g["e_ci"]
                                else "dissimilar")


def test_smooth_gradient_is_similar(spark):
    # a smooth ramp: neighbors are close in value -> 'similar' dominates
    rows = [(gx, gy, gx + gy) for gx in range(8) for gy in range(8)]
    cells = spark.createDataFrame(
        pd.DataFrame(rows, columns=["gx", "gy", "x"]),
        schema="gx int, gy int, x long")
    out = local_geary(cells).collect()
    frac = sum(r["cluster"] == "similar" for r in out) / len(out)
    assert frac > 0.9
