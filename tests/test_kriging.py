"""Ordinary kriging vs an independent np.linalg.solve reference, plus the
estimator's defining properties (exactness at samples, unbiasedness on
constant fields, weights summing to 1)."""

import math

import numpy as np
import pytest

from lib_gdal_spark.operators import grid as GR
from lib_gdal_spark.operators.rasterize import GridSpec


def _grid():
    return GridSpec(width=32, height=32, tile=16,
                    gt=(0.0, 1.0, 0.0, 32.0, 0.0, -1.0))


def _pts(spark, vals=None, n=60, seed=5):
    rng = np.random.default_rng(seed)
    x = np.round(rng.uniform(1, 31, n), 3)
    y = np.round(rng.uniform(1, 31, n), 3)
    v = vals(x, y) if vals else rng.uniform(0, 10, n)
    rows = [(int(i), float(a), float(b), float(c))
            for i, (a, b, c) in enumerate(zip(x, y, v))]
    df = spark.createDataFrame(rows, "pid long, x double, y double, v double")
    return df, x, y, np.asarray(v, dtype=np.float64)


def _assemble(rows, g):
    full = np.full((g.height, g.width), np.nan)
    for r in rows:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * g.tile:r["tile_y"] * g.tile + r["tile_h"],
             r["tile_x"] * g.tile:r["tile_x"] * g.tile + r["tile_w"]] = a
    return full


def _cov(h, a=20.0, psill=1.0, nugget=0.0):
    u = h / a
    c = psill * (1.0 - (1.5 * u - 0.5 * u ** 3))
    c = np.where(h >= a, 0.0, c)
    return np.where(h == 0.0, nugget + psill, c)


def _reference(gx, gy, x, y, v, k, radius, a):
    """Independent per-pixel ordinary kriging via np.linalg.solve."""
    d2 = (gx - x) ** 2 + (gy - y) ** 2
    order = np.argsort(d2, kind="stable")
    sel = [i for i in order if d2[i] <= radius * radius][:k]
    c = len(sel)
    if c < k:
        return None
    A = np.ones((c + 1, c + 1))
    A[c, c] = 0.0
    for i in range(c):
        for j in range(c):
            h = math.hypot(x[sel[i]] - x[sel[j]], y[sel[i]] - y[sel[j]])
            A[i, j] = _cov(np.float64(h), a=a)
    b = np.ones(c + 1)
    for i in range(c):
        b[i] = _cov(np.float64(math.sqrt(d2[sel[i]])), a=a)
    w = np.linalg.solve(A, b)
    return float(w[:c] @ v[sel])


def test_matches_linalg_solve(spark):
    g = _grid()
    pts, x, y, v = _pts(spark)
    out = GR.grid_kriging(pts, g, radius=20.0, max_points=6, min_points=6,
                          psill=1.0, vrange=20.0, nodata=np.nan,
                          id_col="pid").collect()
    full = _assemble(out, g)
    checked = 0
    for py in range(0, 32, 5):
        for px in range(0, 32, 5):
            gx, gy = px + 0.5, 32.0 - (py + 0.5)
            ref = _reference(gx, gy, x, y, v, 6, 20.0, 20.0)
            if ref is None:
                assert np.isnan(full[py, px])
            else:
                assert full[py, px] == pytest.approx(ref, abs=1e-8), (px, py)
                checked += 1
    assert checked > 30


def test_exact_at_sample_points(spark):
    # a sample sitting exactly on a pixel center is reproduced exactly
    # (no nugget -> kriging is an exact interpolator)
    g = _grid()
    rows = [(0, 10.5, 21.5, 7.0), (1, 20.5, 11.5, 3.0), (2, 5.5, 5.5, 9.0),
            (3, 25.5, 25.5, 1.0), (4, 15.5, 15.5, 4.0)]
    df = spark.createDataFrame(rows, "pid long, x double, y double, v double")
    out = GR.grid_kriging(df, g, radius=40.0, max_points=5, min_points=1,
                          psill=2.0, vrange=40.0, nodata=np.nan,
                          id_col="pid").collect()
    full = _assemble(out, g)
    for _, x, y, v in rows:
        px, py = int(x), int(32.0 - y)
        assert full[py, px] == pytest.approx(v, abs=1e-10)


def test_constant_field_unbiased(spark):
    # weights sum to 1 -> a constant field is reproduced everywhere
    g = _grid()
    pts, *_ = _pts(spark, vals=lambda x, y: np.full(len(x), 5.25))
    out = GR.grid_kriging(pts, g, radius=25.0, max_points=4, min_points=1,
                          nodata=np.nan, id_col="pid").collect()
    full = _assemble(out, g)
    valid = full[np.isfinite(full)]
    assert len(valid) > 900
    assert np.allclose(valid, 5.25, atol=1e-9)


def test_min_points_nodata_and_models(spark):
    g = _grid()
    df = spark.createDataFrame([(0, 2.0, 30.0, 5.0)],
                               "pid long, x double, y double, v double")
    out = GR.grid_kriging(df, g, radius=3.0, max_points=3, min_points=2,
                          nodata=-9.0, id_col="pid").collect()
    full = _assemble(out, g)
    assert np.all(full[np.isfinite(full)] == -9.0)  # 1 < min_points
    for model in ("exponential", "gaussian", "linear"):
        pts, *_ = _pts(spark, n=30)
        r = GR.grid_kriging(pts, g, radius=25.0, max_points=4,
                            model=model, nodata=np.nan,
                            id_col="pid").collect()
        assert len(r) > 0

    with pytest.raises(ValueError):
        GR.grid_kriging(df, g, radius=0.0)
    with pytest.raises(ValueError):
        GR.grid_kriging(df, g, radius=1.0, nugget=-1.0, psill=1.0)
    with pytest.raises(ValueError):
        GR.grid_kriging(df, g, radius=1.0, model="cubic")


def test_partition_invariance(spark):
    g = _grid()
    pts, *_ = _pts(spark, n=80)
    a = _assemble(GR.grid_kriging(pts, g, radius=20.0, max_points=5,
                                  nodata=np.nan, id_col="pid").collect(), g)
    b = _assemble(GR.grid_kriging(pts.repartition(11), g, radius=20.0,
                                  max_points=5, nodata=np.nan,
                                  id_col="pid").collect(), g)
    assert np.array_equal(a, b, equal_nan=True)
