"""GWR coefficient surfaces: recovery of an exactly-linear model, local
weighted-least-squares agreement with numpy lstsq, invariance."""

import numpy as np
import pytest

from lib_gdal_spark.operators import grid as GR
from lib_gdal_spark.operators.rasterize import GridSpec


def _grid():
    return GridSpec(width=32, height=32, tile=16,
                    gt=(0.0, 1.0, 0.0, 32.0, 0.0, -1.0))


def _pts(spark, noise=False, n=250, seed=4):
    rng = np.random.default_rng(seed)
    x = np.round(rng.uniform(1, 31, n), 3)
    y = np.round(rng.uniform(1, 31, n), 3)
    x1 = rng.integers(0, 20, n).astype(float)
    x2 = rng.integers(0, 15, n).astype(float)
    resp = 7.0 + 3.0 * x1 + 2.0 * x2
    if noise:
        resp = resp + rng.integers(0, 5, n)
    rows = [(float(a), float(b), float(c), float(d), float(e))
            for a, b, c, d, e in zip(x, y, x1, x2, resp)]
    return spark.createDataFrame(
        rows, "x double, y double, x1 double, x2 double, resp double"), \
        x, y, x1, x2, resp


def _bands(rows, g):
    out = {}
    for r in rows:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full = out.setdefault(r["band"], np.full((g.height, g.width), np.nan))
        full[r["tile_y"] * g.tile:r["tile_y"] * g.tile + r["tile_h"],
             r["tile_x"] * g.tile:r["tile_x"] * g.tile + r["tile_w"]] = a
    return out


def test_recovers_exact_linear_model(spark):
    g = _grid()
    pts, *_ = _pts(spark)
    rows = GR.grid_gwr(pts, g, bandwidth=15.0, y_col="resp",
                       nodata=np.nan).collect()
    b = _bands(rows, g)
    for band, truth in ((1, 7.0), (2, 3.0), (3, 2.0), (4, 1.0)):
        vals = b[band][np.isfinite(b[band])]
        assert len(vals) > 800
        assert np.allclose(vals, truth, atol=1e-6), band


def test_matches_numpy_wls(spark):
    g = _grid()
    pts, x, y, x1, x2, resp = _pts(spark, noise=True)
    rows = GR.grid_gwr(pts, g, bandwidth=12.0, y_col="resp",
                       nodata=np.nan, quantize=None).collect()
    b = _bands(rows, g)
    bw2 = 144.0
    checked = 0
    for py in range(0, 32, 7):
        for px in range(0, 32, 7):
            gx, gy = px + 0.5, 32.0 - (py + 0.5)
            d2 = (gx - x) ** 2 + (gy - y) ** 2
            inside = d2 < bw2
            if inside.sum() < 8:
                assert np.isnan(b[1][py, px])
                continue
            w = np.where(inside, (1 - d2 / bw2) ** 2, 0.0)
            X = np.column_stack([np.ones_like(x1), x1, x2])
            sw = np.sqrt(w)
            beta, *_ = np.linalg.lstsq(X * sw[:, None], resp * sw,
                                       rcond=None)
            assert b[1][py, px] == pytest.approx(beta[0], abs=1e-6)
            assert b[2][py, px] == pytest.approx(beta[1], abs=1e-6)
            assert b[3][py, px] == pytest.approx(beta[2], abs=1e-6)
            assert 0.0 < b[4][py, px] <= 1.0
            checked += 1
    assert checked > 10


def test_quantized_partition_invariance(spark):
    g = _grid()
    pts, *_ = _pts(spark, noise=True)
    a = _bands(GR.grid_gwr(pts, g, bandwidth=15.0, y_col="resp",
                           nodata=np.nan).collect(), g)
    bb = _bands(GR.grid_gwr(pts.repartition(13), g, bandwidth=15.0,
                            y_col="resp", nodata=np.nan).collect(), g)
    for band in (1, 2, 3, 4):
        assert np.array_equal(a[band], bb[band], equal_nan=True)


def test_validation(spark):
    g = _grid()
    pts, *_ = _pts(spark, n=20)
    with pytest.raises(ValueError):
        GR.grid_gwr(pts, g, bandwidth=0.0, y_col="resp")
    with pytest.raises(ValueError):
        GR.grid_gwr(pts, g, bandwidth=5.0, y_col="y")  # collides with coord
