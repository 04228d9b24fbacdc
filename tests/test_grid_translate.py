"""grid interpolation / translate / location_info / mosaic vs NumPy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.kernels import resample as R
from lib_gdal_spark.operators import grid as GR
from lib_gdal_spark.operators import rasterize as RZ
from lib_gdal_spark.operators import translate as T
from lib_gdal_spark.sources import rasters as RS


def _assemble(rows, h, w, tile):
    full = np.full((h, w), np.nan)
    for r in rows:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * tile : r["tile_y"] * tile + r["tile_h"],
             r["tile_x"] * tile : r["tile_x"] * tile + r["tile_w"]] = a
    return full


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    n = 200
    return pd.DataFrame({
        "x": np.round(rng.uniform(-170, 170, n), 3),
        "y": np.round(rng.uniform(-80, 80, n), 3),
        "v": np.round(rng.uniform(0, 100, n), 3),
    })


def _idw_ref(pts, grid, radius, power=2.0, nodata=0.0):
    h, w = grid.height, grid.width
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = grid.gt[0] + (ii + 0.5) * grid.gt[1]
    gy = grid.gt[3] + (jj + 0.5) * grid.gt[5]
    out = np.full((h, w), nodata)
    for r in range(h):
        d2 = (gx[r][:, None] - pts["x"].values[None, :]) ** 2 + (
            gy[r][:, None] - pts["y"].values[None, :]
        ) ** 2
        if radius > 0:
            d2 = np.where(d2 <= radius * radius, d2, np.inf)
        w_ = np.where(np.isfinite(d2), d2 ** (-power / 2.0), 0.0)
        den = w_.sum(axis=1)
        num = (w_ * pts["v"].values[None, :]).sum(axis=1)
        out[r] = np.where(den > 0, num / np.where(den == 0, 1, den), nodata)
    return out


@pytest.mark.parametrize("radius", [0.0, 25.0])
def test_grid_idw(spark, pts, radius):
    grid = RZ.GridSpec((-180.0, 5.625, 0.0, 90.0, 0.0, -2.8125), 64, 64, 32)
    df = spark.createDataFrame(pts).coalesce(2)
    got_rows = GR.grid_interpolate(df, grid, alg="invdist", radius=radius).collect()
    got = _assemble(got_rows, 64, 64, 32)
    ref = _idw_ref(pts, grid, radius)
    got_f = np.nan_to_num(got, nan=0.0)  # tiles outside any bucket ring
    assert np.allclose(got_f, ref, rtol=1e-9, atol=1e-9)


def test_grid_metrics_count(spark, pts):
    grid = RZ.GridSpec((-180.0, 5.625, 0.0, 90.0, 0.0, -2.8125), 64, 64, 32)
    df = spark.createDataFrame(pts).coalesce(2)
    rows = GR.grid_interpolate(df, grid, alg="count", radius=10.0).collect()
    got = np.nan_to_num(_assemble(rows, 64, 64, 32), nan=0.0)
    assert got.sum() > 0
    # brute force one pixel
    jj, ii = 30, 40
    cx = -180.0 + (ii + 0.5) * 5.625
    cy = 90.0 - (jj + 0.5) * 2.8125
    d2 = (cx - pts["x"]) ** 2 + (cy - pts["y"]) ** 2
    assert got[jj, ii] == (d2 <= 100.0).sum()


def test_translate_window_decimate(spark):
    tiles = RS.fixture_rasters(spark)
    out = T.translate_window(tiles, "gradient256", (37, 21, 150, 100),
                             outsize=(75, 50)).collect()
    got = _assemble(out, 50, 75, 64)
    src = RS.gradient(256).astype(np.float64)
    window = src[21:121, 37:187]
    ref = R.overview_nearest(window, (50, 75))
    assert np.array_equal(got, ref)


def test_location_info(spark):
    tiles = RS.fixture_rasters(spark)
    q = spark.createDataFrame(
        [(1, 10.2, 200.7), (2, 100.9, 119.3), (3, 255.2, 100.1)],
        "qid long, x double, y double",
    )
    rows = T.location_info(
        tiles.where(F.col("raster_id") == "gradient256"), q
    ).collect()
    assert len(rows) == 3
    src = RS.gradient(256)
    for r in rows:
        assert r["value"] == float(src[r["py"], r["px"]])


def test_mosaic_last_wins(spark):
    grid = RZ.world_grid(256, 256, 64)
    boxa = G.box_ring(-30.063, -20.063, 10.063, 20.063)
    boxb = G.box_ring(-10.063, -10.063, 30.063, 30.063)
    pa = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon([boxa])), 5.0)],
        "fid long, geom_wkb binary, burn double").coalesce(1)
    pb = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon([boxb])), 9.0)],
        "fid long, geom_wkb binary, burn double").coalesce(1)
    ta = RZ.rasterize_polygons(pa, grid, raster_id="a")
    tb = RZ.rasterize_polygons(pb, grid, raster_id="b")
    m = T.mosaic(ta.unionByName(tb), ["a", "b"], nodata=0.0)
    full = np.nan_to_num(_assemble(m.collect(), 256, 256, 64), nan=0.0)
    # centers strictly inside B must be 9 even where A overlaps
    jj, ii = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    cx = -180.0 + (ii + 0.5) * (360.0 / 256)
    cy = 90.0 - (jj + 0.5) * (180.0 / 256)
    in_a = (cx > -30.063) & (cx < 10.063) & (cy > -20.063) & (cy < 20.063)
    in_b = (cx > -10.063) & (cx < 30.063) & (cy > -10.063) & (cy < 30.063)
    ref = np.where(in_b, 9.0, np.where(in_a, 5.0, 0.0))
    assert np.array_equal(full, ref)


def test_translate_resampled_read_algs(spark):
    """-outsize with each GRIORA_* kernel == the kernel applied to the
    assembled window (r3: non-nearest resampled read path)."""
    import numpy as np
    from pyspark.sql import functions as F

    from lib_gdal_spark.kernels import resample as R
    from lib_gdal_spark.operators import translate as TR
    from lib_gdal_spark.sources.rasters import fixture_rasters, gradient

    tiles = fixture_rasters(spark).where(F.col("raster_id") == "gradient256")
    src = gradient(256).astype(np.float64)[16:208, 16:208]
    for alg, ref_fn in (
        ("cubic", lambda w: R.overview_convolution(w, (96, 96), alg="cubic")),
        ("lanczos", lambda w: R.overview_convolution(w, (96, 96),
                                                     alg="lanczos")),
        ("bilinear", lambda w: R.overview_convolution(w, (96, 96),
                                                      alg="bilinear")),
        ("gauss", lambda w: R.overview_gauss(w, (96, 96))),
        ("mode", lambda w: R.overview_mode(w, (96, 96))),
    ):
        out = TR.translate_window(
            tiles, "gradient256", (16, 16, 192, 192), outsize=(96, 96),
            alg=alg,
        ).collect()
        got = np.full((96, 96), np.nan)
        for r in out:
            arr = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
            got[r["tile_y"] * 64 : r["tile_y"] * 64 + r["tile_h"],
                r["tile_x"] * 64 : r["tile_x"] * 64 + r["tile_w"]] = arr
        assert np.array_equal(got, ref_fn(src)), alg


class TestProjwin:
    def test_projwin_to_srcwin_edges(self):
        from lib_gdal_spark.operators.translate import projwin_to_srcwin
        gt = (0.0, 1.0, 0.0, 100.0, 0.0, -1.0)
        # exact cell edges: the +0.001 epsilon keeps offsets stable
        assert projwin_to_srcwin(gt, (10.0, 90.0, 20.0, 80.0)) == (10, 10, 10, 10)
        # slightly inside the cell still snaps to the same origin
        assert projwin_to_srcwin(gt, (10.0004, 89.9996, 20.0, 80.0))[:2] == (10, 10)
        # sizes round-half-up on the span
        assert projwin_to_srcwin(gt, (0.0, 100.0, 10.6, 89.6))[2:] == (11, 10)
