"""Band statistics/histogram + convolution pyramid vs single-process refs."""

import numpy as np
from pyspark.sql import functions as F

from lib_gdal_spark.kernels import resample as R
from lib_gdal_spark.operators import raster as RAST
from lib_gdal_spark.operators import stats as ST
from lib_gdal_spark.sources.rasters import byte20, fixture_rasters, gradient


def test_band_statistics_matches_numpy(spark):
    tiles = fixture_rasters(spark)
    rows = {(r["raster_id"], r["band"]): r
            for r in ST.band_statistics(tiles.where(F.col("zoom") == 0)).collect()}
    for rid, arr in (("byte20", byte20()), ("gradient256", gradient(256))):
        r = rows[(rid, 1)]
        a = arr.astype(np.float64)
        assert r["n"] == a.size
        assert r["min"] == a.min() and r["max"] == a.max()
        assert abs(r["mean"] - a.mean()) < 1e-9
        assert abs(r["stddev"] - a.std()) < 1e-9


def test_band_statistics_nodata_excluded(spark):
    import pandas as pd
    arr = np.array([[1.0, 2.0], [0.0, 4.0]])
    row = dict(raster_id="x", band=1, zoom=0, tile_x=0, tile_y=0,
               dtype="float64", tile_w=2, tile_h=2,
               gt0=0.0, gt1=1.0, gt2=0.0, gt3=2.0, gt4=0.0, gt5=-1.0,
               nodata=0.0, pixels=arr.ravel().tolist())
    tiles = spark.createDataFrame(pd.DataFrame([row]))
    r = ST.band_statistics(tiles).collect()[0]
    assert r["n"] == 3 and r["min"] == 1.0 and r["max"] == 4.0
    assert abs(r["mean"] - 7.0 / 3.0) < 1e-12


def test_band_histogram(spark):
    tiles = fixture_rasters(spark).where(
        (F.col("raster_id") == "byte20") & (F.col("zoom") == 0)
    )
    rows = ST.band_histogram(tiles, 0.0, 256.0, buckets=256).collect()
    got = np.zeros(256, dtype=np.int64)
    for r in rows:
        got[r["bucket"]] = r["count"]
    want = np.bincount(byte20().ravel(), minlength=256)
    assert np.array_equal(got, want)
    assert got.sum() == 400


def test_pyramid_conv_matches_full_raster_reference(spark):
    """Distributed halo-strip path == one overview_convolution of the
    assembled raster, for every convolution kernel."""
    tiles = fixture_rasters(spark).where(F.col("raster_id") == "gradient256")
    src = gradient(256).astype(np.float64)
    for alg in ("bilinear", "cubic", "cubicspline", "lanczos"):
        out = RAST.pyramid_level_conv(tiles, alg=alg, tile=64).collect()
        full = np.zeros((128, 128))
        for r in out:
            assert r["zoom"] == 1
            a = np.asarray(r["pixels"]).reshape(64, 64)
            full[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
                 r["tile_x"] * 64:(r["tile_x"] + 1) * 64] = a
        ref = R.clamp_round(
            R.overview_convolution(src, (128, 128), alg), "uint8"
        ).astype(np.float64)
        assert np.array_equal(full, ref), alg


def test_band_calc_ndvi_style(spark):
    from lib_gdal_spark.operators.raster import band_calc
    from lib_gdal_spark.sources.rasters import multiband, multiband_tiles

    tiles = multiband_tiles(spark, n=64, tile=32)
    out = band_calc(
        tiles, lambda a, b: (a - b) / (a + b + 1.0), bands=[2, 1],
        out_id="idx",
    ).collect()
    full = np.zeros((64, 64))
    for r in out:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * 32:r["tile_y"] * 32 + r["tile_h"],
             r["tile_x"] * 32:r["tile_x"] * 32 + r["tile_w"]] = a
    m = multiband(64)
    want = (m[2] - m[1]) / (m[2] + m[1] + 1.0)
    assert np.allclose(full, want, atol=1e-12)
    # 3-band variant through the positional path
    out3 = band_calc(tiles, lambda a, b, c: a + b + c, bands=[1, 2, 3])
    v = np.asarray(out3.collect()[0]["pixels"])
    assert np.isfinite(v).all()
