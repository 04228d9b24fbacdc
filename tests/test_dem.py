"""DEM focal ops: distributed halo-exchange result == single-array stencil."""

from __future__ import annotations

import numpy as np
import pytest

from lib_gdal_spark.operators import dem as D
from lib_gdal_spark.sources import rasters as RS


@pytest.fixture(scope="module")
def world_tiles(spark):
    arr, gt = RS.world4326(128)
    rows = RS.tiles_from_array("w", arr, gt, tile=32)
    import pandas as pd
    return spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA), arr, gt


def _assemble(rows, h, w, tile):
    full = np.full((h, w), np.nan)
    for r in rows:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * tile : r["tile_y"] * tile + r["tile_h"],
             r["tile_x"] * tile : r["tile_x"] * tile + r["tile_w"]] = a
    return full


@pytest.mark.parametrize("op", ["slope", "aspect", "hillshade", "tri", "tpi",
                                "roughness", "aspect_trig", "slope_percent",
                                "slope_zt",
                                "aspect_zt", "hillshade_combined",
                                "hillshade_multidirectional",
                                "hillshade_igor", "curv_profile",
                                "curv_plan", "curv_total", "insolation"])
def test_dem_matches_single_array(spark, world_tiles, op):
    tiles, arr, gt = world_tiles
    got_rows = D.dem_op(tiles, op).collect()
    got = _assemble(got_rows, 128, 128, 32)

    pad = np.full((130, 130), np.nan)
    pad[1:-1, 1:-1] = arr.astype(np.float64)
    want = D.KERNELS[op](pad, gt[1], gt[5])

    # boundary ring is NaN in both
    assert np.isnan(got[0]).all() and np.isnan(got[-1]).all()
    assert np.isnan(want[0]).all()
    inner_g = got[1:-1, 1:-1]
    inner_w = want[1:-1, 1:-1]
    assert not np.isnan(inner_g).any()
    assert np.array_equal(inner_g, inner_w)


def test_slope_flat_is_zero(spark):
    import pandas as pd
    arr = np.full((64, 64), 42.0)
    rows = RS.tiles_from_array("flat", arr, (0, 1, 0, 64, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = _assemble(D.dem_op(tiles, "slope").collect(), 64, 64, 32)
    assert np.all(out[1:-1, 1:-1] == 0.0)


def test_hillshade_variants_flat_anchors(spark):
    """Flat surface: combined == 255, multidirectional == 1+254*sin(45deg)
    rounded (181), igor == 255 (gdaldem_lib.cpp flat-pixel branches)."""
    import pandas as pd
    arr = np.full((64, 64), 42.0)
    rows = RS.tiles_from_array("flat", arr, (0, 1, 0, 64, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    for op, want in (("hillshade_combined", 255.0),
                     ("hillshade_multidirectional", 181.0),
                     ("hillshade_igor", 255.0)):
        out = _assemble(D.dem_op(tiles, op).collect(), 64, 64, 32)
        assert np.all(out[1:-1, 1:-1] == want), op


def test_hillshade_range(spark, world_tiles):
    tiles, _, _ = world_tiles
    rows = D.dem_op(tiles, "hillshade").collect()
    full = _assemble(rows, 128, 128, 32)
    inner = full[1:-1, 1:-1]
    assert inner.min() >= 1.0 and inner.max() <= 255.0


def test_focal_convolution_matches_full_array(spark):
    """5x5 kernel across tile seams == direct convolution of the mosaic."""
    import pandas as pd

    from lib_gdal_spark.operators.dem import focal_convolution
    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA

    rng = np.random.default_rng(3)
    full = rng.random((64, 64)) * 100
    rows = []
    for ty in range(0, 64, 16):
        for tx in range(0, 64, 16):
            p = full[ty:ty + 16, tx:tx + 16]
            rows.append(dict(
                raster_id="f", band=1, zoom=0, tile_x=tx // 16,
                tile_y=ty // 16, dtype="float64", tile_w=16, tile_h=16,
                gt0=float(tx), gt1=1.0, gt2=0.0, gt3=float(ty), gt4=0.0,
                gt5=1.0, nodata=None, pixels=p.ravel().tolist(),
            ))
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)
    k = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]) / 256.0  # 5x5 binomial
    out = focal_convolution(tiles, k, normalize=True).collect()
    got = np.zeros((64, 64))
    for r in out:
        a = np.asarray(r["pixels"]).reshape(16, 16)
        got[r["tile_y"] * 16:(r["tile_y"] + 1) * 16,
            r["tile_x"] * 16:(r["tile_x"] + 1) * 16] = a
    # direct reference with boundary renormalization
    pad = np.full((68, 68), np.nan)
    pad[2:66, 2:66] = full
    ref = np.zeros((64, 64))
    den = np.zeros((64, 64))
    for i in range(5):
        for j in range(5):
            v = pad[i:i + 64, j:j + 64]
            valid = ~np.isnan(v)
            ref += np.where(valid, v, 0.0) * k[i, j] * valid
            den += k[i, j] * valid
    ref = ref / den
    assert np.allclose(got, ref, atol=1e-12)


def test_color_relief(spark):
    from lib_gdal_spark.operators.dem import color_relief
    from lib_gdal_spark.sources.rasters import fixture_rasters
    from pyspark.sql import functions as F

    tiles = fixture_rasters(spark).where(F.col("raster_id") == "gradient256")
    ramp = [(0.0, 0, 0, 255), (128.0, 0, 255, 0), (255.0, 255, 0, 0)]
    out = color_relief(tiles, ramp).collect()
    assert {r["band"] for r in out} == {1, 2, 3}
    # spot-check: value v=(px+py)//2; at v=0 -> blue, v=128 -> green
    by = {}
    for r in out:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        by.setdefault(r["band"], np.zeros((256, 256)))[
            r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
            r["tile_x"] * 64:(r["tile_x"] + 1) * 64] = a
    assert (by[3][0, 0], by[2][0, 0], by[1][0, 0]) == (255.0, 0.0, 0.0)
    # pixel (128,128): v=128 -> pure green
    assert (by[1][128, 128], by[2][128, 128], by[3][128, 128]) == (0, 255, 0)
    # interpolation midpoint v=64 -> halfway blue->green
    yy, xx = 64, 64  # v = 64
    assert by[2][yy, xx] == np.floor(np.interp(64, [0, 128], [0, 255]) + 0.5)


def test_curvature_paraboloid_analytic():
    """z = c*(x^2 + y^2) on unit cells has closed-form ZT curvatures:
    profile = -2c everywhere off-center, plan = +2c, total = -4c (the
    quadric fit is exact for a quadric)."""
    c = 0.03
    y, x = np.mgrid[0:33, 0:33]
    z = c * ((x - 16.0) ** 2 + (y - 16.0) ** 2)
    pad = np.full((35, 35), np.nan)
    pad[1:-1, 1:-1] = z
    # kernels consume the halo-padded array and return the 33x33 grid;
    # its border ring touches the NaN halo, so compare the interior
    prof = D.KERNELS["curv_profile"](pad, 1.0, 1.0)[1:-1, 1:-1]
    plan = D.KERNELS["curv_plan"](pad, 1.0, 1.0)[1:-1, 1:-1]
    tot = D.KERNELS["curv_total"](pad, 1.0, 1.0)[1:-1, 1:-1]
    xi, yi = x[1:-1, 1:-1], y[1:-1, 1:-1]
    mask = ~((xi == 16) & (yi == 16))  # apex is flat (G=H=0) -> 0
    assert np.allclose(prof[mask], -2 * c, atol=1e-12)
    assert np.allclose(plan[mask], 2 * c, atol=1e-12)
    assert prof[15, 15] == 0.0 and plan[15, 15] == 0.0  # apex, shifted
    assert np.allclose(tot, -4 * c, atol=1e-12)
    # an inclined plane is curvature-free in every sense
    zp = 0.7 * x + 0.2 * y + 5.0
    pad[1:-1, 1:-1] = zp
    for op in ("curv_profile", "curv_plan", "curv_total"):
        out = D.KERNELS[op](pad, 1.0, 1.0)[1:-1, 1:-1]
        assert np.allclose(out, 0.0, atol=1e-12)
