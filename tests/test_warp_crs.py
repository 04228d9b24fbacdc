"""Arbitrary-CRS warp: UTM + LCC targets vs a single-process reference.

The reference warp inverse-maps every dst pixel center through the same
CRS math over the assembled source mosaic — the distributed tile path
must reproduce it pixel-exactly (nearest) for both projections.
"""

import numpy as np
from pyspark.sql import functions as F

from lib_gdal_spark.functions import crs as CRS
from lib_gdal_spark.operators import raster as RAST
from lib_gdal_spark.sources.rasters import fixture_rasters, world4326


def _reference_warp_nearest(inverse, dst_gt, dst_w, dst_h):
    world, wgt = world4326(256)
    jj, ii = np.meshgrid(np.arange(dst_h), np.arange(dst_w), indexing="ij")
    gx = dst_gt[0] + (ii + 0.5) * dst_gt[1]
    gy = dst_gt[3] + (jj + 0.5) * dst_gt[5]
    lon, lat = inverse(gx, gy)
    sx = np.floor((lon - wgt[0]) / wgt[1] + 1e-10).astype(int)
    sy = np.floor((lat - wgt[3]) / wgt[5] + 1e-10).astype(int)
    out = np.full((dst_h, dst_w), np.nan)
    ok = (sx >= 0) & (sx < 256) & (sy >= 0) & (sy < 256)
    out[ok] = world[sy[ok], sx[ok]]
    return out


def _assemble(rows, dst_w, dst_h, tile):
    full = np.full((dst_h, dst_w), np.nan)
    for r in rows:
        arr = np.asarray(
            [np.nan if v is None else v for v in r["pixels"]]
        ).reshape(r["tile_h"], r["tile_w"])
        y0, x0 = r["tile_y"] * tile, r["tile_x"] * tile
        full[y0:y0 + r["tile_h"], x0:x0 + r["tile_w"]] = arr
    return full


def _run(spark, inverse, dst_gt, dst_w=128, dst_h=128, tile=64):
    tiles = fixture_rasters(spark).where(F.col("raster_id") == "world4326")
    out = RAST.warp_to_crs_tiles_dist(
        tiles, dst_gt, dst_w, dst_h, inverse, alg="nearest", tile=tile
    )
    got = _assemble(out.collect(), dst_w, dst_h, tile)
    ref = _reference_warp_nearest(inverse, dst_gt, dst_w, dst_h)
    assert np.array_equal(np.isnan(got), np.isnan(ref))
    ok = ~np.isnan(ref)
    assert ok.mean() > 0.9  # the grid actually covers source
    assert np.array_equal(got[ok], ref[ok])


def test_warp_utm31_nearest(spark):
    tm = CRS.utm_zone(31)
    # zone 31 band ~ lat 38..48, lon 0..6: E 166k..834k, N 4.2M..5.3M
    dst_gt = (150_000.0, 5500.0, 0.0, 5_350_000.0, 0.0, -8500.0)
    _run(spark, tm.inverse, dst_gt)


def test_warp_lcc_nearest(spark):
    lcc = CRS.LambertConformalConic(
        lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0
    )
    dst_gt = (-2_200_000.0, 35_000.0, 0.0, 1_500_000.0, 0.0, -25_000.0)
    _run(spark, lcc.inverse, dst_gt)


def test_warp_with_alpha(spark):
    """Zero-alpha source regions must surface as NULL in the value band."""
    import pandas as pd

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA

    # 2-band source: band 1 = constant 9, band 2 = alpha (left half 0)
    rows = []
    alpha = np.full((64, 64), 255.0)
    alpha[:, :32] = 0.0
    for band, arr in ((1, np.full((64, 64), 9.0)), (2, alpha)):
        rows.append(dict(
            raster_id="a", band=band, zoom=0, tile_x=0, tile_y=0,
            dtype="float64", tile_w=64, tile_h=64,
            gt0=0.0, gt1=1.0, gt2=0.0, gt3=64.0, gt4=0.0, gt5=-1.0,
            nodata=None, pixels=arr.ravel().tolist(),
        ))
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)

    def ident(x, y):  # dst CRS == src world coords
        return np.asarray(x), np.asarray(y)

    from lib_gdal_spark.operators.raster import warp_with_alpha
    out = warp_with_alpha(
        tiles, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), 64, 64, ident,
        alpha_band=2, tile=32,
    )
    v = out.where(out.band == 1).collect()
    full = np.full((64, 64), np.nan)
    for r in v:
        a = np.asarray([np.nan if p is None else p for p in r["pixels"]]
                       ).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * 32:r["tile_y"] * 32 + r["tile_h"],
             r["tile_x"] * 32:r["tile_x"] * 32 + r["tile_w"]] = a
    assert np.isnan(full[:, :32]).all()     # transparent half -> NULL
    assert (full[:, 32:] == 9.0).all()      # opaque half passes through


def test_cutline_density_blend(spark):
    from lib_gdal_spark.operators.raster import cutline_density_tiles

    # box cutline on a unit grid; blend 4 px
    cut = [np.array([[16.0, 16.0], [48.0, 16.0], [48.0, 48.0],
                     [16.0, 48.0], [16.0, 16.0]])]
    dst_gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    out = cutline_density_tiles(spark, dst_gt, 64, 64, cut,
                                blend_dist=4.0, tile=32).collect()
    full = np.zeros((64, 64))
    for r in out:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * 32:r["tile_y"] * 32 + r["tile_h"],
             r["tile_x"] * 32:r["tile_x"] * 32 + r["tile_w"]] = a
    # deep inside -> 1, deep outside -> 0
    assert full[32, 32] == 1.0
    assert full[2, 2] == 0.0
    # center of pixel 18 is 2.5 units inside the edge at x=16:
    # density = 0.5 + 2.5/8
    assert abs(full[32, 18] - (0.5 + 2.5 / 8.0)) < 1e-9
    # just outside: pixel 14 center is 1.5 outside -> 0.5 - 1.5/8
    assert abs(full[32, 14] - (0.5 - 1.5 / 8.0)) < 1e-9
    # monotone ramp across the edge
    ramp = full[32, 10:22]
    assert (np.diff(ramp) >= -1e-12).all()


def test_warp_polar_stereographic_nearest(spark):
    """EPSG:3031 Antarctic Polar Stereographic via the registry (r3)."""
    ps = CRS.get_crs_transform(3031)
    dst_gt = (-2_880_000.0, 45_000.0, 0.0, 2_880_000.0, 0.0, -45_000.0)
    _run(spark, ps.inverse, dst_gt)


def test_warp_albers_nearest(spark):
    """EPSG:5070 CONUS Albers via the registry (r3)."""
    aea = CRS.get_crs_transform(5070)
    dst_gt = (-2_250_000.0, 35_000.0, 0.0, 3_200_000.0, 0.0, -22_500.0)
    _run(spark, aea.inverse, dst_gt)
