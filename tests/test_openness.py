"""Topographic openness + generalized k-halo exchange: brute-force
parity, tiling invariance, flat/pit/peak semantics."""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators.dem import dem_op_k, openness_kernel
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA, tiles_from_array


def _tiles(spark, arr, tile):
    gt = (0.0, 1.0, 0.0, float(arr.shape[0]), 0.0, -1.0)
    rows = tiles_from_array("o", arr.astype(np.float64), gt, tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def _grid(df, n, tile):
    out = np.full((n, n), np.nan)
    for r in df.collect():
        a = np.array(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        out[r["tile_y"] * tile:r["tile_y"] * tile + r["tile_h"],
            r["tile_x"] * tile:r["tile_x"] * tile + r["tile_w"]] = a
    return out


def _brute(arr, k):
    pad = np.full((arr.shape[0] + 2 * k, arr.shape[1] + 2 * k), np.nan)
    pad[k:-k, k:-k] = arr
    return openness_kernel(pad, k, 1.0, -1.0)


def _terrain(n=48):
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    return np.sin(i * 0.3) * 7 + np.cos(j * 0.2) * 5


def test_matches_single_array_bruteforce(spark):
    arr = _terrain()
    k = 4
    got = _grid(dem_op_k(_tiles(spark, arr, 16), k, openness_kernel), 48, 16)
    want = _brute(arr, k)
    inner = slice(k, 48 - k)
    assert np.array_equal(got[inner, inner], want[inner, inner])


def test_tiling_invariance(spark):
    arr = _terrain()
    k = 6
    a = _grid(dem_op_k(_tiles(spark, arr, 16), k, openness_kernel), 48, 16)
    b = _grid(dem_op_k(_tiles(spark, arr, 24), k, openness_kernel), 48, 24)
    inner = slice(k, 48 - k)
    assert np.array_equal(a[inner, inner], b[inner, inner])


def test_flat_plane_is_90(spark):
    arr = np.full((32, 32), 5.0)
    got = _grid(dem_op_k(_tiles(spark, arr, 16), 4, openness_kernel), 32, 16)
    assert np.allclose(got[4:-4, 4:-4], 90.0)


def test_pit_is_less_open_peak_more(spark):
    n = 33
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    r = np.sqrt((i - 16.0) ** 2 + (j - 16.0) ** 2)
    pit = r.copy()          # bowl: center lowest
    peak = -r               # cone: center highest
    gp = _grid(dem_op_k(_tiles(spark, pit, 16), 8, openness_kernel), n, 16)
    gk = _grid(dem_op_k(_tiles(spark, peak, 16), 8, openness_kernel), n, 16)
    assert gp[16, 16] < 60.0       # bowl center: sky narrowed
    assert gk[16, 16] > 120.0      # cone apex: wide open
    assert gp[16, 16] + gk[16, 16] == pytest.approx(180.0)  # symmetry


def test_svf_flat_plane_is_one(spark):
    from lib_gdal_spark.operators.dem import sky_view_factor_kernel
    arr = np.full((32, 32), 7.0)
    got = _grid(dem_op_k(_tiles(spark, arr, 16), 4,
                         sky_view_factor_kernel), 32, 16)
    assert np.allclose(got[4:-4, 4:-4], 1.0)


def test_svf_bowl_below_one_peak_stays_one(spark):
    from lib_gdal_spark.operators.dem import sky_view_factor_kernel
    n = 33
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    r = np.sqrt((i - 16.0) ** 2 + (j - 16.0) ** 2)
    bowl = _grid(dem_op_k(_tiles(spark, r, 16), 8,
                          sky_view_factor_kernel), n, 16)
    cone = _grid(dem_op_k(_tiles(spark, -r, 16), 8,
                          sky_view_factor_kernel), n, 16)
    assert bowl[16, 16] < 0.5           # bowl center sees little sky
    assert cone[16, 16] == 1.0          # apex horizon never above level
    assert np.all(bowl[8:-8, 8:-8] <= 1.0)


def test_svf_matches_bruteforce(spark):
    from lib_gdal_spark.operators.dem import sky_view_factor_kernel
    arr = _terrain()
    k = 4
    got = _grid(dem_op_k(_tiles(spark, arr, 16), k,
                         sky_view_factor_kernel), 48, 16)
    pad = np.full((48 + 2 * k, 48 + 2 * k), np.nan)
    pad[k:-k, k:-k] = arr
    want = sky_view_factor_kernel(pad, k, 1.0, -1.0)
    inner = slice(k, 48 - k)
    assert np.array_equal(got[inner, inner], want[inner, inner])


def test_vrm_flat_and_smooth_slope_are_zeroish(spark):
    from lib_gdal_spark.operators.dem import vrm_kernel
    flat = np.full((32, 32), 3.0)
    g = _grid(dem_op_k(_tiles(spark, flat, 16), 2, vrm_kernel), 32, 16)
    assert np.allclose(g[2:-2, 2:-2], 0.0)
    # uniform planar slope: all normals parallel -> VRM == 0 exactly
    i, j = np.meshgrid(np.arange(32), np.arange(32), indexing="xy")
    plane = (2.0 * i + 1.0 * j).astype(float)
    gp = _grid(dem_op_k(_tiles(spark, plane, 16), 2, vrm_kernel), 32, 16)
    assert np.allclose(gp[2:-2, 2:-2], 0.0)


def test_vrm_rough_terrain_positive_and_matches_bruteforce(spark):
    from lib_gdal_spark.operators.dem import vrm_kernel
    arr = _terrain()
    k = 2
    got = _grid(dem_op_k(_tiles(spark, arr, 16), k, vrm_kernel), 48, 16)
    pad = np.full((48 + 2 * k, 48 + 2 * k), np.nan)
    pad[k:-k, k:-k] = arr
    want = vrm_kernel(pad, k, 1.0, -1.0)
    inner = slice(k, 48 - k)
    assert np.array_equal(got[inner, inner], want[inner, inner])
    assert np.nanmax(got[inner, inner]) > 0.0


def test_vrm_rejects_thin_halo(spark):
    from lib_gdal_spark.operators.dem import vrm_kernel
    with pytest.raises(ValueError, match="k >= 2"):
        vrm_kernel(np.zeros((10, 10)), 1, 1.0, -1.0)
