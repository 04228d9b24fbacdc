"""Solar exposure kernel: shadow geometry on a synthetic ridge and
local-kernel equivalence through the distributed halo exchange."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.dem import dem_op_k, solar_exposure_kernel
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA, tiles_from_array


def _tiles(spark, arr, tile=32):
    gt = (0.0, 1.0, 0.0, float(arr.shape[0]), 0.0, -1.0)
    rows = tiles_from_array("t", arr.astype(np.float64), gt, tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def _grid(df, n, tile=32):
    out = np.full((n, n), np.nan)
    for r in df.collect():
        h, w = int(r["tile_h"]), int(r["tile_w"])
        px = np.asarray(r["pixels"]).reshape(h, w)
        out[r["tile_y"] * tile:r["tile_y"] * tile + h,
            r["tile_x"] * tile:r["tile_x"] * tile + w] = px
    return out


def test_wall_casts_shadow_westward(spark):
    # flat plain with a tall north-south wall at x=40: cells just WEST
    # of the wall (sun due east, tan_alt=1/4) are shadowed; far cells
    # whose horizon angle drops below 1/4 are lit again
    arr = np.zeros((64, 64))
    arr[:, 40] = 10.0
    got = _grid(dem_op_k(_tiles(spark, arr), 8, solar_exposure_kernel), 64)
    assert got[32, 38] == -1.0        # 10/2 > 1/4 -> shadow
    assert got[32, 34] == -1.0        # 10/6 > 1/4 -> shadow
    # x=30 is 10 px from the wall: ratio 10/10 > 1/4 -> still shadow,
    # but the wall is outside the k=8 horizon -> lit (documented k cap)
    assert got[32, 30] > 0.0
    # flat lit plain: incidence = sin(alt) = 1/sqrt(17)
    assert abs(got[32, 50] - 1.0 / np.sqrt(17.0)) < 1e-12


def test_east_facing_slope_brighter_than_west(spark):
    j, i = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    east = _grid(dem_op_k(_tiles(spark, (-0.2 * i)), 8,
                          solar_exposure_kernel), 64)   # rises westward
    west = _grid(dem_op_k(_tiles(spark, (0.2 * i)), 8,
                          solar_exposure_kernel), 64)
    assert east[32, 32] > west[32, 32]


def test_matches_local_kernel(spark):
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 30, (64, 64)).astype(np.float64)
    got = _grid(dem_op_k(_tiles(spark, arr), 8, solar_exposure_kernel), 64)
    pad = np.full((80, 80), np.nan)
    pad[8:72, 8:72] = arr
    ref = solar_exposure_kernel(pad, 8, 1.0, -1.0)
    assert np.array_equal(got[8:56, 8:56], ref[8:56, 8:56])
