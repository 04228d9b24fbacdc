"""gdal_footprint + gdalcompare operators."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lib_gdal_spark.operators.compare import compare_rasters
from lib_gdal_spark.operators.footprint import footprint
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA, tiles_from_array


def _tiles(spark, arr, gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), tile=8):
    rows = tiles_from_array("t", arr, gt, tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


class TestFootprint:
    def test_holed_region(self, spark):
        # 16x16, one 10x10 valid block with a 2x2 nodata hole inside
        arr = np.zeros((16, 16), dtype=np.float64)
        arr[2:12, 3:13] = 7.0
        arr[5:7, 6:8] = 0.0  # hole
        tiles = _tiles(spark, arr)
        out = footprint(tiles, spark, grid_w=16, tile=8, nodata=0.0).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_pixels == 100 - 4
        assert r.n_rings == 2  # outer + hole
        assert r.area_px == 96.0
        assert r.area == 96.0  # no gt -> pixel units

    def test_two_components_and_det_scaling(self, spark):
        arr = np.zeros((16, 16), dtype=np.float64)
        arr[1:4, 1:4] = 5.0        # 9 px
        arr[10:14, 10:15] = 3.0    # 20 px, different value, same mask
        gt = (100.0, 0.25, 0.0, 50.0, 0.0, -0.5)
        tiles = _tiles(spark, arr, gt=gt)
        out = footprint(tiles, spark, grid_w=16, tile=8,
                        nodata=0.0, gt=gt)
        rows = sorted(out.collect(), key=lambda r: r.n_pixels)
        assert [r.n_pixels for r in rows] == [9, 20]
        assert rows[0].area == 9 * 0.125  # |0.25 * -0.5|
        assert rows[1].area == 20 * 0.125

    def test_touching_values_merge(self, spark):
        # two adjacent blocks of different values form ONE footprint
        arr = np.zeros((8, 8), dtype=np.float64)
        arr[2:4, 2:4] = 1.0
        arr[2:4, 4:6] = 2.0
        tiles = _tiles(spark, arr)
        out = footprint(tiles, spark, grid_w=8, tile=8, nodata=0.0).collect()
        assert len(out) == 1
        assert out[0].n_pixels == 8


class TestCompare:
    def test_identical(self, spark):
        arr = np.arange(64, dtype=np.float64).reshape(8, 8)
        a = _tiles(spark, arr)
        out = compare_rasters(a, _tiles(spark, arr)).collect()[0]
        assert out.n_pixels == 64 and out.n_diff == 0
        assert out.max_abs_diff == 0.0 and out.sum_abs_diff == 0.0

    def test_perturbed(self, spark):
        arr = np.arange(64, dtype=np.float64).reshape(8, 8)
        arr2 = arr.copy()
        arr2[0, 0] += 3.0
        arr2[7, 7] -= 10.0
        out = compare_rasters(_tiles(spark, arr), _tiles(spark, arr2)).collect()[0]
        assert out.n_diff == 2
        assert out.max_abs_diff == 10.0
        assert out.sum_abs_diff == 13.0

    def test_missing_tile_counts_as_diff(self, spark):
        arr = np.arange(256, dtype=np.float64).reshape(16, 16)
        a = _tiles(spark, arr)
        b = _tiles(spark, arr).where(F.col("tile_x") == 0)
        out = compare_rasters(a, b).collect()[0]
        assert out.n_pixels == 256
        assert out.n_diff == 128  # two missing 8x8 tiles
        assert np.isinf(out.max_abs_diff)
