"""Sieve filter: small components merge into their largest neighbor."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lib_gdal_spark.operators import sieve as SV
from lib_gdal_spark.sources import rasters as RS


def _tiles(spark, arr, tile=32):
    rows = RS.tiles_from_array("s", arr, (0, 1, 0, float(arr.shape[0]), 0, -1),
                               tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)


def _assemble(rows, h, w, tile):
    full = np.full((h, w), np.nan)
    for r in rows:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * tile : r["tile_y"] * tile + r["tile_h"],
             r["tile_x"] * tile : r["tile_x"] * tile + r["tile_w"]] = a
    return full


def test_small_island_absorbed(spark):
    arr = np.zeros((64, 64))
    arr[20:24, 20:24] = 7.0  # 16-px island inside a huge 0-background
    tiles = _tiles(spark, arr)
    out = SV.sieve(tiles, spark, grid_w=64, threshold=20, tile=32).collect()
    full = _assemble(out, 64, 64, 32)
    assert np.all(full == 0.0)


def test_large_island_survives(spark):
    arr = np.zeros((64, 64))
    arr[10:40, 10:40] = 7.0  # 900 px
    tiles = _tiles(spark, arr)
    out = SV.sieve(tiles, spark, grid_w=64, threshold=20, tile=32).collect()
    full = _assemble(out, 64, 64, 32)
    assert np.array_equal(full, arr)


def test_merge_into_largest_neighbor(spark):
    # a 1-wide stripe (small) sandwiched between value-1 (large) and
    # value-2 (larger) regions -> absorbed into value 2
    arr = np.zeros((64, 64))
    arr[:, :20] = 1.0
    arr[:, 20:22] = 9.0  # 128 px stripe, threshold 200
    arr[:, 22:] = 2.0
    tiles = _tiles(spark, arr)
    out = SV.sieve(tiles, spark, grid_w=64, threshold=200, tile=32).collect()
    full = _assemble(out, 64, 64, 32)
    assert np.all(full[:, 20:22] == 2.0)  # larger neighbor wins
    assert np.all(full[:, :20] == 1.0)
    assert np.all(full[:, 22:] == 2.0)


def test_cross_tile_component_counted_whole(spark):
    # a component split across 4 tiles whose TOTAL exceeds the threshold
    # must survive even though each per-tile part is small
    arr = np.zeros((64, 64))
    arr[28:36, 28:36] = 5.0  # 64 px centered on the 2x2 tile cross
    tiles = _tiles(spark, arr)
    out = SV.sieve(tiles, spark, grid_w=64, threshold=50, tile=32).collect()
    full = _assemble(out, 64, 64, 32)
    assert np.array_equal(full, arr)
    out2 = SV.sieve(tiles, spark, grid_w=64, threshold=100, tile=32).collect()
    full2 = _assemble(out2, 64, 64, 32)
    assert np.all(full2 == 0.0)
