"""Categorical zonal stats (operators/stats.zonal_majority)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.stats import zonal_majority


def _tiles(spark, arr, name):
    rows = []
    h, w = arr.shape
    t = 8
    for ty in range(h // t):
        for tx in range(w // t):
            rows.append((tx, ty,
                         arr[ty * t:(ty + 1) * t,
                             tx * t:(tx + 1) * t].ravel().tolist()))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_x", "tile_y", "pixels"]),
        schema="tile_x int, tile_y int, pixels array<double>")


def test_majority_minority_variety(spark):
    zones = np.zeros((16, 16))
    zones[:, :8] = 1.0   # zone 1 left, zone 2 right
    zones[:, 8:] = 2.0
    vals = np.zeros((16, 16))
    vals[:, :8] = 7.0            # zone 1: all 7s except one 3
    vals[0, 0] = 3.0
    vals[:, 8:] = np.tile([4.0, 4.0, 5.0, 5.0, 5.0, 9.0, 9.0, 9.0],
                          (16, 1))  # zone 2: 4x32 5x48 9x48
    got = {r["zone"]: r for r in
           zonal_majority(_tiles(spark, zones, "z"),
                          _tiles(spark, vals, "v")).collect()}
    z1, z2 = got[1.0], got[2.0]
    assert (z1["majority"], z1["maj_count"]) == (7, 127)
    assert (z1["minority"], z1["min_count"]) == (3, 1)
    assert z1["variety"] == 2
    # zone 2 ties: 5 and 9 both 48 -> majority = 5 (smaller value);
    # minority = 4 (count 32)
    assert (z2["majority"], z2["maj_count"]) == (5, 48)
    assert (z2["minority"], z2["min_count"]) == (4, 32)
    assert z2["variety"] == 3
