"""HAND: valley-floor drainage gets 0, slopes get positive height,
a planted isolated pit (never reaching drainage) gets NULL."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.dem import hand
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA, tiles_from_array


def _tiles(spark, arr, tile=32):
    gt = (0.0, 1.0, 0.0, float(arr.shape[0]), 0.0, -1.0)
    rows = tiles_from_array("t", arr.astype(np.float64), gt, tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def test_v_valley_hand(spark):
    # V-valley: z = |x - 32|, a north-flowing channel at x=32 by adding
    # a gentle southward... keep it simple: tilt so the channel drains
    n = 64
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    arr = (np.abs(i - 32) * 10 + (n - j)).astype(np.float64)
    out = hand(_tiles(spark, arr), threshold=30, lo=1, hi=62,
               tile=32).collect()
    got = {(r["px"], r["py"]): r for r in out}
    # channel cells accumulate the whole hillslope -> drainage, HAND 0
    ch = got[(32, 40)]
    assert ch["drained"] == 1 and ch["hand"] == 0
    # a hillslope cell: drains to the channel, HAND == its offset * 10
    hill = got[(36, 40)]
    assert hill["drained"] == 1
    assert hill["hand"] > 0
    # HAND equals z(cell) - z(landing drainage cell) exactly
    land = hill["land"]
    lx, ly = land % 65536, land // 65536
    assert hill["hand"] == int(arr[40, 36] - arr[ly, lx])


def test_isolated_pit_not_drained(spark):
    # bowl in a corner, walled off: its pit never reaches the channel
    n = 64
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    arr = (np.abs(i - 32) * 10 + (n - j)).astype(np.float64)
    arr[3:8, 3:8] = 500.0          # high walls
    arr[5, 5] = 1.0                # deep pit inside
    out = hand(_tiles(spark, arr), threshold=30, lo=1, hi=62,
               tile=32).collect()
    got = {(r["px"], r["py"]): r for r in out}
    pit = got[(5, 5)]
    assert pit["drained"] == 0 and pit["hand"] is None
