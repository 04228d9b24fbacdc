"""Fillnodata: distributed IDW fill == single-array reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lib_gdal_spark.operators import fillnodata as FN
from lib_gdal_spark.sources import rasters as RS


def _assemble(rows, h, w, tile):
    full = np.full((h, w), np.nan)
    for r in rows:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * tile : r["tile_y"] * tile + r["tile_h"],
             r["tile_x"] * tile : r["tile_x"] * tile + r["tile_w"]] = a
    return full


def _ref_fill(vals, max_dist, nodata):
    out = vals.copy()
    hy, hx = np.nonzero(vals == nodata)
    oy, ox = np.nonzero(vals != nodata)
    cv = vals[vals != nodata]
    for y, x in zip(hy, hx):
        d2 = (ox - x) ** 2.0 + (oy - y) ** 2.0
        m = d2 <= max_dist * max_dist
        if not m.any():
            continue
        w = 1.0 / np.maximum(d2[m], 1e-300)
        out[y, x] = (w * cv[m]).sum() / w.sum()
    return out


def test_fill_hole_spanning_tiles(spark):
    arr = RS.gradient(64).astype(np.float64)
    arr[28:36, 28:36] = -9999.0  # hole centered on the 2x2 tile cross
    rows = RS.tiles_from_array("f", arr, (0, 1, 0, 64, 0, -1), tile=32,
                               nodata=-9999.0)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = FN.fillnodata(tiles, max_dist=6.0, nodata=-9999.0, tile=32).collect()
    got = _assemble(out, 64, 64, 32)
    ref = _ref_fill(arr, 6.0, -9999.0)
    assert np.allclose(got, ref, rtol=1e-12, atol=1e-12)
    assert not np.any(got == -9999.0)  # hole radius < max_dist everywhere
    # valid pixels untouched
    assert np.array_equal(got[arr != -9999.0], arr[arr != -9999.0])


def test_unreachable_hole_stays_nodata(spark):
    arr = np.full((32, 32), -1.0)
    arr[0, 0] = 7.0
    rows = RS.tiles_from_array("g", arr, (0, 1, 0, 32, 0, -1), tile=32,
                               nodata=-1.0)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = FN.fillnodata(tiles, max_dist=3.0, nodata=-1.0, tile=32).collect()
    got = _assemble(out, 32, 32, 32)
    assert got[31, 31] == -1.0  # beyond reach
    assert got[0, 1] == 7.0  # reachable -> filled with the only value
