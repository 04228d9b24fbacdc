"""D8 flow accumulation (operators/dem.d8_flow_accumulation)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators import dem as D
from lib_gdal_spark.sources import rasters as RS

D8 = {1: (1, 0), 2: (1, 1), 4: (0, 1), 8: (-1, 1),
      16: (-1, 0), 32: (-1, -1), 64: (0, -1), 128: (1, -1)}


def _brute(arr, lo, hi):
    """Walk every cell's D8 path; count visits per cell (excl. self)."""
    h, w = arr.shape
    s2 = np.sqrt(2.0)
    acc = {}

    def code(x, y):
        e = arr[y, x]
        best, bc = 0.0, 0
        for c, (dx, dy) in sorted(D8.items()):
            nx, ny = x + dx, y + dy
            d = (e - arr[ny, nx]) / (s2 if dx and dy else 1.0)
            if d > best:
                best, bc = d, c
        return bc

    for y in range(lo, hi + 1):
        for x in range(lo, hi + 1):
            cx, cy = x, y
            while True:
                c = code(cx, cy)
                if c == 0:
                    break
                dx, dy = D8[c]
                nx, ny = cx + dx, cy + dy
                if not (lo <= nx <= hi and lo <= ny <= hi):
                    break
                acc[(nx, ny)] = acc.get((nx, ny), 0) + 1
                cx, cy = nx, ny
    return acc


def _run(spark, arr, tile=32, lo=1, hi=62):
    h, w = arr.shape
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, h, 0, -1), tile=tile)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    return {(r["px"], r["py"]): r["acc"]
            for r in D.d8_flow_accumulation(
                tiles, tile=tile, lo=lo, hi=hi).collect()}


def test_east_tilt_row_prefix_counts(spark):
    # everything flows EAST: accumulation at column x is x - 1 upstream
    # cells in its row (cells lo..x-1), 0 at the western edge
    arr = np.tile(np.arange(64, 0, -1, dtype=float), (64, 1))
    got = _run(spark, arr)
    for (px, py), a in got.items():
        assert a == px - 1, (px, py, a)


def test_bowl_matches_bruteforce(spark):
    yy, xx = np.mgrid[0:64, 0:64]
    arr = ((xx - 31.3) ** 2 + (yy - 30.7) ** 2).astype(float)
    got = _run(spark, arr)
    want = _brute(arr, 1, 62)
    for (px, py), a in got.items():
        assert a == want.get((px, py), 0), (px, py, a)
    # the pit collects every other interior cell
    assert got[(31, 31)] == 62 * 62 - 1


def test_rough_terrain_matches_bruteforce(spark):
    yy, xx = np.mgrid[0:64, 0:64]
    arr = np.trunc((np.sin(xx * 0.19) + np.cos(yy * 0.13)) * 60.0 + 128.0)
    got = _run(spark, arr)
    want = _brute(arr, 1, 62)
    assert len(got) == 62 * 62
    for (px, py), a in got.items():
        assert a == want.get((px, py), 0), (px, py, a)


def test_twi_composes_acc_and_slope(spark):
    """dem_twi == ln((acc+1)/max(tan(slope),1e-3)) recomputed from the
    two component operators independently."""
    yy, xx = np.mgrid[0:64, 0:64]
    arr = np.trunc((np.sin(xx * 0.19) + np.cos(yy * 0.13)) * 60.0 + 128.0)
    rows = RS.tiles_from_array("t", arr, (0, 1.40625, 0, 64, 0, -0.703125),
                               tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    got = {(r["px"], r["py"]): r["twi"]
           for r in D.dem_twi(tiles, tile=32, flow_lo=1, flow_hi=62)
           .collect()}
    assert len(got) == 62 * 62
    acc = _brute(arr, 1, 62)
    sl = {}
    out = D.dem_op(tiles, "slope").collect()
    for r in out:
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        for j in range(r["tile_h"]):
            for i in range(r["tile_w"]):
                sl[(r["tile_x"] * 32 + i, r["tile_y"] * 32 + j)] = a[j, i]
    for (px, py), twi in got.items():
        want = np.log((acc.get((px, py), 0) + 1.0)
                      / max(np.tan(np.radians(sl[(px, py)])), 0.001))
        assert abs(twi - want) < 1e-12, (px, py)


def test_flow_length_matches_brute_walk(spark):
    rng = np.random.default_rng(21)
    arr = (rng.integers(0, 50, size=(40, 40)).astype(float)
           + np.arange(40)[None, :] * 0.5)  # gentle eastward tilt
    lo, hi = 1, 38
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, 40, 0, -1), tile=16)
    tiles = spark.createDataFrame(pd.DataFrame(rows),
                                  schema=RS.RASTER_SCHEMA)
    got = {(r["px"], r["py"]): (r["n_card"], r["n_diag"], r["flow_len"])
           for r in D.d8_flow_length(tiles, tile=16, lo=lo,
                                     hi=hi).collect()}
    s2 = np.sqrt(2.0)

    def code(x, y):
        e = arr[y, x]
        best, bc = 0.0, 0
        for c, (dx, dy) in sorted(D8.items()):
            d = (e - arr[y + dy, x + dx]) / (s2 if dx and dy else 1.0)
            if d > best:
                best, bc = d, c
        return bc

    for y in range(lo, hi + 1):
        for x in range(lo, hi + 1):
            cx, cy, nc, nd = x, y, 0, 0
            while True:
                c = code(cx, cy)
                if c == 0:
                    break
                dx, dy = D8[c]
                nx, ny = cx + dx, cy + dy
                if not (lo <= nx <= hi and lo <= ny <= hi):
                    break
                if dx and dy:
                    nd += 1
                else:
                    nc += 1
                cx, cy = nx, ny
            g = got[(x, y)]
            assert (g[0], g[1]) == (nc, nd), (x, y)
            assert abs(g[2] - round(nc + s2 * nd, 9)) < 1e-12


def test_flow_length_upstream_matches_brute(spark):
    from lib_gdal_spark.operators.dem import (
        FLOWLEN_CARD_UNITS, FLOWLEN_DIAG_UNITS, d8_flow_length_upstream)

    rng = np.random.default_rng(29)
    arr = (rng.integers(0, 50, size=(36, 36)).astype(float)
           + np.arange(36)[None, :] * 0.4)
    lo, hi = 1, 34
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, 36, 0, -1), tile=12)
    tiles = spark.createDataFrame(pd.DataFrame(rows),
                                  schema=RS.RASTER_SCHEMA)
    got = {(r["px"], r["py"]): r["upstream_units"]
           for r in d8_flow_length_upstream(tiles, tile=12, lo=lo,
                                            hi=hi).collect()}
    s2 = np.sqrt(2.0)

    def code(x, y):
        e = arr[y, x]
        best, bc = 0.0, 0
        for c, (dx, dy) in sorted(D8.items()):
            d = (e - arr[y + dy, x + dx]) / (s2 if dx and dy else 1.0)
            if d > best:
                best, bc = d, c
        return bc

    ref = {}
    for y in range(lo, hi + 1):
        for x in range(lo, hi + 1):
            cx, cy, units = x, y, 0
            while True:
                c = code(cx, cy)
                if c == 0:
                    break
                dx, dy = D8[c]
                nx, ny = cx + dx, cy + dy
                if not (lo <= nx <= hi and lo <= ny <= hi):
                    break
                units += (FLOWLEN_DIAG_UNITS if dx and dy
                          else FLOWLEN_CARD_UNITS)
                cx, cy = nx, ny
                ref[(cx, cy)] = max(ref.get((cx, cy), 0), units)
    for y in range(lo, hi + 1):
        for x in range(lo, hi + 1):
            assert got[(x, y)] == ref.get((x, y), 0), (x, y)
