"""Strahler stream order (operators/dem.strahler_order)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators import dem as D
from lib_gdal_spark.sources import rasters as RS

D8 = {1: (1, 0), 2: (1, 1), 4: (0, 1), 8: (-1, 1),
      16: (-1, 0), 32: (-1, -1), 64: (0, -1), 128: (1, -1)}


def _brute(arr, lo, hi):
    s2 = np.sqrt(2.0)
    succ = {}
    for y in range(lo, hi + 1):
        for x in range(lo, hi + 1):
            best, bt = 0.0, None
            for c, (dx, dy) in sorted(D8.items()):
                d = (arr[y, x] - arr[y + dy, x + dx]) / (s2 if dx and dy else 1.0)
                if d > best:
                    best, bt = d, (x + dx, y + dy)
            if bt and lo <= bt[0] <= hi and lo <= bt[1] <= hi:
                succ[(x, y)] = bt
    ups = {}
    for u, v in succ.items():
        ups.setdefault(v, []).append(u)
    order = {}
    frontier = [(x, y) for y in range(lo, hi + 1) for x in range(lo, hi + 1)
                if (x, y) not in ups]
    for c in frontier:
        order[c] = 1
    pend = {v: len(us) for v, us in ups.items()}
    got = {v: [] for v in ups}
    while frontier:
        nxt = []
        for u in frontier:
            v = succ.get(u)
            if v is None:
                continue
            got[v].append(order[u])
            pend[v] -= 1
            if pend[v] == 0:
                m = max(got[v])
                order[v] = m + (1 if got[v].count(m) >= 2 else 0)
                nxt.append(v)
        frontier = nxt
    return order


def _run(spark, arr, tile=32, lo=1, hi=62, **kw):
    h, w = arr.shape
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, h, 0, -1), tile=tile)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    return {(r["px"], r["py"]): r["strahler"]
            for r in D.strahler_order(tiles, tile=tile, lo=lo, hi=hi,
                                      **kw).collect()}


def test_rough_terrain_matches_bruteforce(spark):
    yy, xx = np.mgrid[0:64, 0:64]
    arr = np.trunc((np.sin(xx * 0.19) + np.cos(yy * 0.13)) * 60.0 + 128.0)
    got = _run(spark, arr)
    want = _brute(arr, 1, 62)
    assert len(got) == 62 * 62
    assert got == want
    assert max(got.values()) >= 3  # real terrain develops a hierarchy


def test_distributed_rounds_match_driver_dp(spark):
    # driver_threshold=0 forces the level-synchronous Spark rounds
    yy, xx = np.mgrid[0:32, 0:32]
    arr = np.trunc((np.sin(xx * 0.31) + np.cos(yy * 0.23)) * 40.0 + 100.0)
    fast = _run(spark, arr, hi=30)
    slow = _run(spark, arr, hi=30, driver_threshold=0)
    assert fast == slow and len(fast) == 30 * 30


def test_east_tilt_all_order_one(spark):
    # straight parallel channels never merge: order 1 everywhere
    arr = np.tile(np.arange(64, 0, -1, dtype=float), (64, 1))
    got = _run(spark, arr)
    assert set(got.values()) == {1}
