"""Accumulated cost distance (operators/proximity.cost_distance)."""

import heapq
import math

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.proximity import cost_distance
from lib_gdal_spark.sources import rasters as RS

S2 = math.sqrt(2.0)
D8 = [(1, 0, 1.0), (1, 1, S2), (0, 1, 1.0), (-1, 1, S2),
      (-1, 0, 1.0), (-1, -1, S2), (0, -1, 1.0), (1, -1, S2)]


def dijkstra(cost, seeds, lo, hi):
    dist = {s: 0.0 for s in seeds}
    pq = [(0.0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, (x, y) = heapq.heappop(pq)
        if d > dist.get((x, y), math.inf):
            continue
        for dx, dy, mult in D8:
            nx, ny = x + dx, y + dy
            if not (lo <= nx <= hi and lo <= ny <= hi):
                continue
            nd = d + ((cost[y, x] + cost[ny, nx]) / 2.0) * mult
            if nd < dist.get((nx, ny), math.inf):
                dist[(nx, ny)] = nd
                heapq.heappush(pq, (nd, (nx, ny)))
    return dist


def _run(spark, arr, seeds, tile=32, lo=1, hi=None):
    h, w = arr.shape
    hi = hi if hi is not None else h - 2
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, h, 0, -1), tile=tile)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    return {(r["px"], r["py"]): r["dist"]
            for r in cost_distance(tiles, seeds, tile=tile, lo=lo,
                                   hi=hi).collect()}


def test_uniform_cost_is_chamfer_distance(spark):
    # constant cost 2 -> step costs are 2 / 2*sqrt(2): the chamfer metric
    arr = np.full((32, 32), 2.0)
    got = _run(spark, arr, [(15, 15)])
    for (px, py), d in got.items():
        ax, ay = abs(px - 15), abs(py - 15)
        want = 2.0 * (min(ax, ay) * S2 + abs(ax - ay))
        assert abs(d - round(want, 9)) < 1e-6, (px, py, d, want)


def test_rough_terrain_matches_dijkstra(spark):
    yy, xx = np.mgrid[0:40, 0:40]
    arr = np.trunc((np.sin(xx * 0.19) + np.cos(yy * 0.13)) * 60.0 + 128.0)
    seeds = [(5, 5), (38, 20)]
    got = _run(spark, arr, seeds, hi=38)
    want = dijkstra(arr, seeds, 1, 38)
    assert len(got) == 38 * 38
    for k, d in got.items():
        assert abs(d - want[k]) < 1e-9, (k, d, want[k])
    assert got[(5, 5)] == 0.0 and got[(38, 20)] == 0.0


def test_wall_forces_detour(spark):
    arr = np.full((32, 32), 1.0)
    arr[5:27, 16] = 1e6          # a costly wall with a gap at the top
    got = _run(spark, arr, [(5, 15)])
    # a cell just across the wall is reached around it, not through it
    assert got[(20, 15)] < 1e5
    assert got[(20, 15)] > got[(12, 15)]


def test_least_cost_path_descends_tree(spark):
    from lib_gdal_spark.operators.proximity import least_cost_path
    yy, xx = np.mgrid[0:40, 0:40]
    arr = np.trunc((np.sin(xx * 0.19) + np.cos(yy * 0.13)) * 60.0 + 128.0)
    seeds = [(5, 5), (38, 20)]
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, 40, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    path = least_cost_path(tiles, seeds, (20, 36), tile=32, lo=1,
                           hi=38).orderBy("step").collect()
    # starts at a seed, ends at the target, dist strictly increasing,
    # every step moves to an 8-neighbor, and the total matches dijkstra
    assert (path[0].px, path[0].py) in seeds and path[0].dist == 0.0
    assert (path[-1].px, path[-1].py) == (20, 36)
    want = dijkstra(arr, seeds, 1, 38)
    assert abs(path[-1].dist - want[(20, 36)]) < 1e-9
    for a, b in zip(path, path[1:]):
        assert max(abs(a.px - b.px), abs(a.py - b.py)) == 1
        assert b.dist > a.dist


def test_least_cost_path_rejects_zero_costs(spark):
    from lib_gdal_spark.operators.proximity import least_cost_path
    import pytest
    arr = np.zeros((32, 32))
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, 32, 0, -1), tile=16)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    with pytest.raises(ValueError, match="strictly positive"):
        least_cost_path(tiles, [(5, 15)], (25, 15), tile=16, lo=1, hi=30)


def test_cost_corridor_min_equals_path_cost(spark):
    """Corridor = dist_A + dist_B per cell; its raster minimum equals the
    least A->B path cost (the defining Corridor-tool identity), verified
    against a local Dijkstra on the same (cu+cv)/2 x sqrt(2) graph."""
    from lib_gdal_spark.operators.proximity import cost_corridor

    rng = np.random.default_rng(11)
    arr = rng.integers(1, 9, size=(24, 24)).astype(float)
    h, w = arr.shape
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, h, 0, -1), tile=16)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    seeds_a, seeds_b = [(2, 3)], [(20, 19)]
    got = {(r["px"], r["py"]): (r["dist_a"], r["dist_b"], r["corridor"])
           for r in cost_corridor(tiles, seeds_a, seeds_b, tile=16,
                                  lo=1, hi=h - 2).collect()}
    da = dijkstra(arr, seeds_a, 1, h - 2)
    db = dijkstra(arr, seeds_b, 1, h - 2)
    assert set(got) == set(da) & set(db)
    for k, (a, b, c) in got.items():
        assert abs(a - da[k]) < 1e-8 and abs(b - db[k]) < 1e-8
        assert abs(c - (round(a, 9) + round(b, 9))) < 1e-9
    # raster min of the corridor == least A->B path cost, attained at
    # every cell ON an optimal path (in particular at both seeds).
    best = min(c for _, _, c in got.values())
    assert abs(best - da[seeds_b[0]]) < 1e-8
    assert abs(got[seeds_a[0]][2] - best) < 1e-8


def test_cost_allocation_matches_dijkstra_argmin(spark):
    """Allocation label = the seed achieving the least accumulated cost,
    ties to the smallest seed key — verified against per-seed local
    Dijkstra runs."""
    from lib_gdal_spark.operators.proximity import cost_allocation

    rng = np.random.default_rng(77)
    arr = rng.integers(1, 9, size=(24, 24)).astype(float)
    h = arr.shape[0]
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, h, 0, -1), tile=16)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    seeds = [(2, 3), (20, 19), (12, 5)]
    got = {(r["px"], r["py"]): (r["dist"], r["seed_px"], r["seed_py"])
           for r in cost_allocation(tiles, seeds, tile=16,
                                    lo=1, hi=h - 2).collect()}
    per_seed = {s: dijkstra(arr, [s], 1, h - 2) for s in seeds}
    for (px, py), (d, sx, sy) in got.items():
        best = min(
            (per_seed[s].get((px, py), math.inf), s[1] * 65536 + s[0], s)
            for s in seeds)
        assert abs(d - best[0]) < 1e-8, (px, py)
        assert (sx, sy) == best[2], (px, py)
