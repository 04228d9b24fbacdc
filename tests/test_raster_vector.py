"""Rasterize -> polygonize round trip (SURVEY.md §2.9).

Oracle strategy: a single-process NumPy reference burns the same polygons
into one full-grid array with the same scanline kernel; the distributed
tile path must assemble to the identical array, and polygonize must report
exactly one component per (disjoint) polygon with matching pixel counts
and bounding boxes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.kernels import scanline as S
from lib_gdal_spark.operators import polygonize as PZ
from lib_gdal_spark.operators import rasterize as RZ


def _pentagon(cx, cy, r, phase, n=5):
    ang = 2 * np.pi * np.arange(n + 1) / n + phase
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


@pytest.fixture(scope="module")
def polys(spark):
    rows = []
    for fid, (cx, cy, r, ph) in enumerate(
        [(-74.1, 40.7, 14.0, 0.3), (10.1, 48.1, 18.0, 0.7),
         (116.3, -30.5, 22.0, 1.1)], start=1
    ):
        ring = _pentagon(cx, cy, r, ph)
        rows.append((fid, bytearray(G.wkb_polygon([ring])), float(fid)))
    return spark.createDataFrame(
        rows, "fid long, geom_wkb binary, burn double"
    ).coalesce(1)


def _reference_burn(polys_rows, grid):
    full = np.zeros((grid.height, grid.width), dtype=np.float64)
    for fid, wkb, burn in sorted(polys_rows, key=lambda r: r[0]):
        rings = G.polygon_rings(bytes(wkb))
        px_rings = []
        for r in rings:
            px, py = grid.world_to_px(r[:, 0], r[:, 1])
            px_rings.append(np.column_stack([px, py]))
        S.burn_values(full, px_rings, burn)
    return full


def test_rasterize_matches_single_process_oracle(spark, polys):
    grid = RZ.world_grid(256, 256, 64)
    tiles = RZ.rasterize_polygons(polys, grid).collect()
    full = np.zeros((grid.height, grid.width), dtype=np.float64)
    for row in tiles:
        arr = np.asarray(row["pixels"]).reshape(row["tile_h"], row["tile_w"])
        y0 = row["tile_y"] * grid.tile
        x0 = row["tile_x"] * grid.tile
        full[y0 : y0 + row["tile_h"], x0 : x0 + row["tile_w"]] = arr
    ref = _reference_burn(polys.collect(), grid)
    assert np.array_equal(full, ref)
    assert ref.sum() > 0  # something actually burned


def test_rasterize_merge_alg_add(spark):
    # two overlapping squares accumulate under MERGE_ALG=ADD
    sq1 = G.box_ring(-10.0, -10.0, 10.0, 10.0)
    sq2 = G.box_ring(0.0, 0.0, 20.0, 20.0)
    polys = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon([sq1])), 1.0),
         (2, bytearray(G.wkb_polygon([sq2])), 1.0)],
        "fid long, geom_wkb binary, burn double",
    ).coalesce(1)
    grid = RZ.world_grid(256, 256, 64)
    tiles = RZ.rasterize_polygons(polys, grid, merge_alg="add")
    top = (
        tiles.select(F.explode("pixels").alias("v"))
        .groupBy("v").count().orderBy("v").collect()
    )
    vals = {r["v"]: r["count"] for r in top}
    assert 2.0 in vals  # overlap region accumulated
    assert vals.get(1.0, 0) > vals[2.0]


def test_polygonize_round_trip(spark, polys):
    grid = RZ.world_grid(256, 256, 64)
    tiles = RZ.rasterize_polygons(polys, grid)
    comps = PZ.polygonize(tiles, spark, grid_w=grid.width,
                          tile=grid.tile).collect()
    ref = _reference_burn(polys.collect(), grid)
    # one component per disjoint pentagon, exact pixel counts + bboxes
    assert len(comps) == 3
    for c in comps:
        mask = ref == c["value"]
        assert c["n_pixels"] == int(mask.sum())
        ys, xs = np.nonzero(mask)
        assert (c["min_px"], c["max_px"]) == (xs.min(), xs.max())
        assert (c["min_py"], c["max_py"]) == (ys.min(), ys.max())
        # component id = global index of the component seed (min) pixel
        assert c["component"] == int((ys * grid.width + xs).min())


def test_polygonize_merges_across_tiles(spark):
    # a thin horizontal bar crossing all 4 tile columns must be ONE component
    bar = G.box_ring(-170.0, 0.1, 170.0, 10.0)
    polys = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon([bar])), 7.0)],
        "fid long, geom_wkb binary, burn double",
    ).coalesce(1)
    grid = RZ.world_grid(256, 256, 64)
    tiles = RZ.rasterize_polygons(polys, grid)
    comps = PZ.polygonize(tiles, spark, grid_w=grid.width, tile=grid.tile)
    rows = comps.collect()
    assert len(rows) == 1
    assert rows[0]["value"] == 7.0


def test_label_tile_shapes():
    # U-shape: one component despite needing propagation around the bend
    a = np.zeros((8, 8))
    a[1:7, 1] = 5
    a[6, 1:7] = 5
    a[1:7, 6] = 5
    lab = PZ._label_tile(a, background=0.0)
    fg = lab[a == 5]
    assert (fg >= 0).all() and len(set(fg.tolist())) == 1
    # two separate values -> two components even when touching
    b = np.zeros((4, 4))
    b[0, :] = 1
    b[1, :] = 2
    lab = PZ._label_tile(b, background=0.0)
    assert len(set(lab[b == 1].tolist())) == 1
    assert len(set(lab[b == 2].tolist())) == 1
    assert set(lab[b == 1].tolist()) != set(lab[b == 2].tolist())
