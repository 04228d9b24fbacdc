"""WKB ring tracing (polygonize_rings): shoelace identity + round trip.

Reference semantics: core/alg/polygonize.cpp:826 (RPolygonizer) — each
component emits its boundary polygon with holes. Invariants tested:
1. area_px (outer - holes, pixel units) == n_pixels exactly.
2. Re-rasterizing the emitted rings with the scanline kernel reproduces
   the original burned mask pixel-for-pixel (rasterize ∘ polygonize == id).
3. A component with an interior hole emits 2 rings; the hole subtracts.
4. Cross-tile components stitch seams into one closed boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.kernels import scanline as S
from lib_gdal_spark.operators import polygonize as PZ
from lib_gdal_spark.operators import rasterize as RZ
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA


def _tiles_from_array(spark, arr, tile=8):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            patch = arr[ty:ty + tile, tx:tx + tile]
            rows.append(dict(
                raster_id="t", band=1, zoom=0,
                tile_x=tx // tile, tile_y=ty // tile, dtype="float64",
                tile_w=patch.shape[1], tile_h=patch.shape[0],
                gt0=float(tx), gt1=1.0, gt2=0.0,
                gt3=float(ty), gt4=0.0, gt5=1.0,
                nodata=0.0, pixels=patch.ravel().tolist(),
            ))
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def _rings_to_mask(rows, h, w):
    """Even-odd re-rasterize every component's WKB at pixel centers."""
    out = np.zeros((h, w), dtype=np.float64)
    for r in sorted(rows, key=lambda r: r["component"]):
        gtype, polys = G.parse_wkb(bytes(r["wkb"]))
        assert gtype == G.WKB_MULTIPOLYGON
        for rings in polys:
            S.burn_values(out, [np.asarray(rg) for rg in rings], r["value"])
    return out


def test_rings_hole_and_identity(spark):
    # 10x10 block with a 4x4 hole, value 5; plus a separate 2x2 block value 3
    arr = np.zeros((24, 24))
    arr[2:12, 2:12] = 5.0
    arr[5:9, 5:9] = 0.0          # hole
    arr[14:16, 14:16] = 3.0
    tiles = _tiles_from_array(spark, arr, tile=8)
    rows = PZ.polygonize_rings(tiles, spark, grid_w=24, tile=8).collect()
    assert len(rows) == 2
    by_val = {r["value"]: r for r in rows}
    big = by_val[5.0]
    assert big["n_rings"] == 2          # outer + hole
    assert big["area_px"] == big["n_pixels"] == 100 - 16
    small = by_val[3.0]
    assert small["n_rings"] == 1
    assert small["area_px"] == small["n_pixels"] == 4
    # round trip
    mask = _rings_to_mask(rows, 24, 24)
    assert np.array_equal(mask, arr)


def test_rings_cross_tile_stitch(spark):
    # an L-shape spanning 4 tiles -> one component, one ring, exact area
    arr = np.zeros((16, 16))
    arr[3:13, 5:8] = 2.0
    arr[10:13, 5:14] = 2.0
    tiles = _tiles_from_array(spark, arr, tile=8)
    rows = PZ.polygonize_rings(tiles, spark, grid_w=16, tile=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rings"] == 1
    assert r["area_px"] == r["n_pixels"] == int((arr == 2.0).sum())
    mask = _rings_to_mask(rows, 16, 16)
    assert np.array_equal(mask, arr)


def test_rings_checkerboard_pinch(spark):
    # diagonal self-touch: U-shape closing to a diagonal corner contact
    arr = np.zeros((8, 8))
    arr[1, 1] = 9.0
    arr[2, 2] = 9.0  # touches (1,1) only diagonally -> separate 4-conn comps
    tiles = _tiles_from_array(spark, arr, tile=8)
    rows = PZ.polygonize_rings(tiles, spark, grid_w=8, tile=8).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["area_px"] == r["n_pixels"] == 1
    mask = _rings_to_mask(rows, 8, 8)
    assert np.array_equal(mask, arr)


def test_rings_world_coords_round_trip(spark):
    """Full pipeline on the pentagon fixture grid with world-coord gt."""
    grid = RZ.world_grid(256, 256, 64)
    ring = G.box_ring(-50.0, -40.0, 60.0, 45.0)
    polys = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon([ring])), 4.0)],
        "fid long, geom_wkb binary, burn double",
    ).coalesce(1)
    tiles = RZ.rasterize_polygons(polys, grid)
    gt = (grid.gt[0], grid.gt[1], 0.0, grid.gt[3], 0.0, grid.gt[5])
    rows = PZ.polygonize_rings(
        tiles, spark, grid_w=grid.width, tile=grid.tile, gt=gt
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["area_px"] == r["n_pixels"]
    # world-space ring must re-rasterize to the same mask on the world grid
    gtype, polys_w = G.parse_wkb(bytes(r["wkb"]))
    full = np.zeros((grid.height, grid.width))
    for rings in polys_w:
        px_rings = []
        for rg in rings:
            rga = np.asarray(rg)
            px, py = grid.world_to_px(rga[:, 0], rga[:, 1])
            px_rings.append(np.column_stack([px, py]))
        S.burn_values(full, px_rings, 4.0)
    ref = np.zeros((grid.height, grid.width))
    tl = RZ.rasterize_polygons(polys, grid).collect()
    for row in tl:
        a = np.asarray(row["pixels"]).reshape(row["tile_h"], row["tile_w"])
        ref[row["tile_y"] * 64:row["tile_y"] * 64 + row["tile_h"],
            row["tile_x"] * 64:row["tile_x"] * 64 + row["tile_w"]] = a
    assert np.array_equal(full, ref)
