"""Sub-pixel contour -p polygons (alg/marching_squares/
polygon_ring_appender.h parity): band boundaries interpolated at exact
level crossings, stitched into closed rings, holes assigned to exteriors.

Invariants proved here:
- band areas telescope EXACTLY to the domain area (the level segments of
  adjacent bands cancel pairwise; the border pieces tile the border),
- each band's area matches the analytic annulus area to sub-pixel error,
- results are bitwise identical across tilings (1x1 vs 2x2 vs 4x4) — the
  tile-seam endpoint decomposition argument in band_boundary_segments,
- ring topology (outer/hole counts) matches the analytic fixture,
- polygon WKB parses back with rings in outer+holes order.
"""

import math

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import contour as CT

LEVELS = [256.0, 1024.0, 2304.0]


def _bullseye_tiles(spark, ntile, size=128):
    t = size // ntile
    rows = []
    for ty in range(ntile):
        for tx in range(ntile):
            yy, xx = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
            gx = tx * t + xx
            gy = ty * t + yy
            rr = (gx - 64.0) ** 2 + (gy - 64.0) ** 2
            rows.append({
                "raster_id": "bullseye", "band": 1, "zoom": 0,
                "tile_x": tx, "tile_y": ty, "dtype": "float64",
                "tile_w": t, "tile_h": t,
                "gt0": 0.0, "gt1": 1.0, "gt2": 0.0,
                "gt3": 0.0, "gt4": 0.0, "gt5": 1.0,
                "nodata": float("nan"),
                "pixels": rr.ravel().tolist(),
            })
    df = spark.createDataFrame(pd.DataFrame(rows))
    return df, t


def _bands(spark, ntile):
    tiles, t = _bullseye_tiles(spark, ntile)
    out = CT.contour_polygons_subpixel(tiles, LEVELS, 128, 128, tile=t)
    return sorted(out.collect(), key=lambda r: (r.band, r.area_px))


class TestContourSubpixel:
    def test_annulus_topology_and_areas(self, spark):
        rows = _bands(spark, 2)
        assert [r.band for r in rows] == [0, 1, 2, 3]
        assert [r.n_holes for r in rows] == [0, 1, 1, 1]
        assert [r.n_rings for r in rows] == [1, 2, 2, 2]
        assert rows[0].elev_min is None and rows[0].elev_max == 256.0
        assert rows[3].elev_min == 2304.0 and rows[3].elev_max is None
        # sub-pixel: within 0.2% of the analytic disk/annulus (chords
        # inscribe the circle, so the bias is one-sided and bounded)
        assert rows[0].area_px == pytest.approx(math.pi * 256, rel=2e-3)
        assert rows[1].area_px == pytest.approx(math.pi * 768, rel=2e-3)
        assert rows[2].area_px == pytest.approx(math.pi * 1280, rel=2e-3)
        # pixel-quantized would be off by whole pixels; sub-pixel is ~40x
        # closer (disk: quantized |err| > 1.5 px, interpolated < 0.05 px)
        assert abs(rows[0].area_px - math.pi * 256) < 1.1

    def test_telescoping_exact(self, spark):
        rows = _bands(spark, 2)
        total = sum(r.area_px for r in rows)
        assert total == pytest.approx(127.0 * 127.0, abs=1e-9)

    def test_tiling_invariance_bitwise(self, spark):
        per = {}
        for ntile in (1, 2, 4):
            per[ntile] = [(r.band, r.n_rings, r.n_holes, r.area_px)
                          for r in _bands(spark, ntile)]
        assert per[1] == per[2] == per[4]

    def test_wkb_rings_roundtrip(self, spark):
        from lib_gdal_spark.functions.geometry import WKB_POLYGON, parse_wkb
        rows = _bands(spark, 2)
        for r in rows:
            kind, rings = parse_wkb(bytes(r.wkb))
            assert kind == WKB_POLYGON
            assert len(rings) == r.n_rings
            for ring in rings:
                assert tuple(ring[0]) == tuple(ring[-1])  # closed
            # world mapping is identity gt + pixel-center offset
            assert rings[0][:, 0].min() >= 0.0

    def test_band_rings_signed_areas(self, spark):
        tiles, t = _bullseye_tiles(spark, 2)
        rings = CT.contour_band_rings(tiles, LEVELS, 128, 128, tile=t)
        pdf = rings.toPandas()
        # exteriors positive, holes negative, one hole per band 1..3
        assert (pdf[~pdf.is_hole].area_px > 0).all()
        assert (pdf[pdf.is_hole].area_px < 0).all()
        assert pdf.groupby("band").is_hole.sum().tolist() == [0, 1, 1, 1]

    def test_border_crossing_bands(self, spark):
        # gradient raster: levels DO cross the domain border, so border
        # pieces split mid-edge; areas must still telescope exactly and
        # match the analytic trapezoids
        arr = np.tile(np.arange(32, dtype=np.float64), (16, 1))
        rows = []
        for tx in range(2):
            rows.append({
                "raster_id": "grad", "band": 1, "zoom": 0,
                "tile_x": tx, "tile_y": 0, "dtype": "float64",
                "tile_w": 16, "tile_h": 16,
                "gt0": 0.0, "gt1": 1.0, "gt2": 0.0,
                "gt3": 0.0, "gt4": 0.0, "gt5": 1.0,
                "nodata": float("nan"),
                "pixels": arr[:, tx * 16:(tx + 1) * 16].ravel().tolist(),
            })
        tiles = spark.createDataFrame(pd.DataFrame(rows))
        out = CT.contour_polygons_subpixel(
            tiles, [10.5, 20.5], 32, 16, tile=16)
        got = sorted(out.collect(), key=lambda r: r.band)
        assert [r.band for r in got] == [0, 1, 2]
        assert all(r.n_holes == 0 for r in got)
        # vertical iso-lines at x = 10.5 and 20.5 over a 31 x 15 domain
        assert got[0].area_px == pytest.approx(10.5 * 15.0, abs=1e-9)
        assert got[1].area_px == pytest.approx(10.0 * 15.0, abs=1e-9)
        assert got[2].area_px == pytest.approx(10.5 * 15.0, abs=1e-9)

    def test_world_area_scaling(self, spark):
        tiles, t = _bullseye_tiles(spark, 1)
        gt = [100.0, 0.25, 0.0, 50.0, 0.0, -0.5]
        out = CT.contour_polygons_subpixel(
            tiles, LEVELS, 128, 128, tile=t, gt=gt)
        pdf = out.toPandas()
        assert np.allclose(pdf.area_world, pdf.area_px * 0.125)
