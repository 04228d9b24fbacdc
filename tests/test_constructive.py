"""Constructive geometry vs closed-form expectations."""

import numpy as np
import pytest

from lib_gdal_spark.functions import constructive as CG
from lib_gdal_spark.functions import overlay as OV


def box(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def test_distance():
    # disjoint boxes: corner-to-corner
    d = CG.distance([box(0, 0, 1, 1)], [box(3, 3, 4, 4)])
    assert d == pytest.approx(np.hypot(2, 2))
    # edge-facing boxes: gap
    assert CG.distance([box(0, 0, 1, 1)], [box(2.5, 0, 4, 1)]) == pytest.approx(1.5)
    # overlapping / containing -> 0
    assert CG.distance([box(0, 0, 2, 2)], [box(1, 1, 3, 3)]) == 0.0
    assert CG.distance([box(0, 0, 5, 5)], [box(1, 1, 2, 2)]) == 0.0


def test_centroid():
    cx, cy = CG.centroid([box(0, 0, 4, 2)])
    assert (cx, cy) == (pytest.approx(2.0), pytest.approx(1.0))
    # holed square: centroid shifts away from the hole
    cx, cy = CG.centroid([box(0, 0, 4, 4), box(2, 1, 3, 2)[::-1]])
    # exact: (total 16*[2,2] - hole 1*[2.5,1.5]) / 15
    assert cx == pytest.approx((16 * 2.0 - 2.5) / 15.0)
    assert cy == pytest.approx((16 * 2.0 - 1.5) / 15.0)


def test_convex_hull():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3], [3, 1]])
    hull = CG.convex_hull(pts)
    assert abs(OV.ring_area(hull)) == pytest.approx(16.0)
    assert len(hull) == 5  # 4 corners + closure


def test_simplify():
    # square with collinear mid-edge points + tiny jag
    r = np.array([[0, 0], [2, 0.001], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    out = CG.simplify(r, tolerance=0.01)
    assert len(out) == 5
    out2 = CG.simplify(r, tolerance=1e-6)
    assert len(out2) == 6  # jag preserved below tolerance


def test_buffer_point_area():
    polys = CG.buffer_point(0.0, 0.0, 2.0, quadsegs=16)
    a = OV.polys_area(polys)
    # inscribed 64-gon area -> pi r^2 as quadsegs grows
    assert a == pytest.approx(np.pi * 4.0, rel=2e-3)


def test_buffer_polygon_dilate_erode():
    sq = box(0, 0, 10, 10)
    grown = CG.buffer_polygon([sq], 1.0, quadsegs=8)
    ga = OV.polys_area(grown)
    # square buffer: area + perimeter*d + pi d^2 (corner arcs), n-gon approx
    expect = 100.0 + 40.0 * 1.0 + np.pi * 1.0
    assert ga == pytest.approx(expect, rel=5e-3)
    shrunk = CG.buffer_polygon([sq], -1.0, quadsegs=8)
    sa = OV.polys_area(shrunk)
    assert sa == pytest.approx(64.0, rel=5e-3)  # 8x8 core
    # erosion that consumes the polygon entirely
    gone = CG.buffer_polygon([box(0, 0, 1, 1)], -2.0)
    assert OV.polys_area(gone) == pytest.approx(0.0, abs=1e-9)


def test_boundary_segmentize():
    b = CG.boundary([box(0, 0, 2, 2)])
    assert len(b) == 1 and len(b[0]) == 5
    s = CG.segmentize(box(0, 0, 3, 3), 1.0)
    d = np.hypot(*(np.diff(s, axis=0).T))
    assert d.max() <= 1.0 + 1e-12
    assert len(s) == 13  # 4 edges x 3 subdivisions + closure


def test_make_valid_bowtie():
    # self-intersecting bowtie normalizes to two triangles, area 2
    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)
    mv = CG.make_valid([bow])
    assert OV.polys_area(mv) == pytest.approx(2.0)


def test_point_on_surface_holed():
    rings = [box(0, 0, 10, 10), box(2, 2, 8, 8)]
    x, y = CG.point_on_surface(rings)
    assert OV._point_in_rings_eo(x, y, rings)


def test_force_to_multipolygon():
    from lib_gdal_spark.functions import geometry as G
    w = G.wkb_polygon([box(0, 0, 1, 1)])
    mw = CG.force_to_multipolygon(w)
    gt, p = G.parse_wkb(mw)
    assert gt == G.WKB_MULTIPOLYGON and len(p) == 1
    assert CG.force_to_multipolygon(mw) == mw
