"""Curve geometry types: WKB/WKT codec + linearization (GetCurveParmeters
circumcenter math, 4-degree default stroking, full-circle convention)."""

import numpy as np

from lib_gdal_spark.functions import curves as CV
from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.functions import wkt as W


def test_curve_parameters_circumcenter():
    # semicircle over (0,0)-(1,1)-(2,0): center (1,0), R=1, CCW? det sign:
    # (1,1)->(2,0) turns clockwise -> angles decrease
    R, cx, cy, a0, a1, a2 = CV.get_curve_parameters(0, 0, 1, 1, 2, 0)
    assert abs(R - 1.0) < 1e-12 and abs(cx - 1.0) < 1e-12 and abs(cy) < 1e-12
    assert a0 > a1 > a2  # clockwise ordering
    # collinear -> None
    assert CV.get_curve_parameters(0, 0, 1, 1, 2, 2) is None
    # full circle (p0 == p2): CCW through the midpoint, span 2*pi
    R, cx, cy, a0, a1, a2 = CV.get_curve_parameters(0, 0, 2, 0, 0, 0)
    assert abs(R - 1.0) < 1e-12 and abs(cx - 1.0) < 1e-12
    assert abs((a2 - a0) - 2 * np.pi) < 1e-12


def test_linearize_semicircle():
    arr = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    pts = CV.linearize_circularstring(arr)
    # endpoints + explicit intermediate exact
    assert np.array_equal(pts[0], [0, 0]) and np.array_equal(pts[-1], [2, 0])
    assert any(np.array_equal(p, [1, 1]) for p in pts)
    # every vertex on the circle |p - (1,0)| == 1
    d = np.hypot(pts[:, 0] - 1.0, pts[:, 1]) - 1.0
    assert np.max(np.abs(d)) < 1e-12
    # 4-degree default step over 180 degrees -> ~46+ points
    assert len(pts) >= 45
    # chord error bound: max deviation of midpoints ~ R*(1-cos(2deg))
    assert len(pts) <= 60


def test_stroke_direction_symmetry():
    """Reversed endpoints stroke the same points in reverse
    (curveToLineString's symmetry guarantee)."""
    fwd = CV.stroke_arc3([0, 0], [1, 1], [2, 0])
    rev = CV.stroke_arc3([2, 0], [1, 1], [0, 0])
    assert np.allclose(fwd, rev[::-1], atol=1e-9)


def test_curvepolygon_area():
    """Full-circle CURVEPOLYGON linearizes to ~pi*R^2 area."""
    wkb = W.wkt_to_wkb("CURVEPOLYGON (CIRCULARSTRING (0 0, 2 0, 0 0))")
    lin = CV.curve_to_line(wkb)
    base, rings = G.parse_wkb(lin)
    assert base == G.WKB_POLYGON
    ring = rings[0]
    assert np.array_equal(ring[0], ring[-1])  # closed
    x, y = ring[:-1, 0], ring[:-1, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert abs(area - np.pi) < 0.01  # R=1; 4-degree stroking error ~0.1%


def test_compoundcurve_continuity():
    wkb = W.wkt_to_wkb(
        "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 4 0))")
    lin = CV.curve_to_line(wkb)
    base, pts = G.parse_wkb(lin)
    assert base == G.WKB_LINESTRING
    assert np.array_equal(pts[0], [0, 0]) and np.array_equal(pts[-1], [4, 0])
    # shared endpoint not duplicated
    assert (np.all(pts == [2, 0], axis=1)).sum() == 1


def test_wkt_round_trip_curves():
    cases = [
        "CIRCULARSTRING (0 0, 1 1, 2 0)",
        "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), LINESTRING (2 0, 4 0))",
        "CURVEPOLYGON (CIRCULARSTRING (0 0, 2 0, 0 0))",
        "MULTICURVE (CIRCULARSTRING (0 0, 1 1, 2 0), LINESTRING (5 5, 6 6))",
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0, 2 0, 0 0)))",
    ]
    for c in cases:
        assert W.wkb_to_wkt(W.wkt_to_wkb(c)) == c, c
    # OGC bare shorthand imports
    got = W.wkb_to_wkt(W.wkt_to_wkb("COMPOUNDCURVE ((0 0, 1 0), (1 0, 2 1))"))
    assert got == "COMPOUNDCURVE (LINESTRING (0 0, 1 0), LINESTRING (1 0, 2 1))"


def test_multisurface_mixed_linearize():
    wkb = W.wkt_to_wkb(
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0, 2 0, 0 0)), "
        "((10 10, 11 10, 11 11, 10 11, 10 10)))")
    lin = CV.curve_to_line(wkb)
    base, polys = G.parse_wkb(lin)
    assert base == G.WKB_MULTIPOLYGON and len(polys) == 2
    assert len(polys[0][0]) > 40   # stroked circle
    assert len(polys[1][0]) == 5   # square passthrough


def test_linear_passthrough():
    wkb = W.wkt_to_wkb("LINESTRING (0 0, 1 1)")
    assert CV.curve_to_line(wkb) == wkb


def test_tin_polyhedral_triangle():
    """TIN / PolyhedralSurface / Triangle (ogr_core.h:340-350): codec
    round trips + CastToMultiPolygon coercion."""
    t = "TIN Z (((0 0 0, 1 0 0, 0 1 0, 0 0 0)), ((1 0 0, 1 1 0, 0 1 0, 1 0 0)))"
    wkb = W.wkt_to_wkb(t)
    base, ndim, payload = G.parse_wkb_full(wkb)
    assert base == G.WKB_TIN and len(payload) == 2
    assert payload[0][0] == G.WKB_TRIANGLE and payload[0][1] == 3
    # WKT back: bare members import as TRIANGLE, export spells them
    assert W.wkb_to_wkt(wkb) == ("TIN (TRIANGLE Z ((0 0 0, 1 0 0, 0 1 0, "
                                 "0 0 0)), TRIANGLE Z ((1 0 0, 1 1 0, "
                                 "0 1 0, 1 0 0)))")
    mp = G.surface_to_multipolygon(wkb)
    b2, polys = G.parse_wkb(mp)
    assert b2 == G.WKB_MULTIPOLYGON and len(polys) == 2
    # planar area of the two triangles = unit square
    import numpy as np
    tot = 0.0
    for rings in polys:
        x, y = rings[0][:-1, 0], rings[0][:-1, 1]
        tot += 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert abs(tot - 1.0) < 1e-12
    ps = W.wkt_to_wkb(
        "POLYHEDRALSURFACE (((0 0, 1 0, 1 1, 0 1, 0 0)))")
    assert W.wkb_to_wkt(ps) == \
        "POLYHEDRALSURFACE (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))"
    tri = W.wkt_to_wkb("TRIANGLE ((0 0, 4 0, 0 4, 0 0))")
    assert W.wkb_to_wkt(tri) == "TRIANGLE ((0 0, 4 0, 0 4, 0 0))"


def test_curve_layer_through_layer_algebra(spark):
    """A CURVEPOLYGON layer linearizes (Arrow batch) and flows into the
    boolean-overlay layer algebra: circle ∩ half-covering box keeps
    ~half the circle's area."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lib_gdal_spark.operators import layer_algebra as LA

    rows = []
    for fid in range(6):
        cx = fid * 10.0
        wkt = (f"CURVEPOLYGON (CIRCULARSTRING ({cx - 1} 0, {cx + 1} 0, "
               f"{cx - 1} 0))")
        rows.append((fid, bytearray(W.wkt_to_wkb(wkt))))
    curves_df = spark.createDataFrame(rows, "fid long, geom_wkb binary")

    def linearize(batches):
        for b in batches:
            out = []
            for _, r in b.iterrows():
                out.append((int(r["fid"]),
                            CV.curve_to_line(bytes(r["geom_wkb"]))))
            yield pd.DataFrame(out, columns=["fid", "geom_wkb"])

    lin = curves_df.mapInPandas(linearize, schema="fid long, geom_wkb binary")
    # method layer: boxes covering the UPPER half of each circle
    boxes = spark.createDataFrame(
        [(100 + fid, bytearray(G.wkb_polygon([G.box_ring(
            fid * 10.0 - 2.0, 0.0, fid * 10.0 + 2.0, 2.0)])))
         for fid in range(6)],
        "fid long, geom_wkb binary")
    inter = LA.intersection(lin, boxes, res=5)
    got = inter.select("in_fid", "area").collect()
    assert len(got) == 6
    for r in got:
        assert abs(r["area"] - np.pi / 2.0) < 0.01, r
