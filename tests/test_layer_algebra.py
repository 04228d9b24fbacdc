"""Layer algebra (Intersection/Clip) vs closed-form expectations."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.operators import layer_algebra as LA


def _poly_df(spark, items):
    rows = [(fid, bytearray(G.wkb_polygon([np.asarray(ring)]))) for fid, ring in items]
    return spark.createDataFrame(rows, "fid long, geom_wkb binary").coalesce(1)


def test_clip_ring_convex_rect_rect():
    a = G.box_ring(0, 0, 10, 10)
    b = G.box_ring(5, 5, 15, 15)
    out = G.clip_ring_convex(a, b)
    assert out is not None
    assert G.shoelace_area([out]) == pytest.approx(25.0)
    # disjoint -> None
    assert G.clip_ring_convex(G.box_ring(0, 0, 1, 1), G.box_ring(5, 5, 6, 6)) is None
    # containment -> subject unchanged (area)
    inner = G.box_ring(2, 2, 3, 3)
    out = G.clip_ring_convex(inner, G.box_ring(0, 0, 10, 10))
    assert G.shoelace_area([out]) == pytest.approx(1.0)


def test_clip_triangle_by_rect():
    tri = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [0.0, 0.0]])
    out = G.clip_ring_convex(tri, G.box_ring(0, 0, 5, 5))
    # triangle clipped to 5x5 box: area = 25 - 0.5*... piece is a pentagon
    # (0,0)(5,0)(5,5)... exact: area of tri within box = 25 - 12.5 = ... by
    # integration: region x+y<=10 within [0,5]^2 is the whole box minus the
    # empty corner: x+y<=10 holds everywhere in [0,5]^2 -> area 25? No:
    # max x+y = 10 at corner -> fully inside. Use a smaller box for a cut.
    assert G.shoelace_area([out]) == pytest.approx(25.0)
    out2 = G.clip_ring_convex(tri, G.box_ring(0, 0, 8, 8))
    # region x>=0,y>=0,x<=8,y<=8,x+y<=10: 64 - 0.5*6*6 = 46
    assert G.shoelace_area([out2]) == pytest.approx(46.0)


def test_intersection_operator(spark):
    inputs = _poly_df(spark, [
        (1, G.box_ring(0, 0, 10, 10)),
        (2, G.box_ring(20, 20, 30, 30)),
        (3, G.box_ring(100, -50, 110, -40)),  # no method overlap
    ])
    methods = _poly_df(spark, [
        (10, G.box_ring(5, 5, 25, 25)),
    ])
    rows = LA.intersection(inputs, methods).collect()
    got = {(r["in_fid"], r["m_fid"]): r["area"] for r in rows}
    assert got == {
        (1, 10): pytest.approx(25.0),
        (2, 10): pytest.approx(25.0),
    }
    # clipped geometry round-trips through WKB
    for r in rows:
        rings = G.polygon_rings(bytes(r["geom_wkb"]))
        assert G.shoelace_area(rings) == pytest.approx(r["area"])


def test_clip_operator_merges_pieces(spark):
    inputs = _poly_df(spark, [(1, G.box_ring(0, 0, 30, 10))])
    methods = _poly_df(spark, [
        (10, G.box_ring(2, 2, 8, 8)),
        (11, G.box_ring(12, 2, 18, 8)),
    ])
    rows = LA.clip(inputs, methods).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_pieces"] == 2
    assert r["area"] == pytest.approx(72.0)  # two 6x6 windows


def test_intersection_pentagon_area(spark):
    # convex pentagon ∩ huge box == pentagon itself (area = shoelace)
    ang = 2 * math.pi * np.arange(6) / 5
    pent = np.column_stack([10 + 4 * np.cos(ang), 20 + 4 * np.sin(ang)])
    inputs = _poly_df(spark, [(1, pent)])
    methods = _poly_df(spark, [(10, G.box_ring(-50, -50, 50, 50))])
    rows = LA.intersection(inputs, methods).collect()
    expect = G.shoelace_area([pent])
    assert rows[0]["area"] == pytest.approx(expect, rel=1e-12)


def test_dissolve(spark):
    """ogrdissolve: overlapping boxes in a group union into one polygon
    with the closed-form union area; disjoint boxes stay multi-part."""
    import numpy as np

    from lib_gdal_spark.functions import geometry as G
    from lib_gdal_spark.operators.layer_algebra import dissolve

    rows = []
    # group 1: two 4x2 boxes overlapping in a 2x2 square
    rows.append((1, bytearray(G.wkb_polygon([G.box_ring(0, 0, 4, 2)]))))
    rows.append((1, bytearray(G.wkb_polygon([G.box_ring(2, 0, 6, 2)]))))
    # group 2: two disjoint unit boxes
    rows.append((2, bytearray(G.wkb_polygon([G.box_ring(0, 0, 1, 1)]))))
    rows.append((2, bytearray(G.wkb_polygon([G.box_ring(5, 5, 6, 6)]))))
    df = spark.createDataFrame(rows, "grp long, geom_wkb binary")
    got = {r["grp"]: r for r in dissolve(df, "grp").collect()}
    assert abs(got[1]["area"] - (8 + 8 - 4)) < 1e-9
    assert got[1]["n_parts"] == 1
    assert abs(got[2]["area"] - 2.0) < 1e-9
    assert got[2]["n_parts"] == 2
    b, polys = G.parse_wkb(bytes(got[1]["geom_wkb"]))
    assert b == G.WKB_MULTIPOLYGON


class TestPolygonNeighbors:
    def test_grid_rook_adjacency(self, spark):
        import pandas as pd
        from lib_gdal_spark.functions import geometry as G
        from lib_gdal_spark.operators.layer_algebra import polygon_neighbors

        rows = []
        for j in range(3):
            for i in range(4):
                ring = G.box_ring(i * 2.0, j * 1.5, i * 2.0 + 2.0,
                                  j * 1.5 + 1.5)
                rows.append((j * 10 + i, bytearray(G.wkb_polygon([ring]))))
        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["fid", "geom_wkb"]),
            schema="fid long, geom_wkb binary")
        out = {(r.fid_a, r.fid_b): (r.n_edges, r.shared_len)
               for r in polygon_neighbors(layer).collect()}
        # 3x4 grid: 3*3 horizontal + 2*4 vertical pairs, no diagonals
        assert len(out) == 9 + 8
        for j in range(3):
            for i in range(3):
                assert out[(j * 10 + i, j * 10 + i + 1)] == (1, 1.5)
        for j in range(2):
            for i in range(4):
                assert out[(j * 10 + i, (j + 1) * 10 + i)] == (1, 2.0)

    def test_disjoint_and_diagonal_absent(self, spark):
        import pandas as pd
        from lib_gdal_spark.functions import geometry as G
        from lib_gdal_spark.operators.layer_algebra import polygon_neighbors

        rows = [
            (1, bytearray(G.wkb_polygon([G.box_ring(0, 0, 1, 1)]))),
            (2, bytearray(G.wkb_polygon([G.box_ring(1, 1, 2, 2)]))),  # corner
            (3, bytearray(G.wkb_polygon([G.box_ring(5, 5, 6, 6)]))),  # far
        ]
        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["fid", "geom_wkb"]),
            schema="fid long, geom_wkb binary")
        assert polygon_neighbors(layer).count() == 0


class TestArealInterpolate:
    """Area-weighted areal interpolation vs analytic expectations."""

    def _layers(self, spark):
        # two 10x10 source zones side by side; one 10x10 target zone
        # straddling them half-and-half
        src = spark.createDataFrame(
            [(1, bytearray(G.wkb_polygon([G.box_ring(0, 0, 10, 10)])), 100.0, 4.0),
             (2, bytearray(G.wkb_polygon([G.box_ring(10, 0, 20, 10)])), 60.0, 8.0)],
            "fid long, geom_wkb binary, pop double, density double",
        ).coalesce(1)
        tgt = spark.createDataFrame(
            [(7, bytearray(G.wkb_polygon([G.box_ring(5, 0, 15, 10)])))],
            "fid long, geom_wkb binary",
        ).coalesce(1)
        return src, tgt

    def test_extensive_mass_transfer(self, spark):
        src, tgt = self._layers(spark)
        out = LA.areal_interpolate(src, tgt, ["pop"], res=4).collect()
        assert len(out) == 1
        # half of each source zone overlaps: 100*0.5 + 60*0.5 = 80
        assert out[0]["fid"] == 7
        assert out[0]["pop"] == pytest.approx(80.0)

    def test_intensive_weighted_mean(self, spark):
        src, tgt = self._layers(spark)
        out = LA.areal_interpolate(src, tgt, ["density"], res=4,
                                   mode="intensive").collect()
        # equal-area pieces -> plain mean of 4 and 8
        assert out[0]["density"] == pytest.approx(6.0)

    def test_extensive_conserves_total_mass(self, spark):
        # targets that tile the full source extent: total mass conserved
        src, _ = self._layers(spark)
        tgt = spark.createDataFrame(
            [(i, bytearray(G.wkb_polygon(
                [G.box_ring(i * 5.0, 0, i * 5.0 + 5.0, 10)])))
             for i in range(4)],
            "fid long, geom_wkb binary",
        ).coalesce(1)
        out = LA.areal_interpolate(src, tgt, ["pop"], res=4).toPandas()
        assert len(out) == 4
        assert out["pop"].sum() == pytest.approx(160.0)

    def test_quantized_partition_invariance(self, spark):
        src, tgt = self._layers(spark)
        a = LA.areal_interpolate(src, tgt, ["pop"], res=4,
                                 quantize=1e-6).collect()[0]["pop"]
        b = LA.areal_interpolate(src.repartition(7), tgt, ["pop"], res=4,
                                 quantize=1e-6).collect()[0]["pop"]
        assert a == b  # bit-identical under re-partitioning

    def test_bad_mode_raises(self, spark):
        src, tgt = self._layers(spark)
        with pytest.raises(ValueError):
            LA.areal_interpolate(src, tgt, ["pop"], mode="nope")


class TestShuffleJoinParity:
    """broadcast_method=False must produce identical results through the
    shuffle equi-join path (the continent-scale method-layer shape), even
    with Spark's auto-broadcast disabled so the plan really shuffles."""

    def _layers(self, spark):
        import random
        rng = random.Random(7)
        inputs = _poly_df(spark, [
            (i, G.box_ring(x := rng.uniform(-170, 150),
                           y := rng.uniform(-75, 60),
                           x + rng.uniform(1, 15), y + rng.uniform(1, 12)))
            for i in range(120)])
        methods = _poly_df(spark, [
            (j, G.box_ring(x := rng.uniform(-170, 140),
                           y := rng.uniform(-70, 50),
                           x + rng.uniform(5, 40), y + rng.uniform(5, 30)))
            for j in range(900, 912)])
        return inputs, methods

    def _canon(self, rows, keys):
        return sorted(
            tuple(round(r[k], 9) if isinstance(r[k], float) else r[k]
                  for k in keys)
            for r in rows)

    def test_intersection_and_erase_parity(self, spark):
        inputs, methods = self._layers(spark)
        bc = LA.intersection(inputs, methods, broadcast_method=True).collect()
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            sh = LA.intersection(inputs, methods,
                                 broadcast_method=False).collect()
            er_sh = LA.erase(inputs, methods,
                             broadcast_method=False).collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        er_bc = LA.erase(inputs, methods, broadcast_method=True).collect()
        keys = ("in_fid", "m_fid", "area")
        assert self._canon(bc, keys) == self._canon(sh, keys)
        ekeys = ("in_fid", "area")
        assert self._canon(er_bc, ekeys) == self._canon(er_sh, ekeys)

    def test_auto_probe_is_bounded(self, spark):
        # auto mode (None) must pick broadcast for a tiny layer and the
        # shuffle path for one over the cap, without a full count
        inputs, methods = self._layers(spark)
        assert LA._resolve_broadcast(methods, None) is True
        old_cap = LA.MAX_BROADCAST_METHOD
        LA.MAX_BROADCAST_METHOD = 5
        try:
            assert LA._resolve_broadcast(methods, None) is False
            out = LA.intersection(inputs, methods,
                                  broadcast_method=None).collect()
            bc = LA.intersection(inputs, methods,
                                 broadcast_method=True).collect()
            keys = ("in_fid", "m_fid", "area")
            assert self._canon(out, keys) == self._canon(bc, keys)
        finally:
            LA.MAX_BROADCAST_METHOD = old_cap


class TestContainmentPretest:
    """The contained-feature shortcut must agree with the slab kernel on
    every classification branch, including holes and concave shapes."""

    def test_contained_concave_and_holes(self, spark):
        # method: big square with a square hole; inputs: one box wholly in
        # the solid part, one wholly inside the hole, one straddling the
        # hole edge, one containing the whole method feature
        hole = G.box_ring(40, 40, 60, 60)
        outer = G.box_ring(0, 0, 100, 100)
        m_wkb = G.wkb_polygon([np.asarray(outer), np.asarray(hole)])
        methods = spark.createDataFrame(
            [(10, bytearray(m_wkb))], "fid long, geom_wkb binary").coalesce(1)
        inputs = _poly_df(spark, [
            (1, G.box_ring(5, 5, 15, 15)),      # inside solid part -> full
            (2, G.box_ring(45, 45, 55, 55)),    # inside hole -> empty
            (3, G.box_ring(35, 45, 45, 55)),    # straddles hole edge -> 50
            (4, G.box_ring(-10, -10, 110, 110)),  # contains method -> 9600
        ])
        rows = LA.intersection(inputs, methods).collect()
        got = {r["in_fid"]: r["area"] for r in rows}
        assert got[1] == pytest.approx(100.0)
        assert 2 not in got
        assert got[3] == pytest.approx(50.0)
        assert got[4] == pytest.approx(100 * 100 - 20 * 20)

    def test_erase_hole_punch_branch(self, spark):
        # method wholly inside input with boundaries apart -> the even-odd
        # hole punch fires; area must equal the kernel's difference
        inputs = _poly_df(spark, [(1, G.box_ring(0, 0, 100, 100))])
        methods = _poly_df(spark, [
            (10, G.box_ring(20, 20, 30, 30)),   # punches a hole
            (11, G.box_ring(200, 200, 210, 210)),  # disjoint (no pair)
            (12, G.box_ring(90, 90, 120, 120)),  # straddles -> kernel
        ])
        rows = LA.erase(inputs, methods).collect()
        assert len(rows) == 1
        assert rows[0]["area"] == pytest.approx(100 * 100 - 100 - 100)

    def test_erase_fully_contained_input(self, spark):
        # input wholly inside a method feature -> fully erased, no row
        inputs = _poly_df(spark, [(1, G.box_ring(10, 10, 20, 20))])
        methods = _poly_df(spark, [(10, G.box_ring(0, 0, 50, 50))])
        assert LA.erase(inputs, methods).collect() == []
