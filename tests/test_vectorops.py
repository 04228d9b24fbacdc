"""ogr2ogr -explodecollections / -wrapdateline."""

import numpy as np

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.operators.vectorops import explode_collections, wrap_dateline


def _df(spark, wkbs):
    rows = [(i, bytearray(w)) for i, w in enumerate(wkbs)]
    return spark.createDataFrame(rows, "fid long, geom_wkb binary")


class TestExplodeCollections:
    def test_nested_collection(self, spark):
        inner = G.wkb_geometrycollection([
            G.wkb_point(1.0, 2.0),
            G.wkb_multipoint(np.array([[3.0, 4.0], [5.0, 6.0]])),
        ])
        gc = G.wkb_geometrycollection([G.wkb_linestring(
            np.array([[0.0, 0.0], [1.0, 1.0]])), inner])
        out = explode_collections(_df(spark, [gc])).collect()
        assert len(out) == 4  # line + point + 2 multipoint members
        assert sorted(r.part for r in out) == [0, 1, 2, 3]
        types = sorted(G.parse_wkb_full(bytes(r.geom_wkb))[0] for r in out)
        assert types == [G.WKB_POINT, G.WKB_POINT, G.WKB_POINT,
                         G.WKB_LINESTRING]

    def test_single_passthrough(self, spark):
        p = G.wkb_point(9.0, 9.0)
        out = explode_collections(_df(spark, [p])).collect()
        assert len(out) == 1 and out[0].part == 0
        assert bytes(out[0].geom_wkb) == p


class TestWrapDateline:
    def test_holed_polygon_split(self, spark):
        outer = G.box_ring(170.0, 0.0, 190.0, 20.0)
        hole = G.box_ring(174.0, 5.0, 186.0, 15.0)[::-1]  # CW hole
        for ring in (outer, hole):
            ring[:, 0] = np.where(ring[:, 0] > 180.0, ring[:, 0] - 360.0,
                                  ring[:, 0])
        poly = G.wkb_polygon([outer, hole])
        out = wrap_dateline(_df(spark, [poly])).collect()
        assert len(out) == 2
        areas = {}
        for r in out:
            _, _, payload = G.parse_wkb_full(bytes(r.geom_wkb))
            rings = [np.asarray(x) for x in payload]
            assert all(abs(x[:, 0]).max() <= 180.0 for x in rings)
            areas[r.part] = G.shoelace_area(payload)
        # west: 10x20 outer minus 6x10 hole; east: same by symmetry
        assert areas[0] == 200.0 - 60.0
        assert areas[1] == 200.0 - 60.0

    def test_non_crossing_passthrough(self, spark):
        poly = G.wkb_polygon([G.box_ring(0.0, 0.0, 1.0, 1.0)])
        out = wrap_dateline(_df(spark, [poly])).collect()
        assert len(out) == 1 and bytes(out[0].geom_wkb) == poly

    def test_line_split_latitude(self, spark):
        ln = G.wkb_linestring(np.array([[178.0, 0.0], [-178.0, 4.0]]))
        out = {r.part: r for r in wrap_dateline(_df(spark, [ln])).collect()}
        _, _, p0 = G.parse_wkb_full(bytes(out[0].geom_wkb))
        _, _, p1 = G.parse_wkb_full(bytes(out[1].geom_wkb))
        assert np.allclose(np.asarray(p0), [[178.0, 0.0], [180.0, 2.0]])
        assert np.allclose(np.asarray(p1), [[-180.0, 2.0], [-178.0, 4.0]])


class TestRasterizeInvert:
    def test_invert_complements(self, spark):
        import numpy as np
        from lib_gdal_spark.operators.rasterize import (
            GridSpec,
            rasterize_polygons,
        )
        grid = GridSpec((0.0, 1.0, 0.0, 16.0, 0.0, -1.0), 16, 16, 8)
        ring = G.box_ring(2.0, 2.0, 10.0, 10.0)
        polys = spark.createDataFrame(
            [(1, bytearray(G.wkb_polygon([ring])), 5.0)],
            "fid long, geom_wkb binary, burn double")
        normal = rasterize_polygons(polys, grid, dense=True)
        inverted = rasterize_polygons(polys, grid, invert=True)

        def full(df):
            out = np.zeros((16, 16))
            for r in df.collect():
                a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
                out[r["tile_y"] * 8:(r["tile_y"] + 1) * 8,
                    r["tile_x"] * 8:(r["tile_x"] + 1) * 8] = a
            return out
        n, i = full(normal), full(inverted)
        assert ((n == 5.0) == (i == 0.0)).all()
        assert ((n == 0.0) == (i == 5.0)).all()
        assert (i == 5.0).sum() == 256 - 64  # 8x8 box covered


class TestWrapDatelineFuzz:
    def test_area_conservation_random_boxes(self, spark):
        """Fuzz: west part + east part == original box area exactly
        (integer-coordinate rectangles keep the shoelace sums exact)."""
        import numpy as np
        rng = np.random.default_rng(99)
        rows = []
        want = {}
        for i in range(25):
            a = int(rng.integers(150, 179))     # west lon
            b = int(rng.integers(-179, -150))   # east lon (crossing)
            y0 = int(rng.integers(-80, 70))
            h = int(rng.integers(1, 15))
            ring = np.array([[a, y0], [b, y0], [b, y0 + h],
                             [a, y0 + h], [a, y0]], dtype=np.float64)
            rows.append((i, bytearray(G.wkb_polygon([ring]))))
            want[i] = ((180 - a) + (b + 180)) * h
        df = spark.createDataFrame(rows, "fid long, geom_wkb binary")
        out = wrap_dateline(df).collect()
        got = {}
        for r in out:
            _, _, payload = G.parse_wkb_full(bytes(r.geom_wkb))
            rings = [np.asarray(x) for x in payload]
            assert all(abs(x[:, 0]).max() <= 180.0 for x in rings)
            got[r.fid] = got.get(r.fid, 0.0) + G.shoelace_area(payload)
        assert got == {i: float(w) for i, w in want.items()}


class TestWrapDatelineMulti:
    def test_multipolygon_members_split_independently(self, spark):
        import numpy as np
        crossing = G.box_ring(175.0, 0.0, 185.0, 10.0)
        crossing[:, 0] = np.where(crossing[:, 0] > 180.0,
                                  crossing[:, 0] - 360.0, crossing[:, 0])
        plain = G.box_ring(0.0, 0.0, 5.0, 5.0)
        mp = G.wkb_multipolygon([[crossing], [plain]])
        out = wrap_dateline(_df(spark, [mp])).collect()
        # crossing member -> 2 parts, plain member -> 1 part
        assert len(out) == 3
        areas = sorted(
            round(G.shoelace_area(G.parse_wkb_full(bytes(r.geom_wkb))[2]), 6)
            for r in out)
        assert areas == [25.0, 50.0, 50.0]

    def test_multilinestring(self, spark):
        import numpy as np
        ml = G.wkb_multilinestring([
            np.array([[178.0, 0.0], [-178.0, 4.0]]),   # crossing
            np.array([[0.0, 0.0], [1.0, 1.0]]),        # plain
        ])
        out = wrap_dateline(_df(spark, [ml])).collect()
        assert len(out) == 3


class TestWrapDatelineSeamHoles:
    """VERDICT r3 missing #2 / TODO #5: holes that THEMSELVES straddle
    the antimeridian route through the general overlay kernel."""

    @staticmethod
    def _even_odd_area(parts):
        import numpy as np
        tot = 0.0
        for rings in parts:
            x, y = rings[0][:, 0], rings[0][:, 1]
            tot += abs(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
            for h in rings[1:]:
                x, y = h[:, 0], h[:, 1]
                tot -= abs(0.5 * np.sum(x * np.roll(y, -1)
                                        - np.roll(x, -1) * y))
        return tot

    def test_seam_straddling_hole(self, spark):
        import numpy as np
        outer = np.array([[170., -10.], [-170., -10.], [-170., 10.],
                          [170., 10.], [170., -10.]])
        cases = {
            # interior hole across the seam
            0: (np.array([[175., -5.], [-175., -5.], [-175., 5.],
                          [175., 5.], [175., -5.]]), 400.0 - 100.0),
            # hole severs the band into two disconnected pieces
            1: (np.array([[175., -10.], [-175., -10.], [-175., 10.],
                          [175., 10.], [175., -10.]]), 400.0 - 200.0),
            # hole edge ON the seam (west side only)
            2: (np.array([[176., -4.], [180., -4.], [180., 4.],
                          [176., 4.], [176., -4.]]), 400.0 - 32.0),
        }
        rows = [(i, bytearray(G.wkb_polygon([outer, h])))
                for i, (h, _) in cases.items()]
        df = spark.createDataFrame(rows, "fid long, geom_wkb binary")
        got = {}
        for r in wrap_dateline(df).collect():
            _, _, payload = G.parse_wkb_full(bytes(r.geom_wkb))
            rings = [np.asarray(x) for x in payload]
            assert all(abs(x[:, 0]).max() <= 180.0 + 1e-9 for x in rings)
            got.setdefault(r.fid, []).append(rings)
        for i, (_, want) in cases.items():
            assert abs(self._even_odd_area(got[i]) - want) < 1e-9, i
        # the severing hole leaves NO coverage in (175, 180)
        allx = np.concatenate([x[:, 0] for rings in got[1] for x in rings])
        assert not np.any((allx > 175.0 + 1e-9) & (allx < 180.0 - 1e-9))

    def test_area_conservation_random_holed_boxes(self, spark):
        """Fuzz: crossing boxes with a random seam-straddling hole keep
        outer-minus-hole area exactly (integer coordinates)."""
        import numpy as np
        rng = np.random.default_rng(7)
        rows, want = [], {}
        for i in range(20):
            a = int(rng.integers(150, 175))
            b = int(rng.integers(-175, -150))
            y0 = int(rng.integers(-80, 60))
            h = int(rng.integers(4, 15))
            ha = int(rng.integers(a + 1, 179))
            hb = int(rng.integers(-179, b))
            hy0 = y0 + 1
            hh = int(rng.integers(1, h - 1))
            outer = np.array([[a, y0], [b, y0], [b, y0 + h], [a, y0 + h],
                              [a, y0]], dtype=np.float64)
            hole = np.array([[ha, hy0], [hb, hy0], [hb, hy0 + hh],
                             [ha, hy0 + hh], [ha, hy0]], dtype=np.float64)
            rows.append((i, bytearray(G.wkb_polygon([outer, hole]))))
            want[i] = (((180 - a) + (b + 180)) * h
                       - ((180 - ha) + (hb + 180)) * hh)
        df = spark.createDataFrame(rows, "fid long, geom_wkb binary")
        got = {}
        for r in wrap_dateline(df).collect():
            _, _, payload = G.parse_wkb_full(bytes(r.geom_wkb))
            rings = [np.asarray(x) for x in payload]
            got.setdefault(r.fid, []).append(rings)
        for i, w in want.items():
            assert abs(self._even_odd_area(got[i]) - w) < 1e-9, i
