"""S2-style cell index: faces, hierarchy, ranges."""

import numpy as np
from pyspark.sql import functions as F

from lib_gdal_spark.functions import s2cells as S2
from lib_gdal_spark.functions.cells import hilbert_xy2d


class TestS2Cells:
    def test_cardinal_faces(self):
        lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        face, _, _ = S2.face_uv(lons, lats)
        assert face.tolist() == [0, 1, 2, 3, 4, 5]

    def test_st_range_and_center(self):
        assert S2.uv_to_st(np.array([0.0]))[0] == 0.5
        assert S2.uv_to_st(np.array([1.0]))[0] == 1.0
        assert S2.uv_to_st(np.array([-1.0]))[0] == 0.0

    def test_hilbert_prefix_property(self):
        rng = np.random.default_rng(3)
        i = rng.integers(0, 1 << 12, 500)
        j = rng.integers(0, 1 << 12, 500)
        d12 = hilbert_xy2d(i, j, order=12)
        d6 = hilbert_xy2d(i >> 6, j >> 6, order=6)
        assert np.array_equal(d12 >> 12, d6)

    def test_parent_and_range_consistency(self, spark):
        rng = np.random.default_rng(5)
        rows = [(float(rng.uniform(-179, 179)), float(rng.uniform(-85, 85)))
                for _ in range(300)]
        df = spark.createDataFrame(rows, "lon double, lat double")
        out = S2.with_s2_cell(df, level=12, out_col="c12")
        out = S2.with_s2_cell(out, level=6, out_col="c6_direct")
        lo, hi = S2.s2_range(F.col("c6_direct"), 6, 12)
        out = out.select(
            "c12", "c6_direct",
            S2.s2_parent(F.col("c12"), 12, 6).alias("c6_up"),
            lo.alias("lo"), hi.alias("hi"),
        )
        for r in out.collect():
            # rollup equals direct coarse assignment
            assert r.c6_up == r.c6_direct
            # the level-12 cell falls in its parent's child range
            assert r.lo <= r.c12 <= r.hi

    def test_locality_of_key_ranges(self):
        # neighboring points land in nearby curve positions on one face
        lons = np.linspace(10.0, 10.5, 50)
        lats = np.full(50, 20.0)
        face, _, _, pos = S2.s2_cell_components(lons, lats, 12)
        assert len(set(face.tolist())) == 1
        assert pos.max() - pos.min() < (1 << 24) // 64  # compact span


class TestS2RingPairs:
    def test_cross_face_completeness(self, spark):
        """Pairs straddling cube edges AND the corner (45, 35.264) must all
        be found by the ring join — the brute force is the ground truth."""
        import itertools

        from lib_gdal_spark.functions.cells import haversine_km
        from lib_gdal_spark.operators.knn import s2_ring_pairs
        corner_lat = 35.2643896827547  # atan(1/sqrt(2)): 3-face corner
        hot = [(45.0, 0.0), (45.0, corner_lat), (-45.0, corner_lat),
               (135.0, -corner_lat), (180.0, 0.0), (0.0, 89.0)]
        rows = []
        pid = 0
        rng = np.random.default_rng(17)
        for clon, clat in hot:
            for _ in range(8):
                rows.append((pid,
                             clon + float(rng.uniform(-0.4, 0.4)),
                             clat + float(rng.uniform(-0.4, 0.4))))
                pid += 1
        df = spark.createDataFrame(rows, "pid long, lon double, lat double")
        got = {(r.id_a, r.id_b)
               for r in s2_ring_pairs(df, max_km=50.0, level=6).collect()}
        want = set()
        for (ia, lo1, la1), (ib, lo2, la2) in itertools.combinations(rows, 2):
            d = haversine_km(np.array([lo1]), np.array([la1]),
                             np.array([lo2]), np.array([la2]))[0]
            if round(d, 6) <= 50.0:
                want.add((min(ia, ib), max(ia, ib)))
        assert got == want
        assert len(want) > 30  # the fixture really exercises tight pairs
