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
