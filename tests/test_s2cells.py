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

    def test_hot_cell_cap_skew(self, spark):
        """City-skew stress: one dense cell over the cap. The capped run
        must (a) complete with the dense cell excluded from candidate
        generation, (b) report it loudly, (c) equal the brute-force oracle
        restricted to pairs with at least one cold endpoint."""
        import itertools

        from lib_gdal_spark.functions import s2cells as S2
        from lib_gdal_spark.functions.cells import haversine_km
        from lib_gdal_spark.operators.knn import s2_ring_pairs

        rng = np.random.default_rng(23)
        rows = []
        # 400 points packed into ~2 km around one city center (hot)
        for pid in range(400):
            rows.append((pid, 2.35 + float(rng.uniform(-0.01, 0.01)),
                         48.85 + float(rng.uniform(-0.01, 0.01))))
        # 60 scattered points 5-40 km out (cold)
        for pid in range(400, 460):
            rows.append((pid, 2.35 + float(rng.uniform(-0.4, 0.4)),
                         48.85 + float(rng.uniform(-0.4, 0.4))))
        df = spark.createDataFrame(rows, "pid long, lon double, lat double")

        pairs, overflow = s2_ring_pairs(
            df, max_km=50.0, level=6, max_cell_freq=100, with_overflow=True)
        hot_cells = {r.cell for r in overflow.collect()}
        assert hot_cells, "the 400-point cell must trip the cap"
        assert all(r.n_points > 100 for r in overflow.collect())

        # oracle: brute force, keeping pairs where either endpoint's own
        # cell is cold (the documented cap semantics)
        lon = np.array([r[1] for r in rows])
        lat = np.array([r[2] for r in rows])
        cell = S2.s2_cell_id(lon, lat, 6)
        want = set()
        for i, j in itertools.combinations(range(len(rows)), 2):
            if cell[i] in hot_cells and cell[j] in hot_cells:
                continue
            d = haversine_km(lon[i:i+1], lat[i:i+1], lon[j:j+1],
                             lat[j:j+1])[0]
            if round(d, 6) <= 50.0:
                want.add((rows[i][0], rows[j][0]))
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert got == want and len(want) > 100

        # uncapped call is unchanged: single DataFrame, empty overflow
        p2, ov2 = s2_ring_pairs(df, max_km=50.0, level=6,
                                with_overflow=True)
        assert ov2.count() == 0
        full = {(r.id_a, r.id_b) for r in p2.collect()}
        assert want <= full and len(full) > len(want)

    def test_hot_cell_cap_bounds_blowup(self, spark):
        """150k points in ONE city cell (uncapped would be ~10^10 candidate
        pairs — unrunnable); with the cap the join completes in seconds and
        emits exactly the either-endpoint-cold pairs (count vs a vectorized
        NumPy oracle; small-scale set equality is the test above)."""
        import pandas as pd

        from lib_gdal_spark.functions import s2cells as S2
        from lib_gdal_spark.functions.cells import haversine_km
        from lib_gdal_spark.operators.knn import s2_ring_pairs

        level, max_km = 10, 1.0
        lat0 = 48.85
        km_per_deg = 111.32 * np.cos(np.radians(lat0))
        # walk east from the city center to the first level-10 cell
        # boundary, then park the hot cluster 0.5 km west of it and the
        # cold points 0.3-0.6 km east of it — guaranteed different cells
        probe_lons = 2.35 + np.arange(0, 2000) * 0.01 / km_per_deg
        cells = S2.s2_cell_id(probe_lons, np.full_like(probe_lons, lat0),
                              level)
        bidx = int(np.argmax(cells != cells[0]))
        assert bidx > 0, "no boundary within 20 km?"
        blon = probe_lons[bidx]

        rng = np.random.default_rng(7)
        n_hot, n_cold = 150_000, 3
        lon = np.concatenate([
            blon - (0.5 + rng.uniform(-0.1, 0.1, n_hot)) / km_per_deg,
            blon + (0.3 + 0.15 * np.arange(n_cold)) / km_per_deg,
        ])
        lat = np.concatenate([
            lat0 + rng.uniform(-0.1, 0.1, n_hot) / 111.32,
            np.full(n_cold, lat0),
        ])
        df = spark.createDataFrame(pd.DataFrame({
            "pid": np.arange(n_hot + n_cold, dtype=np.int64),
            "lon": lon, "lat": lat}))
        pairs, overflow = s2_ring_pairs(
            df, max_km=max_km, level=level, max_cell_freq=10_000,
            with_overflow=True)
        ov = overflow.collect()
        hot_cells = {r.cell for r in ov}
        assert sum(r.n_points for r in ov) >= n_hot  # cluster reported
        # NumPy oracle: pairs with >=1 cold endpoint within max_km
        cell = S2.s2_cell_id(lon, lat, level)
        cold_idx = np.nonzero(~np.isin(cell, list(hot_cells)))[0]
        assert len(cold_idx) == n_cold  # all cold points escaped the cap
        want = set()
        for i in cold_idx:
            d = haversine_km(np.full_like(lon, lon[i]),
                             np.full_like(lat, lat[i]), lon, lat)
            for j in np.nonzero(np.round(d, 6) <= max_km)[0]:
                if j != i:
                    want.add((min(i, j), max(i, j)))
        assert pairs.count() == len(want) > 1000
