"""Spatial statistics vs independent numpy brute-force oracles.

The module's own exactness claim (int64 partials -> one float expression)
is verified by recomputing each statistic with dense-matrix numpy on the
collected cells and requiring EXACT float equality, plus partition
invariance (the distributive-aggregation property the claim rests on).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import spatialstats as S


def _cells_df(spark, n=400, seed=7, parts=1):
    rng = np.random.default_rng(seed)
    gx = rng.integers(0, 12, n)
    gy = rng.integers(0, 12, n)
    rows = {}
    for x, y in zip(gx, gy):
        rows[(int(x), int(y))] = rows.get((int(x), int(y)), 0) + 1
    # salt counts so the variable has real structure (gradient + noise)
    data = [
        (x, y, c + 3 * x + (7 * y) % 5)
        for (x, y), c in sorted(rows.items())
    ]
    df = spark.createDataFrame(data, "gx int, gy int, x long")
    return df.repartition(parts) if parts > 1 else df


def _brute(cells, queen=True):
    """Dense numpy Moran/Gi* on the collected cells."""
    pts = {(r["gx"], r["gy"]): r["x"] for r in cells.collect()}
    keys = sorted(pts)
    x = np.array([pts[k] for k in keys], dtype=np.int64)
    n = len(keys)
    w = np.zeros((n, n), dtype=np.int64)
    for i, (ax, ay) in enumerate(keys):
        for j, (bx, by) in enumerate(keys):
            if i == j:
                continue
            dx, dy = abs(ax - bx), abs(ay - by)
            if max(dx, dy) == 1 and (queen or dx + dy == 1):
                w[i, j] = 1
    return keys, x, w


class TestMoran:
    def test_vs_brute(self, spark):
        cells = _cells_df(spark)
        keys, x, w = _brute(cells)
        n = len(x)
        m = x.sum() / n
        s0 = int(w.sum())
        num = float(
            int((w * np.outer(x, x)).sum())
            - m * int((w * (x[:, None] + x[None, :])).sum())
            + m * m * s0
        )
        den = float(int((x * x).sum()) - n * m * m)
        i_brute = (n / s0) * num / den
        got = S.morans_i(cells).collect()[0]
        assert got["n_cells"] == n and got["s0"] == s0
        assert got["moran_i"] == pytest.approx(i_brute, abs=1e-9)
        assert got["e_i"] == round(-1.0 / (n - 1), 10)
        # normality z-score moments
        deg = w.sum(axis=1)
        s1, s2 = 2.0 * s0, 4.0 * float((deg * deg).sum())
        var = (n * n * s1 - n * s2 + 3.0 * s0 * s0) / (
            (n * n - 1.0) * s0 * s0
        ) - (1.0 / (n - 1)) ** 2
        z = (i_brute - (-1.0 / (n - 1))) / math.sqrt(var)
        assert got["z_norm"] == pytest.approx(z, abs=1e-7)

    def test_checkerboard_negative(self, spark):
        # alternating high/low on a rook lattice -> strongly negative I
        data = [
            (x, y, 100 if (x + y) % 2 == 0 else 1)
            for x in range(8)
            for y in range(8)
        ]
        cells = spark.createDataFrame(data, "gx int, gy int, x long")
        got = S.morans_i(cells, queen=False).collect()[0]
        assert got["moran_i"] < -0.9  # rook checkerboard is maximally negative
        assert got["z_norm"] < -5.0

    def test_partition_invariance(self, spark):
        a = S.morans_i(_cells_df(spark, parts=1)).collect()[0]
        b = S.morans_i(_cells_df(spark, parts=11)).collect()[0]
        assert a == b  # exact, not approx: int partials + one float expr


class TestGetis:
    def test_vs_brute(self, spark):
        cells = _cells_df(spark)
        keys, x, w = _brute(cells)
        n = len(x)
        m = x.sum() / n
        s = math.sqrt(int((x * x).sum()) / n - m * m)
        got = {(r["gx"], r["gy"]): r for r in S.getis_gi_star(cells).collect()}
        assert len(got) == n
        for i, k in enumerate(keys):
            w_i = int(w[i].sum()) + 1
            nbr = int((w[i] * x).sum()) + int(x[i])
            gi = (nbr - m * w_i) / (
                s * math.sqrt((n * w_i - w_i * w_i) / (n - 1.0))
            )
            r = got[k]
            assert r["w_i"] == w_i and r["nbr_sum"] == nbr
            assert r["gi_star"] == pytest.approx(gi, abs=1e-8)

    def test_hot_cell_tops(self, spark):
        # one cell and its ring boosted -> that cell has the max Gi*
        data = [
            (x, y, 500 if max(abs(x - 5), abs(y - 5)) <= 1 else 10)
            for x in range(11)
            for y in range(11)
        ]
        cells = spark.createDataFrame(data, "gx int, gy int, x long")
        rows = S.getis_gi_star(cells).collect()
        top = max(rows, key=lambda r: r["gi_star"])
        assert (top["gx"], top["gy"]) == (5, 5)
        assert top["gi_star"] > 3.0


class TestKDE:
    def test_vs_brute_and_conservation(self, spark):
        rng = np.random.default_rng(3)
        pix = {}
        for _ in range(300):
            k = (int(rng.integers(0, 25)), int(rng.integers(0, 25)))
            pix[k] = pix.get(k, 0) + 1
        counts = spark.createDataFrame(
            [(x, y, c) for (x, y), c in sorted(pix.items())],
            "px int, py int, cnt long",
        )
        r = 3
        quanta = S.kernel_quanta(r)
        dense = {}
        for (x, y), c in pix.items():
            for dx, dy, q in quanta:
                k = (x + dx, y + dy)
                dense[k] = dense.get(k, 0.0) + c * q
        got = {(row["px"], row["py"]): row["density"]
               for row in S.kde_heatmap(counts, r).collect()}
        assert got.keys() == dense.keys()
        for k, v in dense.items():
            assert got[k] == v  # exact: dyadic quanta, order-free sums
        # mass conservation: every point contributes sum(quanta) exactly
        total_q = sum(q for _, _, q in quanta)
        assert sum(got.values()) == pytest.approx(300 * total_q, rel=1e-12)

    def test_kernel_shape(self):
        q = {(dx, dy): v for dx, dy, v in S.kernel_quanta(3)}
        assert q[(0, 0)] == 1.0  # center weight is exactly 1
        assert q[(2, 2)] == math.floor((1 - 8 / 9) ** 2 * 4096 + 0.5) / 4096
        assert all(v * 4096 == int(v * 4096) for v in q.values())
        assert (3, 0) not in q  # strict support: d2 < R^2


class TestRipley:
    def test_vs_brute(self, spark):
        rng = np.random.default_rng(11)
        xs = rng.uniform(0, 40, 250).round(2)
        ys = rng.uniform(0, 40, 250).round(2)
        pts = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
            "pid long, x double, y double",
        )
        radii = [1.0, 2.0, 5.0]
        got = {r["r"]: r for r in S.ripley_k(pts, radii, 1600.0, 5.0).collect()}
        d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
        np.fill_diagonal(d2, np.inf)
        n = len(xs)
        for r in radii:
            pairs = int((d2 < r * r).sum())
            assert got[r]["n_pairs"] == pairs  # covering join is complete
            k = 1600.0 * pairs / (n * (n - 1.0))
            assert got[r]["k_hat"] == pytest.approx(k, abs=1e-9)
            assert got[r]["l_hat"] == pytest.approx(
                math.sqrt(k / math.pi), abs=1e-9
            )

    def test_cell_guard(self, spark):
        pts = spark.createDataFrame(
            [(0, 1.0, 1.0)], "pid long, x double, y double"
        )
        with pytest.raises(ValueError, match="must be >="):
            S.ripley_k(pts, [10.0], 1600.0, 5.0)

    def test_csr_poisson_scale(self, spark):
        # complete spatial randomness: K(r) ~ pi r^2, L(r) ~ r
        rng = np.random.default_rng(5)
        pts = spark.createDataFrame(
            [
                (i, float(x), float(y))
                for i, (x, y) in enumerate(
                    zip(rng.uniform(0, 100, 2000), rng.uniform(0, 100, 2000))
                )
            ],
            "pid long, x double, y double",
        )
        got = {r["r"]: r for r in
               S.ripley_k(pts, [2.0, 4.0], 10000.0, 4.0).collect()}
        for r in (2.0, 4.0):
            assert got[r]["l_hat"] == pytest.approx(r, rel=0.15)


class TestEmergingHotspots:
    def _cells(self, spark, series):
        import pandas as pd
        rows = []
        for (gx, gy), xs in series.items():
            for t, x in enumerate(xs):
                rows.append((gx, gy, t, x))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["gx", "gy", "tbin", "x"]))

    def test_per_bin_matches_single_slice(self, spark):
        import numpy as np
        from lib_gdal_spark.operators.spatialstats import (
            getis_gi_star, getis_per_bin)
        rng = np.random.default_rng(3)
        vals = {(i % 5, i // 5): int(v)
                for i, v in enumerate(rng.integers(1, 50, 25))}
        cells1 = spark.createDataFrame(
            [(gx, gy, x) for (gx, gy), x in vals.items()],
            "gx int, gy int, x long")
        cells2 = self._cells(spark, {k: [v] for k, v in vals.items()})
        a = {(r.gx, r.gy): r.gi_star for r in getis_gi_star(cells1).collect()}
        b = {(r.gx, r.gy): r.z for r in getis_per_bin(cells2).collect()}
        for k in vals:
            assert abs(a[k] - b[k]) < 1e-9, k

    def test_categories(self, spark):
        from lib_gdal_spark.operators.spatialstats import emerging_hotspots
        # 7x7 lattice over 10 bins; a 3x3 BLOCK ramps from cold to very
        # hot in the last bins (a lone spiked cell cannot clear the Gi*
        # threshold — the spike inflates the global variance as fast as
        # its own neighborhood sum; hotspots are clusters by
        # construction of the statistic).
        ramp = [10, 10, 10, 12, 16, 24, 40, 70, 120, 200]
        series = {}
        for gx in range(7):
            for gy in range(7):
                series[(gx, gy)] = (
                    list(ramp) if 1 <= gx <= 3 and 1 <= gy <= 3
                    else [10] * 10)
        out = {(r.gx, r.gy): r for r in
               emerging_hotspots(self._cells(spark, series)).collect()}
        c = out[(2, 2)]
        assert c.category in ("new", "sporadic", "intensifying")
        assert c.n_hot >= 1 and c.mk_z > 0
        # flat neighbors never exceed the hot threshold on a flat field
        flat = out[(0, 0)]
        assert flat.category in ("none", "historic")


class TestGearysC:
    def test_vs_numpy_brute(self, spark):
        cells = _cells_df(spark)
        row = S.gearys_c(cells).collect()[0]
        pts = {(r["gx"], r["gy"]): r["x"] for r in cells.collect()}
        keys = sorted(pts)
        x = np.array([pts[k] for k in keys], dtype=np.float64)
        n = len(keys)
        num = 0.0
        s0 = 0
        for i, (ax, ay) in enumerate(keys):
            for j, (bx, by) in enumerate(keys):
                if i != j and abs(ax - bx) <= 1 and abs(ay - by) <= 1:
                    num += (x[i] - x[j]) ** 2
                    s0 += 1
        m = x.mean()
        c = (n - 1) * num / (2.0 * s0 * ((x - m) ** 2).sum())
        assert row["geary_c"] == pytest.approx(c, abs=1e-9)
        assert row["s0"] == s0

    def test_checkerboard_is_dispersed(self, spark):
        # perfect rook checkerboard -> strong negative autocorrelation:
        # C > 1 and z >> 0
        data = [(i, j, (i + j) % 2 * 10 + 1)
                for i in range(8) for j in range(8)]
        cells = spark.createDataFrame(data, "gx int, gy int, x long")
        row = S.gearys_c(cells, queen=False).collect()[0]
        assert row["geary_c"] > 1.5
        assert row["z_norm"] > 3.0

    def test_partition_invariance(self, spark):
        a = S.gearys_c(_cells_df(spark, parts=1)).collect()[0]
        b = S.gearys_c(_cells_df(spark, parts=13)).collect()[0]
        assert a["geary_c"] == b["geary_c"] and a["z_norm"] == b["z_norm"]


class TestLocalMoran:
    def test_vs_numpy_brute(self, spark):
        cells = _cells_df(spark)
        out = {(r["gx"], r["gy"]): r for r in S.local_moran(cells).collect()}
        pts = {(r["gx"], r["gy"]): r["x"] for r in cells.collect()}
        keys = sorted(pts)
        x = np.array([pts[k] for k in keys], dtype=np.float64)
        n = len(keys)
        m = x.mean()
        m2 = ((x - m) ** 2).sum() / n
        for i, k in enumerate(keys):
            lag = sum(
                x[j] - m
                for j, kb in enumerate(keys)
                if j != i and abs(k[0] - kb[0]) <= 1 and abs(k[1] - kb[1]) <= 1
            )
            ii = (x[i] - m) / m2 * lag
            assert out[k]["ii"] == pytest.approx(ii, abs=1e-8), k

    def test_quadrants_and_island(self, spark):
        # one hot 2x2 block in a cold field + an isolated far cell
        data = [(i, j, 100) for i in range(2) for j in range(2)]
        data += [(i, j, 1) for i in range(5) for j in range(5)
                 if not (i < 2 and j < 2)]
        data += [(50, 50, 1)]
        cells = spark.createDataFrame(data, "gx int, gy int, x long")
        out = {(r["gx"], r["gy"]): r for r in S.local_moran(cells).collect()}
        assert out[(0, 0)]["quad"] == "HH"      # hot cell, hot corner nbrs
        assert out[(4, 4)]["quad"] == "LL"      # cold cell among cold
        assert out[(2, 0)]["quad"] == "LH"      # cold cell beside the block
        island = out[(50, 50)]
        assert island["deg"] == 0 and island["z"] is None
        assert island["quad"] is None

    def test_mean_of_ii_equals_global_moran(self, spark):
        # sum(Ii) / s0 * n relates LISA to global I (Anselin 1995 eq. 8):
        # I = sum_i Ii / n with row-standardized W; with binary W,
        # I = sum(Ii) / s0.
        cells = _cells_df(spark)
        glob = S.morans_i(cells).collect()[0]
        loc = S.local_moran(cells).agg(F.sum("ii").alias("s")).collect()[0]
        assert loc["s"] / glob["s0"] == pytest.approx(
            glob["moran_i"], abs=1e-8)


class TestJoinCounts:
    def test_counts_checkerboard(self, spark):
        # rook checkerboard of 0/1: every join is BW
        data = [(i, j, (i + j) % 2) for i in range(6) for j in range(6)]
        cells = spark.createDataFrame(data, "gx int, gy int, x long")
        row = S.join_counts(cells, queen=False).collect()[0]
        joins = 2 * 6 * 5  # rook joins on a 6x6 grid
        assert row["jj_bb"] == 0 and row["jj_ww"] == 0
        assert row["jj_bw"] == joins
        assert row["z_bb"] < 0  # far fewer BB than chance

    def test_totals_and_expectation(self, spark):
        cells = _cells_df(spark).select(
            "gx", "gy", (F.col("x") % 2).alias("x"))
        row = S.join_counts(cells).collect()[0]
        # BB + BW + WW exhausts all unordered joins
        pairs = S.neighbor_pairs(cells).count()
        assert row["jj_bb"] + row["jj_bw"] + row["jj_ww"] == pairs // 2
        # E[BB] = J * p^2
        p = row["n_black"] / row["n_cells"]
        assert row["e_bb"] == pytest.approx((pairs / 2) * p * p, abs=1e-6)


class TestCentrography:
    def test_vs_numpy_brute(self, spark):
        rng = np.random.default_rng(11)
        xs = rng.integers(0, 1000, 300)
        ys = (xs * 0.7 + rng.integers(0, 200, 300)).astype(np.int64)
        df = spark.createDataFrame(
            [(0, int(a), int(b)) for a, b in zip(xs, ys)],
            "g int, x long, y long").repartition(9)
        row = S.centrography(df).collect()[0]
        mx, my = xs.mean(), ys.mean()
        dx, dy = xs - mx, ys - my
        assert row["mean_x"] == pytest.approx(mx, abs=1e-9)
        assert row["mean_y"] == pytest.approx(my, abs=1e-9)
        assert row["std_dist"] == pytest.approx(
            math.sqrt((dx @ dx + dy @ dy) / len(xs)), abs=1e-6)
        a = dx @ dx - dy @ dy
        b = dx @ dy
        t = (a + math.sqrt(a * a + 4 * b * b)) / (2 * b)
        th = math.atan(t)
        cs, sn = math.cos(th), math.sin(th)
        sx = math.sqrt(2) * math.sqrt(((cs * dx - sn * dy) ** 2).mean())
        sy = math.sqrt(2) * math.sqrt(((sn * dx + cs * dy) ** 2).mean())
        assert row["sigma_x"] == pytest.approx(sx, rel=1e-9)
        assert row["sigma_y"] == pytest.approx(sy, rel=1e-9)
        assert row["theta"] == pytest.approx(th, abs=1e-9)

    def test_collinear_diagonal(self, spark):
        # points on the 45-degree line: theta = pi/4, minor axis 0
        df = spark.createDataFrame(
            [(1, i, i) for i in range(10)], "g int, x long, y long")
        row = S.centrography(df).collect()[0]
        assert row["theta"] == pytest.approx(math.pi / 4, abs=1e-9)
        assert min(row["sigma_x"], row["sigma_y"]) == pytest.approx(0, abs=1e-9)
        # major axis: sqrt(2)*std of projected coords = sqrt(2)*std(x)*sqrt(2)
        xs = np.arange(10.0)
        proj = (xs - xs.mean()) * math.sqrt(2)
        assert max(row["sigma_x"], row["sigma_y"]) == pytest.approx(
            math.sqrt(2) * math.sqrt((proj ** 2).mean()), rel=1e-9)

    def test_axis_aligned_zero_covariance(self, spark):
        # symmetric cross: cxy = 0 -> t = 0, theta = 0; sigma_x/sigma_y are
        # the plain axis deviations
        pts = [(2, 5, 0), (2, -5, 0), (2, 0, 2), (2, 0, -2)]
        df = spark.createDataFrame(pts, "g int, x long, y long")
        row = S.centrography(df).collect()[0]
        assert row["theta"] == 0.0
        assert row["sigma_x"] == pytest.approx(
            math.sqrt(2) * math.sqrt((25 + 25) / 4), rel=1e-12)
        assert row["sigma_y"] == pytest.approx(
            math.sqrt(2) * math.sqrt((4 + 4) / 4), rel=1e-12)

    def test_groups_and_partition_invariance(self, spark):
        rng = np.random.default_rng(3)
        rows = [(int(i % 3), int(rng.integers(0, 500)),
                 int(rng.integers(0, 500))) for i in range(200)]
        df1 = spark.createDataFrame(rows, "g int, x long, y long")
        out1 = {r["g"]: r for r in S.centrography(df1).collect()}
        out2 = {r["g"]: r for r in
                S.centrography(df1.repartition(17)).collect()}
        assert len(out1) == 3
        for g in out1:
            assert out1[g] == out2[g]


class TestEmpiricalVariogram:
    def _pts(self, spark, n=300, seed=2, parts=1):
        rng = np.random.default_rng(seed)
        rows = [(int(i), int(rng.integers(0, 400)), int(rng.integers(0, 400)),
                 int(rng.integers(0, 50))) for i in range(n)]
        df = spark.createDataFrame(rows, "pid long, x long, y long, v long")
        return (df.repartition(parts) if parts > 1 else df), rows

    def test_vs_brute_force(self, spark):
        df, rows = self._pts(spark)
        out = {r["bin"]: r for r in
               S.empirical_variogram(df, max_dist=80.0, n_bins=4).collect()}
        import itertools
        bins = {}
        for (pa, xa, ya, va), (pb, xb, yb, vb) in \
                itertools.combinations(rows, 2):
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 < 6400:
                b = int(math.floor(math.sqrt(d2) / 20.0))
                n, sdd, sd2 = bins.get(b, (0, 0, 0))
                bins[b] = (n + 1, sdd + (va - vb) ** 2, sd2 + d2)
        assert set(out) == set(bins)
        for b, (n, sdd, sd2) in bins.items():
            assert out[b]["n_pairs"] == n, b
            assert out[b]["gamma"] == pytest.approx(sdd / (2 * n), abs=1e-9)
            assert out[b]["avg_d2"] == pytest.approx(sd2 / n, abs=1e-9)

    def test_pure_nugget_flat(self, spark):
        # spatially-independent values: gamma is ~variance at every lag
        df, rows = self._pts(spark, n=500, seed=9)
        out = S.empirical_variogram(df, max_dist=200.0, n_bins=4).collect()
        v = np.array([r[3] for r in rows], dtype=float)
        var = v.var()
        for r in out:
            if r["n_pairs"] > 200:
                assert abs(r["gamma"] - var) / var < 0.25

    def test_partition_invariance_and_cap(self, spark):
        df1, _ = self._pts(spark, parts=1)
        df2, _ = self._pts(spark, parts=11)
        a = S.empirical_variogram(df1, 80.0, 4).collect()
        b = S.empirical_variogram(df2, 80.0, 4).collect()
        assert a == b
        capped = S.empirical_variogram(df1, 80.0, 4,
                                       max_per_cell=5).collect()
        assert sum(r["n_pairs"] for r in capped) < \
            sum(r["n_pairs"] for r in a)
        with pytest.raises(ValueError):
            S.empirical_variogram(df1, 80.0, 4, cell=50.0)


class TestFitVariogram:
    def test_recovers_known_spherical(self, spark):
        # synthesize an empirical variogram FROM a known spherical model:
        # the WLS fit must recover (nugget, psill) exactly and pick the
        # true range from the candidate grid
        true_n, true_p, true_a = 3.0, 12.0, 90.0
        rows = []
        for b in range(6):
            h = (b + 0.5) * 25.0
            u = min(h / true_a, 1.0)
            gam = true_n + true_p * (1.5 * u - 0.5 * u ** 3) \
                if h < true_a else true_n + true_p
            rows.append((b, 1000 + 100 * b, float(gam), h * h))
        vgm = spark.createDataFrame(
            rows, "bin long, n_pairs long, gamma double, avg_d2 double")
        fit = S.fit_variogram(vgm, [60.0, 90.0, 120.0],
                              max_dist=150.0, n_bins=6).collect()[0]
        assert fit["vrange"] == 90.0
        assert fit["nugget"] == pytest.approx(true_n, abs=1e-6)
        assert fit["psill"] == pytest.approx(true_p, abs=1e-6)
        assert fit["wss"] == pytest.approx(0.0, abs=1e-6)

    def test_validation(self, spark):
        vgm = spark.createDataFrame(
            [(0, 10, 1.0, 4.0)],
            "bin long, n_pairs long, gamma double, avg_d2 double")
        with pytest.raises(ValueError):
            S.fit_variogram(vgm, [], 150.0, 6)
        with pytest.raises(ValueError):
            S.fit_variogram(vgm, [50.0], 150.0, 6, model="exponential")


class TestHuffModel:
    def test_two_equal_stores_split_demand(self, spark):
        # symmetric layout: two identical stores equidistant from every
        # demand cell on the perpendicular bisector -> 50/50 split
        demand = spark.createDataFrame(
            [(i, 10, i, 100) for i in range(1, 6)],
            "cid long, x long, y long, pop long")
        stores = spark.createDataFrame(
            [(1, 0, 0, 50.0), (2, 20, 0, 50.0)],
            "fid long, x long, y long, attr double")
        out = {r["fid"]: r for r in S.huff_model(demand, stores).collect()}
        assert out[1]["share"] == pytest.approx(250.0)
        assert out[2]["share"] == pytest.approx(250.0)
        # primary ties break to the lower fid
        assert out[1]["n_primary"] == 5 and out[2]["n_primary"] == 0

    def test_attractiveness_and_distance_decay(self, spark):
        demand = spark.createDataFrame(
            [(0, 0, 0, 60)], "cid long, x long, y long, pop long")
        stores = spark.createDataFrame(
            [(1, 1, 0, 10.0), (2, 2, 0, 10.0)],   # d2 = 1 vs 4
            "fid long, x long, y long, attr double")
        out = {r["fid"]: r for r in S.huff_model(demand, stores).collect()}
        # p1 = 10/1 / (10/1 + 10/4) = 0.8
        assert out[1]["share"] == pytest.approx(48.0)
        assert out[2]["share"] == pytest.approx(12.0)

    def test_zero_distance_captures_all(self, spark):
        demand = spark.createDataFrame(
            [(0, 7, 7, 30)], "cid long, x long, y long, pop long")
        stores = spark.createDataFrame(
            [(1, 7, 7, 1.0), (2, 8, 7, 1000.0)],
            "fid long, x long, y long, attr double")
        out = {r["fid"]: r for r in S.huff_model(demand, stores).collect()}
        assert out[1]["share"] == pytest.approx(30.0)
        assert 2 not in out or out[2]["share"] == 0.0


class TestQuadratTest:
    def test_uniform_grid_dispersed(self, spark):
        # one point per quadrat exactly: vmr = 0, chi2 = 0
        pts = spark.createDataFrame(
            [(i * 10 + 5, j * 10 + 5) for i in range(4) for j in range(4)],
            "x long, y long")
        row = S.quadrat_test(pts, (0, 40), (0, 40), 4, 4).collect()[0]
        assert row["vmr"] == 0.0 and row["chi2"] == 0.0

    def test_fully_clustered(self, spark):
        # all N points in one quadrat: chi2 = N*(Q-1), vmr = N - N/Q
        pts = spark.createDataFrame([(1, 1)] * 64, "x long, y long")
        row = S.quadrat_test(pts, (0, 40), (0, 40), 4, 4).collect()[0]
        assert row["chi2"] == pytest.approx(64 * 15)
        assert row["vmr"] == pytest.approx(64 - 4.0)
        assert row["z"] > 10

    def test_csr_near_one(self, spark):
        rng = np.random.default_rng(0)
        pts = spark.createDataFrame(
            [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 400, 3000), rng.integers(0, 400, 3000))],
            "x long, y long")
        row = S.quadrat_test(pts, (0, 400), (0, 400), 8, 8).collect()[0]
        assert 0.8 < row["vmr"] < 1.25 and abs(row["z"]) < 2.5

    def test_window_validation(self, spark):
        pts = spark.createDataFrame([(1, 1)], "x long, y long")
        with pytest.raises(ValueError):
            S.quadrat_test(pts, (0, 41), (0, 40), 4, 4)


class TestMoransByDistance:
    def test_clustered_short_range(self, spark):
        # values correlated at short range only: band-0 I >> band-3 I
        rng = np.random.default_rng(5)
        rows = []
        for i in range(800):
            x, y = int(rng.integers(0, 600)), int(rng.integers(0, 600))
            v = int((x // 100 + y // 100) * 10 + rng.integers(0, 4))
            rows.append((i, x, y, v))
        df = spark.createDataFrame(rows, "pid long, x long, y long, v long")
        out = {r["bin"]: r for r in
               S.morans_by_distance(df, max_dist=200.0, n_bins=4).collect()}
        assert out[0]["moran_i"] > out[3]["moran_i"]
        assert out[0]["z_norm"] > 3.0

    def test_vs_global_moran_consistency(self, spark):
        # one band spanning everything == dense Moran over the same
        # weight matrix (brute-check on a small set)
        rng = np.random.default_rng(1)
        rows = [(i, int(rng.integers(0, 50)), int(rng.integers(0, 50)),
                 int(rng.integers(0, 30))) for i in range(60)]
        df = spark.createDataFrame(rows, "pid long, x long, y long, v long")
        out = S.morans_by_distance(df, max_dist=30.0, n_bins=1).collect()
        band = out[0]
        x = np.array([r[3] for r in rows], dtype=float)
        n = len(rows)
        m = x.mean()
        num = s0 = 0.0
        deg = np.zeros(n)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d2 = ((rows[i][1] - rows[j][1]) ** 2
                      + (rows[i][2] - rows[j][2]) ** 2)
                if d2 < 900:
                    num += (x[i] - m) * (x[j] - m)
                    s0 += 1
                    deg[i] += 1
        i_val = (n / s0) * num / ((x - m) ** 2).sum()
        assert band["s0"] == s0
        assert band["moran_i"] == pytest.approx(i_val, abs=1e-9)

    def test_partition_invariance(self, spark):
        rng = np.random.default_rng(3)
        rows = [(i, int(rng.integers(0, 300)), int(rng.integers(0, 300)),
                 int(rng.integers(0, 20))) for i in range(300)]
        a = S.morans_by_distance(
            spark.createDataFrame(rows, "pid long, x long, y long, v long"),
            100.0, 4).collect()
        b = S.morans_by_distance(
            spark.createDataFrame(rows, "pid long, x long, y long, v long")
            .repartition(13), 100.0, 4).collect()
        assert a == b


class TestGeneralG:
    def test_high_clustering_detected(self, spark):
        # big values adjacent -> G above expectation; scattered -> near it
        hot = [(0, 0, 50), (0, 1, 50), (1, 0, 50), (1, 1, 50)]
        cold = [(i, j, 1) for i in range(6) for j in range(6)
                if not (i < 2 and j < 2)]
        cells = spark.createDataFrame(hot + cold, "gx int, gy int, x long")
        row = S.general_g(cells).collect()[0]
        assert row["g_ratio"] > 1.5

    def test_matches_dense_numpy(self, spark):
        cells = _cells_df(spark)
        row = S.general_g(cells).collect()[0]
        pts = {(r["gx"], r["gy"]): r["x"] for r in cells.collect()}
        keys = sorted(pts)
        x = np.array([pts[k] for k in keys], dtype=float)
        num = den = s0 = 0.0
        for i, a in enumerate(keys):
            for j, b in enumerate(keys):
                if i == j:
                    continue
                den += x[i] * x[j]
                if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1:
                    num += x[i] * x[j]
                    s0 += 1
        assert row["g"] == pytest.approx(num / den, abs=1e-12)
        assert row["e_g"] == pytest.approx(
            s0 / (len(keys) * (len(keys) - 1)), abs=1e-12)
