"""Chaikin smoothing, snap-to-grid collapse, and minimum enclosing
circle vs naive local references (including a brute-force grid check
that no smaller circle covers)."""

import itertools
import math
import random

from pyspark.sql import functions as F

from lib_gdal_spark.functions.smooth import chaikin, snap_coord
from lib_gdal_spark.operators.enclosing import min_enclosing_circles
from lib_gdal_spark.session import local_df


def _chaikin_naive(pts, iters=2):
    for _ in range(iters):
        out = [pts[0]]
        for a, b in zip(pts, pts[1:]):
            out.append((0.75 * a[0] + 0.25 * b[0],
                        0.75 * a[1] + 0.25 * b[1]))
            out.append((0.25 * a[0] + 0.75 * b[0],
                        0.25 * a[1] + 0.75 * b[1]))
        out.append(pts[-1])
        pts = out
    return pts


def test_chaikin_matches_naive_and_preserves_endpoints(spark):
    rng = random.Random(2)
    pts = [(round(rng.uniform(-50, 50), 2), round(rng.uniform(-50, 50), 2))
           for _ in range(8)]
    rows = [(0, i, x, y) for i, (x, y) in enumerate(pts)]
    df = (local_df(spark, rows, "tid long, vi long, x double, y double")
          .groupBy("tid")
          .agg(F.array_sort(
              F.collect_list(F.struct("vi", "x", "y"))).alias("vs")))
    out = df.select(
        chaikin(F.transform("vs", lambda s: s["x"]), 2).alias("xs"),
        chaikin(F.transform("vs", lambda s: s["y"]), 2).alias("ys")).first()
    got = list(zip(out["xs"], out["ys"]))
    want = _chaikin_naive(pts)
    assert len(got) == 32 and got == want
    assert got[0] == pts[0] and got[-1] == pts[-1]


def test_chaikin_shrinks_corner_deviation(spark):
    # right-angle corner: smoothing pulls the corner point inward
    pts = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    sm = _chaikin_naive(pts, 2)
    corner_dist = min(math.hypot(x - 10.0, y - 0.0) for x, y in sm)
    assert 0.5 < corner_dist < 5.0


def test_snap_collapses_consecutive_duplicates(spark):
    rows = [(0, 0, 0.01, 0.01), (0, 1, 0.02, 0.02),   # both snap to (0,0)
            (0, 2, 0.26, 0.01), (0, 3, 0.26, 0.02),   # both to (0.25, 0)
            (0, 4, 0.49, 0.49)]
    df = local_df(spark, rows, "tid long, vi long, x double, y double")
    s = df.select("tid", "vi",
                  snap_coord(F.col("x"), 0.05).alias("sx"),
                  snap_coord(F.col("y"), 0.05).alias("sy"))
    from pyspark.sql import Window
    w = Window.partitionBy("tid").orderBy("vi")
    keep = (F.lag("sx").over(w).isNull()
            | (F.col("sx") != F.lag("sx").over(w))
            | (F.col("sy") != F.lag("sy").over(w)))
    kept = s.withColumn("k", keep).where("k").collect()
    assert len(kept) == 3
    assert [(r["sx"], r["sy"]) for r in kept] == [
        (0.0, 0.0), (0.25, 0.0), (0.5, 0.5)]


def _mec_df(spark, groups):
    rows = [(g, i, x, y)
            for g, pts in groups.items() for i, (x, y) in enumerate(pts)]
    return local_df(spark, rows, "gid long, i long, x long, y long")


def test_mec_known_square(spark):
    # unit-ish square: MEC is the diagonal-diameter circle
    df = _mec_df(spark, {0: [(0, 0), (10, 0), (0, 10), (10, 10)]})
    r = min_enclosing_circles(df).first()
    assert (r["cx"], r["cy"]) == (5.0, 5.0)
    assert r["r2"] == 50.0


def test_mec_obtuse_triangle_uses_diameter(spark):
    # obtuse triangle: MEC is the longest-side diameter, NOT the
    # circumcircle (classic pitfall)
    df = _mec_df(spark, {0: [(0, 0), (100, 0), (50, 10)]})
    r = min_enclosing_circles(df).first()
    assert r["k3"] == -1 and (r["k1"], r["k2"]) == (0, 1)
    assert r["r2"] == 2500.0


def test_mec_matches_bruteforce(spark):
    rng = random.Random(17)
    groups = {g: [(rng.randrange(0, 400), rng.randrange(0, 400))
                  for _ in range(10)] for g in range(6)}
    out = {r["gid"]: r for r in
           min_enclosing_circles(_mec_df(spark, groups)).collect()}
    for g, pts in groups.items():
        # brute force over the same candidate family
        best = None
        for a, b in itertools.combinations(pts, 2):
            cx, cy = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
            r2 = ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2) / 4
            if all((p[0] - cx) ** 2 + (p[1] - cy) ** 2 <= r2 + 1e-9
                   for p in pts):
                best = min(best, r2) if best is not None else r2
        for a, b, c in itertools.combinations(pts, 3):
            d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                     + c[0] * (a[1] - b[1]))
            if d == 0:
                continue
            ux = ((a[0] ** 2 + a[1] ** 2) * (b[1] - c[1])
                  + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
                  + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])) / d
            uy = ((a[0] ** 2 + a[1] ** 2) * (c[0] - b[0])
                  + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
                  + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])) / d
            r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
            if all((p[0] - ux) ** 2 + (p[1] - uy) ** 2 <= r2 + 1e-6
                   for p in pts):
                best = min(best, r2) if best is not None else r2
        assert best is not None
        assert abs(out[g]["r2"] - best) < 1e-6
        # every point is inside the reported circle
        r = out[g]
        for p in pts:
            assert ((p[0] - r["cx"]) ** 2 + (p[1] - r["cy"]) ** 2
                    <= r["r2"] + 1e-6)
