"""Visvalingam-Whyatt vs a naive sequential reference (re-computed
effective areas each step), collinear-vertex priority, and endpoint
preservation."""

import random

from lib_gdal_spark.operators.simplify import visvalingam
from lib_gdal_spark.session import local_df


def _df(spark, tracks):
    rows = [(t, i, x, y)
            for t, pts in tracks.items() for i, (x, y) in enumerate(pts)]
    return local_df(spark, rows, "tid long, vi long, x long, y long")


def _naive(pts, n_remove):
    pts = list(enumerate(pts))            # (orig_vi, (x, y))
    for _ in range(n_remove):
        best = None
        for k in range(1, len(pts) - 1):
            (ax, ay), (bx, by), (cx, cy) = (
                pts[k - 1][1], pts[k][1], pts[k + 1][1])
            a2 = abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))
            key = (a2, pts[k][0])
            if best is None or key < best[0]:
                best = (key, k)
        if best is None:
            break
        del pts[best[1]]
    return pts


def test_collinear_removed_first(spark):
    # middle vertex exactly on the segment: zero area, removed first
    tracks = {0: [(0, 0), (5, 5), (10, 10), (10, 0), (0, 1)]}
    out = sorted(r["vi"] for r in
                 visvalingam(_df(spark, tracks), 1).collect())
    assert out == [0, 2, 3, 4]


def test_endpoints_survive_heavy_simplification(spark):
    tracks = {0: [(i, (i * 37) % 11) for i in range(10)]}
    out = visvalingam(_df(spark, tracks), 7).collect()
    vis = sorted(r["vi"] for r in out)
    assert len(vis) == 3 and vis[0] == 0 and vis[-1] == 9


def test_matches_naive_random(spark):
    rng = random.Random(31)
    tracks = {t: [(rng.randrange(0, 1000), rng.randrange(0, 1000))
                  for _ in range(12)] for t in range(8)}
    out = {}
    for r in visvalingam(_df(spark, tracks), 5).collect():
        out.setdefault(r["tid"], []).append((r["out_vi"], r["vi"],
                                             r["x"], r["y"]))
    for t, pts in tracks.items():
        want = _naive(pts, 5)
        got = sorted(out[t])
        assert [(vi, x, y) for _, vi, x, y in got] == [
            (vi, x, y) for vi, (x, y) in want]
