"""Distributed Delaunay == single-node triangulation, exact triangle set."""

import numpy as np

from lib_gdal_spark.functions import delaunay as DT
from lib_gdal_spark.operators.delaunay_dist import delaunay_distributed


def _ref_triangles(pts):
    _, tris = DT.delaunay(pts)
    return {tuple(sorted(map(int, t))) for t in tris}


def _run(spark, pts, cells=4, max_rounds=4):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    ).repartition(8)
    got = {
        (r["ia"], r["ib"], r["ic"])
        for r in delaunay_distributed(df, spark, cells=cells,
                                      max_rounds=max_rounds).collect()
    }
    want = _ref_triangles(pts)
    assert got == want, (
        f"n={len(pts)}: missing={len(want - got)} extra={len(got - want)}"
    )


def test_uniform_points(spark):
    rng = np.random.default_rng(31)
    _run(spark, rng.random((400, 2)) * 100)


def test_clustered_points(spark):
    rng = np.random.default_rng(32)
    a = rng.normal((20, 20), 3, (150, 2))
    b = rng.normal((80, 70), 5, (150, 2))
    c = rng.random((50, 2)) * 100
    _run(spark, np.vstack([a, b, c]))


def test_small_and_degenerate(spark):
    rng = np.random.default_rng(33)
    _run(spark, rng.random((10, 2)) * 10, cells=2)
    # forces escalation/fallback: one round only, sparse wide-spread points
    _run(spark, rng.random((60, 2)) * 1000, cells=8, max_rounds=1)


def test_fallback_fringe_no_full_gather(spark):
    """VERDICT r2 #9: with max_fallback_points BELOW the total point count,
    the fringe fallback must still succeed (gather only the unsettled
    reach) and produce the exact global triangle set. The old fallback
    raised here because it needed the full set in one task."""
    rng = np.random.default_rng(77)
    pts = rng.random((3000, 2)) * 100
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    ).repartition(8)
    got = {
        (r["ia"], r["ib"], r["ic"])
        for r in delaunay_distributed(
            df, spark, cells=4, max_rounds=2,   # few rounds -> fallback hit
            max_fallback_points=2500,           # < total: full gather dies
        ).collect()
    }
    assert got == _ref_triangles(pts)
