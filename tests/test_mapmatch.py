"""Map-matching (operators/mapmatch.py): bucketed nearest-segment snap.

The bucketed covering-cell join must be recall-complete — every test
compares against a brute-force pandas argmin over the full cross
product with identical projection arithmetic.
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators.mapmatch import match_points


def brute(pts: pd.DataFrame, segs: pd.DataFrame, max_dist: float) -> pd.DataFrame:
    rows = []
    for _, p in pts.iterrows():
        best = None
        for _, s in segs.iterrows():
            dx, dy = s.x2 - s.x1, s.y2 - s.y1
            den = dx * dx + dy * dy
            t = 0.0 if den == 0.0 else min(max(
                ((p.x - s.x1) * dx + (p.y - s.y1) * dy) / den, 0.0), 1.0)
            d = float(np.hypot(p.x - (s.x1 + t * dx), p.y - (s.y1 + t * dy)))
            if d <= max_dist and (best is None or (d, s.seg_id) < (best[2], best[0])):
                best = (int(s.seg_id), t, d)
        if best is not None:
            rows.append((int(p.pid), best[0], best[1], best[2]))
    return pd.DataFrame(rows, columns=["pid", "seg_id", "t", "dist"])


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(42)
    pts = pd.DataFrame({
        "pid": np.arange(300),
        "x": rng.uniform(0, 100, 300),
        "y": rng.uniform(0, 100, 300),
    })
    segs = pd.DataFrame({
        "seg_id": np.arange(25),
        "x1": rng.uniform(0, 100, 25),
        "y1": rng.uniform(0, 100, 25),
    })
    segs["x2"] = segs.x1 + rng.uniform(-20, 20, 25)
    segs["y2"] = segs.y1 + rng.uniform(-20, 20, 25)
    return pts, segs


def test_matches_bruteforce(spark, fixture):
    pts, segs = fixture
    got = (match_points(spark.createDataFrame(pts), spark.createDataFrame(segs),
                        max_dist=6.0)
           .toPandas().sort_values("pid", ignore_index=True))
    want = brute(pts, segs, 6.0)
    assert list(got.pid) == list(want.pid)
    assert list(got.seg_id) == list(want.seg_id)
    np.testing.assert_allclose(got.t, want.t, atol=1e-9)
    np.testing.assert_allclose(got.dist, want.dist, atol=1e-9)


def test_degenerate_segment_and_cell_arg(spark):
    # zero-length segment => t = 0, distance = point distance to the vertex
    pts = spark.createDataFrame(pd.DataFrame({"pid": [0], "x": [3.0], "y": [4.0]}))
    segs = spark.createDataFrame(pd.DataFrame(
        {"seg_id": [7], "x1": [0.0], "y1": [0.0], "x2": [0.0], "y2": [0.0]}))
    row = match_points(pts, segs, max_dist=10.0, cell=12.0).collect()[0]
    assert row.seg_id == 7 and row.t == 0.0 and abs(row.dist - 5.0) < 1e-12
    with pytest.raises(ValueError):
        match_points(pts, segs, max_dist=10.0, cell=5.0)


def test_out_of_range_points_absent(spark):
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [0, 1], "x": [0.0, 50.0], "y": [0.0, 50.0]}))
    segs = spark.createDataFrame(pd.DataFrame(
        {"seg_id": [1], "x1": [0.0], "y1": [1.0], "x2": [2.0], "y2": [1.0]}))
    got = match_points(pts, segs, max_dist=2.0).toPandas()
    assert list(got.pid) == [0]
