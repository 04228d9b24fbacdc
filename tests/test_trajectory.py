"""Dwell segmentation (operators/trajectory.dwell_segments)."""

import datetime as dt

import pandas as pd

from lib_gdal_spark.operators.trajectory import dwell_segments

T0 = dt.datetime(2024, 1, 1)


def _track(spark, rows):
    pdf = pd.DataFrame(
        [(eid, T0 + dt.timedelta(seconds=s), float(x), float(y))
         for eid, s, x, y in rows],
        columns=["eid", "ts", "x", "y"])
    return spark.createDataFrame(pdf)


def test_alternating_runs(spark):
    # 10 s per step; v_max 1.0 -> step dist <= 10 is a stay step
    rows = [
        (1, 0, 0, 0), (1, 10, 1, 0), (1, 20, 2, 0),      # 2 stay steps
        (1, 30, 100, 0), (1, 40, 200, 0),                # 2 move steps
        (1, 50, 201, 0), (1, 60, 202, 0), (1, 70, 203, 0),  # 3 stay steps
    ]
    out = dwell_segments(_track(spark, rows), v_max=1.0).orderBy("seg").collect()
    assert len(out) == 2
    a, b = out
    assert a.n_pts == 3 and a.dur_s == 20.0 and a.cx == 1.0 and a.cy == 0.0
    assert b.n_pts == 4 and b.dur_s == 30.0 and b.cx == 201.5
    assert a.t_start == T0 and b.t_end == T0 + dt.timedelta(seconds=70)


def test_min_dwell_filters(spark):
    rows = [(1, 0, 0, 0), (1, 5, 0, 0),               # 5 s stay
            (1, 10, 500, 0),                           # move step 5->10
            (1, 20, 500, 0), (1, 80, 500, 0)]          # stay from t=10 on
    out = dwell_segments(_track(spark, rows), v_max=1.0,
                         min_dwell_s=30.0).collect()
    # the arrival point (t=10) opens the stay run: steps 10->20, 20->80
    assert len(out) == 1 and out[0].dur_s == 70.0 and out[0].cx == 500.0
    assert out[0].n_pts == 3


def test_multi_entity_and_single_point(spark):
    rows = [(1, 0, 0, 0),                              # lone point: no steps
            (2, 0, 0, 0), (2, 10, 0, 1), (2, 20, 0, 2)]
    out = dwell_segments(_track(spark, rows), v_max=1.0).collect()
    assert {r.eid for r in out} == {2}
    assert out[0].n_pts == 3 and out[0].cy == 1.0


def test_boundary_speed_is_stay(spark):
    # dist exactly v_max * dt is a stay (<=)
    rows = [(1, 0, 0, 0), (1, 10, 10, 0)]
    out = dwell_segments(_track(spark, rows), v_max=1.0).collect()
    assert len(out) == 1 and out[0].n_pts == 2
