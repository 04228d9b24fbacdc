"""Kaplan-Meier product-limit estimator (operators/events.kaplan_meier)."""

import pandas as pd

from lib_gdal_spark.operators.events import kaplan_meier


def _subj(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["t", "event"]),
        schema="t int, event int")


def test_textbook_curve(spark):
    # classic example: deaths at 1 (n=10), 3 (n=8, after a censor at 2),
    # censor at 2 and 5, death at 4
    rows = ([(1, 1)] * 2 + [(2, 0)] + [(3, 1)] * 3 + [(4, 1)]
            + [(5, 0)] * 3)
    got = {r["t"]: r for r in kaplan_meier(_subj(spark, rows)).collect()}
    # t=1: n=10, d=2 -> S = 0.8
    assert got[1]["n_risk"] == 10 and abs(got[1]["survival"] - 0.8) < 1e-9
    # t=2: censor only, S unchanged
    assert got[2]["d_events"] == 0 and abs(got[2]["survival"] - 0.8) < 1e-9
    # t=3: n=7, d=3 -> S = 0.8 * 4/7
    assert got[3]["n_risk"] == 7
    assert abs(got[3]["survival"] - 0.8 * 4 / 7) < 1e-9
    # t=4: n=4, d=1 -> S *= 3/4
    assert abs(got[4]["survival"] - 0.8 * 4 / 7 * 3 / 4) < 1e-9
    # t=5: censored tail, S unchanged
    assert abs(got[5]["survival"] - got[4]["survival"]) < 1e-12


def test_monotone_and_all_events_reach_zero(spark):
    rows = [(t, 1) for t in (1, 1, 2, 3, 3, 4)]
    got = sorted(kaplan_meier(_subj(spark, rows)).collect(),
                 key=lambda r: r["t"])
    s = [r["survival"] for r in got]
    assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))
    assert abs(s[-1]) < 1e-12  # everyone observed -> S(t_max) = 0
