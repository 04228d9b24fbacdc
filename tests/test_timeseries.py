"""Time-series operators vs naive local references: dense spine,
ACF bounds/known series, decomposition recovery of a planted cycle,
AMOC changepoint on a level shift, EWMA recursion equivalence, Welch
t-test vs the closed-form textbook computation."""

import math

from pyspark.sql import functions as F

from lib_gdal_spark.operators.timeseries import (
    acf,
    amoc_changepoint,
    ewma_truncated,
    hourly_counts,
    seasonal_means,
    trend_ma,
    welch_ttest_row,
)
from lib_gdal_spark.session import local_df


def _series(spark, xs):
    return local_df(spark, [(t, x) for t, x in enumerate(xs)],
                    "t long, x long")


def test_hourly_counts_dense_and_zero_filled(spark):
    rows = [(i, 3600 * h) for i, h in enumerate([0, 0, 2, 5])]
    ev = local_df(spark, rows, "event_id long, sec long").select(
        "event_id", F.timestamp_seconds("sec").alias("ts"))
    got = {r["t"]: r["x"] for r in hourly_counts(ev).collect()}
    assert got == {0: 2, 1: 0, 2: 1, 3: 0, 4: 0, 5: 1}


def test_acf_alternating_series(spark):
    # x = 0,1,0,1,...: lag-1 ACF -> -1, lag-2 -> +1 (up to edge effects)
    xs = [0, 1] * 30
    out = {r["lag"]: r["acf"] for r in acf(_series(spark, xs), 4).collect()}
    assert out[1] < -0.9 and out[3] < -0.9
    assert out[2] > 0.9 and out[4] > 0.9


def test_acf_matches_naive(spark):
    import random
    rng = random.Random(9)
    xs = [rng.randrange(0, 20) for _ in range(80)]
    n, s = len(xs), sum(xs)
    d = [n * x - s for x in xs]
    c0 = sum(v * v for v in d)
    got = {r["lag"]: (r["cov_num"], r["acf"])
           for r in acf(_series(spark, xs), 6).collect()}
    for k in range(1, 7):
        ck = sum(d[t] * d[t + k] for t in range(n - k))
        assert got[k][0] == ck
        assert got[k][1] == ck / c0


def test_trend_recovers_linear_ramp(spark):
    # pure linear series: centered MA reproduces it exactly on the interior
    xs = [3 * t for t in range(60)]
    out = {r["t"]: r["trend"] for r in
           trend_ma(_series(spark, xs), period=24).collect()}
    assert set(out) == set(range(12, 48))      # interior rows only
    for t, tr in out.items():
        assert tr == 3.0 * t


def test_seasonal_recovers_planted_cycle(spark):
    # ramp + deterministic phase bump: seasonal mean isolates the bump
    bump = [5 if h == 7 else 0 for h in range(24)]
    xs = [2 * t + bump[t % 24] for t in range(24 * 6)]
    rows = {r["h"]: r["s_mean"] for r in
            seasonal_means(_series(spark, xs), period=24).collect()}
    top = max(rows, key=lambda h: rows[h])
    assert top == 7
    assert rows[7] > 4 * 48            # x48 scaling: bump ~= 5*48 minus MA leak


def test_changepoint_finds_level_shift(spark):
    xs = [10] * 40 + [30] * 40
    r = amoc_changepoint(_series(spark, xs)).first()
    assert r["t_star"] == 39
    assert r["mean_before"] == 10.0 and r["mean_after"] == 30.0


def test_ewma_equals_recursion_after_warmup(spark):
    import random
    rng = random.Random(4)
    xs = [rng.randrange(0, 50) for _ in range(120)]
    got = {r["t"]: r["ewma"]
           for r in ewma_truncated(_series(spark, xs), 24).collect()}
    # textbook recursion s_t = 0.5*s_{t-1} + 0.5*x_t, s_0 = x_0; the
    # truncated FIR form converges to it within 2^-24 after warmup
    s = float(xs[0])
    for t in range(1, 120):
        s = 0.5 * s + 0.5 * xs[t]
        if t >= 30:
            assert abs(got[t] - s) < 1e-5
    # exact weighted-sum contract at a spot point
    t0 = 60
    num = sum(xs[t0 - j] * 2 ** (24 - j) for j in range(25))
    den = sum(2 ** (24 - j) for j in range(25))
    assert got[t0] == num / den


def test_welch_matches_textbook(spark):
    a = [10.25, 12.50, 9.75, 11.00, 10.50]
    b = [20.00, 22.25, 19.50, 21.75]
    rows = ([("purchase", v) for v in a] + [("error", v) for v in b])
    ev = local_df(spark, rows, "event_type string, value double")
    r = welch_ttest_row(ev, "event_type", "value",
                        "purchase", "error").first()
    import statistics
    m1, m2 = statistics.mean(a), statistics.mean(b)
    v1, v2 = statistics.variance(a), statistics.variance(b)
    se = v1 / len(a) + v2 / len(b)
    t = (m1 - m2) / math.sqrt(se)
    df = se * se / ((v1 / len(a)) ** 2 / (len(a) - 1)
                    + (v2 / len(b)) ** 2 / (len(b) - 1))
    assert r["n1"] == 5 and r["n2"] == 4
    assert abs(r["mean1"] - m1) < 1e-12 and abs(r["mean2"] - m2) < 1e-12
    assert abs(r["t_stat"] - t) < 1e-10
    assert abs(r["df"] - df) < 1e-10


def test_ccf_symmetric_identity(spark):
    # identical series: CCF at lag 0 == 1 and equals ACF at other lags
    rows = [("error", t * 3600) for t in range(40) for _ in range(t % 5 + 1)]
    rows += [("purchase", t * 3600) for t in range(40)
             for _ in range(t % 5 + 1)]
    ev = local_df(spark, [(et, s) for et, s in rows],
                  "event_type string, sec long").select(
        "event_type", F.timestamp_seconds("sec").alias("ts"))
    from lib_gdal_spark.operators.timeseries import ccf, paired_hourly
    out = {r["lag"]: r["ccf"]
           for r in ccf(paired_hourly(ev, "error", "purchase"), 3).collect()}
    assert abs(out[0] - 1.0) < 1e-12
    assert abs(out[1] - out[-1]) < 1e-12      # symmetric for x == y


def test_ccf_detects_planted_lead(spark):
    # y is x shifted by +2 hours: CCF peaks at lag +2
    import random
    rng = random.Random(7)
    xs = [rng.randrange(0, 30) for _ in range(60)]
    rows = [("error", t * 3600) for t, n in enumerate(xs)
            for _ in range(n)]
    rows += [("purchase", (t + 2) * 3600) for t, n in enumerate(xs)
             for _ in range(n)]
    ev = local_df(spark, rows, "event_type string, sec long").select(
        "event_type", F.timestamp_seconds("sec").alias("ts"))
    from lib_gdal_spark.operators.timeseries import ccf, paired_hourly
    out = {r["lag"]: r["ccf"]
           for r in ccf(paired_hourly(ev, "error", "purchase"), 5).collect()}
    assert max(out, key=lambda k: out[k]) == 2
    # slightly under 1.0: the 2-hour shift pads each series end with
    # zeros that dilute the n-scaled deviations
    assert out[2] > 0.9


def test_lag_regression_recovers_linear_map(spark):
    # y_t = 3 * x_{t-1} exactly -> slope 3, intercept 0, r2 1
    xs = [(t * 7) % 11 for t in range(50)]
    rows = [("error", t * 3600) for t, n in enumerate(xs) for _ in range(n)]
    rows += [("purchase", (t + 1) * 3600) for t, n in enumerate(xs)
             for _ in range(3 * n)]
    ev = local_df(spark, rows, "event_type string, sec long").select(
        "event_type", F.timestamp_seconds("sec").alias("ts"))
    from lib_gdal_spark.operators.timeseries import (lag_regression,
                                                     paired_hourly)
    r = lag_regression(paired_hourly(ev, "error", "purchase"), 1).first()
    assert abs(r["slope"] - 3.0) < 1e-9
    assert abs(r["intercept"]) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12
