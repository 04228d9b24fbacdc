"""Time-series analytics over the events table: ACF, classical
seasonal decomposition, AMOC changepoint, truncated EWMA, Welch t-test.

The reference repo has no time-series layer (crawl-metadata tooling
stops at per-file timestamps); these are the standard exploratory ops a
crawl/feed pipeline needs (seasonality of fetch rates, drift detection
on error rates) re-expressed as DataFrame aggregations.

Exactness doctrine (the repo-wide contract): every series is an hourly
*count* series — integers — and each statistic is arranged so all
aggregation happens on integers (order-independent, shuffle-safe) with
at most a handful of FIXED float expressions applied to the exact
integer aggregates at the end. Nothing here depends on float summation
order, so the DuckDB oracles match hash-exactly.

Scale: the dense hour spine comes from one sequence-explode of the
(min,max) aggregate — O(series length), never a per-row collect. Lag
gathers are equi-joins on the hour index; at 10^12 events the heavy
groupBy(hour) pre-aggregation is the only full-data pass and it
map-side combines to |hours| rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Dense (t, x) hourly count series: t = hour index from the first
    hour, zero-filled for silent hours. One integer groupBy over the
    data + a sequence-exploded spine from the (min,max) aggregate."""
    h = events.select(
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).alias("h"))
    counts = h.groupBy("h").agg(F.count(F.lit(1)).alias("x"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = span.select(
        F.col("h0"),
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"))
    return (
        spine.join(counts, "h", "left")
        .select((F.col("h") - F.col("h0")).alias("t"),
                F.coalesce(F.col("x"), F.lit(0)).alias("x")))


def acf(series: DataFrame, max_lag: int = 24) -> DataFrame:
    """Autocorrelation function r_k = c_k / c_0, k = 1..max_lag, with
    c_k = sum_t (n*x_t - S)(n*x_{t+k} - S) over the n-k overlapping
    pairs — the n-scaled form keeps every covariance term an exact
    integer (no float mean subtraction). Returns
    (lag, cov_num BIGINT exact, acf DOUBLE = one division)."""
    tot = series.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("x").alias("s"))
    a = series.crossJoin(F.broadcast(tot))
    dev = a.select(
        "t", "n",
        (F.col("n") * F.col("x") - F.col("s")).alias("d"))
    # decimal(38,0) products: the n-scaled deviations are ~n*x, so the
    # squared terms wrap int64 silently (non-ANSI) at large n*x while the
    # DuckDB oracle sums HUGEINT — same guard as welch_ttest_row
    _d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    c0 = dev.agg(F.sum(_d("d") * _d("d")).alias("c0"))
    lags = dev.select(
        "t", "d", F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"))
    j = lags.alias("a").join(
        dev.select(F.col("t").alias("tk"), F.col("d").alias("dk")).alias("b"),
        F.col("a.t") + F.col("a.lag") == F.col("b.tk"))
    ck = j.groupBy("lag").agg(
        F.sum(_d("d") * _d("dk")).alias("cov_num"))
    return (
        ck.crossJoin(F.broadcast(c0))
        .select(F.col("lag").cast("long").alias("lag"),
                F.col("cov_num").cast("long").alias("cov_num"),
                (F.col("cov_num").cast("double")
                 / F.col("c0").cast("double")).alias("acf"))
        .orderBy("lag"))


def trend_ma(series: DataFrame, period: int = 24) -> DataFrame:
    """Classical-decomposition trend: the centered 2x(period) moving
    average, kept integer by scaling x 2*period: trend48_t =
    x_{t-m} + 2*sum(x_{t-m+1}..x_{t+m-1}) + x_{t+m}, m = period/2.
    Rows where the full window exists; trend = trend48 / (2*period).

    EVEN periods only (the classical-decomposition 2xMA is defined for
    even seasonal periods; odd periods use a plain centered MA, which
    this is not) — an odd ``period`` raises."""
    if period % 2:
        raise ValueError(
            f"trend_ma requires an even period (2x{period} centered MA "
            "weights sum to 2*period only when period is even); use a "
            "plain centered moving average for odd periods")
    m = period // 2
    offs = series.select(
        "t", "x",
        F.explode(F.sequence(F.lit(-m), F.lit(m))).alias("o"))
    w = F.when(F.abs(F.col("o")) == m, F.lit(1)).otherwise(F.lit(2))
    contrib = offs.select(
        (F.col("t") + F.col("o")).alias("tc"),
        (F.col("x") * w).alias("wx"))
    g = (contrib.groupBy("tc")
         .agg(F.sum("wx").alias("trend_num"), F.count(F.lit(1)).alias("k")))
    # k == 2m+1 exactly where every window member existed (interior
    # rows) — no length scalar needed, the count IS the boundary test
    return (
        g.where(F.col("k") == 2 * m + 1)
        .join(series.select(F.col("t").alias("tc"), "x"), "tc")
        .select(F.col("tc").alias("t"), "x",
                F.col("trend_num").cast("long").alias("trend_num"),
                (F.col("trend_num") / F.lit(float(2 * period))).alias("trend"),
                (F.lit(2 * period) * F.col("x")
                 - F.col("trend_num")).cast("long").alias("detr_num")))


def seasonal_means(series: DataFrame, period: int = 24) -> DataFrame:
    """Uncentered seasonal indices: per phase h = t % period, the mean
    of the 2*period-scaled detrended values from :func:`trend_ma`.
    Returns (h, s_num BIGINT, s_den BIGINT, s_mean DOUBLE = one
    division); the caller can center by the grand mean if desired."""
    d = trend_ma(series, period)
    return (
        d.groupBy((F.col("t") % period).alias("h"))
        .agg(F.sum("detr_num").alias("s_num"),
             F.count(F.lit(1)).alias("s_den"))
        .select(F.col("h").cast("long").alias("h"),
                F.col("s_num").cast("long").alias("s_num"),
                F.col("s_den").cast("long").alias("s_den"),
                (F.col("s_num").cast("double")
                 / F.col("s_den").cast("double")).alias("s_mean"))
        .orderBy("h"))


def amoc_changepoint(series: DataFrame) -> DataFrame:
    """At-most-one-changepoint by the CUSUM statistic: D_t =
    n*cum_t - (t+1)*S (exact integers); the split is argmax |D_t| over
    t < n-1, ties to the smallest t. Returns one row with the exact
    statistic and the two segment means (two final divisions)."""
    from pyspark.sql import Window

    tot = series.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = series.select("t", F.sum("x").over(w).alias("cum"))
    d = cum.crossJoin(F.broadcast(tot)).select(
        "t", "cum", "n", "s",
        (F.col("n") * F.col("cum") - (F.col("t") + 1) * F.col("s"))
        .alias("dstat"))
    d = d.where(F.col("t") < F.col("n") - 1)
    best = d.orderBy(F.abs(F.col("dstat")).desc(), F.col("t").asc()).limit(1)
    return best.select(
        F.col("t").cast("long").alias("t_star"),
        F.col("dstat").cast("long").alias("d_stat"),
        F.abs(F.col("dstat")).cast("long").alias("d_abs"),
        (F.col("cum").cast("double") / (F.col("t") + 1).cast("double"))
        .alias("mean_before"),
        ((F.col("s") - F.col("cum")).cast("double")
         / (F.col("n") - F.col("t") - 1).cast("double")).alias("mean_after"))


def ewma_truncated(series: DataFrame, half_lags: int = 24) -> DataFrame:
    """EWMA with alpha = 1/2, truncated to the last ``half_lags``+1
    samples (a stated FIR approximation — weights below 2^-25 are under
    measurement noise for count data): num_t = sum_{j=0..J} x_{t-j} *
    2^(K-j), den_t = sum 2^(K-j), J = min(t, K). Both exact integers;
    ewma = num/den is the single float division."""
    k = half_lags
    gather = series.select(
        "t", "x", F.explode(F.sequence(F.lit(0), F.lit(k))).alias("j"))
    # 2^(K-j) via pow — exact for K <= 52, same op as the SQL oracle
    w = F.pow(F.lit(2.0), F.lit(k) - F.col("j")).cast("long")
    shifted = gather.select(
        (F.col("t") + F.col("j")).alias("td"),
        (F.col("x") * w).alias("wx"),
        w.alias("w"))
    # keep only target hours that exist on the spine (semi join beats a
    # length scalar: no driver action, broadcastable)
    g = (shifted.join(series.select(F.col("t").alias("td")), "td",
                      "left_semi")
         .groupBy("td")
         .agg(F.sum("wx").alias("num"), F.sum("w").alias("den")))
    return g.select(
        F.col("td").cast("long").alias("t"),
        F.col("num").cast("long").alias("num"),
        F.col("den").cast("long").alias("den"),
        (F.col("num").cast("double") / F.col("den").cast("double"))
        .alias("ewma")).orderBy("t")


def welch_ttest_row(events: DataFrame, group_col: str, value_col: str,
                    group_a: str, group_b: str) -> DataFrame:
    """Welch's unequal-variance t-test between two groups, one result
    row: (n1, n2, mean1, mean2, t_stat, df).

    Exactness: two-decimal values quantize to integer cents (round
    half-away at *100 — the true values are exact cents, so the .5
    boundary never arises); n, sum, sum-of-squares are integer
    aggregates; mean / variance / t / Welch-Satterthwaite df are fixed
    float expressions over those exact integers."""
    cents = F.round(F.col(value_col) * 100).cast("long")

    def side(g: str, tag: str) -> DataFrame:
        return events.where(F.col(group_col) == g).agg(
            F.count(F.lit(1)).alias("n" + tag),
            F.sum(cents).alias("s" + tag),
            F.sum(cents * cents).alias("q" + tag))

    j = side(group_a, "1").crossJoin(side(group_b, "2"))
    m1 = F.col("s1").cast("double") / (F.col("n1") * 100).cast("double")
    m2 = F.col("s2").cast("double") / (F.col("n2") * 100).cast("double")
    # the n*q - s^2 identity runs in DECIMAL(38,0) (HUGEINT in the
    # oracle) so it cannot wrap int64 at large scale factors
    d38 = "decimal(38,0)"
    v1 = ((F.col("n1").cast(d38) * F.col("q1").cast(d38)
           - F.col("s1").cast(d38) * F.col("s1").cast(d38))
          .cast("double")
          / (F.col("n1") * (F.col("n1") - 1) * 10000).cast("double"))
    v2 = ((F.col("n2").cast(d38) * F.col("q2").cast(d38)
           - F.col("s2").cast(d38) * F.col("s2").cast(d38))
          .cast("double")
          / (F.col("n2") * (F.col("n2") - 1) * 10000).cast("double"))
    se1 = v1 / F.col("n1").cast("double")
    se2 = v2 / F.col("n2").cast("double")
    tstat = (m1 - m2) / F.sqrt(se1 + se2)
    df = ((se1 + se2) * (se1 + se2)
          / (se1 * se1 / (F.col("n1") - 1).cast("double")
             + se2 * se2 / (F.col("n2") - 1).cast("double")))
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        m1.alias("mean1"), m2.alias("mean2"),
        tstat.alias("t_stat"), df.alias("df"))


def paired_hourly(events: DataFrame, type_x: str, type_y: str,
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Two aligned hourly count series on ONE shared spine (built from
    the min/max hour over ALL events so both series cover the same t
    range): (t, x, y) with zero-filled silent hours."""
    h = events.select(
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).alias("h"),
        F.col(type_col).alias("et"))
    counts = h.groupBy("h").agg(
        F.sum(F.when(F.col("et") == type_x, 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("et") == type_y, 1).otherwise(0)).alias("y"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = span.select(
        F.col("h0"),
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"))
    return (spine.join(counts, "h", "left")
            .select((F.col("h") - F.col("h0")).alias("t"),
                    F.coalesce(F.col("x"), F.lit(0)).alias("x"),
                    F.coalesce(F.col("y"), F.lit(0)).alias("y")))


def ccf(paired: DataFrame, max_lag: int = 12) -> DataFrame:
    """Cross-correlation function between the two series, lags
    -max_lag..+max_lag: c_k = sum_t (n*x_t - Sx)(n*y_{t+k} - Sy) over
    the overlapping range (exact integers); r_k = c_k /
    sqrt(c0x * c0y), the single fixed float expression. Positive lags
    mean x LEADS y. Returns (lag, cov_num, ccf)."""
    tot = paired.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("x").alias("sx"), F.sum("y").alias("sy"))
    a = paired.crossJoin(F.broadcast(tot))
    dev = a.select(
        "t",
        (F.col("n") * F.col("x") - F.col("sx")).alias("dx"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("dy"))
    # decimal(38,0) products — same int64-wrap guard as acf
    _d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    c0 = dev.agg(F.sum(_d("dx") * _d("dx")).alias("c0x"),
                 F.sum(_d("dy") * _d("dy")).alias("c0y"))
    lags = dev.select(
        "t", "dx",
        F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag))).alias("lag"))
    j = lags.join(
        dev.select(F.col("t").alias("tk"), F.col("dy").alias("dyk")),
        F.col("t") + F.col("lag") == F.col("tk"))
    ck = j.groupBy("lag").agg(F.sum(_d("dx") * _d("dyk"))
                              .alias("cov_num"))
    return (ck.crossJoin(F.broadcast(c0))
            .select(F.col("lag").cast("long").alias("lag"),
                    F.col("cov_num").cast("long").alias("cov_num"),
                    (F.col("cov_num").cast("double")
                     / F.sqrt(F.col("c0x").cast("double")
                              * F.col("c0y").cast("double"))).alias("ccf"))
            .orderBy("lag"))


def lag_regression(paired: DataFrame, lag: int = 1) -> DataFrame:
    """OLS of y_t on x_{t-lag} (the Granger-style single-lag check:
    does x lead y?): all moments are exact integer sums over the
    overlap; slope / intercept / r2 are fixed float expressions of
    them. Returns one row (n, slope, intercept, r2)."""
    x = paired.select((F.col("t") + lag).alias("t"),
                      F.col("x").alias("xl"))
    j = paired.select("t", "y").join(x, "t")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xl").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("xl") * F.col("xl")).alias("sxx"),
        F.sum(F.col("xl") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    slope = num.cast("double") / denx.cast("double")
    intercept = (F.col("sy").cast("double")
                 - slope * F.col("sx").cast("double")) \
        / F.col("n").cast("double")
    r2 = ((num * num).cast("double") / (denx * deny).cast("double"))
    return m.select(F.col("n").cast("long").alias("n"),
                    slope.alias("slope"), intercept.alias("intercept"),
                    r2.alias("r2"))


def periodogram(series: DataFrame, max_harmonic: int = 12) -> DataFrame:
    """Discrete Fourier periodogram of an integer series (t, x): for
    harmonic k = 1..``max_harmonic`` over the n observed points,

        a_k = sum_t x_t cos(2*pi*k*t/n),  b_k = sum_t x_t sin(2*pi*k*t/n),
        power_k = 2*(a_k^2 + b_k^2)/n

    — the classical Schuster periodogram (seasonality detection for
    event streams; the spectral companion of :func:`acf`). Determinism:
    the cos/sin weights are quantized to the 1e-12 lattice and the
    weighted sums run as exact decimal(38,0) integers, so partial-
    aggregation order cannot perturb a_k/b_k; power is a fixed float
    expression of the two exact sums. Scale: one crossJoin of the
    (max_harmonic)-row k spine with the series, one combinable groupBy.

    Returns (k, a_q, b_q, power) with a_q/b_q the exact quantized sums.
    """
    tot = series.agg(F.count(F.lit(1)).alias("n"))
    ks = series.sparkSession.range(1, max_harmonic + 1).select(
        F.col("id").alias("k"))
    j = series.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ks))
    w = 2.0 * math.pi * F.col("k") * F.col("t") / F.col("n")
    cq = F.round(F.cos(w) * 1e12).cast("decimal(38,0)")
    sq = F.round(F.sin(w) * 1e12).cast("decimal(38,0)")
    x = F.col("x").cast("decimal(38,0)")
    agg = j.groupBy("k", "n").agg(
        F.sum(cq * x).alias("a_q"), F.sum(sq * x).alias("b_q"))
    a = agg["a_q"].cast("double") / 1e12
    b = agg["b_q"].cast("double") / 1e12
    return agg.select(
        F.col("k").cast("long").alias("k"),
        F.col("a_q").cast("decimal(38,0)").cast("string").alias("a_q"),
        F.col("b_q").cast("decimal(38,0)").cast("string").alias("b_q"),
        F.round(2.0 * (a * a + b * b) / F.col("n"), 6).alias("power"),
    ).orderBy("k")


def holt_smoothing(series: DataFrame, alpha: float = 0.3,
                   beta: float = 0.1, key_col: str | None = None,
                   round_decimals: int = 9) -> DataFrame:
    """Holt double exponential smoothing (level + trend), the classic
    short-horizon forecaster:

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    initialized l_0 = x_0, b_0 = x_1 - x_0. The recurrence is inherently
    sequential IN t, so each series runs inside one Arrow group
    (``applyInPandas`` per ``key_col``; one ungrouped series uses a
    single synthetic key) — series-level parallelism, the same per-key
    contract as sessionization. The float ops are evaluated in the
    written order, matching a SQL oracle's recursive CTE replay
    term-for-term; outputs round at ``round_decimals``.

    Returns (key?, t, x, level, trend, fitted) where fitted_t =
    l_{t-1} + b_{t-1} (the one-step-ahead forecast made at t-1; NULL at
    t = 0, x_1 - x_0... defined from t >= 1).
    """
    a_, b_ = float(alpha), float(beta)
    keyed = key_col is not None
    src = series if keyed else series.withColumn("__k", F.lit(0))
    kc = key_col if keyed else "__k"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t", ignore_index=True)
        xs = pdf["x"].to_numpy(np.float64)
        n = len(xs)
        lv = np.empty(n)
        tr = np.empty(n)
        ft = np.full(n, np.nan)
        lv[0] = xs[0]
        tr[0] = xs[1] - xs[0] if n > 1 else 0.0
        for i in range(1, n):
            ft[i] = lv[i - 1] + tr[i - 1]
            lprev = lv[i - 1]
            lv[i] = a_ * xs[i] + (1.0 - a_) * (lv[i - 1] + tr[i - 1])
            tr[i] = b_ * (lv[i] - lprev) + (1.0 - b_) * tr[i - 1]
        out = pd.DataFrame({
            kc: pdf[kc], "t": pdf["t"], "x": pdf["x"],
            "level": np.round(lv, round_decimals),
            "trend": np.round(tr, round_decimals),
            "fitted": np.round(ft, round_decimals),
        })
        return out

    schema = (f"{kc} long, t long, x long, level double, trend double, "
              "fitted double")
    out = src.groupBy(kc).applyInPandas(run, schema=schema)
    if not keyed:
        out = out.drop("__k")
    return out


def isotonic_pava(series: DataFrame, key_col: str | None = None,
                  round_decimals: int = 9) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression by pool-adjacent-
    violators (PAVA; Barlow et al. 1972) — the calibration-curve fitter
    (reliability diagrams, monotone score -> probability maps). Each
    series (t, x integer) runs inside one Arrow group (per-key
    parallelism, the holt_smoothing contract).

    Every fitted value is a pooled block mean sum(x)/count — ONE
    division of exact integers — so the result matches the minimax
    characterization fitted_i = max_{j<=i} min_{k>=i} mean(x[j..k])
    exactly (the oracle computes THAT closed form instead of replaying
    the algorithm: two independent derivations, one gate).

    Returns (key?, t, x, fitted)."""
    keyed = key_col is not None
    src = series if keyed else series.withColumn("__k", F.lit(0))
    kc = key_col if keyed else "__k"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t", ignore_index=True)
        xs = pdf["x"].to_numpy(np.int64)
        # blocks as (sum, cnt) stacks; merge while the mean decreases
        sums: list[int] = []
        cnts: list[int] = []
        for v in xs:
            s, c = int(v), 1
            while sums and sums[-1] * c >= s * cnts[-1]:
                # prev_mean >= new_mean (cross-multiplied, exact)
                s += sums.pop()
                c += cnts.pop()
            sums.append(s)
            cnts.append(c)
        fitted = np.concatenate([
            np.full(c, round(s / c, round_decimals))
            for s, c in zip(sums, cnts)])
        return pd.DataFrame({kc: pdf[kc], "t": pdf["t"], "x": pdf["x"],
                             "fitted": fitted})

    schema = f"{kc} long, t long, x long, fitted double"
    out = src.groupBy(kc).applyInPandas(run, schema=schema)
    if not keyed:
        out = out.drop("__k")
    return out


def page_hinkley(series: DataFrame, delta: float = 0.5,
                 lam: float = 50.0, round_decimals: int = 9) -> DataFrame:
    """Page-Hinkley drift detection on an integer series (t, x): the
    streaming mean-shift monitor (Page 1954; the CUSUM cousin used for
    concept-drift alarms in online pipelines):

        mean_t = running mean of x_1..x_t  (exact: sum/count, one div)
        m_t = m_{t-1} + (x_t - mean_t - delta);  M_t = min(M_{t-1}, m_t)
        alarm_t = (m_t - M_t > lam)

    The recurrence is sequential (one Arrow group, series-level
    parallelism — the holt_smoothing contract); the float ops evaluate
    in the written order so a recursive-CTE oracle replays them
    exactly. Returns (t, x, ph_m, ph_min, alarm)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t", ignore_index=True)
        xs = pdf["x"].to_numpy(np.int64)
        n = len(xs)
        ms = np.empty(n)
        mins = np.empty(n)
        csum = 0
        m = 0.0
        mn = 0.0
        for i in range(n):
            csum += int(xs[i])
            mean = csum / (i + 1)
            m = m + (float(xs[i]) - mean - delta)
            if i == 0 or m < mn:
                mn = m
            ms[i] = m
            mins[i] = mn
        return pd.DataFrame({
            "t": pdf["t"], "x": pdf["x"],
            "ph_m": np.round(ms, round_decimals),
            "ph_min": np.round(mins, round_decimals),
            "alarm": (ms - mins) > lam,
        })

    out_schema = "t long, x long, ph_m double, ph_min double, alarm boolean"
    return (series.withColumn("__k", F.lit(0)).groupBy("__k")
            .applyInPandas(lambda k, pdf: run(pdf), schema=out_schema))
