"""Temporal operators over event tables (web-log shape: entity key +
timestamp + attributes).

The two classic event-table operations Spark has no built-in for:

- ``asof_join``: attach to each left event the latest right event
  at-or-before it for the same key (kdb aj / pandas merge_asof /
  DuckDB ASOF JOIN semantics).
- ``sessionize`` / ``session_stats``: split each entity's event stream
  into sessions at inactivity gaps — the standard web-analytics rollup,
  and the batch twin of Structured Streaming's session windows.

Both reduce to ONE shuffle partitioned by the entity key with an ordered
window inside each partition: no range self-join (Catalyst would plan a
``l.ts >= r.ts`` join condition as BroadcastNestedLoopJoin), no per-row
Python. Skew is bounded by the busiest single entity: a hot key is
processed by one task but only over its own rows — salting would break
the ordered semantics, and per-entity event counts are naturally bounded
in web logs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: str | Column) -> Column:
    """Exact integer microseconds since epoch. TIMESTAMP_NTZ is cast
    through TIMESTAMP first, which is epoch-identity because
    ``get_spark`` pins ``spark.sql.session.timeZone`` to UTC (matching
    DuckDB's ``epoch_us`` on naive timestamps)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    payload_cols: Sequence[str] = ("event_id",),
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for each ``left`` row, find the ``right`` row
    with the greatest ``ts_col`` such that ``right.ts <= left.ts``
    (``strict=True`` makes it ``<``) and the same ``on`` key, and attach
    that row's ``ts_col`` + ``payload_cols`` with ``suffix``. Left rows
    with no match keep NULLs (LEFT ASOF JOIN semantics). Ties on the
    right timestamp break toward the largest payload tuple, so the result
    is deterministic.

    Plan: tag the two sides, ``unionByName``, and take
    ``last(payload, ignorenulls=True)`` over a window ordered by
    ``(ts, side, payload)`` — at equal timestamps the right row sorts
    before the left row for inclusive semantics and after it for strict.
    One shuffle on ``on``; O(n log n) per key.
    """
    right_first = 0 if not strict else 1
    left_tag = 1 - right_first
    payload = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        payload.alias("__p"),
        F.lit(right_first).alias("__side"),
    )
    l = left.withColumn(
        "__p", F.lit(None).cast(r.schema["__p"].dataType)
    ).withColumn("__side", F.lit(left_tag))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__m.{ts_col}").alias(ts_col + suffix))
    out_cols += [F.col(f"__m.{c}").alias(c + suffix) for c in payload_cols]
    return matched.where(F.col("__side") == left_tag).select(*out_cols)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Inactivity-gap sessionization: within each ``key``, a new session
    starts at the first event and whenever the gap from the previous
    event exceeds ``gap_us`` microseconds (the classic 30-minute web
    session). Adds ``session_idx`` (0-based per key, in time order) and
    ``is_session_start``. Timestamp math is integer microseconds
    (``unix_micros``), so results are exact on every engine.

    ``order_cols`` breaks timestamp ties deterministically if the event
    stream can contain equal timestamps per key.
    """
    us = _us(ts_col)
    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    gap_prev = us - F.lag(us).over(w)
    new_s = F.when(gap_prev.isNull() | (gap_prev > gap_us), 1).otherwise(0)
    return (
        events.withColumn("__new", new_s)
        .withColumn(
            "session_idx",
            F.sum("__new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            - 1,
        )
        .withColumn("is_session_start", F.col("__new") == 1)
        .drop("__new")
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: event count, start/end
    as exact unix microseconds, and duration in microseconds. One extra
    map-side-combinable groupBy on (key, session_idx) — same partitioning
    as the sessionize shuffle, so AQE coalesces it without a second wide
    exchange."""
    s = sessionize(events, key, ts_col, gap_us, order_cols)
    us = _us(ts_col)
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user: the first step-1 event, then the
    first step-2 event strictly after it, and so on (the classic
    earliest-completion funnel of web analytics).

    One row per user with ``stage`` (how many steps completed, in order)
    and ``k1..kn`` (epoch-micros of each completed step, NULL beyond the
    reached stage). All shuffles hash on ``user_col`` — after the first
    exchange every chained aggregation/join is co-partitioned, so the
    funnel depth adds no extra corpus movement at scale.
    """
    u = F.col(user_col)
    ev = events.select(
        u.alias("__u"),
        _us(ts_col).alias("__k"),
        F.col(type_col).alias("__t"),
    )
    acc = ev.groupBy("__u").agg(
        F.min(F.when(F.col("__t") == steps[0], F.col("__k"))).alias("k1"))
    for i, s in enumerate(steps[1:], start=2):
        prev_ks = [f"k{m}" for m in range(1, i)]
        j = ev.join(acc, "__u")
        acc = j.groupBy("__u", *prev_ks).agg(
            F.min(F.when((F.col("__t") == s)
                         & (F.col("__k") > F.col(f"k{i - 1}")),
                         F.col("__k"))).alias(f"k{i}"))
    stage = sum(
        (F.when(F.col(f"k{m}").isNotNull(), 1).otherwise(0)
         for m in range(1, len(steps) + 1)),
        F.lit(0),
    )
    return acc.select(
        F.col("__u").alias(user_col), stage.alias("stage"),
        *[f"k{m}" for m in range(1, len(steps) + 1)],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bucket: int = 64,
    l_cols: tuple[str, str, str] = ("lid", "lstart", "lend"),
    r_cols: tuple[str, str, str] = ("rid", "rstart", "rend"),
) -> DataFrame:
    """Interval-overlap equi-bucket join: every (left, right) pair with
    ``lstart <= rend AND rstart <= lend`` — the range-join shape Spark's
    optimizer turns into a BroadcastNestedLoopJoin when written as a
    theta join. Here both sides explode to their covering buckets of
    width ``bucket`` and meet in an EQUI-join; a pair that shares
    several buckets is emitted exactly once by keeping it only in the
    canonical bucket of the overlap start, floor(max(lstart, rstart) /
    bucket) — no DISTINCT pass, no duplicate shuffle rows downstream.

    Scale: shuffle volume is keys-only times the explode factor
    (interval length / bucket + 1 per side) — pick ``bucket`` near the
    median interval length so the factor stays ~2; the exact overlap
    re-check bounds false candidates to same-bucket neighbors. This is
    the same covering-join contract as the spatial ring joins
    (knn.hex_ring_pairs), applied to the time axis.
    """
    lid, ls, le = l_cols
    rid, rs, re_ = r_cols
    lb = left.select(
        lid, ls, le,
        F.explode(F.sequence(
            F.floor(F.col(ls) / bucket), F.floor(F.col(le) / bucket)
        )).alias("__b"))
    rb = right.select(
        rid, rs, re_,
        F.explode(F.sequence(
            F.floor(F.col(rs) / bucket), F.floor(F.col(re_) / bucket)
        )).alias("__b"))
    j = lb.join(rb, "__b")
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    canonical = F.col("__b") == F.floor(
        F.greatest(F.col(ls), F.col(rs)) / bucket)
    return j.where(overlap & canonical).select(lid, ls, le, rid, rs, re_)


def cusum_drift(
    series: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
    slack: float = 0.0,
    threshold: float = 5.0,
) -> DataFrame:
    """One-sided CUSUM drift detection (Page 1954) over per-key ordered
    series — the crawl-monitoring classic (did a host's daily page
    yield shift upward?). The textbook recursion S_t = max(0, S_{t-1} +
    (x_t - mean - slack)) is NOT window-expressible, but its closed
    form is: with P_t = cumsum(x - mean_key - slack),
    S_t = P_t - min(0, min_{k<=t} P_k) — one running sum plus one
    running min, both plain ordered windows (the prefix-min clamp IS
    the max(0, .) floor). Ordered windows evaluate sequentially in
    every engine, so the float stream is identical and the oracle
    compares exactly.

    Returns (key, t, x, cusum, drift) with drift = cusum > threshold.
    Scale: two windows keyed by ``key_col`` — keys-only shuffle of the
    (already aggregated) series table, never the raw events.
    """
    wk = Window.partitionBy(key_col)
    wo = wk.orderBy(t_col)
    # windows stage (no nesting): mean first, then the running sum
    m = series.select(key_col, t_col, x_col,
                      F.avg(x_col).over(wk).alias("__mu"))
    base = m.select(
        key_col, t_col, x_col,
        F.sum(F.col(x_col) - F.col("__mu") - F.lit(slack))
        .over(wo).alias("__p"),
    )
    s = F.col("__p") - F.least(F.lit(0.0), F.min("__p").over(wo))
    return base.select(
        key_col, t_col, x_col,
        F.round(s, 6).alias("cusum"),
        (F.round(s, 6) > threshold).alias("drift"),
    )


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      bin_us: int = 86_400_000_000) -> DataFrame:
    """Cohort retention matrix — the standard web-analytics rollup that
    sits beside :func:`sessionize`: users are grouped into cohorts by
    their FIRST active time bin (``bin_us`` microseconds wide; the
    default is daily), and for every (cohort, offset) the fraction of
    that cohort active ``offset`` bins later is reported.

    Returns (cohort, offset, n_active, n_cohort, retention): cohort the
    first-activity bin index (floor(epoch_us / bin_us)), offset >= 0 in
    bins, retention = n_active / n_cohort (the single float in the
    result — counts are exact int64; offset 0 always has
    retention 1.0).

    Scale shape: one distinct over (user, bin) — map-side combinable on
    the dominant duplicate mass — then a per-user min (combinable), a
    broadcast-sized cohort table, and one final keyed groupBy. No
    windows, no self-joins; skew is bounded by the busiest cohort,
    which is |users|-bounded, not |events|-bounded.
    """
    b = F.floor(_us(ts_col) / F.lit(int(bin_us))).cast("long")
    act = (events.select(F.col(user_col).alias("uid"), b.alias("b"))
           .distinct())
    coh = act.groupBy("uid").agg(F.min("b").alias("cohort"))
    sizes = coh.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    per = (
        act.join(coh, "uid")
        .groupBy("cohort", (F.col("b") - F.col("cohort")).alias("offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        per.join(sizes, "cohort")
        .select(
            "cohort", "offset", "n_active", "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 9)
            .alias("retention"),
        )
    )


def attribution(events: DataFrame, conv_type: str = "purchase",
                lookback_s: float = 86400.0,
                user_col: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type",
                id_col: str = "event_id") -> DataFrame:
    """Multi-touch attribution — which channels get credit for each
    conversion (the classic funnel follow-up beside :func:`funnel` and
    :func:`sessionize`): for every ``conv_type`` event, its TOUCHES are
    the same user's earlier non-conversion events within ``lookback_s``
    seconds, and each touch row carries the first-/last-touch flags and
    the touch count that the standard credit models (first, last,
    linear = 1/n) are computed from. Credit itself is returned as the
    exact integer pair (1, n_touches) rather than a float sum, so any
    downstream rollup can stay order-independent.

    Returns one row per (conversion, touch):
    (conv_id, uid, conv_ts, channel, touch_ts, n_touches, is_first,
    is_last). Conversions with no touch in the window are absent.

    Scale shape: ONE equi-join on the user key with a range predicate
    (per-user event counts are naturally bounded in web logs, so the
    join fan-out is touches-per-conversion, not corpus-squared) and one
    window over each conversion's touch set (bounded by the lookback).
    Ties on touch_ts break by the touch's event id — deterministic.
    """
    conv = events.where(F.col(type_col) == conv_type).select(
        F.col(id_col).alias("conv_id"),
        F.col(user_col).alias("uid"),
        F.col(ts_col).cast("timestamp").alias("conv_ts"),
    )
    touch = events.where(F.col(type_col) != conv_type).select(
        F.col(user_col).alias("uid"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).cast("timestamp").alias("touch_ts"),
        F.col(id_col).alias("touch_id"),
    )
    lb = F.lit(int(round(lookback_s * 1e6))).cast("long")
    j = conv.join(touch, "uid").where(
        (F.unix_micros("touch_ts") < F.unix_micros("conv_ts"))
        & (F.unix_micros("touch_ts") >= F.unix_micros("conv_ts") - lb))
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("touch_ts", "touch_id")
    return j.select(
        "conv_id", "uid", "conv_ts", "channel", "touch_ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_touches"),
        (F.row_number().over(wo) == 1).cast("int").alias("is_first"),
        (F.row_number().over(
            w.orderBy(F.col("touch_ts").desc(), F.col("touch_id").desc()))
         == 1).cast("int").alias("is_last"),
    )


def ab_test(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_floor: float | None = None,
    value_col: str = "value",
    stream: int = 77,
    seed: int = 42,
) -> DataFrame:
    """A/B experiment readout: deterministic 50/50 user assignment
    (splitmix64 of the user id — the reproducible bucketing every
    experimentation platform uses, never Spark's nondeterministic
    sample) + the pooled two-proportion z-test on conversion.

    ONE row: (n_a, x_a, p_a, n_b, x_b, p_b, z) with x = users having at
    least one ``convert_type`` event (optionally restricted to events
    with ``value_col`` >= ``value_floor`` — "high-value conversion"),

        z = (p_a - p_b) / sqrt(p(1-p) * (1/n_a + 1/n_b)),  p pooled

    Engine-exact: counts are integers; p's, the pooled se, and z are
    IEEE divisions/multiplications/one sqrt in a fixed order (no erf —
    the p-value lookup belongs in the caller's stats table, keeping the
    pipeline's arithmetic bit-reproducible). Degenerate pools (p = 0 or
    1, or an empty arm) report z = 0.

    Scale shape: two keys-only distincts (users, converted users), one
    equi-join, one two-row aggregate — no data-volume shuffle at all.
    """
    from lib_gdal_spark.operators.mixing import M53, _hash53

    users = events.select(user_col).distinct()
    draw = _hash53(user_col, stream, seed)
    assigned = users.select(
        F.col(user_col),
        F.when(draw < M53 // 2, F.lit("A")).otherwise(F.lit("B"))
        .alias("variant"),
    )
    ce = events.where(F.col(type_col) == convert_type)
    if value_floor is not None:
        ce = ce.where(F.col(value_col) >= value_floor)
    conv = ce.select(user_col).distinct().withColumn("__conv", F.lit(1))
    per = (
        assigned.join(conv, user_col, "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("__conv"), F.lit(0))).alias("x"),
        )
    )
    a = per.where(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("x").alias("x_a"))
    b = per.where(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("x").alias("x_b"))
    row = a.crossJoin(b)
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    pa, pb = xa / na, xb / nb
    pp = (xa + xb) / (na + nb)
    se = F.sqrt((pp * (F.lit(1.0) - pp)) * (F.lit(1.0) / na
                                            + F.lit(1.0) / nb))
    z = F.when(se == 0.0, F.lit(0.0)).otherwise((pa - pb) / se)
    return row.select(
        "n_a", "x_a", F.round(pa, 6).alias("p_a"),
        "n_b", "x_b", F.round(pb, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
    )


def kaplan_meier(subjects: DataFrame, t_col: str = "t",
                 event_col: str = "event") -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier,
    JASA 1958) — the retention/churn curve with right-censoring done
    correctly (naive retention ignores users still alive at cutoff):
    S(t) = prod over event times t_i <= t of (1 - d_i / n_i), with d_i
    the events at t_i and n_i the number still at risk.

    ``subjects``: one row per subject — (t integer duration,
    event 1 = observed event / 0 = right-censored). Exactness: d_i and
    n_i are exact int64 aggregates (n_i via a suffix sum over the
    <= |distinct t| aggregated rows — a bounded window, like
    otsu_threshold's histogram); the running product is
    exp(cumsum(ln(1 - d/n))) over rows SORTED by t — a fixed libm
    chain both engines evaluate identically (the openness contract).
    Times where d_i = 0 (pure censoring) keep S unchanged but still
    appear with their risk set, per the standard KM table. Returns
    (t, n_risk, d_events, n_censored, survival) per distinct t."""
    from pyspark.sql import Window

    per_t = subjects.groupBy(F.col(t_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.sum((1 - F.col(event_col)).cast("long")).alias("c"))
    wsuf = Window.orderBy(F.desc("t")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    at_risk = per_t.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(wsuf))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # d == n_risk kills the whole risk set: the factor is exactly 0, and
    # ln(0) is NULL in Spark / -inf elsewhere — handle it as an explicit
    # absorbing flag so both engines agree bit-for-bit.
    surv = at_risk.withColumn(
        "lnS", F.sum(F.when((F.col("d") > 0)
                            & (F.col("d") < F.col("n_risk")),
                            F.log(1.0 - F.col("d") / F.col("n_risk")))
                     .otherwise(F.lit(0.0))).over(wcum)) \
        .withColumn("dead", F.max(
            (F.col("d") == F.col("n_risk")).cast("int")).over(wcum))
    return surv.select(
        "t", F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.round(F.when(F.col("dead") == 1, F.lit(0.0))
                .otherwise(F.exp("lnS")), 9).alias("survival"))


def did_estimator(panel: DataFrame) -> DataFrame:
    """Two-period difference-in-differences (the canonical natural-
    experiment estimator; Card & Krueger 1994 usage): with panel rows
    (unit, treated 0/1, period 0/1, y), the effect is
    (mean_T1 - mean_T0) - (mean_C1 - mean_C0) — the treatment-group
    change net of the control-group trend — with the large-sample
    standard error sqrt(sum over the four cells of s_g^2 / n_g)
    (heteroskedastic two-sample form applied twice) and t = effect/SE.

    Exactness: per-cell n / sum / sum-of-squares are exact int64
    aggregates (one combinable groupBy over (treated, period)); means,
    sample variances (n-1 denominator), the effect, SE, and t are each
    ONE fixed float expression over those integers — engine-exact.
    Returns one row (n_t0, n_t1, n_c0, n_c1, mean_t0, mean_t1,
    mean_c0, mean_c1, did, se, t)."""
    cells = panel.groupBy("treated", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)")
              * F.col("y").cast("decimal(38,0)")).alias("s2"))
    agg = cells.agg(*[
        F.sum(F.when((F.col("treated") == t) & (F.col("period") == pd_),
                     F.col(c))).alias(f"{c}_{t}{pd_}")
        for t in (0, 1) for pd_ in (0, 1) for c in ("n", "s", "s2")])

    def mean(t, pd_):
        return F.col(f"s_{t}{pd_}") / F.col(f"n_{t}{pd_}")

    def var(t, pd_):  # sample variance from exact sums
        n = F.col(f"n_{t}{pd_}")
        return ((n * F.col(f"s2_{t}{pd_}")
                 - F.col(f"s_{t}{pd_}").cast("decimal(38,0)")
                 * F.col(f"s_{t}{pd_}").cast("decimal(38,0)"))
                .cast("double") / (n * (n - 1)).cast("double"))

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(var(1, 1) / F.col("n_11") + var(1, 0) / F.col("n_10")
                + var(0, 1) / F.col("n_01") + var(0, 0) / F.col("n_00"))
    return agg.select(
        F.col("n_10").cast("long").alias("n_t0"),
        F.col("n_11").cast("long").alias("n_t1"),
        F.col("n_00").cast("long").alias("n_c0"),
        F.col("n_01").cast("long").alias("n_c1"),
        F.round(mean(1, 0), 9).alias("mean_t0"),
        F.round(mean(1, 1), 9).alias("mean_t1"),
        F.round(mean(0, 0), 9).alias("mean_c0"),
        F.round(mean(0, 1), 9).alias("mean_c1"),
        F.round(did, 9).alias("did"),
        F.round(se, 9).alias("se"),
        F.round(did / se, 9).alias("t"))


def markov_chain(events: DataFrame, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts",
                 id_col: str = "event_id", steps: int = 3) -> DataFrame:
    """First-order Markov chain over per-user event-type sequences: the
    transition-count matrix (exact integers), the row-normalized
    transition probabilities, and the ``steps``-step occupancy
    distribution from the empirical start distribution (each user's
    first event) — the session-flow model behind next-event prediction
    and funnel leak analysis (beyond-reference; lib_gdal has no event
    layer).

    Distributed shape: consecutive pairs come from one lag window per
    user (the sessionize pattern); counts are combinable groupBys. The
    k x k matrix (k = distinct event types, inherently small) collects
    to the driver for the ``steps`` power iterations in fixed float
    order — the same driver-sized-state contract as kmeans centroids.

    Returns one row per (src, dst): (src, dst, n_trans BIGINT,
    p DOUBLE, occ_dst DOUBLE) — occ_dst is the ``steps``-step occupancy
    of dst (repeated per src for a flat schema), rounded at 9.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    seq = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("dst"),
        F.lag(type_col).over(w).alias("src"),
        F.row_number().over(w).alias("rn"))
    trans = (seq.where(F.col("src").isNotNull())
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_trans")))
    starts = (seq.where(F.col("rn") == 1)
              .groupBy(F.col("dst").alias("s"))
              .agg(F.count(F.lit(1)).alias("n_start")))
    t_rows = trans.collect()
    s_rows = starts.collect()
    states = sorted({r["src"] for r in t_rows} | {r["dst"] for r in t_rows}
                    | {r["s"] for r in s_rows})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    import numpy as _np
    cnt = _np.zeros((k, k), dtype=_np.int64)
    for r in t_rows:
        cnt[idx[r["src"]], idx[r["dst"]]] = r["n_trans"]
    rowsum = cnt.sum(axis=1)
    P = _np.zeros((k, k))
    nz = rowsum > 0
    P[nz] = cnt[nz] / rowsum[nz, None]
    # absorbing convention: a state with no outgoing transition self-loops
    for i in _np.nonzero(~nz)[0]:
        P[i, i] = 1.0
    v = _np.zeros(k)
    tot = sum(r["n_start"] for r in s_rows)
    for r in s_rows:
        v[idx[r["s"]]] = r["n_start"] / tot
    for _ in range(int(steps)):
        v = v @ P
    occ = {states[i]: round(float(v[i]), 9) for i in range(k)}
    spark = events.sparkSession
    occ_df = spark.createDataFrame(
        [(s, occ[s]) for s in states], "dst string, occ_dst double")
    return (trans.join(F.broadcast(occ_df), "dst")
            .select("src", "dst", "n_trans",
                    F.round(F.col("n_trans")
                            / F.sum("n_trans").over(
                                Window.partitionBy("src")), 9).alias("p"),
                    "occ_dst"))


def viterbi_decode(events: DataFrame, log_pi: list, log_a: list,
                   log_b: dict, user_col: str = "user_id",
                   obs_col: str = "event_type", ts_col: str = "ts",
                   id_col: str = "event_id",
                   round_decimals: int = 9) -> DataFrame:
    """Viterbi decoding of a K-state HMM over each user's event-type
    sequence (Rabiner 1989): delta_t(s) = max_p(delta_{t-1}(p) +
    logA[p][s]) + logB[s][obs_t], ties to the SMALLER predecessor
    index, path recovered by backtrace. The session-state decoder
    (engaged/idle/bot phases) behind behavioral segmentation.

    ``log_pi``: K start log-probs; ``log_a``: KxK transition log-probs;
    ``log_b``: {observation: [K emission log-probs]}. All floats are
    evaluated in the written order (max spelled as left-to-right
    pairwise comparisons), so a SQL oracle carrying the K deltas in one
    row per step replays the arithmetic bit-for-bit; the final
    log-likelihood rounds at ``round_decimals``.

    Scale: one Arrow group per user (the sessionize contract); K is
    driver-literal. Returns (user, n_obs, path STRING of state digits,
    loglik)."""
    k = len(log_pi)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__id"], ignore_index=True)
        obs = pdf["__o"].tolist()
        # delta + per-state path strings (ties to smaller index)
        d = [log_pi[s] + log_b[obs[0]][s] for s in range(k)]
        paths = [str(s) for s in range(k)]
        for t in range(1, len(obs)):
            nd, np_ = [], []
            for s in range(k):
                best_p, best_v = 0, d[0] + log_a[0][s]
                for p in range(1, k):
                    v = d[p] + log_a[p][s]
                    if v > best_v:
                        best_p, best_v = p, v
                nd.append(best_v + log_b[obs[t]][s])
                np_.append(paths[best_p] + str(s))
            d, paths = nd, np_
        best = 0
        for s in range(1, k):
            if d[s] > d[best]:
                best = s
        return pd.DataFrame([{
            "user": key[0], "n_obs": len(obs), "path": paths[best],
            "loglik": round(d[best], round_decimals),
        }])

    src = events.select(
        F.col(user_col).alias("user"), F.col(obs_col).alias("__o"),
        F.col(ts_col).alias("__ts"), F.col(id_col).alias("__id"))
    return src.groupBy("user").applyInPandas(
        run, schema="user long, n_obs long, path string, loglik double")
