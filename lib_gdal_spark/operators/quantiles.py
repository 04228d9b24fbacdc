"""Exact distributed order statistics without a global sort.

The "median of 100 TB" pattern: you cannot sort the corpus, but you can
histogram it. Each pass groups the surviving values into ``buckets``
ordered cells with ONE map-side-combinable aggregation, walks the
(driver-sized, <= buckets rows) histogram to the cell containing the
target rank, and repeats inside that cell; when few enough values
survive they are collected and selected exactly. Worst case
log_buckets(range/ulp) passes (~5 for doubles at B=4096), 2-3 in
practice — versus one global sort shuffle of everything.

Exactness with floats: cell assignment is clamp(floor((v - lo)/w)) — a
MONOTONE function of v — and the next pass filters with the SAME
expression (not recomputed interval bounds), so ulp-level disagreement
between division and interval arithmetic cannot leak or double-count a
value. Result matches DuckDB's ``quantile_disc`` (type-1 discrete
quantile, 0-based rank k = max(0, ceil(q*n) - 1)) exactly.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    buckets: int = 4096,
    final_limit: int = 65536,
    max_passes: int = 64,
) -> DataFrame:
    """Exact type-1 discrete quantiles of a numeric column. Returns a
    DataFrame (q double, value double), one row per requested quantile;
    NULLs are ignored (and an all-NULL/empty column yields NULL values).

    Per-pass driver traffic is one <= ``buckets``-row histogram; the
    terminal collect is bounded by ``final_limit`` values (or by the
    number of distinct values inside one ulp-wide cell when the column
    is massively duplicated).
    """
    spark = df.sparkSession
    base = (
        df.select(F.col(col).cast("double").alias("v"))
        .where(F.col("v").isNotNull())
    )
    st = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n = st["n"]
    if n == 0:
        return spark.createDataFrame(
            [(float(q), None) for q in qs], "q double, value double"
        )

    def _solve(q: float) -> float:
        k = max(0, math.ceil(q * n) - 1)  # 0-based global target rank
        lo, hi = float(st["lo"]), float(st["hi"])
        preds: list[Column] = []
        below, cnt = 0, n

        def _where() -> DataFrame:
            d = base
            for p in preds:
                d = d.where(p)
            return d

        for _ in range(max_passes):
            if lo == hi:
                return lo
            if cnt <= final_limit:
                vals = sorted(r["v"] for r in _where().collect())
                return vals[k - below]
            width = (hi - lo) / buckets
            if width <= 0 or not math.isfinite(width):
                break
            cell = F.least(
                F.lit(buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("v") - lo) / width).cast("int"),
                ),
            )
            hist = dict(
                (r["c"], r["cnt"])
                for r in _where()
                .groupBy(cell.alias("c"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            )
            acc = below
            for ib in range(buckets):
                cb = hist.get(ib, 0)
                if acc + cb > k:
                    break
                acc += cb
            else:  # unreachable (cells partition the surviving set)
                break
            if cb == cnt:
                # stale bounds put everything in one cell: re-tighten to
                # the exact min/max of the surviving set. With exact
                # bounds, min lands in cell 0 and max in cell B-1, so the
                # next histogram is guaranteed to split (or lo == hi).
                b2 = _where().agg(
                    F.min("v").alias("lo"), F.max("v").alias("hi")
                ).collect()[0]
                lo, hi = float(b2["lo"]), float(b2["hi"])
                continue
            preds.append(cell == ib)
            below, cnt = acc, cb
            lo = lo + ib * width
            hi = min(lo + width, hi)
        # terminal for massive duplicates: the surviving cell spans at
        # most a few representable doubles -> exact per-value counts
        rows = sorted(
            (r["v"], r["cnt"])
            for r in _where()
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        acc = below
        for v, cb in rows:
            if acc + cb > k:
                return v
            acc += cb
        return rows[-1][0]

    return spark.createDataFrame(
        [(float(q), float(_solve(q))) for q in qs], "q double, value double"
    )


def corr_matrix(df: DataFrame, cols: list, scale: int = 100) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric columns in ONE
    distributed pass of exact integer moments — the profiling primitive
    behind feature audits (which TPC-H measures co-move?).

    Each column is quantized half-up to integer ``1/scale`` units
    (fixed-point money/ratio columns are exact at scale=100), so every
    sum and cross-sum is an exact int64/decimal(38) — order- and
    partition-independent — and each correlation is one float
    expression (n*s_xy - s_x*s_y) / (sqrt(n*s_xx - s_x^2) *
    sqrt(n*s_yy - s_y^2)). Zero-variance columns yield NULL, not an
    error. Returns (col_x, col_y, corr) for every unordered pair,
    col_x < col_y in ``cols`` order."""
    k = len(cols)
    qs = [F.round(F.col(c) * scale, 0).cast("long").alias(f"q{i}")
          for i, c in enumerate(cols)]
    q = df.select(*qs)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        aggs.append(F.sum(f"q{i}").alias(f"s{i}"))
        for j in range(i, k):
            aggs.append(F.sum(F.col(f"q{i}").cast("decimal(38,0)")
                              * F.col(f"q{j}").cast("decimal(38,0)"))
                        .alias(f"s{i}_{j}"))
    m = q.agg(*aggs)
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            num = (F.col("n") * F.col(f"s{i}_{j}")
                   - F.col(f"s{i}").cast("decimal(38,0)")
                   * F.col(f"s{j}").cast("decimal(38,0)")).cast("double")
            vx = (F.col("n") * F.col(f"s{i}_{i}")
                  - F.col(f"s{i}").cast("decimal(38,0)")
                  * F.col(f"s{i}").cast("decimal(38,0)")).cast("double")
            vy = (F.col("n") * F.col(f"s{j}_{j}")
                  - F.col(f"s{j}").cast("decimal(38,0)")
                  * F.col(f"s{j}").cast("decimal(38,0)")).cast("double")
            den = F.sqrt(vx) * F.sqrt(vy)
            pairs.append(F.struct(
                F.lit(cols[i]).alias("col_x"), F.lit(cols[j]).alias("col_y"),
                F.round(F.when(den != 0.0, num / den), 9).alias("corr")))
    return (m.select(F.explode(F.array(*pairs)).alias("p"))
            .select("p.col_x", "p.col_y", "p.corr"))


def trimmed_mean(df: DataFrame, col: str, trim_num: int = 1,
                 trim_den: int = 20, scale: int = 100) -> DataFrame:
    """Exact trimmed and winsorized means (the robust-location pair;
    Tukey/Huber practice): drop (trimmed) or clamp (winsorized) the
    lowest and highest floor(n * trim_num/trim_den) observations by
    EXACT global rank — no approximate quantiles, no float threshold.

    Exactness/scale: ranks come from
    :func:`~lib_gdal_spark.operators.skew._global_ranks`
    (range-repartition + per-partition offsets, no single-reducer
    window; ties break on the quantized value itself — duplicates are
    interchangeable so any stable order yields the same sums); values
    quantize half-up to ``1/scale`` units so every sum is exact int64
    and the means are one division each. The trim count is integer
    floor arithmetic (n * t_num div t_den — no 0.05 * n float
    boundary). Returns one row (n, n_trimmed_each, mean, trimmed_mean,
    winsorized_mean)."""
    from lib_gdal_spark.operators.skew import _global_ranks

    q = df.select(
        F.monotonically_increasing_id().alias("pid"),
        F.round(F.col(col) * scale, 0).cast("long").alias("x"))
    n = q.count()
    k = (n * int(trim_num)) // int(trim_den)
    r = _global_ranks(q.select("pid", F.col("x").alias("x"),
                               F.lit(0.0).alias("y")), ["x", "pid"])
    lo_rank, hi_rank = k + 1, n - k
    bounds = r.where((F.col("__rank") == lo_rank)
                     | (F.col("__rank") == hi_rank)) \
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    mid = r.where(F.col("__rank").between(lo_rank, hi_rank))
    agg = mid.agg(F.count(F.lit(1)).alias("nm"),
                  F.sum("x").alias("sm"))
    full = r.agg(F.sum("x").alias("sa"))
    win = r.crossJoin(F.broadcast(bounds)).select(
        F.greatest(F.least(F.col("x"), F.col("hi")),
                   F.col("lo")).alias("w"))
    wagg = win.agg(F.sum("w").alias("sw"))
    out = agg.crossJoin(full).crossJoin(wagg)
    return out.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(k).cast("long").alias("n_trimmed_each"),
        F.round(F.col("sa") / F.lit(float(n)) / scale, 9).alias("mean"),
        F.round(F.col("sm") / F.col("nm") / scale, 9)
        .alias("trimmed_mean"),
        F.round(F.col("sw") / F.lit(float(n)) / scale, 9)
        .alias("winsorized_mean"))


def benford_test(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938;
    the standard fabricated-data / parser-bug detector for positive
    scale-spanning measures): observed leading-digit counts vs the
    Benford expectation n * log10(1 + 1/d), with the chi-square
    statistic (8 df) folded over the nine digits in fixed order.

    Exactness: the leading digit comes from STRING manipulation of the
    value's canonical formatting? No — from exact integer/float math:
    d = floor(x / 10^floor(log10(x))) — log10/floor on identical
    doubles, the same in any engine; counts are exact int64; expected
    and chi-square are fixed float expressions. Non-positive values
    are excluded (documented). Returns one row per digit
    (digit, observed, expected, chi2_term) plus the digit-ordered
    fold makes sum(chi2_term) the engine-exact statistic."""
    x = F.col(col)
    pos = df.where(x > 0)
    d = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))) \
        .cast("int").alias("digit")
    counts = pos.select(d).groupBy("digit").agg(
        F.count(F.lit(1)).alias("observed"))
    n = pos.count()
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"))
    j = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("observed", F.lit(0)).alias("observed"))
    exp = F.lit(float(n)) * F.log10(1.0 + 1.0 / F.col("digit"))
    chi = (F.col("observed") - exp) * (F.col("observed") - exp) / exp
    return j.select(
        "digit", F.col("observed").cast("long").alias("observed"),
        F.round(exp, 9).alias("expected"),
        F.round(chi, 9).alias("chi2_term"))
