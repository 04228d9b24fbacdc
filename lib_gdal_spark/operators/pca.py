"""PCA of document text-statistics by distributed covariance + unrolled
power iteration — the MLlib-PCA shape (one pass computes the d x d
covariance as aggregates; the tiny eigenproblem is solved by fixed
arithmetic, here 24 explicit power-iteration steps so the SQL oracle
can replay every FLOP).

Exactness: the 6 features are integer string statistics; the n-scaled
covariance C_ab = n*sum(f_a f_b) - S_a S_b is exact int64; every
power-iteration step is a FIXED left-to-right float expression
(matvec in index order, one L2 normalization with IEEE sqrt), so both
engines produce bit-identical doubles.

Scale: the only full-data pass is the single groupBy-less aggregation
(map-side partials, one reduce of d*(d+1)/2 + d + 1 numbers); the
iteration happens on a one-row frame. This is exactly how PCA over
10^12 documents should run — nothing iterative ever touches the data.
"""

from __future__ import annotations

from itertools import combinations_with_replacement

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D = 6
FEATS = ["f1", "f2", "f3", "f4", "f5", "f6"]


def _count_removed(text: Column, pattern: str) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, pattern, ""))


def text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Six integer text statistics per document: length, spaces,
    digits, uppercase, punctuation, letter-e count."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(t).alias("f1"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
         ).alias("f2"),
        _count_removed(t, "[0-9]").alias("f3"),
        _count_removed(t, "[A-Z]").alias("f4"),
        _count_removed(t, "[.,!?;:]").alias("f5"),
        (F.length(t) - F.length(F.replace(t, F.lit("e"), F.lit("")))
         ).alias("f6"))


def covariance_row(feats: DataFrame) -> DataFrame:
    """One-row frame: n, s_a (sums), q_ab (product sums, a <= b) —
    all exact integers from one aggregation."""
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(F.col(f)).alias(f"s{a + 1}")
             for a, f in enumerate(FEATS)]
    aggs += [F.sum(F.col(FEATS[a]) * F.col(FEATS[b])).alias(f"q{a+1}{b+1}")
             for a, b in combinations_with_replacement(range(D), 2)]
    return feats.agg(*aggs)


def _cov(a: int, b: int) -> Column:
    lo, hi = min(a, b), max(a, b)
    return (F.col("n") * F.col(f"q{lo}{hi}")
            - F.col(f"s{a}") * F.col(f"s{b}")).cast("double")


def pca_top_component(docs: DataFrame, text_col: str = "text",
                      iters: int = 24) -> DataFrame:
    """Top principal component of the 6 text statistics: returns one
    row (n, eig (the final pre-normalization vector norm), explained
    (= eig / trace), v1..v6)."""
    row = covariance_row(text_features(docs, text_col))
    base = list(row.columns)
    cur = row.select(
        "*", *[F.lit(1.0).alias(f"v{a}") for a in range(1, D + 1)])
    for _ in range(iters):
        ws = []
        for a in range(1, D + 1):
            w = _cov(a, 1) * F.col("v1")
            for b in range(2, D + 1):
                w = w + _cov(a, b) * F.col(f"v{b}")
            ws.append(w.alias(f"w{a}"))
        cur = cur.select(*base, *ws)
        nrm = F.col("w1") * F.col("w1")
        for a in range(2, D + 1):
            nrm = nrm + F.col(f"w{a}") * F.col(f"w{a}")
        cur = cur.select("*", F.sqrt(nrm).alias("nrm"))
        cur = cur.select(
            *base, "nrm",
            *[(F.col(f"w{a}") / F.col("nrm")).alias(f"v{a}")
              for a in range(1, D + 1)])
    trace = _cov(1, 1)
    for a in range(2, D + 1):
        trace = trace + _cov(a, a)
    return cur.select(
        F.col("n").cast("long").alias("n"),
        F.col("nrm").alias("eig"),
        (F.col("nrm") / trace).alias("explained"),
        *[F.col(f"v{a}") for a in range(1, D + 1)])
