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

import math
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
    (= eig / trace), v1..v6).

    The DATA pass is the single distributed aggregation in
    :func:`covariance_row`; the 24 power-iteration steps then run on
    the collected d*(d+1)/2 + d + 1 scalars DRIVER-side — the Spark
    MLlib PCA pattern (RowMatrix.computePrincipalComponents does its
    eigensolve on the driver's Gramian too). Python floats are IEEE
    doubles and every step is the same left-assoc fold the SQL oracle
    spells, so the result is bit-identical. (A first cut unrolled the
    iterations as 24 chained Catalyst projections; project-collapse
    substituted each step into the next and planning alone cost ~20 s
    — iterating ON the reduced statistics is the correct altitude.)"""
    r = covariance_row(text_features(docs, text_col)).first()
    n = int(r["n"])

    def cov(a: int, b: int) -> float:
        lo, hi = min(a, b), max(a, b)
        return float(n * r[f"q{lo}{hi}"] - r[f"s{a}"] * r[f"s{b}"])

    v = [1.0] * D
    nrm = 0.0
    for _ in range(iters):
        w = []
        for a in range(1, D + 1):
            acc = cov(a, 1) * v[0]
            for b in range(2, D + 1):
                acc = acc + cov(a, b) * v[b - 1]
            w.append(acc)
        nrm = w[0] * w[0]
        for a in range(1, D):
            nrm = nrm + w[a] * w[a]
        nrm = math.sqrt(nrm)
        v = [x / nrm for x in w]
    trace = cov(1, 1)
    for a in range(2, D + 1):
        trace = trace + cov(a, a)
    spark = docs.sparkSession
    out = {"n": n, "eig": nrm, "explained": nrm / trace}
    out.update({f"v{a}": v[a - 1] for a in range(1, D + 1)})
    return spark.createDataFrame(
        [tuple(out.values())],
        "n long, eig double, explained double, " + ", ".join(
            f"v{a} double" for a in range(1, D + 1)))
