"""Trajectory / point-set shape comparison.

Discrete Hausdorff distance between point sequences — the geometry
similarity measure OGR exposes as ``OGR_G_... / GEOS
HausdorffDistance`` (``core/ogr/ogrgeometry.cpp`` delegates to GEOS;
this is a from-scratch DataFrame re-expression of the discrete form).

Scale shape: distances are computed only for EXPLICIT candidate pairs
(never all-pairs of trajectories); within a pair the point-level cross
product is bounded by the two track lengths, distributed as one
equi-join + two combinable aggregations (min over b per a-point, then
max over a). Everything stays JVM-side (no UDF)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hausdorff_pairs(
    points: DataFrame,
    pairs: DataFrame,
    tid_col: str = "tid",
    x_col: str = "x",
    y_col: str = "y",
    round_decimals: int = 9,
) -> DataFrame:
    """Discrete Hausdorff distance for each (tid_a, tid_b) row of
    ``pairs`` over the point table ``points`` (tid, x, y):

        h(A,B) = max_{a in A} min_{b in B} d(a, b)
        H(A,B) = max(h(A,B), h(B,A))

    Distances round at ``round_decimals`` BEFORE the min/max lattice so
    both engines aggregate identical values (the repo-wide tie
    doctrine). Returns (tid_a, tid_b, h_ab, h_ba, hausdorff).
    """
    a = points.select(F.col(tid_col).alias("tid_a"),
                      F.col(x_col).alias("xa"), F.col(y_col).alias("ya"))
    b = points.select(F.col(tid_col).alias("tid_b"),
                      F.col(x_col).alias("xb"), F.col(y_col).alias("yb"))
    j = (pairs.join(a, "tid_a").join(b, "tid_b"))
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d = F.round(F.sqrt(dx * dx + dy * dy), round_decimals)
    # forward: min over b per (pair, a-point), then max over the pair
    fwd = (j.groupBy("tid_a", "tid_b", "xa", "ya")
           .agg(F.min(d).alias("dmin"))
           .groupBy("tid_a", "tid_b")
           .agg(F.max("dmin").alias("h_ab")))
    bwd = (j.groupBy("tid_a", "tid_b", "xb", "yb")
           .agg(F.min(d).alias("dmin"))
           .groupBy("tid_a", "tid_b")
           .agg(F.max("dmin").alias("h_ba")))
    return (fwd.join(bwd, ["tid_a", "tid_b"])
            .select("tid_a", "tid_b", "h_ab", "h_ba",
                    F.greatest("h_ab", "h_ba").alias("hausdorff")))


def dtw_pairs(
    points: DataFrame,
    pairs: DataFrame,
    tid_col: str = "tid",
    seq_col: str = "vi",
    x_col: str = "x",
    y_col: str = "y",
    max_len: int = 256,
) -> DataFrame:
    """Dynamic time warping distance for each (tid_a, tid_b) pair:
    classic Sakoe-Chiba DP with steps (i-1,j), (i,j-1), (i-1,j-1) and
    SQUARED euclidean point cost — integer coordinates make every cell
    of the DP table an exact BIGINT, so the result is reproducible at
    any parallelism and in a SQL oracle (the gate unrolls the DP by
    anti-diagonals).

    Shape: the two point sequences of one pair meet inside one Arrow
    group (applyInPandas over the explicit pair table — never
    all-pairs); the O(n*m) table is worker-local and ``max_len`` guards
    the quadratic cell count loudly. Returns (tid_a, tid_b, n_a, n_b,
    dtw_cost BIGINT)."""
    import numpy as np
    import pandas as pd

    a = points.select(F.col(tid_col).alias("tid_a"),
                      F.col(seq_col).alias("ia"),
                      F.col(x_col).alias("xa"), F.col(y_col).alias("ya"))
    b = points.select(F.col(tid_col).alias("tid_b"),
                      F.col(seq_col).alias("ib"),
                      F.col(x_col).alias("xb"), F.col(y_col).alias("yb"))
    j = pairs.join(a, "tid_a").join(b, "tid_b")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        aa = (pdf[["ia", "xa", "ya"]].drop_duplicates()
              .sort_values("ia", ignore_index=True))
        bb = (pdf[["ib", "xb", "yb"]].drop_duplicates()
              .sort_values("ib", ignore_index=True))
        n, m = len(aa), len(bb)
        if n > max_len or m > max_len:
            raise ValueError(
                f"dtw_pairs: sequence longer than max_len={max_len} "
                f"({n}x{m}); raise max_len knowingly — the DP table is "
                "O(n*m) per pair")
        ax = aa["xa"].to_numpy(np.int64)[:, None]
        ay = aa["ya"].to_numpy(np.int64)[:, None]
        bx = bb["xb"].to_numpy(np.int64)[None, :]
        by = bb["yb"].to_numpy(np.int64)[None, :]
        cost = (ax - bx) ** 2 + (ay - by) ** 2
        d = np.empty((n, m), dtype=np.int64)
        d[0, 0] = cost[0, 0]
        for i2 in range(1, n):
            d[i2, 0] = cost[i2, 0] + d[i2 - 1, 0]
        for j2 in range(1, m):
            d[0, j2] = cost[0, j2] + d[0, j2 - 1]
        for i2 in range(1, n):
            for j2 in range(1, m):
                d[i2, j2] = cost[i2, j2] + min(
                    d[i2 - 1, j2], d[i2, j2 - 1], d[i2 - 1, j2 - 1])
        return pd.DataFrame([{
            "tid_a": key[0], "tid_b": key[1],
            "n_a": n, "n_b": m, "dtw_cost": int(d[n - 1, m - 1]),
        }])

    return j.groupBy("tid_a", "tid_b").applyInPandas(
        run, schema="tid_a long, tid_b long, n_a long, n_b long, "
                    "dtw_cost long")
