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
