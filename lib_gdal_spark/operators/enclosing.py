"""Minimum enclosing circle (ST_MinimumBoundingCircle / GEOS
MinimumBoundingCircle parity) per point group, fully declarative.

Classic fact: the minimum enclosing circle of a finite point set is
either the circle on the diameter of two points or the circumcircle of
three points. With integer coordinates every candidate and every
containment test is EXACT integer arithmetic:

- pair candidate (a,b), point p inside iff
  (2px - (ax+bx))^2 + (2py - (ay+by))^2  <=  (ax-bx)^2 + (ay-by)^2
- triple candidate (a,b,c): d = 2*(ax*(by-cy) + bx*(cy-ay) + cx*(ay-by))
  (skip d = 0, collinear); circumcenter*d = (ux, uy); p inside iff
  (px*d - ux)^2 + (py*d - uy)^2 <= (ax*d - ux)^2 + (ay*d - uy)^2
  (d^2 cancels — sign-safe).

Coordinates must satisfy |coord| < ~500 so the sharpest term
(16*M^3)^2*2 stays under 2^63 — the caller contract, asserted in the
fixture. The final radius^2 / center are single double divisions on
the exactly-selected winner, ranked by (r2, support-key) so even a
bitwise r2 tie resolves identically in both engines.

Plan shape: the candidate build is a per-group self-join (bounded by
group size, broadcastable), the containment check one more join, the
argmin a per-group sort — shuffle keys are group ids, so the operator
scales linearly in the number of groups (the 100 TB layout: millions
of small clusters, e.g. per-city POI sets)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def min_enclosing_circles(pts: DataFrame) -> DataFrame:
    """``pts``: (gid, i, x, y) integer coordinates, i a per-group
    ordinal. Returns one row per gid: support keys (k1, k2, k3 = -1
    for pair candidates), exact integer r2 numerator/denominator
    parts, and double cx, cy, r2."""
    a = pts.select("gid", F.col("i").alias("i1"), F.col("x").alias("ax"),
                   F.col("y").alias("ay"))
    b = pts.select("gid", F.col("i").alias("i2"), F.col("x").alias("bx"),
                   F.col("y").alias("by"))
    c = pts.select("gid", F.col("i").alias("i3"), F.col("x").alias("cx"),
                   F.col("y").alias("cy"))

    # pair candidates in doubled coordinates: center2 = a+b, rr4 = |a-b|^2
    pairs = (a.join(b, "gid").where(F.col("i1") < F.col("i2"))
             .select(
                 "gid", "i1", "i2", F.lit(-1).alias("i3"),
                 (F.col("ax") + F.col("bx")).alias("ox"),
                 (F.col("ay") + F.col("by")).alias("oy"),
                 ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                  + (F.col("ay") - F.col("by"))
                  * (F.col("ay") - F.col("by"))).alias("rr"),
                 F.lit(2).alias("den")))

    # triple candidates scaled by d: center*d = (ux, uy)
    aa = F.col("ax") * F.col("ax") + F.col("ay") * F.col("ay")
    bb = F.col("bx") * F.col("bx") + F.col("by") * F.col("by")
    cc = F.col("cx") * F.col("cx") + F.col("cy") * F.col("cy")
    d = 2 * (F.col("ax") * (F.col("by") - F.col("cy"))
             + F.col("bx") * (F.col("cy") - F.col("ay"))
             + F.col("cx") * (F.col("ay") - F.col("by")))
    ux = (aa * (F.col("by") - F.col("cy")) + bb * (F.col("cy") - F.col("ay"))
          + cc * (F.col("ay") - F.col("by")))
    uy = (aa * (F.col("cx") - F.col("bx")) + bb * (F.col("ax") - F.col("cx"))
          + cc * (F.col("bx") - F.col("ax")))
    triples = (a.join(b, "gid").join(c, "gid")
               .where((F.col("i1") < F.col("i2"))
                      & (F.col("i2") < F.col("i3")))
               .withColumn("d", d)
               .where(F.col("d") != 0)
               .select(
                   "gid", "i1", "i2", "i3",
                   ux.alias("ox"), uy.alias("oy"),
                   ((F.col("ax") * F.col("d") - ux)
                    * (F.col("ax") * F.col("d") - ux)
                    + (F.col("ay") * F.col("d") - uy)
                    * (F.col("ay") * F.col("d") - uy)).alias("rr"),
                   F.col("d").alias("den")))

    cand = pairs.unionByName(triples)

    # containment: every group point must satisfy the integer test
    p = pts.select("gid", F.col("x").alias("px"), F.col("y").alias("py"))
    inside = ((F.col("px") * F.col("den") - F.col("ox"))
              * (F.col("px") * F.col("den") - F.col("ox"))
              + (F.col("py") * F.col("den") - F.col("oy"))
              * (F.col("py") * F.col("den") - F.col("oy"))
              <= F.col("rr"))
    npts = pts.groupBy("gid").agg(F.count(F.lit(1)).alias("n"))
    cov = (cand.join(p, "gid")
           .groupBy("gid", "i1", "i2", "i3", "ox", "oy", "rr", "den")
           .agg(F.sum(F.when(inside, 1).otherwise(0)).alias("n_in"))
           .join(npts, "gid")
           .where(F.col("n_in") == F.col("n")))

    # winner: min r2 = rr/den^2 (one double division), ties by support key
    r2 = (F.col("rr").cast("double")
          / (F.col("den") * F.col("den")).cast("double"))
    w = Window.partitionBy("gid").orderBy(
        r2.asc(), F.col("i1").asc(), F.col("i2").asc(), F.col("i3").asc())
    return (cov.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "gid",
                F.col("i1").cast("long").alias("k1"),
                F.col("i2").cast("long").alias("k2"),
                F.col("i3").cast("long").alias("k3"),
                (F.col("ox").cast("double")
                 / F.col("den").cast("double")).alias("cx"),
                (F.col("oy").cast("double")
                 / F.col("den").cast("double")).alias("cy"),
                r2.alias("r2")))
