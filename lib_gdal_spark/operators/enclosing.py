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


def largest_empty_circles(pts: DataFrame, box: int) -> DataFrame:
    """Largest empty circle (ST_LargestEmptyCircle semantics with the
    [0, box]^2 square as the boundary obstacle... the complement of
    :func:`min_enclosing_circles`): the biggest circle whose center
    lies in the box and whose interior contains no input point.

    The optimum of the distance-to-nearest-point field over a box is
    attained at a Voronoi VERTEX (a triple's circumcenter), at a
    Voronoi-edge x box-edge crossing (a pair's perpendicular bisector
    hitting a wall), or at a box CORNER — so enumerating exactly those
    candidates and taking r = distance to the nearest point needs no
    emptiness test at all: the nearest-point distance IS the empty
    radius at that center.

    Exactness: every candidate center is rational (num/den with den
    sign-normalized positive); in-box tests and the per-candidate
    nearest-point argmin compare (p*den - num)^2 sums — pure int64
    (caller contract: 0 <= coords <= box <= ~400). The final ranking
    divides once per candidate and breaks bitwise ties on the
    candidate key, so both engines pick the identical winner.

    Candidate keys: triples (i1, i2, i3 >= 0); pair-bisector x edge
    (i1, i2, i3 = -(edge+1), edges 0..3 = S,N,W,E); corners
    (-1, -1, -(10+corner))."""
    a = pts.select("gid", F.col("i").alias("i1"), F.col("x").alias("ax"),
                   F.col("y").alias("ay"))
    b = pts.select("gid", F.col("i").alias("i2"), F.col("x").alias("bx"),
                   F.col("y").alias("by"))
    c = pts.select("gid", F.col("i").alias("i3"), F.col("x").alias("cx"),
                   F.col("y").alias("cy"))
    B = int(box)

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
    sgn = F.when(F.col("d0") < 0, -1).otherwise(1)
    triples = (a.join(b, "gid").join(c, "gid")
               .where((F.col("i1") < F.col("i2"))
                      & (F.col("i2") < F.col("i3")))
               .withColumn("d0", d)
               .where(F.col("d0") != 0)
               .select("gid", "i1", "i2", "i3",
                       (ux * sgn).alias("nx"), (uy * sgn).alias("ny"),
                       (F.col("d0") * sgn).alias("den"))
               .where((F.col("nx") >= 0) & (F.col("nx") <= B * F.col("den"))
                      & (F.col("ny") >= 0)
                      & (F.col("ny") <= B * F.col("den"))))

    # pair bisector x box edge: on horizontal edges (y = 0 / y = B) the
    # center x satisfies 2(bx-ax)x = |b|^2-|a|^2 - 2yc(by-ay); vertical
    # edges symmetric. den0 sign-normalized, in-box filtered.
    pair = (a.join(b, "gid").where(F.col("i1") < F.col("i2"))
            .withColumn("aa", F.col("ax") * F.col("ax")
                        + F.col("ay") * F.col("ay"))
            .withColumn("bb", F.col("bx") * F.col("bx")
                        + F.col("by") * F.col("by")))
    edges = []
    for e, (horiz, fixed) in enumerate([(True, 0), (True, B),
                                        (False, 0), (False, B)]):
        if horiz:
            den0 = 2 * (F.col("bx") - F.col("ax"))
            num0 = (F.col("bb") - F.col("aa")
                    - 2 * F.lit(fixed) * (F.col("by") - F.col("ay")))
        else:
            den0 = 2 * (F.col("by") - F.col("ay"))
            num0 = (F.col("bb") - F.col("aa")
                    - 2 * F.lit(fixed) * (F.col("bx") - F.col("ax")))
        sg = F.when(den0 < 0, -1).otherwise(1)
        var = (num0 * sg).alias("vnum")
        dn = (den0 * sg).alias("den")
        ed = (pair.where(den0 != 0)
              .select("gid", "i1", "i2",
                      F.lit(-(e + 1)).alias("i3"), var, dn))
        ed = ed.where((F.col("vnum") >= 0)
                      & (F.col("vnum") <= B * F.col("den")))
        if horiz:
            ed = ed.select("gid", "i1", "i2", "i3",
                           F.col("vnum").alias("nx"),
                           (F.lit(fixed) * F.col("den")).alias("ny"), "den")
        else:
            ed = ed.select("gid", "i1", "i2", "i3",
                           (F.lit(fixed) * F.col("den")).alias("nx"),
                           F.col("vnum").alias("ny"), "den")
        edges.append(ed)

    gids = pts.select("gid").distinct()
    corners = None
    for ci, (cxv, cyv) in enumerate([(0, 0), (B, 0), (0, B), (B, B)]):
        cr = gids.select(
            "gid", F.lit(-1).alias("i1"), F.lit(-1).alias("i2"),
            F.lit(-(10 + ci)).alias("i3"),
            F.lit(cxv).alias("nx"), F.lit(cyv).alias("ny"),
            F.lit(1).alias("den"))
        corners = cr if corners is None else corners.unionByName(cr)

    cand = triples
    for ed in edges:
        cand = cand.unionByName(ed)
    cand = cand.unionByName(corners)

    # nearest input point per candidate: integer (p*den - n)^2 compare
    p = pts.select("gid", F.col("x").alias("px"), F.col("y").alias("py"))
    dd = ((F.col("px") * F.col("den") - F.col("nx"))
          * (F.col("px") * F.col("den") - F.col("nx"))
          + (F.col("py") * F.col("den") - F.col("ny"))
          * (F.col("py") * F.col("den") - F.col("ny")))
    near = (cand.join(p, "gid")
            .groupBy("gid", "i1", "i2", "i3", "nx", "ny", "den")
            .agg(F.min(dd).alias("rr")))

    r2 = (F.col("rr").cast("double")
          / (F.col("den") * F.col("den")).cast("double"))
    w = Window.partitionBy("gid").orderBy(
        r2.desc(), F.col("i1").asc(), F.col("i2").asc(), F.col("i3").asc())
    return (near.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "gid",
                F.col("i1").cast("long").alias("k1"),
                F.col("i2").cast("long").alias("k2"),
                F.col("i3").cast("long").alias("k3"),
                (F.col("nx").cast("double")
                 / F.col("den").cast("double")).alias("cx"),
                (F.col("ny").cast("double")
                 / F.col("den").cast("double")).alias("cy"),
                r2.alias("r2")))
