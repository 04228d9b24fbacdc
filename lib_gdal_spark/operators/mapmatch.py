"""Map-matching: snap points to their nearest polyline segment.

The geotag-to-road-network operator: given mined page geocoordinates and
a segment table (a road / rail / coastline network), find each point's
nearest segment within ``max_dist`` and the projected position along it.
Reference analog: OGR nearest-feature queries (lib_gdal's quadtree
point-to-layer lookups, ``core/ogr/ogr_api.h`` layer spatial filters) —
re-expressed as a bucketed equi-join instead of a driver-side tree.

Distributed shape (the same covering-cell pattern as operators/knn.py):
segments explode to every grid cell their ``max_dist``-buffered bbox
touches (O(length / cell) keys per segment, keys only); points hash to
their single cell; one equi-join on cell yields a complete candidate set
— any segment within ``max_dist`` of a point overlaps the point's cell
by construction. The exact point-to-segment projection is pure JVM
column math (no UDF), and the per-point argmin is a bounded window.
All-pairs never happens; skew is bounded by cell occupancy, and the
candidate multiplicity is segments-per-cell, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["match_points"]


def match_points(points: DataFrame, segments: DataFrame,
                 max_dist: float, cell: float | None = None) -> DataFrame:
    """Snap each point to its nearest segment within ``max_dist``.

    ``points``: (pid, x, y). ``segments``: (seg_id, x1, y1, x2, y2).
    ``cell`` defaults to ``max_dist`` (any value >= max_dist keeps the
    candidate join complete; smaller cells would miss neighbors).

    Returns (pid, x, y, seg_id, t, dist): the winning segment, the
    clamped projection parameter t in [0, 1], and the euclidean
    distance. Ties break on the smaller seg_id (deterministic, so an
    independent brute-force argmin is a valid oracle). Points with no
    segment within ``max_dist`` are absent.
    """
    if cell is None:
        cell = max_dist
    if cell < max_dist:
        raise ValueError("cell must be >= max_dist for completeness")
    p = points.select(
        F.col(points.columns[0]).alias("pid"),
        F.col(points.columns[1]).cast("double").alias("x"),
        F.col(points.columns[2]).cast("double").alias("y"),
        F.floor(F.col(points.columns[1]) / cell).alias("cx"),
        F.floor(F.col(points.columns[2]) / cell).alias("cy"),
    )
    s = segments.select(
        F.col(segments.columns[0]).alias("seg_id"),
        F.col(segments.columns[1]).cast("double").alias("x1"),
        F.col(segments.columns[2]).cast("double").alias("y1"),
        F.col(segments.columns[3]).cast("double").alias("x2"),
        F.col(segments.columns[4]).cast("double").alias("y2"),
    )
    # covering cells of the max_dist-buffered segment bbox (keys only)
    sc = (s
          .withColumn("cx", F.explode(F.sequence(
              F.floor((F.least("x1", "x2") - max_dist) / cell),
              F.floor((F.greatest("x1", "x2") + max_dist) / cell))))
          .withColumn("cy", F.explode(F.sequence(
              F.floor((F.least("y1", "y2") - max_dist) / cell),
              F.floor((F.greatest("y1", "y2") + max_dist) / cell)))))
    cand = p.join(sc, ["cx", "cy"]).drop("cx", "cy")
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    len2 = dx * dx + dy * dy
    raw_t = ((F.col("x") - F.col("x1")) * dx
             + (F.col("y") - F.col("y1")) * dy) / len2
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.least(F.greatest(raw_t, F.lit(0.0)), F.lit(1.0)))
    ex = F.col("x") - (F.col("x1") + F.col("__t") * dx)
    ey = F.col("y") - (F.col("y1") + F.col("__t") * dy)
    scored = (cand.withColumn("__t", t)
              .withColumn("__d", F.sqrt(ex * ex + ey * ey))
              .where(F.col("__d") <= max_dist))
    w = Window.partitionBy("pid").orderBy("__d", "seg_id")
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("pid", "x", "y", "seg_id",
                    F.col("__t").alias("t"), F.col("__d").alias("dist")))
