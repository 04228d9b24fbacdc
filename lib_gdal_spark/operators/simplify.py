"""Visvalingam–Whyatt line simplification (Visvalingam & Whyatt,
Cartographic Journal 1993): repeatedly remove the interior vertex whose
triangle with its current neighbors has the smallest area — the
generalization that preserves shape character better than
Douglas-Peucker's tolerance bands (which the repo already has as
constructive Simplify).

Formulation here is fully relational — no arrays, no UDF: one
elimination step is two window passes (lag/lead neighbors over the
surviving vertices, doubled triangle area) plus a per-line argmin
delete. The caller fixes the number of eliminations, so the plan is a
statically unrolled chain — the same 2-window stage the SQL oracle
spells per step.

Exactness: integer coordinates make the doubled area
|(bx-ax)(cy-ay) - (cx-ax)(by-ay)| an exact int64; the victim argmin
tie-breaks on (area2, vi), both integers. Endpoints are never
candidates.

Scale: windows partition by line id — the shuffle key is the line, and
each unrolled stage is one exchange reused by Catalyst across the
chain. For cartographic workloads (millions of lines, tens of
vertices) this is embarrassingly parallel; the static unroll count is
the knob (simplify-to-fixed-size, the batch-rendering form)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _one_step(pts: DataFrame) -> DataFrame:
    """Remove, per line, the interior vertex with minimal doubled
    triangle area (ties to the smallest vertex index)."""
    w = Window.partitionBy("tid").orderBy("vi")
    ax, ay = F.lag("x").over(w), F.lag("y").over(w)
    cx, cy = F.lead("x").over(w), F.lead("y").over(w)
    a2 = F.abs((F.col("x") - ax) * (cy - ay)
               - (cx - ax) * (F.col("y") - ay))
    cand = pts.select(
        "tid", "vi", "x", "y",
        F.when(ax.isNotNull() & cx.isNotNull(), a2).alias("a2"))
    pick = Window.partitionBy("tid").orderBy(
        F.col("a2").asc_nulls_last(), F.col("vi").asc())
    ranked = cand.withColumn(
        "victim",
        F.col("a2").isNotNull() & (F.row_number().over(pick) == 1))
    return ranked.where(~F.col("victim")).select("tid", "vi", "x", "y")


def visvalingam(pts: DataFrame, n_remove: int) -> DataFrame:
    """``pts``: (tid, vi, x, y) integer vertex rows per line. Removes
    ``n_remove`` interior vertices per line (statically unrolled) and
    returns the survivors with a fresh dense ordinal ``out_vi`` plus
    the original ``vi``."""
    cur = pts
    for _ in range(n_remove):
        cur = _one_step(cur)
    w = Window.partitionBy("tid").orderBy("vi")
    return cur.select(
        "tid",
        (F.row_number().over(w) - 1).cast("long").alias("out_vi"),
        F.col("vi").cast("long").alias("vi"), "x", "y")
