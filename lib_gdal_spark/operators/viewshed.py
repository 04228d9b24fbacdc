"""Viewshed (observer visibility) over a pixel grid — the classic DEM
line-of-sight analysis (``gdal_viewshed`` in modern GDAL; the reference
fork predates the tool, so this is a beyond-reference operator in the
same gdaldem family as slope/hillshade, ``apps/gdaldem_lib.cpp``).

Semantics (exact, integer-only, so a SQL oracle can reproduce it
bit-for-bit): a target pixel T is visible from observer O iff no sampled
cell strictly between them reaches the O→T sight line. The ray O→T is
sampled at the n−1 interior parameters t/n (n = Chebyshev distance —
one sample per major-axis step, the Bresenham convention); each sample
rounds half-up to a grid cell, and the cell blocks iff

    (z_sample − z_obs) * n  >=  (z_target − z_obs) * t

— the cross-multiplied elevation-angle comparison (distances along one
straight ray are proportional to t), so the whole test is 64-bit
integer arithmetic with zero float-tolerance ambiguity; ties (a sample
exactly on the sight line) block, matching the conservative convention.

Distributed shape (the relational formulation): targets explode to
≤ n−1 (target, t) sample rows, sample coordinates are native column
math, ONE equi-join on the sample cell against the pixel table fetches
elevations, and one combinable groupBy(target) reduces to
visible/blocker-count. No per-ray task, no driver gather, no Python.
At scale the pixel side is broadcast when the DEM fits (the common
case — viewsheds are bounded by ``max_distance``) or co-partitioned on
a spatial key otherwise; the fan-out is O(W·H·max_ray) rows, stated
rather than hidden, and ``max_distance`` caps the ray length exactly
like gdal_viewshed's ``-md``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def viewshed(
    pixels: DataFrame,
    ox: int,
    oy: int,
    obs_height: int = 2,
    max_distance: int | None = None,
    broadcast_elevations: bool = True,
    x_col: str = "px",
    y_col: str = "py",
    z_col: str = "z",
) -> DataFrame:
    """Visibility of every pixel from observer (``ox``, ``oy``) standing
    ``obs_height`` units above the terrain.

    ``pixels``: one row per cell (x, y, integer elevation).
    ``max_distance``: Chebyshev radius cap (cells beyond it report
    visible = false, n_blockers = -1, the "not evaluated" marker).
    ``broadcast_elevations``: True (default) broadcasts the pixel table
    to the sample join — right whenever the (max_distance-bounded) DEM
    fits in an executor; set False for huge unbounded grids to let the
    sample join shuffle-partition on the sample cell key instead.

    Output: (x, y, visible boolean, n_blockers bigint) for every input
    cell. The observer cell itself is visible with 0 blockers; cells at
    Chebyshev distance 1 have no interior sample and are always visible.
    """
    px, py, z = F.col(x_col), F.col(y_col), F.col(z_col)

    # observer elevation: a 1-row broadcast frame, never a collect
    obs = pixels.where((px == ox) & (py == oy)).select(
        (z.cast("long") + obs_height).alias("__obs_z"))
    base = pixels.select(
        px.alias("__tx"), py.alias("__ty"), z.cast("long").alias("__tz")
    ).crossJoin(F.broadcast(obs))

    n = F.greatest(F.abs(F.col("__tx") - ox), F.abs(F.col("__ty") - oy))
    base = base.withColumn("__n", n.cast("long"))
    in_range = (F.lit(max_distance is None)
                | (F.col("__n") <= F.lit(max_distance or 0)))

    # interior samples t = 1..n-1 (guard: Spark's sequence(1, 0) counts
    # DOWN, so gate the explode on n >= 2)
    rays = base.where(in_range & (F.col("__n") >= 2)).select(
        "__tx", "__ty", "__tz", "__obs_z", "__n",
        F.explode(F.sequence(F.lit(1).cast("long"),
                             F.col("__n") - 1)).alias("__t"),
    )
    # sample cell: round-half-up of O + (t/n)·(T−O); the double divide
    # is correctly rounded in every IEEE engine and the rational can't
    # sit within one ulp of a half-integer without being one, so the
    # floor is engine-exact (see module docstring).
    def snap(o: int, tgt: F.Column) -> F.Column:
        frac = (F.lit(o) * F.col("__n") + F.col("__t") * (tgt - o)) \
            / F.col("__n")
        return F.floor(frac + F.lit(0.5)).cast("long")

    rays = rays.select(
        "__tx", "__ty", "__tz", "__obs_z", "__n", "__t",
        snap(ox, F.col("__tx")).alias("__sx"),
        snap(oy, F.col("__ty")).alias("__sy"),
    )
    elev = pixels.select(
        px.cast("long").alias("__sx"), py.cast("long").alias("__sy"),
        z.cast("long").alias("__sz"))
    if broadcast_elevations:
        elev = F.broadcast(elev)
    hits = rays.join(elev, ["__sx", "__sy"])
    blocked = (
        hits.groupBy("__tx", "__ty")
        .agg(F.sum(
            ((F.col("__sz") - F.col("__obs_z")) * F.col("__n")
             >= (F.col("__tz") - F.col("__obs_z")) * F.col("__t"))
            .cast("long")).alias("__nb"))
    )
    out = base.join(blocked, ["__tx", "__ty"], "left").select(
        F.col("__tx").alias(x_col),
        F.col("__ty").alias(y_col),
        F.when(~in_range, F.lit(False))
        .otherwise(F.coalesce(F.col("__nb"), F.lit(0)) == 0)
        .alias("visible"),
        F.when(~in_range, F.lit(-1).cast("long"))
        .otherwise(F.coalesce(F.col("__nb"), F.lit(0))).alias("n_blockers"),
    )
    return out
