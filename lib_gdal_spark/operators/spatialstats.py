"""Spatial statistics over cell-aggregated pages: Moran's I, Getis-Ord Gi*,
kernel-density heatmaps, Ripley's K.

Beyond the reference (GDAL 2.4 has no spatial-stats layer; its closest
analogs are the band statistics in ``core/gcore/gdalrasterband.cpp`` and the
data-metrics grid algorithms in ``core/alg/gdalgrid.cpp:1183`` — per-window
count/min/max/avg-distance); the formulas here are the published classics:
Moran (1950), Getis & Ord (1992, Geographical Analysis 24), Ripley (1976),
quartic-kernel density per Silverman (1986, eq. 4.5).

Design for exactness AND scale:

- Every statistic is decomposed into **exact int64 partial sums** (counts,
  sums, sums of squares/products over integer-valued cell variables) that
  Spark aggregates distributively — map-side combinable, one keyed shuffle —
  followed by ONE final float expression on the driver-sized result. Because
  the partials are exact integers, the outputs are partitioning- and
  order-independent, and a SQL oracle that spells the identical final
  expression reproduces them bit-for-bit.
- Neighborhoods are **equi-joins on (gx, gy) lattice keys** (queen/rook
  contiguity) — never a distance cross-join. The cell table is the
  *aggregated* corpus (|cells| << |pages|), so the join is small even when
  the input is 100 TB of pages.
- The KDE kernel is **quantized to 1/4096 dyadic rationals** (same trick as
  kernels/resample.py's GRA_Sum weights), so density sums are exact and
  order-independent.
- Ripley's K uses the same bounded 3x3 covering join as operators/knn.py:
  cell size >= r_max guarantees every pair within r_max is found (proven
  against a brute-force oracle in the driver query).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "neighbor_pairs",
    "morans_i",
    "gearys_c",
    "local_moran",
    "local_geary",
    "join_counts",
    "getis_gi_star",
    "kde_heatmap",
    "ripley_k",
    "cross_k",
    "clark_evans",
    "two_step_fca",
    "colocation_quotient",
    "knox_test",
    "mann_kendall",
    "getis_per_bin",
    "emerging_hotspots",
    "centrography",
    "empirical_variogram",
]


def _offsets(queen: bool) -> list[tuple[int, int]]:
    return [
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0) and (queen or dx == 0 or dy == 0)
    ]


def neighbor_pairs(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Directed contiguity pairs over occupied lattice cells.

    ``cells``: (gx int, gy int, x long) — one row per OCCUPIED cell.
    Returns (gx, gy, xi, ngx, ngy, xj): one row per directed pair of
    occupied cells that are queen- (8-) or rook- (4-) adjacent. Binary
    symmetric weights; unoccupied neighbors simply don't join (this is the
    standard "occupied-cells lattice" weight matrix).

    Shape: |cells| x 8 explode of the AGGREGATED table, then one equi-join
    on (gx, gy) — no distance predicate, no cross join.
    """
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _offsets(queen)
        ]
    )
    probe = (
        cells.select("gx", "gy", F.col("x").alias("xi"), F.explode(offs).alias("o"))
        .select(
            "gx",
            "gy",
            "xi",
            (F.col("gx") + F.col("o.dx")).alias("ngx"),
            (F.col("gy") + F.col("o.dy")).alias("ngy"),
        )
    )
    nbr = cells.select(
        F.col("gx").alias("ngx"), F.col("gy").alias("ngy"), F.col("x").alias("xj")
    )
    return probe.join(nbr, ["ngx", "ngy"])


def morans_i(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Global Moran's I with the normality z-score (Moran 1950; Cliff & Ord
    1981 moments) over an integer cell variable.

    One-row result: (n_cells, s0, moran_i, e_i, z_norm).

    Everything up to the last expression is an exact int64 aggregate:
      sum_w(xi-m)(xj-m) = spp - m*sxy + m^2*s0   (m = sx/n)
      sum (xi-m)^2      = sxx - n*m^2
    with spp = sum(xi*xj), sxy = sum(xi+xj) over pairs, s0 = #directed
    pairs; the normality variance uses S1 = 2*s0 (binary symmetric W) and
    S2 = 4*sum(deg_i^2). The SQL oracle spells the identical final
    arithmetic over the same integer partials.
    """
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    pairs = neighbor_pairs(cells, queen)
    p = pairs.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.col("xi") * F.col("xj")).alias("spp"),
        F.sum(F.col("xi") + F.col("xj")).alias("sxy"),
    )
    deg = (
        pairs.groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.sum(F.col("deg") * F.col("deg")).alias("sdeg2"))
    )
    j = g.crossJoin(p).crossJoin(deg)
    m = F.col("sx") / F.col("n")
    num = F.col("spp") - m * F.col("sxy") + m * m * F.col("s0")
    den = F.col("sxx") - F.col("n") * m * m
    i = (F.col("n") / F.col("s0")) * num / den
    e_i = F.lit(-1.0) / (F.col("n") - F.lit(1))
    s1 = 2.0 * F.col("s0")
    s2 = 4.0 * F.col("sdeg2")
    var = (
        (F.col("n") * F.col("n") * s1 - F.col("n") * s2
         + 3.0 * F.col("s0") * F.col("s0"))
        / ((F.col("n") * F.col("n") - 1.0) * F.col("s0") * F.col("s0"))
        - e_i * e_i
    )
    return j.select(
        F.col("n").alias("n_cells"),
        F.col("s0"),
        F.round(i, 10).alias("moran_i"),
        F.round(e_i, 10).alias("e_i"),
        F.round((i - e_i) / F.sqrt(var), 8).alias("z_norm"),
    )


def getis_gi_star(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Local Getis-Ord Gi* hotspot z-scores (Getis & Ord 1992, eq. 14 with
    the self-inclusive star weights; Ord & Getis 1995 standardization).

    Per occupied cell: (gx, gy, x, w_i, nbr_sum, gi_star) where
      nbr_sum = sum of x over the cell AND its occupied neighbors,
      w_i     = that neighborhood's size (deg_i + 1),
      gi_star = (nbr_sum - m*w_i) / (s * sqrt((n*w_i - w_i^2)/(n-1)))
    with m = sx/n and s = sqrt(sxx/n - m^2) over ALL cells. nbr_sum/w_i
    are exact int64 join-aggregates; the global (n, sx, sxx) broadcast to
    every row; one final float expression.
    """
    pairs = neighbor_pairs(cells, queen)
    nbr = pairs.groupBy("gx", "gy").agg(
        F.sum("xj").alias("nsum"), F.count(F.lit(1)).alias("deg")
    )
    per = (
        cells.join(nbr, ["gx", "gy"], "left")
        .select(
            "gx",
            "gy",
            "x",
            (F.coalesce(F.col("deg"), F.lit(0)) + F.lit(1)).alias("w_i"),
            (F.coalesce(F.col("nsum"), F.lit(0)) + F.col("x")).alias("nbr_sum"),
        )
    )
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = per.crossJoin(F.broadcast(g))
    m = F.col("sx") / F.col("n")
    s = F.sqrt(F.col("sxx") / F.col("n") - m * m)
    gi = (F.col("nbr_sum") - m * F.col("w_i")) / (
        s
        * F.sqrt(
            (F.col("n") * F.col("w_i") - F.col("w_i") * F.col("w_i"))
            / (F.col("n") - 1.0)
        )
    )
    return j.select("gx", "gy", "x", "w_i", "nbr_sum", F.round(gi, 9).alias("gi_star"))


def kernel_quanta(radius: int) -> list[tuple[int, int, float]]:
    """Quartic (biweight) kernel K(u) = (1-u^2)^2 on the integer offset
    lattice, u^2 = (dx^2+dy^2)/R^2, quantized to 1/4096 dyadic rationals
    (exactly the GRA_Sum weight trick, kernels/resample.py) so that any
    summation order yields the identical float density."""
    out = []
    r2 = float(radius * radius)
    for dx in range(-radius + 1, radius):
        for dy in range(-radius + 1, radius):
            d2 = float(dx * dx + dy * dy)
            if d2 >= r2:
                continue
            u = 1.0 - d2 / r2
            q = math.floor(u * u * 4096.0 + 0.5) / 4096.0
            if q > 0.0:
                out.append((dx, dy, q))
    return out


def kde_heatmap(counts: DataFrame, radius: int = 3) -> DataFrame:
    """Quantized kernel-density heatmap over pixel-binned points.

    ``counts``: (px int, py int, cnt long) — points pre-binned to pixels
    (the standard quantized KDE: each point sits at its pixel, so kernel
    weights depend only on the INTEGER offset and are computed once).
    Returns (px, py, density) for every pixel with positive density.

    Shape: the (2R-1)^2 bounded explode runs over the AGGREGATED pixel
    table, not the raw points; both shuffles (bin, re-sum) are keyed and
    map-side combinable. density = sum(cnt * q) with dyadic q — exact.
    """
    quanta = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(q).alias("q")
            )
            for dx, dy, q in kernel_quanta(radius)
        ]
    )
    return (
        counts.select("px", "py", "cnt", F.explode(quanta).alias("k"))
        .select(
            (F.col("px") + F.col("k.dx")).alias("px"),
            (F.col("py") + F.col("k.dy")).alias("py"),
            (F.col("cnt") * F.col("k.q")).alias("w"),
        )
        .groupBy("px", "py")
        .agg(F.sum("w").alias("density"))
    )


def ripley_k(
    points: DataFrame,
    radii: list[float],
    area: float,
    cell: float,
) -> DataFrame:
    """Ripley's K / Besag's L at the given radii over a planar window.

    ``points``: (pid long, x double, y double) inside a window of measure
    ``area``; ``cell`` must be >= max(radii) so the 3x3 covering join finds
    every pair within range (same completeness argument as knn.s2_ring_pairs,
    proven against the brute-force oracle in the driver query).

    K_hat(r) = area * #{ordered pairs with d < r} / (n * (n-1)) — the
    uncorrected estimator (no edge correction; documented). L_hat(r) =
    sqrt(K_hat / pi). Pair counts are exact int64; one final float row per
    radius.
    """
    if cell < max(radii):
        raise ValueError(f"cell {cell} must be >= max radius {max(radii)}")
    pts = points.select(
        "pid",
        "x",
        "y",
        F.floor(F.col("x") / cell).cast("int").alias("cx"),
        F.floor(F.col("y") / cell).cast("int").alias("cy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        "pid", "x", "y", F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    ).select("pid", "x", "y", "ncx", "ncy")
    other = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("ncx"),
        F.col("cy").alias("ncy"),
    )
    d2 = (
        (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
        + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb"))
    )
    pairs = (
        probe.join(other, ["ncx", "ncy"])
        .where(F.col("pid") != F.col("pid_b"))
        .select(d2.alias("d2"))
    )
    aggs = pairs.agg(
        *[
            F.coalesce(
                F.sum((F.col("d2") < F.lit(float(r) * float(r))).cast("long")),
                F.lit(0),
            ).alias(f"c{i}")
            for i, r in enumerate(radii)
        ]
    )
    cnt = points.agg(F.count(F.lit(1)).alias("n"))
    arr = F.array(
        *[
            F.struct(
                F.lit(float(r)).alias("r"), F.col(f"c{i}").alias("n_pairs")
            )
            for i, r in enumerate(radii)
        ]
    )
    k_hat = F.lit(area) * F.col("n_pairs") / (F.col("n") * (F.col("n") - 1.0))
    return (
        aggs.crossJoin(cnt)
        .select(F.explode(arr).alias("e"), "n")
        .select(F.col("e.r").alias("r"), F.col("e.n_pairs").alias("n_pairs"), "n")
        .select(
            "r",
            "n_pairs",
            F.round(k_hat, 9).alias("k_hat"),
            F.round(F.sqrt(k_hat / math.pi), 9).alias("l_hat"),
        )
    )


def _covered(points: DataFrame, cell: float, prefix: str = "") -> DataFrame:
    p = prefix
    return points.select(
        F.col("pid").alias(f"{p}pid"),
        F.col("x").alias(f"{p}x"),
        F.col("y").alias(f"{p}y"),
        F.floor(F.col("x") / cell).cast("int").alias("cx"),
        F.floor(F.col("y") / cell).cast("int").alias("cy"),
    )


_OFFS9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def cross_k(points_a: DataFrame, points_b: DataFrame, radii: list[float],
            area: float, cell: float) -> DataFrame:
    """Bivariate (cross) Ripley K / L (Lotwick & Silverman, JRSS-B 1982):
    K_ab(r) = area * #{(a, b) pairs with d(a, b) < r} / (n_a * n_b) over a
    planar window of measure ``area`` — the independence test between two
    point processes (clustering of B around A when L_ab(r) > r). Both
    inputs are (pid long, x double, y double); ``cell`` >= max(radii)
    gives the same 3x3 covering-join completeness guarantee as
    :func:`ripley_k` (proven vs a brute-force oracle in the driver
    query). Uncorrected estimator (no edge correction; documented). Pair
    counts are exact int64; one float row per radius."""
    if cell < max(radii):
        raise ValueError(f"cell {cell} must be >= max radius {max(radii)}")
    a = _covered(points_a, cell)
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFS9])
    probe = a.select(
        "pid", "x", "y", F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    ).select("pid", "x", "y", "ncx", "ncy")
    b = _covered(points_b, cell, "b").select(
        "bpid", "bx", "by",
        F.col("cx").alias("ncx"), F.col("cy").alias("ncy"))
    d2 = ((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
          + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")))
    pairs = probe.join(b, ["ncx", "ncy"]).select(d2.alias("d2"))
    aggs = pairs.agg(*[
        F.coalesce(
            F.sum((F.col("d2") < F.lit(float(r) * float(r))).cast("long")),
            F.lit(0)).alias(f"c{i}")
        for i, r in enumerate(radii)])
    na = points_a.agg(F.count(F.lit(1)).alias("na"))
    nb = points_b.agg(F.count(F.lit(1)).alias("nb"))
    arr = F.array(*[
        F.struct(F.lit(float(r)).alias("r"), F.col(f"c{i}").alias("n_pairs"))
        for i, r in enumerate(radii)])
    k_ab = F.lit(area) * F.col("n_pairs") / (F.col("na") * F.col("nb") * 1.0)
    return (
        aggs.crossJoin(na).crossJoin(nb)
        .select(F.explode(arr).alias("e"), "na", "nb")
        .select(F.col("e.r").alias("r"),
                F.col("e.n_pairs").alias("n_pairs"), "na", "nb")
        .select("r", "n_pairs",
                F.round(k_ab, 9).alias("k_ab"),
                F.round(F.sqrt(k_ab / math.pi), 9).alias("l_ab"))
    )


def clark_evans(points: DataFrame, area: float, cell: float,
                max_doublings: int = 8) -> DataFrame:
    """Clark-Evans nearest-neighbour index (Clark & Evans, Ecology 1954):
    R = observed mean NN distance / expected under CSR (0.5 *
    sqrt(area/n)), with the normal test statistic z = (obs - exp) /
    (0.26136 / sqrt(n^2 / area)). R < 1 clustered, R > 1 dispersed/
    regular. No edge correction (the classic estimator; documented).

    Scale path: per-point NN via the bounded 3x3 covering join at
    ``cell``, accepting a candidate only when its distance <= the
    current cell size (the covering-completeness criterion — a nearer
    point cannot hide outside the 3x3 block); unresolved points retry at
    doubled cell sizes (each round touches only the remainder), and any
    survivors after ``max_doublings`` finish against a broadcast of the
    (tiny) remainder over one full scan — exact at every step, never an
    n^2 self-join on the full set.

    Exactness: each NN distance is quantized to integer micrometres
    (round(d * 1e6) as int64) so the distributed sum is exact and
    order-independent; the mean and the final floats are one fixed
    expression, reproducible in SQL."""
    pts = points.select("pid", "x", "y").persist()
    n_total = pts.count()
    if n_total < 2:
        raise ValueError("clark_evans needs >= 2 points")
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFS9])
    resolved = None
    remain = pts
    c = float(cell)
    for _ in range(max_doublings):
        a = _covered(remain, c)
        probe = a.select(
            "pid", "x", "y", F.explode(offs).alias("o"),
            (F.col("cx") + F.col("o.dx")).alias("ncx"),
            (F.col("cy") + F.col("o.dy")).alias("ncy"),
        ).select("pid", "x", "y", "ncx", "ncy")
        b = _covered(pts, c, "b").select(
            "bpid", "bx", "by",
            F.col("cx").alias("ncx"), F.col("cy").alias("ncy"))
        d2 = ((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
              + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")))
        best = (probe.join(b, ["ncx", "ncy"])
                .where(F.col("pid") != F.col("bpid"))
                .groupBy("pid").agg(F.min(d2).alias("d2")))
        ok = best.where(F.sqrt("d2") <= F.lit(c)).persist()
        resolved = ok if resolved is None else resolved.unionByName(ok)
        remain = remain.join(ok.select("pid"), "pid", "left_anti").persist()
        if remain.isEmpty():
            break
        c *= 2.0
    else:
        # tiny remainder x one full scan, exact (broadcast the remainder)
        rem = remain.select(
            F.col("pid").alias("rpid"), F.col("x").alias("rx"),
            F.col("y").alias("ry"))
        d2 = ((F.col("rx") - F.col("x")) * (F.col("rx") - F.col("x"))
              + (F.col("ry") - F.col("y")) * (F.col("ry") - F.col("y")))
        tail = (pts.join(F.broadcast(rem), F.col("pid") != F.col("rpid"))
                .groupBy(F.col("rpid").alias("pid"))
                .agg(F.min(d2).alias("d2")))
        resolved = resolved.unionByName(tail)
    nn_q = F.round(F.sqrt("d2") * 1e6, 0).cast("long")
    agg = resolved.agg(F.count(F.lit(1)).alias("n"),
                       F.sum(nn_q).alias("sum_q"))
    pts.unpersist()
    obs = F.col("sum_q") / F.col("n") / 1e6
    exp = 0.5 * F.sqrt(F.lit(area) / F.col("n"))
    se = 0.26136 / F.sqrt(F.col("n") * F.col("n") / F.lit(area))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(obs, 9).alias("mean_nn"),
        F.round(exp, 9).alias("expected_nn"),
        F.round(obs / exp, 9).alias("r_index"),
        F.round((obs - exp) / se, 9).alias("z"),
    )


def two_step_fca(supply: DataFrame, demand: DataFrame, radius: float,
                 cell: float | None = None,
                 scale: int = 10**9) -> DataFrame:
    """Two-step floating catchment area accessibility (Luo & Wang,
    Env. & Planning B 2003 — the health-care/service accessibility
    standard). Step 1: each supply site j gets the ratio
    R_j = S_j / sum of demand within ``radius``; step 2: each demand
    point i gets A_i = sum of R_j over supplies within ``radius``.

    ``supply``: (pid, x, y, s); ``demand``: (pid, x, y, d) — s/d
    integer-valued weights. Exactness: each R_j is ONE float division of
    exact int64 sums, quantized half-up to integer ``1/scale`` units
    (floor(R*scale + 0.5) — explicit, engine-independent), so the step-2
    sum is an exact int64 and the result is order- and partition-
    independent. Binary catchment (no distance decay; the classic
    formulation — E2SFCA weights would slot into the same joins).

    Scale shape: both steps are the bounded 3x3 covering join at
    ``cell`` (default = radius; must be >= radius for completeness —
    the ripley_k/s2_ring_pairs argument) plus map-side-combinable
    groupBys on point keys; never an all-pairs join. Returns
    (pid, access_units, access) per demand point — demand points with
    no supply in range get 0."""
    c = float(cell if cell is not None else radius)
    if c < radius:
        raise ValueError(f"cell {c} must be >= radius {radius}")
    r2 = float(radius) * float(radius)
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFS9])
    sup = _covered(supply.select("pid", "x", "y", "s"), c)
    sup = supply.select(F.col("pid").alias("spid"), "s").join(
        sup, F.col("spid") == F.col("pid")).select(
        "spid", "s", "x", "y", "cx", "cy")
    dem = _covered(demand.select("pid", "x", "y", "d"), c, "b")
    dem = demand.select(F.col("pid").alias("dpid"), "d").join(
        dem, F.col("dpid") == F.col("bpid")).select(
        "dpid", "d", "bx", "by", "cx", "cy")
    probe = sup.select(
        "spid", "s", "x", "y", F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    ).select("spid", "s", "x", "y", "ncx", "ncy")
    dem_k = dem.select("dpid", "d", "bx", "by",
                       F.col("cx").alias("ncx"), F.col("cy").alias("ncy"))
    d2 = ((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
          + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")))
    pairs = (probe.join(dem_k, ["ncx", "ncy"])
             .where(d2 <= F.lit(r2))
             .select("spid", "s", "dpid", "d").persist())
    ratio = (pairs.groupBy("spid").agg(
        F.min("s").alias("s"), F.sum("d").alias("dem_sum"))
        .select("spid", F.floor(
            F.col("s") / F.col("dem_sum") * F.lit(float(scale)) + 0.5)
            .cast("long").alias("r_units")))
    access = (pairs.select("spid", "dpid").join(ratio, "spid")
              .groupBy("dpid").agg(F.sum("r_units").alias("access_units")))
    out = (demand.select(F.col("pid").alias("dpid"))
           .join(access, "dpid", "left")
           .select(F.col("dpid").alias("pid"),
                   F.coalesce("access_units", F.lit(0)).cast("long")
                   .alias("access_units")))
    pairs.unpersist()
    return out.select(
        "pid", "access_units",
        F.round(F.col("access_units") / scale, 9).alias("access"))


def colocation_quotient(points: DataFrame, cell: float,
                        max_doublings: int = 8) -> DataFrame:
    """Colocation quotient (Leslie & Kronenfeld, Geographical Analysis
    2011): for each ordered category pair (a, b),
    CLQ_a->b = (C_a->b / N_a) / (N_b' / (N - 1)), where C_a->b counts
    a-points whose nearest neighbour (among ALL other points) has
    category b, and N_b' = N_b minus 1 when a = b (a point cannot be
    its own neighbour). CLQ > 1: b clusters around a more than chance.

    ``points``: (pid, x, y, cat). NN resolution is the exact escalating
    covering join of :func:`clark_evans` (accept only when the block
    minimum distance <= current cell; doubling rounds touch only the
    unresolved remainder; broadcast tail for stragglers). Ties break
    deterministically on (d2, neighbour pid) — d2 comparisons are exact
    IEEE doubles, so the chosen neighbour is engine-independent. All
    counts are exact int64; the final CLQ is one float expression.

    Returns (cat_a, cat_b, c_ab, n_a, n_b, clq) for observed pairs."""
    pts = points.select("pid", "x", "y", "cat").persist()
    n_total = pts.count()
    if n_total < 2:
        raise ValueError("colocation_quotient needs >= 2 points")
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFS9])
    resolved = None
    remain = pts.select("pid", "x", "y")
    c = float(cell)
    for _ in range(max_doublings):
        a = _covered(remain, c)
        probe = a.select(
            "pid", "x", "y", F.explode(offs).alias("o"),
            (F.col("cx") + F.col("o.dx")).alias("ncx"),
            (F.col("cy") + F.col("o.dy")).alias("ncy"),
        ).select("pid", "x", "y", "ncx", "ncy")
        b = _covered(pts, c, "b").select(
            "bpid", "bx", "by",
            F.col("cx").alias("ncx"), F.col("cy").alias("ncy"))
        d2 = ((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
              + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")))
        best = (probe.join(b, ["ncx", "ncy"])
                .where(F.col("pid") != F.col("bpid"))
                .select("pid", F.col("bpid"), d2.alias("d2"))
                .groupBy("pid")
                .agg(F.min("d2").alias("d2"),
                     F.min_by("bpid", F.struct("d2", "bpid")).alias("nn")))
        ok = best.where(F.sqrt("d2") <= F.lit(c)).persist()
        resolved = ok if resolved is None else resolved.unionByName(ok)
        remain = remain.join(ok.select("pid"), "pid", "left_anti").persist()
        if remain.isEmpty():
            break
        c *= 2.0
    else:
        rem = remain.select(
            F.col("pid").alias("rpid"), F.col("x").alias("rx"),
            F.col("y").alias("ry"))
        d2 = ((F.col("rx") - F.col("x")) * (F.col("rx") - F.col("x"))
              + (F.col("ry") - F.col("y")) * (F.col("ry") - F.col("y")))
        tail = (pts.join(F.broadcast(rem), F.col("pid") != F.col("rpid"))
                .select(F.col("rpid"), F.col("pid").alias("bpid"),
                        d2.alias("d2"))
                .groupBy(F.col("rpid").alias("pid"))
                .agg(F.min("d2").alias("d2"),
                     F.min_by("bpid", F.struct("d2", "bpid")).alias("nn")))
        resolved = resolved.unionByName(tail)
    cats = pts.groupBy("cat").agg(F.count(F.lit(1)).alias("n"))
    nn_cat = (resolved.select("pid", "nn")
              .join(pts.select(F.col("pid").alias("p2"),
                               F.col("cat").alias("cat_a")),
                    F.col("pid") == F.col("p2"))
              .join(pts.select(F.col("pid").alias("p3"),
                               F.col("cat").alias("cat_b")),
                    F.col("nn") == F.col("p3")))
    pair = nn_cat.groupBy("cat_a", "cat_b").agg(
        F.count(F.lit(1)).alias("c_ab"))
    out = (pair
           .join(cats.select(F.col("cat").alias("cat_a"),
                             F.col("n").alias("n_a")), "cat_a")
           .join(cats.select(F.col("cat").alias("cat_b"),
                             F.col("n").alias("n_b")), "cat_b"))
    nb_eff = F.when(F.col("cat_a") == F.col("cat_b"),
                    F.col("n_b") - 1).otherwise(F.col("n_b"))
    clq = (F.col("c_ab") / F.col("n_a")) / (nb_eff / F.lit(n_total - 1.0))
    pts.unpersist()
    return out.select("cat_a", "cat_b", "c_ab", "n_a", "n_b",
                      F.round(clq, 9).alias("clq"))


def knox_test(points: DataFrame, ds: float, dt_s: float,
              cell: float | None = None) -> DataFrame:
    """Knox space-time interaction test (Knox, Applied Statistics 1964
    — the classic epidemiology cluster detector, e.g. disease outbreaks
    or burst news coverage): X = number of unordered point pairs that
    are close in BOTH space (d <= ds) and time (|Δt| <= dt_s seconds);
    under no interaction E[X] = S * T / P with S/T the space-only/
    time-only close pair counts and P = n(n-1)/2, and the usual Poisson
    approximation gives z = (X - E) / sqrt(E).

    ``points``: (pid, x, y, ts). All pair counts are exact int64:
    space candidates come from the bounded 3x3 covering join at
    ``cell`` (default ds; must be >= ds — the ripley_k completeness
    argument), time candidates from the SAME covering pattern in 1-D
    (floor(t/dt) buckets, adjacent-bucket join), and time differences
    are exact microsecond integers. The ordered-pair counts are halved
    exactly (each unordered pair is seen twice). One float row out."""
    c = float(cell if cell is not None else ds)
    if c < ds:
        raise ValueError(f"cell {c} must be >= ds {ds}")
    dt_us = int(round(float(dt_s) * 1e6))
    pts = points.select(
        "pid", "x", "y",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t")).persist()
    n = pts.count()
    if n < 2:
        raise ValueError("knox_test needs >= 2 points")
    # space-close ordered pairs via the 3x3 covering join
    a = _covered(pts, c)
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFS9])
    probe = a.select(
        "pid", "x", "y", F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    ).join(pts.select(F.col("pid").alias("pid2"), F.col("t").alias("t1")),
           F.col("pid") == F.col("pid2")) \
     .select("pid", "x", "y", "t1", "ncx", "ncy")
    b = _covered(pts, c, "b").join(
        pts.select(F.col("pid").alias("pid3"), F.col("t").alias("t2")),
        F.col("bpid") == F.col("pid3")).select(
        "bpid", "bx", "by", "t2",
        F.col("cx").alias("ncx"), F.col("cy").alias("ncy"))
    d2 = ((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
          + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")))
    sp = (probe.join(b, ["ncx", "ncy"])
          .where((F.col("pid") != F.col("bpid")) & (d2 <= ds * ds))
          .agg(F.count(F.lit(1)).alias("s2"),
               F.sum(((F.abs(F.col("t1") - F.col("t2")) <= dt_us)
                      ).cast("long")).alias("x2")).first())
    space_pairs, st_pairs = sp["s2"] // 2, int(sp["x2"] or 0) // 2
    # time-close ordered pairs via 1-D bucket covering (3 buckets)
    tb = pts.select("pid", "t",
                    F.floor(F.col("t") / F.lit(dt_us)).alias("tb"))
    toffs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    tp = tb.select("pid", "t", F.explode(toffs).alias("o"),
                   (F.col("tb") + F.col("o")).alias("ntb")) \
        .select("pid", "t", "ntb")
    t2 = tb.select(F.col("pid").alias("qid"), F.col("t").alias("t2"),
                   F.col("tb").alias("ntb"))
    tm = (tp.join(t2, "ntb")
          .where((F.col("pid") != F.col("qid"))
                 & (F.abs(F.col("t") - F.col("t2")) <= dt_us))
          .agg(F.count(F.lit(1)).alias("c")).first())
    time_pairs = int(tm["c"] or 0) // 2
    pts.unpersist()
    total = n * (n - 1) // 2
    spark = points.sparkSession
    out = spark.createDataFrame(
        [(n, space_pairs, time_pairs, st_pairs, total)],
        "n long, space_pairs long, time_pairs long, st_pairs long, "
        "total_pairs long")
    exp = (F.col("space_pairs") * F.col("time_pairs")
           / F.col("total_pairs"))
    return out.select(
        "n", "space_pairs", "time_pairs", "st_pairs",
        F.round(exp, 9).alias("expected"),
        F.round((F.col("st_pairs") - exp) / F.sqrt(exp), 9).alias("z"))


def mann_kendall(cells: DataFrame, z_crit: float = 1.959964) -> DataFrame:
    """Per-cell Mann-Kendall trend test over time-binned counts — the
    "emerging hotspot" statistic (Mann 1945; Kendall 1975; the
    space-time companion of :func:`getis_gi_star`: Gi* answers "is this
    cell hot NOW", MK answers "is it HEATING UP").

    ``cells``: one row per (gx, gy, tbin, x) — the cell lattice crossed
    with time bins, x the integer count in that bin (pre-aggregated, so
    |input| = |occupied cells| * T << corpus size). Missing bins are
    simply absent (MK is rank-based and needs no imputation; n is the
    per-cell bin count).

    Per cell: S = sum over bin pairs i<j of sign(x_j - x_i); the
    tie-corrected normal variance Var = (n(n-1)(2n+5) -
    sum_t t(t-1)(2t+5)) / 18 over tie groups t; the continuity-corrected
    z = (S -+ 1)/sqrt(Var); and the trend label at ``z_crit``
    (two-sided 5% by default). S, n, and the tie sums are exact int64
    aggregates — one bounded self-join on the cell key (T(T-1)/2 pairs
    per cell, T a small constant) plus two combinable groupBys — so the
    only float arithmetic is the final z expression, which a SQL oracle
    reproduces bit-for-bit.

    Returns (gx, gy, n_bins, s, z, trend) with z rounded to 8 dp and
    trend in {'increasing', 'decreasing', 'no_trend'}.
    """
    a = cells.select("gx", "gy", F.col("tbin").alias("ti"),
                     F.col("x").alias("xi"))
    b = cells.select("gx", "gy", F.col("tbin").alias("tj"),
                     F.col("x").alias("xj"))
    s = (
        a.join(b, ["gx", "gy"])
        .where(F.col("ti") < F.col("tj"))
        .groupBy("gx", "gy")
        .agg(F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long"))
             .alias("s"))
    )
    n = cells.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("n_bins"))
    t = F.col("t")
    ties = (
        cells.groupBy("gx", "gy", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("gx", "gy")
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).alias("tt"))
    )
    nn = F.col("n_bins")
    var = (nn * (nn - 1) * (2 * nn + 5) - F.col("tt")) / F.lit(18.0)
    # the divisor is substituted, not just CASE-guarded: ANSI mode may
    # evaluate the hoisted division on rows where var == 0 (all tied)
    rt = F.sqrt(F.when(var > 0, var).otherwise(F.lit(1.0)))
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / rt)
        .when(F.col("s") < 0, (F.col("s") + 1) / rt)
        .otherwise(F.lit(0.0))
    )
    z = F.when(var > 0, z).otherwise(F.lit(0.0))
    trend = (
        F.when(z > z_crit, F.lit("increasing"))
        .when(z < -z_crit, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
    )
    return (
        n.join(s, ["gx", "gy"], "left")
        .join(ties, ["gx", "gy"], "left")
        .select(
            "gx", "gy", "n_bins",
            F.coalesce(F.col("s"), F.lit(0)).alias("s"),
            F.round(z, 8).alias("z"),
            trend.alias("trend"),
        )
    )


def getis_per_bin(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Space-time Gi*: :func:`getis_gi_star` computed independently per
    time bin. ``cells``: (gx, gy, tbin, x) — occupied cells per bin.
    Returns (gx, gy, tbin, z) with z rounded to 10 dp (the rounding is
    part of the contract: downstream trend tests compare these values,
    and a consistently-rounded input keeps the composition
    engine-reproducible at the bit level).

    Same scale shape as the per-slice statistic — the 8-offset explode
    and the neighbor equi-join just carry tbin in the key, and the
    global moments become one combinable groupBy(tbin).
    """
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _offsets(queen)
        ]
    )
    probe = (
        cells.select("gx", "gy", "tbin", F.explode(offs).alias("o"))
        .select(
            "gx", "gy", "tbin",
            (F.col("gx") + F.col("o.dx")).alias("ngx"),
            (F.col("gy") + F.col("o.dy")).alias("ngy"),
        )
    )
    nbr = cells.select(
        F.col("gx").alias("ngx"), F.col("gy").alias("ngy"),
        F.col("tbin").alias("tbin"), F.col("x").alias("xj"))
    pairs = probe.join(nbr, ["ngx", "ngy", "tbin"])
    agg = pairs.groupBy("gx", "gy", "tbin").agg(
        F.sum("xj").alias("nsum"), F.count(F.lit(1)).alias("deg"))
    g = cells.groupBy("tbin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    per = (
        cells.join(agg, ["gx", "gy", "tbin"], "left")
        .select(
            "gx", "gy", "tbin", "x",
            (F.coalesce(F.col("deg"), F.lit(0)) + F.lit(1)).alias("w_i"),
            (F.coalesce(F.col("nsum"), F.lit(0)) + F.col("x"))
            .alias("nbr_sum"),
        )
        .join(F.broadcast(g), "tbin")
    )
    m = F.col("sx") / F.col("n")
    s = F.sqrt(F.col("sxx") / F.col("n") - m * m)
    # Two degenerate cases get z = 0 by definition: a zero-variance bin
    # (every occupied cell equal), and a cell whose star neighborhood
    # covers the WHOLE bin (w_i == n, e.g. tiny lattices — numerator and
    # variance both vanish). Divisors are substituted, not just CASE-
    # guarded: ANSI mode may still evaluate the hoisted division.
    wterm = F.col("n") * F.col("w_i") - F.col("w_i") * F.col("w_i")
    ok = (s > 0) & (wterm > 0)
    s_safe = F.when(ok, s).otherwise(F.lit(1.0))
    w_safe = F.when(ok, wterm.cast("double")).otherwise(F.lit(1.0))
    gi = (F.col("nbr_sum") - m * F.col("w_i")) / (
        s_safe * F.sqrt(w_safe / (F.col("n") - 1.0)))
    gi = F.when(ok, gi).otherwise(F.lit(0.0))
    return per.select("gx", "gy", "tbin", F.round(gi, 10).alias("z"))


def emerging_hotspots(cells: DataFrame, z_hot: float = 1.645,
                      z_trend: float = 1.959964,
                      persist_frac: float = 0.9,
                      queen: bool = True) -> DataFrame:
    """Emerging-hotspot classification — the space-time composition of
    Gi* per bin (:func:`getis_per_bin`) and the Mann-Kendall trend over
    each cell's z series (:func:`mann_kendall`), a deliberately
    SIMPLIFIED 7-category variant of the ESRI Space Time Pattern Mining
    taxonomy (the full product has 17; the rules here are documented
    and mirrored verbatim by the oracle):

    - ``new``          hot in the latest global bin, for the first time
    - ``intensifying`` hot in >= ``persist_frac`` of its bins, MK z
                       significantly increasing
    - ``diminishing``  same coverage, MK z significantly decreasing
    - ``persistent``   same coverage, no significant trend
    - ``sporadic``     hot in the latest bin plus some history below
                       the persistence bar
    - ``historic``     hot in the past, cold in the latest bin
    - ``none``         never hot

    Returns (gx, gy, n_bins, n_hot, mk_z, category). All counts are
    exact int64; the only floats are the per-bin z (rounded 10 dp
    upstream) and the MK z over that rounded series.
    """
    # checkpoint once: z feeds three consumers (last-bin scalar, the
    # hot/persist aggregation, and the MK pair self-join) — without it
    # the whole per-bin Gi* pipeline would re-execute per branch
    z = getis_per_bin(cells, queen=queen).localCheckpoint()
    last_bin = z.agg(F.max("tbin")).first()[0]
    hot = (F.col("z") > F.lit(float(z_hot))).cast("int")
    per = z.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(hot).alias("n_hot"),
        F.max(F.when(F.col("tbin") == last_bin, hot).otherwise(F.lit(0)))
        .alias("hot_last"),
    )
    mk = mann_kendall(
        z.select("gx", "gy", "tbin", F.col("z").alias("x")),
        z_crit=z_trend,
    ).select("gx", "gy", F.col("z").alias("mk_z"),
             F.col("trend").alias("mk_trend"))
    j = per.join(mk, ["gx", "gy"])
    persist = F.col("n_hot") >= F.lit(float(persist_frac)) * F.col("n_bins")
    cat = (
        F.when((F.col("hot_last") == 1) & (F.col("n_hot") == 1),
               F.lit("new"))
        .when(persist & (F.col("mk_trend") == "increasing"),
              F.lit("intensifying"))
        .when(persist & (F.col("mk_trend") == "decreasing"),
              F.lit("diminishing"))
        .when(persist, F.lit("persistent"))
        .when(F.col("hot_last") == 1, F.lit("sporadic"))
        .when(F.col("n_hot") > 0, F.lit("historic"))
        .otherwise(F.lit("none"))
    )
    return j.select("gx", "gy", "n_bins",
                    F.col("n_hot").cast("long").alias("n_hot"),
                    "mk_z", cat.alias("category"))


def gearys_c(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Global Geary's C (Geary 1954) with the normality z-score — the
    local-difference complement to Moran's I (sensitive to local rather
    than global departures).

    One-row result: (n_cells, s0, geary_c, z_norm). E[C] = 1; C < 1 is
    positive spatial autocorrelation.

    Same exact-int64 decomposition as :func:`morans_i`: the numerator
    sum_w (xi-xj)^2 is an integer pair aggregate (sdd), the denominator
    variance comes from (n, sx, sxx), and the normality variance
    (Cliff & Ord 1981) uses S1 = 2*s0, S2 = 4*sum(deg^2):
      Var(C) = ((2*S1 + S2)*(n-1) - 4*s0^2) / (2*(n+1)*s0^2).
    """
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    pairs = neighbor_pairs(cells, queen)
    p = pairs.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum((F.col("xi") - F.col("xj")) * (F.col("xi") - F.col("xj")))
        .alias("sdd"),
    )
    deg = (
        pairs.groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.sum(F.col("deg") * F.col("deg")).alias("sdeg2"))
    )
    j = g.crossJoin(p).crossJoin(deg)
    m = F.col("sx") / F.col("n")
    den = F.col("sxx") - F.col("n") * m * m  # sum (xi-m)^2
    c = (F.col("n") - 1.0) * F.col("sdd") / (2.0 * F.col("s0") * den)
    s1 = 2.0 * F.col("s0")
    s2 = 4.0 * F.col("sdeg2")
    var = (
        ((2.0 * s1 + s2) * (F.col("n") - 1.0)
         - 4.0 * F.col("s0") * F.col("s0"))
        / (2.0 * (F.col("n") + 1.0) * F.col("s0") * F.col("s0"))
    )
    return j.select(
        F.col("n").alias("n_cells"),
        F.col("s0"),
        F.round(c, 10).alias("geary_c"),
        F.round((c - 1.0) / F.sqrt(var), 8).alias("z_norm"),
    )


def local_moran(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Local Moran's I (LISA; Anselin 1995) per occupied cell, with the
    randomization moments and the HH/LL/HL/LH cluster quadrant.

    Per cell: (gx, gy, x, deg, ii, e_ii, z, quad) where
      Ii   = (xi - m)/m2 * sum_j wij (xj - m)      (m2 = sum(xk-m)^2 / n)
      E[Ii]  = -deg_i / (n - 1)
      Var[Ii] = deg_i*(n - b2)/(n-1)
                + (deg_i^2 - deg_i)*(2*b2 - n)/((n-1)*(n-2))
                - deg_i^2/(n-1)^2                   (b2 = n*m4/m2s^2 kurtosis,
                                                     m4/m2s raw int sums)
      quad = HH/LL/LH/HL by sign of (xi - m) and the neighbor lag mean.
    Cells with no occupied neighbor emit NULL z (their Ii is 0 with no
    moment) — the standard PySAL "island" convention.

    Exactness: nsum/deg are int64 join-aggregates; m, m2, b2 come from the
    global int64 (n, sx, sxx, sx3, sx4); one final float expression per
    row, so results are partition-invariant and a SQL oracle spelling the
    identical arithmetic is bit-exact.
    """
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("sx3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias("sx4"),
    )
    nbr = neighbor_pairs(cells, queen).groupBy("gx", "gy").agg(
        F.sum("xj").alias("nsum"), F.count(F.lit(1)).alias("deg")
    )
    per = cells.join(nbr, ["gx", "gy"], "left").select(
        "gx", "gy", "x",
        F.coalesce(F.col("nsum"), F.lit(0)).alias("nsum"),
        F.coalesce(F.col("deg"), F.lit(0)).alias("deg"),
    )
    j = per.crossJoin(F.broadcast(g))
    n = F.col("n")
    m = F.col("sx") / n
    # central moment sums from raw power sums (exact-integer inputs)
    m2s = F.col("sxx") - n * m * m
    m4s = (F.col("sx4") - 4.0 * m * F.col("sx3")
           + 6.0 * m * m * F.col("sxx") - 3.0 * n * m * m * m * m)
    m2 = m2s / n
    b2 = (m4s / n) / (m2 * m2)
    lag = F.col("nsum") - F.col("deg") * m  # sum_j wij (xj - m)
    ii = (F.col("x") - m) / m2 * lag
    e_ii = -F.col("deg") / (n - 1.0)
    var = (
        F.col("deg") * (n - b2) / (n - 1.0)
        + (F.col("deg") * F.col("deg") - F.col("deg"))
        * (2.0 * b2 - n) / ((n - 1.0) * (n - 2.0))
        - (F.col("deg") * F.col("deg")) / ((n - 1.0) * (n - 1.0))
    )
    z = F.when(F.col("deg") > 0, (ii - e_ii) / F.sqrt(var))
    quad = F.when(F.col("deg") == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.when(F.col("x") * n >= F.col("sx"), F.lit("H")).otherwise(F.lit("L")),
            F.when(lag >= 0, F.lit("H")).otherwise(F.lit("L")),
        )
    )
    return j.select(
        "gx", "gy", "x", "deg",
        F.round(ii, 10).alias("ii"),
        F.round(e_ii, 10).alias("e_ii"),
        F.round(z, 8).alias("z"),
        quad.alias("quad"),
    )


def local_geary(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Local Geary's c (Anselin, Geographical Analysis 2019 — the LISA
    family member :func:`local_moran` misses: Moran detects value
    CO-VARIATION, local Geary detects value SIMILARITY, catching
    negative-spatial-autocorrelation pockets Moran's cross-product
    blurs): c_i = sum_j w_ij (z_i - z_j)^2 with z = (x - m)/sqrt(m2),
    i.e. (deg*(xi-m)^2 - 2(xi-m)*lag + nd2) / m2 from the exact int64
    neighbor aggregates (nsum, nsum2, deg) and global (n, sx, sxx).
    Under total randomization E[(z_i - z_j)^2] = 2n/(n-1) for i != j,
    so E[c_i] = deg * 2n/(n-1); ``cluster`` = 'similar' when
    c_i < E[c_i] (neighbors alike), 'dissimilar' otherwise, NULL for
    islands (deg = 0 — the PySAL convention). Full inference is
    conditional-permutation-based (documented out of scope); the
    statistic and moments here are one float expression per row over
    exact integer sums — oracle-identical."""
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    nbr = neighbor_pairs(cells, queen).groupBy("gx", "gy").agg(
        F.sum("xj").alias("nsum"),
        F.sum(F.col("xj") * F.col("xj")).alias("nsum2"),
        F.count(F.lit(1)).alias("deg"))
    per = cells.join(nbr, ["gx", "gy"], "left").select(
        "gx", "gy", "x",
        F.coalesce("nsum", F.lit(0)).alias("nsum"),
        F.coalesce("nsum2", F.lit(0)).alias("nsum2"),
        F.coalesce("deg", F.lit(0)).alias("deg"))
    j = per.crossJoin(F.broadcast(g))
    n = F.col("n")
    m = F.col("sx") / n
    m2 = (F.col("sxx") - n * m * m) / n
    dx = F.col("x") - m
    lag = F.col("nsum") - F.col("deg") * m
    nd2 = (F.col("nsum2") - 2.0 * m * F.col("nsum")
           + F.col("deg") * m * m)
    ci = (F.col("deg") * dx * dx - 2.0 * dx * lag + nd2) / m2
    e_ci = F.col("deg") * 2.0 * n / (n - 1.0)
    cluster = F.when(F.col("deg") == 0, F.lit(None).cast("string")) \
        .when(ci < e_ci, F.lit("similar")).otherwise(F.lit("dissimilar"))
    return j.select(
        "gx", "gy", "x", "deg",
        F.round(ci, 8).alias("ci"),
        F.round(e_ci, 8).alias("e_ci"),
        cluster.alias("cluster"))


def join_counts(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Join-count statistics for a BINARY cell variable (Cliff & Ord 1981
    ch. 1; the classic black/white map test). ``cells``: (gx, gy, x) with
    x in {0, 1}.

    One row: (n_cells, n_black, jj_bb, jj_bw, jj_ww, e_bb, z_bb) over
    UNORDERED neighbor joins. z_bb is the free-sampling (binomial) z for
    the BB count with p = n_black/n:
      E[BB] = J*p^2,  Var[BB] = J*p^2 + 2*K*p^3 - (J + 2*K)*p^4
    where J = total joins = s0/2 and K = sum_i C(deg_i, 2) counts paths of
    length 2. All counts are exact int64 aggregates.
    """
    pairs = neighbor_pairs(cells, queen)
    p = pairs.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.col("xi") * F.col("xj")).alias("bb2"),
        F.sum((1 - F.col("xi")) * (1 - F.col("xj"))).alias("ww2"),
        F.sum(
            F.col("xi") * (1 - F.col("xj")) + (1 - F.col("xi")) * F.col("xj")
        ).alias("bw2"),
    )
    deg = (
        pairs.groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1)).alias("k2"))
    )
    g = cells.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("nb"))
    j = g.crossJoin(p).crossJoin(deg)
    jn = F.col("s0") / 2.0
    k = F.col("k2") / 2.0
    pr = F.col("nb") / F.col("n")
    e_bb = jn * pr * pr
    # Var[BB] = J p^2 + 2K p^3 - (J + 2K) p^4  (iid Bernoulli(p) derivation:
    # J same-join pairs at p^2, 2K one-shared-vertex pairs at p^3, the
    # disjoint rest at p^4, minus E[BB]^2)
    var = (jn * pr * pr + 2.0 * k * pr * pr * pr
           - (jn + 2.0 * k) * pr * pr * pr * pr)
    return j.select(
        F.col("n").alias("n_cells"),
        F.col("nb").alias("n_black"),
        (F.col("bb2") / 2).cast("long").alias("jj_bb"),
        (F.col("bw2") / 2).cast("long").alias("jj_bw"),
        (F.col("ww2") / 2).cast("long").alias("jj_ww"),
        F.round(e_bb, 10).alias("e_bb"),
        F.round((F.col("bb2") / 2.0 - e_bb) / F.sqrt(var), 8).alias("z_bb"),
    )


def centrography(pts: DataFrame, by: str = "g") -> DataFrame:
    """Centrography per group (the ESRI "measuring geographic
    distributions" toolbox: Mean Center, Standard Distance, Directional
    Distribution / standard deviational ellipse; Lefever 1926, Yuill 1971).

    ``pts``: (``by``, x long, y long) — integer lattice coordinates (e.g.
    the hundredth-degree keys), so every partial (n, sx, sy, sxx, syy,
    sxy) is an exact int64 aggregate: one map-side-combinable groupBy,
    partition-invariant, oracle-reproducible. Bound: n * max(x)^2 per
    group must stay < 2^63 (7e9 rows per group at 36k keys — pre-shift or
    coarsen keys beyond that).

    Per group: (g, n, mean_x, mean_y, std_dist, sigma_x, sigma_y, theta)
    where theta = atan(t) is the ESRI directional-distribution rotation —
    radians CLOCKWISE FROM NORTH (for a cloud elongated along slope m the
    reported angle is pi/2 - atan(m)):
      t = (A + sqrt(A^2 + 4*Cxy^2)) / (2*Cxy),  A = Cxx - Cyy
    and the semi-axes use the algebraic rotation (cos,sin from t via
    1/sqrt(1+t^2) — no transcendentals in the axis lengths, so the only
    cross-engine trig is the reported theta itself):
      sigma_x = sqrt(2) * sqrt((c^2*Cxx - 2*c*s*Cxy + s^2*Cyy) / n)
      sigma_y = sqrt(2) * sqrt((s^2*Cxx + 2*c*s*Cxy + c^2*Cyy) / n).
    Cxy = 0 (axis-aligned spread) yields t = 0 -> theta 0; sigma_x is then
    the x-axis deviation (the larger axis may be sigma_y — callers wanting
    major-first can order by value).
    """
    agg = pts.groupBy(F.col(by).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    mx = F.col("sx") / n
    my = F.col("sy") / n
    cxx = F.col("sxx") - n * mx * mx
    cyy = F.col("syy") - n * my * my
    cxy = F.col("sxy") - n * mx * my
    a = cxx - cyy
    t = F.when(cxy != 0.0,
               (a + F.sqrt(a * a + 4.0 * cxy * cxy)) / (2.0 * cxy)) \
         .otherwise(F.lit(0.0))
    h = F.sqrt(1.0 + t * t)
    c, s = 1.0 / h, t / h
    sig_x = F.sqrt(F.lit(2.0)) * F.sqrt(
        (c * c * cxx - 2.0 * c * s * cxy + s * s * cyy) / n)
    sig_y = F.sqrt(F.lit(2.0)) * F.sqrt(
        (s * s * cxx + 2.0 * c * s * cxy + c * c * cyy) / n)
    return agg.select(
        "g", "n",
        F.round(mx, 9).alias("mean_x"),
        F.round(my, 9).alias("mean_y"),
        F.round(F.sqrt((cxx + cyy) / n), 9).alias("std_dist"),
        F.round(sig_x, 9).alias("sigma_x"),
        F.round(sig_y, 9).alias("sigma_y"),
        F.round(F.atan(t), 9).alias("theta"),
    )


def empirical_variogram(
    pts: DataFrame,
    max_dist: float,
    n_bins: int = 10,
    cell: float | None = None,
    max_per_cell: int | None = None,
) -> DataFrame:
    """Empirical (Matheron) semivariogram over integer-coordinate points —
    the estimation half of the kriging workflow (operators/grid.py
    grid_kriging consumes the fitted model):
      gamma(bin) = sum (vi - vj)^2 / (2 * n_pairs)
    over unordered point pairs with separation h < ``max_dist``, binned by
    floor(h / (max_dist / n_bins)).

    ``pts``: (pid long, x long, y long, v long) — integer lattice coords
    and an integer variable, so pair d2 and (vi-vj)^2 are exact int64 and
    every aggregate is order-independent (bit-reproducible).

    Scale shape: NO cross join — points key to a square lattice cell of
    side ``cell`` (default ``max_dist``; must be >= ``max_dist`` for
    completeness), the probe side explodes to the 3x3 cell ring, one
    equi-join, pid_a < pid_b dedup. All JVM-side (zero Python). Dense
    cells are quadratic in their own population — the estimator's true
    cost; ``max_per_cell`` bounds it by keeping only the ``max_per_cell``
    lowest-pid points per cell (a deterministic systematic subsample, the
    standard practice for variogram estimation on large point sets).
    Callers needing an unbiased thinning should pre-sample upstream.

    Returns (bin, n_pairs, gamma, avg_d2) ordered by bin.
    """
    c = float(cell if cell is not None else max_dist)
    if c < max_dist:
        raise ValueError(f"cell ({c}) must be >= max_dist ({max_dist}) "
                         "or ring coverage is incomplete")
    cl = F.lit(c)
    base = pts.select(
        "pid", "x", "y", "v",
        F.floor(F.col("x") / cl).cast("long").alias("cx"),
        F.floor(F.col("y") / cl).cast("long").alias("cy"),
    )
    if max_per_cell is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("cx", "cy").orderBy("pid")
        base = (base.withColumn("_r", F.row_number().over(w))
                    .where(F.col("_r") <= max_per_cell).drop("_r"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probe = base.select(
        F.col("pid").alias("pid_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"), F.col("v").alias("va"),
        F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("jcx"),
        (F.col("cy") + F.col("o.dy")).alias("jcy"),
    ).drop("o")
    build = base.select(
        F.col("pid").alias("pid_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), F.col("v").alias("vb"),
        F.col("cx").alias("jcx"), F.col("cy").alias("jcy"),
    )
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    dd = (F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))
    bw = max_dist / n_bins
    pairs = (
        probe.join(build, ["jcx", "jcy"])
        .where(F.col("pid_a") < F.col("pid_b"))
        .select(d2.alias("d2"), dd.alias("dd"))
        .where(F.col("d2") < F.lit(max_dist * max_dist))
    )
    return (
        pairs.groupBy(F.floor(F.sqrt(F.col("d2")) / F.lit(bw))
                      .cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum("dd").alias("sdd"),
             F.sum("d2").alias("sd2"))
        .select("bin", "n_pairs",
                F.round(F.col("sdd") / (2.0 * F.col("n_pairs")), 9)
                 .alias("gamma"),
                F.round(F.col("sd2") / F.col("n_pairs"), 9).alias("avg_d2"))
        .orderBy("bin")
    )


def fit_variogram(
    vgm: DataFrame,
    candidates: list[float],
    max_dist: float,
    n_bins: int,
    model: str = "spherical",
) -> DataFrame:
    """Fit (nugget, psill, range) to an :func:`empirical_variogram` result
    by pair-count-weighted least squares (Cressie 1985 weighting, the
    gstat default shape): for each candidate range the model is LINEAR in
    (nugget, psill), so each fit is a closed-form 2x2 Cramer solve; the
    winning candidate minimizes the weighted SSE (ties -> smaller range).
    Output (one row): (vrange, nugget, psill, wss) — feed straight into
    operators/grid.grid_kriging.

    Input is inherently tiny (n_bins rows), so this is a driver-sized
    DataFrame computation; lag centers are h = (bin + 0.5) * max_dist /
    n_bins. Parameters are NOT sign-clamped — a negative fitted nugget
    flags a mis-specified model to the caller rather than being hidden.
    """
    if not candidates:
        raise ValueError("need at least one candidate range")
    if model != "spherical":
        raise ValueError("only the spherical model is implemented")
    spark = vgm.sparkSession
    cand = spark.createDataFrame([(float(a),) for a in candidates],
                                 "vrange double")
    bw = max_dist / n_bins
    h = (F.col("bin") + 0.5) * bw
    u = h / F.col("vrange")
    g = F.when(h >= F.col("vrange"), 1.0).otherwise(
        1.5 * u - 0.5 * u * u * u)
    j = vgm.crossJoin(F.broadcast(cand)).select(
        "vrange", F.col("n_pairs").cast("double").alias("w"),
        F.col("gamma").alias("y"), g.alias("g"))
    s = j.groupBy("vrange").agg(
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("g")).alias("swg"),
        F.sum(F.col("w") * F.col("g") * F.col("g")).alias("swgg"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("w") * F.col("g") * F.col("y")).alias("swgy"),
        F.sum(F.col("w") * F.col("y") * F.col("y")).alias("swyy"),
    )
    det = F.col("sw") * F.col("swgg") - F.col("swg") * F.col("swg")
    c0 = (F.col("swy") * F.col("swgg") - F.col("swg") * F.col("swgy")) / det
    c1 = (F.col("sw") * F.col("swgy") - F.col("swg") * F.col("swy")) / det
    wss = (F.col("swyy") - 2.0 * c0 * F.col("swy")
           - 2.0 * c1 * F.col("swgy") + c0 * c0 * F.col("sw")
           + 2.0 * c0 * c1 * F.col("swg") + c1 * c1 * F.col("swgg"))
    return (
        s.select("vrange", F.round(c0, 9).alias("nugget"),
                 F.round(c1, 9).alias("psill"),
                 F.round(wss, 6).alias("wss"))
        .orderBy("wss", "vrange").limit(1)
    )


def huff_model(
    demand: DataFrame,
    stores: DataFrame,
    beta: float = 2.0,
) -> DataFrame:
    """Huff gravity model (Huff 1964): probabilistic market capture of
    competing destinations over a demand surface.

    ``demand``: (cid long, x long, y long, pop long) — demand cells on an
    integer lattice. ``stores``: (fid long, x long, y long, attr double)
    — the small destination layer (broadcast). Capture probability of
    store j at cell i is attr_j * d_ij^-beta normalized over stores;
    beta=2 uses exact 1/d2 (no pow). A demand cell coincident with a
    store is captured fully by it (the d -> 0 limit; ties by fid order).

    Returns per store: (fid, share, n_primary) where share = sum_i pop_i
    * p_ij (expected captured demand) and n_primary counts cells where
    the store has the highest capture probability (ties -> lowest fid).

    Scale shape: broadcast the store dim, one narrow crossJoin over the
    AGGREGATED demand cells, a window for the per-cell normalizer, one
    groupBy(fid). No shuffle of the raw corpus — demand is already the
    cell rollup.
    """
    from pyspark.sql import Window

    if beta != 2.0:
        raise ValueError("only beta=2 (exact 1/d2 weights) is implemented")
    d = demand.select(F.col("cid"), F.col("x").alias("dx"),
                      F.col("y").alias("dy"), "pop")
    st = stores.select("fid", F.col("x").alias("sx"),
                       F.col("y").alias("sy"), "attr")
    d2 = ((F.col("dx") - F.col("sx")) * (F.col("dx") - F.col("sx"))
          + (F.col("dy") - F.col("sy")) * (F.col("dy") - F.col("sy")))
    j = d.crossJoin(F.broadcast(st)).select(
        "cid", "pop", "fid", d2.alias("d2"), "attr")
    wcell = Window.partitionBy("cid")
    # zero-distance capture: if any store sits ON the cell, it takes all
    hit = F.sum(F.when(F.col("d2") == 0, 1).otherwise(0)).over(wcell)
    w = F.when(F.col("d2") == 0, F.lit(None)).otherwise(
        F.col("attr") / F.col("d2"))
    j = j.select("cid", "pop", "fid", "d2", "attr",
                 w.alias("w"), hit.alias("hit"))
    den = F.sum("w").over(wcell)
    first0 = F.min(F.when(F.col("d2") == 0, F.col("fid"))).over(wcell)
    p = (F.when(F.col("hit") > 0,
                F.when(F.col("fid") == first0, 1.0).otherwise(0.0))
         .otherwise(F.col("w") / den))
    scored = j.select("cid", "pop", "fid", p.alias("p"))
    rk = Window.partitionBy("cid").orderBy(F.col("p").desc(), F.col("fid"))
    scored = scored.withColumn("rk", F.row_number().over(rk))
    return (
        scored.groupBy("fid").agg(
            F.round(F.sum(F.col("pop") * F.col("p")), 6).alias("share"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).alias("n_primary"),
        )
    )


def quadrat_test(
    pts: DataFrame,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    qx: int,
    qy: int,
) -> DataFrame:
    """Quadrat analysis / chi-square test of complete spatial randomness
    (Greig-Smith 1952; the classic CSR screen before Ripley's K).

    ``pts``: (x long, y long) on an integer lattice; the window
    [x0, x1) x [y0, y1) splits into ``qx`` x ``qy`` equal quadrats via
    integer arithmetic (no float-floor boundary risk). Points outside the
    window are ignored.

    One row: (n_points, n_quadrats, vmr, chi2, z) where vmr is the
    variance-mean ratio (1 under CSR, > 1 clustered, < 1 dispersed),
    chi2 = (Q * sum(n^2) / N) - N with df = Q-1, and z is the
    Wilson-Hilferty-style normal approximation sqrt(2*chi2) -
    sqrt(2*df - 1). All partials exact int64 (empty quadrats enter via
    the closed form, not by materializing them).
    """
    x0, x1 = x_range
    y0, y1 = y_range
    if (x1 - x0) % qx or (y1 - y0) % qy:
        raise ValueError("window must split evenly into quadrats")
    wx = (x1 - x0) // qx
    wy = (y1 - y0) // qy
    inside = ((F.col("x") >= x0) & (F.col("x") < x1)
              & (F.col("y") >= y0) & (F.col("y") < y1))
    q = pts.where(inside).select(
        (((F.col("x") - x0) - (F.col("x") - x0) % wx) / wx)
        .cast("long").alias("qcx"),
        (((F.col("y") - y0) - (F.col("y") - y0) % wy) / wy)
        .cast("long").alias("qcy"),
    )
    counts = q.groupBy("qcx", "qcy").agg(F.count(F.lit(1)).alias("n"))
    g = counts.agg(F.sum("n").alias("ntot"),
                   F.sum(F.col("n") * F.col("n")).alias("sn2"))
    qn = qx * qy
    n = F.col("ntot")
    chi2 = qn * F.col("sn2") / n - n
    df = float(qn - 1)
    # VMR over ALL Q quadrats (empty ones contribute 0 to both sums)
    mean = n / qn
    var = (F.col("sn2") - n * mean) / qn
    return g.select(
        F.col("ntot").alias("n_points"),
        F.lit(qn).cast("long").alias("n_quadrats"),
        F.round(var / mean, 9).alias("vmr"),
        F.round(chi2, 9).alias("chi2"),
        F.round(F.sqrt(2.0 * chi2) - math.sqrt(2.0 * df - 1.0), 8)
         .alias("z"),
    )


def morans_by_distance(
    pts: DataFrame,
    max_dist: float,
    n_bins: int = 6,
    cell: float | None = None,
) -> DataFrame:
    """Incremental spatial autocorrelation (the ESRI tool of that name;
    Moran's I per distance band): global Moran's I computed over binary
    band-distance weights for each lag bin — the peak z picks the
    analysis scale for hotspot work (the reason this pairs with
    :func:`getis_gi_star`).

    ``pts``: (pid long, x long, y long, v long) integer lattice points,
    same contract (and the same 3x3 cell-ring covering join — no cross
    join, complete for ``cell >= max_dist``) as
    :func:`empirical_variogram`. Per band the Moran partials are the
    DIRECTED pair sums (2x the unordered join output) and the normality
    moments need sum(deg^2), one extra keys-only groupBy. Everything up
    to the final float expression is exact int64, so the result is
    bit-reproducible.

    Returns (bin, s0, moran_i, e_i, z_norm) ordered by bin; bands with
    fewer than 2 directed pairs are dropped (degenerate variance).
    """
    c = float(cell if cell is not None else max_dist)
    if c < max_dist:
        raise ValueError(f"cell ({c}) must be >= max_dist ({max_dist}) "
                         "or ring coverage is incomplete")
    cl = F.lit(c)
    base = pts.select(
        "pid", "x", "y", "v",
        F.floor(F.col("x") / cl).cast("long").alias("cx"),
        F.floor(F.col("y") / cl).cast("long").alias("cy"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probe = base.select(
        F.col("pid").alias("pid_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"), F.col("v").alias("va"),
        F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("jcx"),
        (F.col("cy") + F.col("o.dy")).alias("jcy"),
    ).drop("o")
    build = base.select(
        F.col("pid").alias("pid_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), F.col("v").alias("vb"),
        F.col("cx").alias("jcx"), F.col("cy").alias("jcy"),
    )
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    bw = max_dist / n_bins
    # DIRECTED pairs (a != b): each unordered pair appears twice, which
    # is exactly the s0 / spp / sxy convention of morans_i
    pairs = (
        probe.join(build, ["jcx", "jcy"])
        .where(F.col("pid_a") != F.col("pid_b"))
        .select("pid_a", "va", "vb", d2.alias("d2"))
        .where(F.col("d2") < F.lit(max_dist * max_dist))
        .select(F.floor(F.sqrt(F.col("d2")) / F.lit(bw)).cast("long")
                 .alias("bin"),
                "pid_a", "va", "vb")
    )
    p = pairs.groupBy("bin").agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.col("va") * F.col("vb")).alias("spp"),
        F.sum(F.col("va") + F.col("vb")).alias("sxy"),
    )
    deg = (
        pairs.groupBy("bin", "pid_a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("bin")
        .agg(F.sum(F.col("deg") * F.col("deg")).alias("sdeg2"))
    )
    g = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
    )
    j = p.join(deg, "bin").crossJoin(F.broadcast(g)) \
         .where(F.col("s0") >= 2)
    m = F.col("sx") / F.col("n")
    num = F.col("spp") - m * F.col("sxy") + m * m * F.col("s0")
    den = F.col("sxx") - F.col("n") * m * m
    i = (F.col("n") / F.col("s0")) * num / den
    e_i = F.lit(-1.0) / (F.col("n") - F.lit(1))
    s1 = 2.0 * F.col("s0")
    s2 = 4.0 * F.col("sdeg2")
    var = (
        (F.col("n") * F.col("n") * s1 - F.col("n") * s2
         + 3.0 * F.col("s0") * F.col("s0"))
        / ((F.col("n") * F.col("n") - 1.0) * F.col("s0") * F.col("s0"))
        - e_i * e_i
    )
    return j.select(
        "bin", "s0",
        F.round(i, 10).alias("moran_i"),
        F.round(e_i, 10).alias("e_i"),
        F.round((i - e_i) / F.sqrt(var), 8).alias("z_norm"),
    ).orderBy("bin")


def general_g(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Getis-Ord General G (Getis & Ord 1992, eq. 6) — the global
    high/low clustering statistic: G = sum_w xi*xj / sum_{i!=j} xi*xj
    over a nonnegative variable. G above its expectation means HIGH
    values cluster (Moran's I cannot tell high-clusters from
    low-clusters; G can).

    One row: (n_cells, s0, g, e_g, g_ratio) with E[G] = s0 / (n*(n-1))
    and g_ratio = G / E[G] (> 1: high clustering). Both numerator and
    denominator are exact int64 aggregates — the denominator is
    (sum x)^2 - sum x^2 via the all-directed-pairs identity, no second
    join. (The Ord-Getis 1992 variance needs the full B0..B4 moment
    expansion; it is deliberately not reproduced here — use
    :func:`getis_gi_star` for per-cell inference.)
    """
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    p = neighbor_pairs(cells, queen).agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.col("xi") * F.col("xj")).alias("spp"),
    )
    j = g.crossJoin(p)
    den = F.col("sx") * F.col("sx") - F.col("sxx")
    gg = F.col("spp") / den
    e_g = F.col("s0") / (F.col("n") * (F.col("n") - 1.0))
    return j.select(
        F.col("n").alias("n_cells"), F.col("s0"),
        F.round(gg, 12).alias("g"),
        F.round(e_g, 12).alias("e_g"),
        F.round(gg / e_g, 9).alias("g_ratio"),
    )


def theil_sen(cells: DataFrame) -> DataFrame:
    """Per-cell Theil-Sen slope estimator (Theil 1950; Sen, JASA 1968)
    over time-binned values — the robust trend MAGNITUDE that pairs
    with :func:`mann_kendall`'s trend TEST (the emerging-hotspots
    combo: MK says whether a cell heats up, Theil-Sen says how fast):
    slope = median of the pairwise slopes (x_j - x_i) / (t_j - t_i)
    over all time pairs, insensitive to ~29% outliers.

    ``cells``: (gx, gy, tbin, x) with integer tbin and x. Exactness:
    each pairwise slope is ONE integer division Δx/Δt (identical
    doubles in any engine); the median is an exact ORDER-STATISTIC
    selection — rows ranked by (slope, ti, tj) — taking the middle
    element for odd m and the mean of the two middles for even m (one
    float add + halving). Bounded T^2 pairs per cell on the AGGREGATED
    lattice, one window per cell — the mann_kendall shape. Returns
    (gx, gy, n_bins, n_pairs, slope)."""
    from pyspark.sql import Window

    a = cells.select("gx", "gy", F.col("tbin").alias("ti"),
                     F.col("x").alias("xi"))
    b = cells.select(F.col("gx").alias("gx2"), F.col("gy").alias("gy2"),
                     F.col("tbin").alias("tj"), F.col("x").alias("xj"))
    pr = (a.join(b, (F.col("gx") == F.col("gx2"))
                 & (F.col("gy") == F.col("gy2"))
                 & (F.col("ti") < F.col("tj")))
          .select("gx", "gy", "ti", "tj",
                  ((F.col("xj") - F.col("xi"))
                   / (F.col("tj") - F.col("ti")).cast("double"))
                  .alias("s")))
    w = Window.partitionBy("gx", "gy").orderBy("s", "ti", "tj")
    rk = pr.withColumn("r", F.row_number().over(w)) \
           .withColumn("m", F.count(F.lit(1)).over(
               Window.partitionBy("gx", "gy")))
    med = (rk.where(((F.col("m") % 2 == 1)
                     & (F.col("r") * 2 == F.col("m") + 1))
                    | ((F.col("m") % 2 == 0)
                       & ((F.col("r") * 2 == F.col("m"))
                          | (F.col("r") * 2 == F.col("m") + 2))))
        .groupBy("gx", "gy", "m")
        .agg(F.sum("s").alias("ssum"), F.count(F.lit(1)).alias("k")))
    nb = cells.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("n_bins"))
    return (med.join(nb, ["gx", "gy"])
            .select("gx", "gy", "n_bins",
                    F.col("m").cast("long").alias("n_pairs"),
                    F.round(F.col("ssum") / F.col("k"), 9).alias("slope")))


def directional_variogram(
    pts: DataFrame,
    max_dist: float,
    n_bins: int = 10,
    cell: float | None = None,
    max_per_cell: int | None = None,
) -> DataFrame:
    """Directional (anisotropic) Matheron semivariogram — the
    anisotropy diagnostic :func:`empirical_variogram` averages away
    (geological trends, prevailing winds, crawl-time drift): the same
    binned gamma(h), split into the four canonical azimuth sectors
    (E-W, NE-SW, N-S, NW-SE; 45-degree windows, direction taken
    modulo 180 for unordered pairs).

    Sector assignment: az = degrees(atan2(dy, dx)) folded to [0, 180)
    then floor(((az + 22.5) mod 180) / 45) — the identical libm/fmod
    chain in both engines (the aspect-kernel contract). Everything
    else (exact int64 d2 / squared differences, the 3x3 covering join,
    the optional per-cell cap) is empirical_variogram's machinery
    verbatim. Returns (sector, bin, n_pairs, gamma) — sector 0=E-W,
    1=NE-SW, 2=N-S, 3=NW-SE."""
    c = float(cell if cell is not None else max_dist)
    if c < max_dist:
        raise ValueError(f"cell ({c}) must be >= max_dist ({max_dist}) "
                         "or ring coverage is incomplete")
    cl = F.lit(c)
    base = pts.select(
        "pid", "x", "y", "v",
        F.floor(F.col("x") / cl).cast("long").alias("cx"),
        F.floor(F.col("y") / cl).cast("long").alias("cy"),
    )
    if max_per_cell is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("cx", "cy").orderBy("pid")
        base = (base.withColumn("_r", F.row_number().over(w))
                    .where(F.col("_r") <= max_per_cell).drop("_r"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probe = base.select(
        F.col("pid").alias("pid_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"), F.col("v").alias("va"),
        F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("jcx"),
        (F.col("cy") + F.col("o.dy")).alias("jcy"),
    ).drop("o")
    build = base.select(
        F.col("pid").alias("pid_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), F.col("v").alias("vb"),
        F.col("cx").alias("jcx"), F.col("cy").alias("jcy"),
    )
    dxe = F.col("xb") - F.col("xa")
    dye = F.col("yb") - F.col("ya")
    d2 = dxe * dxe + dye * dye
    dd = (F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))
    az = F.degrees(F.atan2(dye.cast("double"), dxe.cast("double")))
    azn = F.when(az < 0.0, az + 180.0).otherwise(az)
    azn = F.when(azn == 180.0, F.lit(0.0)).otherwise(azn)
    sector = F.floor(((azn + 22.5) % 180.0) / 45.0).cast("int")
    bw = max_dist / n_bins
    pairs = (
        probe.join(build, ["jcx", "jcy"])
        .where(F.col("pid_a") < F.col("pid_b"))
        .select(d2.alias("d2"), dd.alias("dd"), sector.alias("sector"))
        .where(F.col("d2") < F.lit(max_dist * max_dist))
        .where(F.col("d2") > 0)
    )
    return (
        pairs.groupBy("sector",
                      F.floor(F.sqrt(F.col("d2")) / F.lit(bw))
                      .cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum("dd").alias("sdd"))
        .select("sector", "bin", "n_pairs",
                F.round(F.col("sdd") / (2.0 * F.col("n_pairs")), 9)
                 .alias("gamma"))
    )


def lees_l(cells: DataFrame, queen: bool = True) -> DataFrame:
    """Lee's L bivariate spatial association (Lee, J. Geogr. Systems
    2001): the spatial co-patterning of two cell variables — high where
    x and y cluster IN THE SAME PLACES, unlike a plain correlation. The
    binary-weights form used here (stated contract, matching this
    module's other statistics):

        L = (n / sum_i deg_i^2)
            * sum_i (sum_j w_ij X_j)(sum_j w_ij Y_j)
            / sqrt(sum X^2 * sum Y^2)

    with X_j = n*x_j - Sx, Y_j = n*y_j - Sy — the n-scaled integer
    deviations, so every aggregate is exact int64 and the n^2 factors
    cancel in the ratio. One-row result:
    (n_cells, s0, sdeg2, l_num, lees_l)."""
    g = cells.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"))
    c = cells.crossJoin(F.broadcast(g)).select(
        "gx", "gy",
        (F.col("n") * F.col("x") - F.col("sx")).alias("dx"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("dy"))
    offs = F.array(
        *[F.struct(F.lit(dx).alias("dx2"), F.lit(dy).alias("dy2"))
          for dx, dy in _offsets(queen)])
    probe = (c.select("gx", "gy", F.explode(offs).alias("o"))
             .select("gx", "gy",
                     (F.col("gx") + F.col("o.dx2")).alias("ngx"),
                     (F.col("gy") + F.col("o.dy2")).alias("ngy")))
    nbr = c.select(F.col("gx").alias("ngx"), F.col("gy").alias("ngy"),
                   F.col("dx").alias("nx"), F.col("dy").alias("ny"))
    sums = (probe.join(nbr, ["ngx", "ngy"])
            .groupBy("gx", "gy")
            .agg(F.count(F.lit(1)).alias("deg"),
                 F.sum("nx").alias("wx"), F.sum("ny").alias("wy")))
    # decimal(38,0) products: wx/wy are sums of n-scaled deviations, so
    # wx*wy (and dx^2) wrap int64 silently in non-ANSI Spark while the
    # DuckDB oracle sums HUGEINT — welch_ttest_row's guard, applied here
    _d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = sums.agg(
        F.sum("deg").alias("s0"),
        F.sum(F.col("deg") * F.col("deg")).alias("sdeg2"),
        F.sum(_d("wx") * _d("wy")).alias("l_num"))
    dev = c.agg(F.sum(_d("dx") * _d("dx")).alias("sxx"),
                F.sum(_d("dy") * _d("dy")).alias("syy"))
    j = g.crossJoin(agg).crossJoin(dev)
    l = (F.col("n").cast("double") / F.col("sdeg2").cast("double")
         * F.col("l_num").cast("double")
         / F.sqrt(F.col("sxx").cast("double")
                  * F.col("syy").cast("double")))
    return j.select(
        F.col("n").cast("long").alias("n_cells"),
        F.col("s0").cast("long").alias("s0"),
        F.col("sdeg2").cast("long").alias("sdeg2"),
        F.col("l_num").cast("long").alias("l_num"),
        l.alias("lees_l"))
