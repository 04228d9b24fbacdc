"""Sieve filter: remove raster components smaller than a threshold.

Reference: ``core/alg/gdalsievefilter.cpp:200`` — polygons (4-connected
equal-value components) under ``threshold`` pixels merge into their largest
neighbor, cascading until no small component remains.

Distributed shape: per-tile labeling (mapInPandas) emits (a) labeled pixel
tiles, (b) per-tile label summaries, (c) border pixels; cross-tile label
unification and the merge cascade run on the component graph (driver-side —
O(components), tiny next to pixels; the large-star/small-star join variant
is the 10^12-px path, as in operators.polygonize). A final broadcast map
rewrites pixel labels to the surviving component's value.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lib_gdal_spark.operators.polygonize import _label_tile
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA

_LAB_SCHEMA = (
    "tile_x int, tile_y int, tile_w int, tile_h int, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, gt5 double, "
    "raster_id string, band int, zoom int, dtype string, nodata double, "
    "labels array<long>, values array<double>"
)


def sieve(
    tiles: DataFrame,
    spark: SparkSession,
    grid_w: int,
    threshold: int,
    tile: int = 64,
    out_id: str = "sieved",
) -> DataFrame:
    """Tile table -> sieved tile table (small components absorbed)."""

    def label_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                vals = np.asarray(r["pixels"], dtype=np.float64).reshape(th, tw)
                lab = _label_tile(vals, background=None)  # every pixel labeled
                x0 = int(r["tile_x"]) * tile
                y0 = int(r["tile_y"]) * tile
                ly, lx = np.divmod(lab, tw)
                glab = (y0 + ly) * grid_w + (x0 + lx)
                row = {k: r[k] for k in (
                    "tile_x", "tile_y", "tile_w", "tile_h",
                    "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
                    "raster_id", "band", "zoom", "dtype", "nodata",
                )}
                row["labels"] = glab.ravel().tolist()
                row["values"] = vals.ravel().tolist()
                rows.append(row)
            yield pd.DataFrame(rows)

    labeled = tiles.mapInPandas(label_pass, schema=_LAB_SCHEMA).persist()

    # per-label stats + adjacency edges (within-tile different-label pairs
    # and cross-tile border pairs), computed from the labeled tiles
    def stats_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            srows = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                lab = np.asarray(r["labels"], dtype=np.int64).reshape(th, tw)
                vals = np.asarray(r["values"], dtype=np.float64).reshape(th, tw)
                flat = pd.DataFrame({
                    "label": lab.ravel(), "value": vals.ravel(),
                })
                agg = flat.groupby("label", as_index=False).agg(
                    value=("value", "first"), n=("value", "size"),
                )
                agg["kind"] = 0
                agg["la"] = agg["label"]
                agg["lb"] = -1
                srows.append(agg[["kind", "la", "lb", "value", "n"]])
                # within-tile adjacency (right + down neighbors)
                for a, bb in (
                    (lab[:, :-1], lab[:, 1:]),
                    (lab[:-1, :], lab[1:, :]),
                ):
                    diff = a != bb
                    if diff.any():
                        e = pd.DataFrame({
                            "kind": 1,
                            "la": a[diff].ravel(), "lb": bb[diff].ravel(),
                            "value": 0.0, "n": 0,
                        })
                        srows.append(e)
                # border pixels for cross-tile adjacency (emitted as kind 2
                # with n = global pixel index packed: px * 2^32 + py)
                x0 = int(r["tile_x"]) * tile
                y0 = int(r["tile_y"]) * tile
                py, px = np.meshgrid(np.arange(th), np.arange(tw),
                                     indexing="ij")
                edge = (px == 0) | (px == tw - 1) | (py == 0) | (py == th - 1)
                srows.append(pd.DataFrame({
                    "kind": 2,
                    "la": lab[edge].ravel(), "lb": -1,
                    "value": 0.0,
                    "n": ((px[edge] + x0).astype(np.int64) << np.int64(32))
                         | (py[edge] + y0).astype(np.int64),
                }))
            yield (pd.concat(srows, ignore_index=True) if srows
                   else pd.DataFrame({"kind": [], "la": [], "lb": [],
                                      "value": [], "n": []}))

    pieces = labeled.mapInPandas(
        stats_edges,
        schema="kind int, la long, lb long, value double, n long",
    ).persist()

    stats = pieces.where(F.col("kind") == 0)
    inner_edges = pieces.where(F.col("kind") == 1).select("la", "lb").distinct()
    borders = pieces.where(F.col("kind") == 2).select(
        (F.shiftrightunsigned("n", 32)).alias("px"),
        (F.col("n").bitwiseAND(F.lit((1 << 32) - 1))).alias("py"),
        F.col("la").alias("label"),
    )

    def adj(dx, dy):
        a = borders.select((F.col("px") + dx).alias("jx"),
                           (F.col("py") + dy).alias("jy"),
                           F.col("label").alias("la"))
        b = borders.select(F.col("px").alias("jx"), F.col("py").alias("jy"),
                           F.col("label").alias("lb"))
        return a.join(b, ["jx", "jy"]).select("la", "lb")

    cross_edges = adj(1, 0).unionByName(adj(0, 1)).where(
        F.col("la") != F.col("lb")
    ).distinct()

    # --- driver-side component graph -------------------------------------
    stat_rows = stats.groupBy("la", "value").agg(F.sum("n").alias("n")).collect()
    edge_rows = inner_edges.unionByName(cross_edges).collect()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    size: dict[int, int] = {}
    value: dict[int, float] = {}
    for r in stat_rows:
        size[r["la"]] = size.get(r["la"], 0) + r["n"]
        value[r["la"]] = r["value"]
    # unify equal-valued touching labels (same component split by tiles)
    for r in edge_rows:
        la, lb = r["la"], r["lb"]
        if value.get(la) == value.get(lb):
            ra, rb = find(la), find(lb)
            if ra != rb:
                if ra > rb:
                    ra, rb = rb, ra
                parent[rb] = ra
    csize: dict[int, int] = {}
    cvalue: dict[int, float] = {}
    for lab, n in size.items():
        root = find(lab)
        csize[root] = csize.get(root, 0) + n
        cvalue[root] = value[lab]
    nbrs: dict[int, set[int]] = {}
    for r in edge_rows:
        ra, rb = find(r["la"]), find(r["lb"])
        if ra != rb:
            nbrs.setdefault(ra, set()).add(rb)
            nbrs.setdefault(rb, set()).add(ra)

    # merge cascade: smallest-first, into the largest current neighbor
    absorbed: dict[int, int] = {}

    def resolve(c: int) -> int:
        while c in absorbed:
            c = absorbed[c]
        return c

    small = sorted([c for c, n in csize.items() if n < threshold],
                   key=lambda c: (csize[c], c))
    for c in small:
        c = resolve(c)
        if c not in csize or csize[c] >= threshold:
            continue
        cand = {resolve(nb) for nb in nbrs.get(c, set())} - {c}
        if not cand:
            continue
        target = max(cand, key=lambda t: (csize[t], -t))
        absorbed[c] = target
        csize[target] += csize.pop(c)
        nbrs.setdefault(target, set()).update(nbrs.pop(c, set()))

    final_value = {
        lab: cvalue[resolve(find(lab))] for lab in size
    }

    # --- pixel rewrite ----------------------------------------------------
    if final_value:
        mapping = spark.createDataFrame(
            list(final_value.items()), "label long, out_v double"
        )
    else:
        mapping = spark.createDataFrame([], "label long, out_v double")
    bmap = F.broadcast(mapping)

    ex = labeled.select(
        "raster_id", "band", "zoom", "tile_x", "tile_y", "dtype",
        "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
        "nodata", F.posexplode("labels").alias("pos", "label"),
    ).join(bmap, "label", "left")
    rebuilt = (
        ex.groupBy("raster_id", "band", "zoom", "tile_x", "tile_y", "dtype",
                   "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4",
                   "gt5", "nodata")
        .agg(F.array_sort(
            F.collect_list(F.struct("pos", "out_v"))).alias("pv"))
        .select(
            F.lit(out_id).alias("raster_id"), "band", "zoom",
            "tile_x", "tile_y", "dtype", "tile_w", "tile_h",
            "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
            F.transform("pv", lambda s: s["out_v"]).alias("pixels"),
        )
    )
    return rebuilt
