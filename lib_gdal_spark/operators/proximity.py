"""Proximity: per-pixel distance to the nearest target pixel (bounded).

Reference: ``core/alg/gdalproximity.cpp:112`` (two-pass chamfer over the
whole raster). Distributed re-expression for a bounded search radius
``max_dist`` (the common ``MAXDIST`` usage): a target pixel can only
influence pixels within ``max_dist``, so each target broadcasts to the tiles
whose window it can reach (ring = ceil(max_dist / tile)); every tile then
computes the exact euclidean distance transform against its gathered
candidate set — chunk-vectorized like operators.grid. Results are exact for
d <= max_dist; farther pixels get ``nodata`` (GDAL writes nodata beyond
MAXDIST too).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lib_gdal_spark.sources.rasters import RASTER_SCHEMA


def proximity(
    tiles: DataFrame,
    target_values: list[float],
    max_dist: float,
    nodata: float = -1.0,
    tile: int = 64,
    out_id: str = "proximity",
) -> DataFrame:
    """Tile table -> distance (in pixels) to nearest target-valued pixel."""
    ring = int(math.ceil(max_dist / tile))
    tv = set(float(v) for v in target_values)

    def targets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = np.arange(-ring, ring + 1)
        dx, dy = np.meshgrid(offs, offs)
        dx = dx.ravel()
        dy = dy.ravel()
        for b in batches:
            outs = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                vals = np.asarray(r["pixels"], dtype=np.float64).reshape(th, tw)
                mask = np.isin(vals, list(tv))
                if not mask.any():
                    continue
                py, px = np.nonzero(mask)
                gx = px + int(r["tile_x"]) * tile
                gy = py + int(r["tile_y"]) * tile
                n, m = len(gx), len(dx)
                rep = np.repeat(np.arange(n), m)
                outs.append(pd.DataFrame({
                    "raster_id": r["raster_id"], "band": r["band"],
                    "zoom": r["zoom"],
                    "dst_x": int(r["tile_x"]) + np.tile(dx, n),
                    "dst_y": int(r["tile_y"]) + np.tile(dy, n),
                    "gx": gx[rep], "gy": gy[rep],
                }))
            yield (pd.concat(outs, ignore_index=True) if outs
                   else pd.DataFrame({"raster_id": [], "band": [], "zoom": [],
                                      "dst_x": [], "dst_y": [],
                                      "gx": [], "gy": []}))

    tgt = tiles.mapInPandas(
        targets,
        schema="raster_id string, band int, zoom int, dst_x int, dst_y int, "
               "gx long, gy long",
    )

    CHUNK = 8192
    md2 = max_dist * max_dist

    def per_tile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # cogroup: the tile array stays on one row; targets arrive narrow
        if left.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in RASTER_SCHEMA.split(", ")]
            )
        r = left.iloc[0]
        th, tw = int(r["tile_h"]), int(r["tile_w"])
        x0 = int(key[3]) * tile
        y0 = int(key[4]) * tile
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (ii + x0).ravel()
        gy = (jj + y0).ravel()
        best = np.full(th * tw, np.inf)
        tx = right["gx"].to_numpy(np.float64)
        ty = right["gy"].to_numpy(np.float64)
        for c0 in range(0, len(tx), CHUNK):
            cx = tx[c0 : c0 + CHUNK]
            cy = ty[c0 : c0 + CHUNK]
            d2 = (gx[:, None] - cx[None, :]) ** 2 + (
                gy[:, None] - cy[None, :]
            ) ** 2
            best = np.minimum(best, d2.min(axis=1) if d2.size else best)
        out = np.where(best <= md2, np.sqrt(best), nodata)
        return pd.DataFrame([{
            "raster_id": out_id, "band": int(key[1]), "zoom": int(key[2]),
            "tile_x": int(key[3]), "tile_y": int(key[4]),
            "dtype": "float64", "tile_w": tw, "tile_h": th,
            "gt0": r["gt0"], "gt1": r["gt1"], "gt2": r["gt2"],
            "gt3": r["gt3"], "gt4": r["gt4"], "gt5": r["gt5"],
            "nodata": nodata, "pixels": out.tolist(),
        }])

    return (
        tiles.groupBy("raster_id", "band", "zoom", "tile_x", "tile_y")
        .cogroup(tgt.groupBy("raster_id", "band", "zoom", "dst_x", "dst_y"))
        .applyInPandas(per_tile, schema=RASTER_SCHEMA)
    )


def allocation(
    tiles: DataFrame,
    target_values: list[float],
    max_dist: float,
    tile: int = 64,
) -> DataFrame:
    """Euclidean allocation (the GRASS ``r.grow.distance value=`` /
    ArcGIS Euclidean Allocation semantics — the companion output of
    :func:`proximity`): every pixel receives the VALUE of its nearest
    target pixel, bounded at ``max_dist``.

    Same distributed shape as :func:`proximity` (bounded broadcast ring:
    each target reaches only the tiles within ``ceil(max_dist / tile)``,
    then an exact per-tile transform over the gathered candidates —
    never a global all-pairs). The nearest-target choice is an EXACT
    INTEGER argmin: pixel coordinates are integers, so the squared
    distance is an int64, and ties break deterministically on
    ``(d2, target_gy, target_gx)`` via one packed sort key
    ``d2 * 2^32 + gy * 2^16 + gx`` — bit-identical at any parallelism
    and spellable verbatim in the SQL oracle (a float argmin would be
    tie-unstable across engines). Pixels farther than ``max_dist`` get
    the nodata sentinels ``alloc = -1.0, d2 = -1`` (GDAL's proximity
    writes nodata beyond MAXDIST too).

    Returns exploded cells ``(px, py, alloc, d2)`` — ``alloc`` is the
    nearest target's pixel value, ``d2`` the exact squared distance.
    """
    ring = int(math.ceil(max_dist / tile))
    tv = set(float(v) for v in target_values)

    def targets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = np.arange(-ring, ring + 1)
        dx, dy = np.meshgrid(offs, offs)
        dx = dx.ravel()
        dy = dy.ravel()
        for b in batches:
            outs = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                vals = np.asarray(r["pixels"], dtype=np.float64).reshape(th, tw)
                mask = np.isin(vals, list(tv))
                if not mask.any():
                    continue
                py, px = np.nonzero(mask)
                gx = px + int(r["tile_x"]) * tile
                gy = py + int(r["tile_y"]) * tile
                n, m = len(gx), len(dx)
                rep = np.repeat(np.arange(n), m)
                outs.append(pd.DataFrame({
                    "raster_id": r["raster_id"], "band": r["band"],
                    "zoom": r["zoom"],
                    "dst_x": int(r["tile_x"]) + np.tile(dx, n),
                    "dst_y": int(r["tile_y"]) + np.tile(dy, n),
                    "gx": gx[rep], "gy": gy[rep],
                    "tval": vals[py, px][rep],
                }))
            yield (pd.concat(outs, ignore_index=True) if outs
                   else pd.DataFrame({"raster_id": [], "band": [], "zoom": [],
                                      "dst_x": [], "dst_y": [],
                                      "gx": [], "gy": [], "tval": []}))

    tgt = tiles.mapInPandas(
        targets,
        schema="raster_id string, band int, zoom int, dst_x int, dst_y int, "
               "gx long, gy long, tval double",
    )

    CHUNK = 8192
    md2 = int(math.floor(max_dist * max_dist))

    def per_tile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["px", "py", "alloc", "d2"])
        r = left.iloc[0]
        th, tw = int(r["tile_h"]), int(r["tile_w"])
        x0 = int(key[3]) * tile
        y0 = int(key[4]) * tile
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (ii + x0).ravel().astype(np.int64)
        gy = (jj + y0).ravel().astype(np.int64)
        best = np.full(th * tw, np.iinfo(np.int64).max, dtype=np.int64)
        best_val = np.full(th * tw, np.nan)
        tx = right["gx"].to_numpy(np.int64)
        ty = right["gy"].to_numpy(np.int64)
        tval = right["tval"].to_numpy(np.float64)
        for c0 in range(0, len(tx), CHUNK):
            cx = tx[c0 : c0 + CHUNK]
            cy = ty[c0 : c0 + CHUNK]
            if not len(cx):
                continue
            d2 = (gx[:, None] - cx[None, :]) ** 2 + (
                gy[:, None] - cy[None, :]
            ) ** 2
            # packed exact argmin key: d2 then (ty, tx) — deterministic
            k = (d2 << 32) | (cy[None, :] << 16) | cx[None, :]
            idx = np.argmin(k, axis=1)
            kmin = k[np.arange(len(gx)), idx]
            take = kmin < best
            best = np.where(take, kmin, best)
            best_val = np.where(take, tval[c0 : c0 + CHUNK][idx], best_val)
        d2b = best >> 32
        hit = d2b <= md2
        return pd.DataFrame({
            "px": gx, "py": gy,
            "alloc": np.where(hit, best_val, -1.0),
            "d2": np.where(hit, d2b, -1).astype(np.int64),
        })

    out = (
        tiles.groupBy("raster_id", "band", "zoom", "tile_x", "tile_y")
        .cogroup(tgt.groupBy("raster_id", "band", "zoom", "dst_x", "dst_y"))
        .applyInPandas(per_tile,
                       schema="px long, py long, alloc double, d2 long")
    )
    return out


def _grid_cost_graph(tiles: DataFrame, tile: int, lo: int, hi: int):
    """Cost raster -> (cells, directed weighted 8-neighbor edge list).

    cells: (px, py, c, id) for the [lo, hi]^2 window, id = py*2^16 + px;
    edges: (u, v, w) with w = (cost(u) + cost(v)) / 2, x sqrt(2) on
    diagonals (GRASS r.cost step weights). Keys-only: one explode + one
    equi-join, no halo machinery — weights read only the two endpoint
    costs. Shared by cost_distance and least_cost_path, which must
    agree on weights to compose.
    """
    import math as _m

    ex = tiles.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "c"),
    )
    px = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int"))
    cells = ex.select(
        px.cast("long").alias("px"), py.cast("long").alias("py"),
        F.col("c").cast("double").alias("c"),
    ).where((F.col("px").between(lo, hi)) & (F.col("py").between(lo, hi))) \
     .withColumn("id", F.col("py") * 65536 + F.col("px")) \
     .localCheckpoint()

    s2 = _m.sqrt(2.0)
    nbrs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(s2 if dx and dy else 1.0).alias("mult"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ])
    half = cells.select(
        "id", "c",
        F.explode(nbrs).alias("n"),
        (F.col("px") + F.col("n.dx")).alias("nx"),
        (F.col("py") + F.col("n.dy")).alias("ny"),
    ).where(F.col("nx").between(lo, hi) & F.col("ny").between(lo, hi))
    edges = (
        half.join(
            cells.select((F.col("id")).alias("vid"),
                         F.col("c").alias("cv")),
            (F.col("ny") * 65536 + F.col("nx")) == F.col("vid"))
        .select(
            F.col("id").alias("u"), F.col("vid").alias("v"),
            (((F.col("c") + F.col("cv")) / F.lit(2.0))
             * F.col("n.mult")).alias("w"))
    )
    return cells, edges


def cost_distance(tiles: DataFrame, seeds: list, tile: int = 64,
                  lo: int = 1, hi: int = 254,
                  max_rounds: int = 400) -> DataFrame:
    """Accumulated-cost distance over a cost raster (the GRASS ``r.cost``
    semantics — the weighted generalization of :func:`proximity`'s
    euclidean transform): from a set of ``seeds`` (``[(px, py), ...]``,
    cost 0), the minimal path cost to every interior cell, where a step
    u -> v over the 8-neighborhood costs ``(cost(u) + cost(v)) / 2``
    on cardinals and ``(cost(u) + cost(v)) / 2 * sqrt(2)`` on
    diagonals. Returns (px, py, dist) for every reached cell.

    Distributed shape: the raster becomes its 8-neighbor grid graph
    (keys-only, one explode + one equi-join — no halo machinery needed
    since weights only read the two endpoint costs) and the existing
    Bellman-Ford relaxation (graph.shortest_path_tree, multi-source
    seeded) runs to fixpoint. Synchronous relaxation needs one round
    per HOP of the longest min-cost path — fine for windowed mosaics
    and bounded corridors, round-heavy for continental rasters (the
    known cost of exactness at scale; delta-stepping would trade
    determinism for rounds, so it is deliberately not used here).
    """
    from lib_gdal_spark.operators.graph import shortest_path_tree

    cells, edges = _grid_cost_graph(tiles, tile, lo, hi)
    seed_ids = [int(y) * 65536 + int(x) for x, y in seeds]
    d = shortest_path_tree(edges, seed_ids, directed=True,
                           max_rounds=max_rounds)
    return (
        cells.join(d, cells.id == d.node)
        .select("px", "py", F.round("dist", 9).alias("dist"))
    )


def least_cost_path(tiles: DataFrame, seeds: list, target: tuple,
                    tile: int = 64, lo: int = 1, hi: int = 254,
                    max_rounds: int = 400,
                    max_doublings: int = 24) -> DataFrame:
    """The minimal-cost corridor from the nearest seed to ``target``
    over the cost raster — cost_distance's path-extraction companion
    (``r.drain`` in the GRASS family). Returns one row per path cell:
    (step, px, py, dist), step 0 at the seed, dist the accumulated cost
    (strictly increasing along the path for positive costs).

    The relaxation's predecessor tree is DETERMINISTIC (ties at the
    minimal distance break to the smallest predecessor id — see
    shortest_path_tree), so the path is reproducible and an independent
    SQL oracle can re-derive it. Backtracking never walks the chain one
    hop per round: the prev table doubles into 2^k-ancestor jump tables
    and the reach set from ``target`` expands by one equi-join per
    round — log2(path length) rounds, O(path) rows.

    Costs must be STRICTLY POSITIVE (checked, loud): zero-cost cells
    create zero-weight cycles in which predecessor chains are not
    well-defined for any backtracking algorithm. (cost_distance itself
    tolerates zeros — distances stay well-defined, only paths don't.)
    """
    from lib_gdal_spark.operators.graph import shortest_path_tree

    cells, edges = _grid_cost_graph(tiles, tile, lo, hi)
    min_cost = cells.agg(F.min("c")).first()[0]
    if min_cost is not None and min_cost <= 0:
        raise ValueError(
            f"least_cost_path requires strictly positive costs "
            f"(min cell cost is {min_cost}); zero-cost cells make the "
            "predecessor chain ill-defined")
    seed_ids = [int(y) * 65536 + int(x) for x, y in seeds]
    tree = shortest_path_tree(edges, seed_ids, directed=True,
                              max_rounds=max_rounds).localCheckpoint()

    spark = tiles.sparkSession
    tgt_id = int(target[1]) * 65536 + int(target[0])
    from lib_gdal_spark.session import local_df
    # reach carries `back` = hops back from the target along the prev
    # chain: the node 2^k ancestors up enters with back + 2^k, exactly
    # once (a chain has one node per depth). Step then derives from the
    # CHAIN, not from a dist sort — tied accumulated costs (legal with
    # zero-cost cells) would make a dist ordering nondeterministic.
    reach = local_df(spark, [(tgt_id, 0)], "id long, back long")
    jump = tree.where(F.col("prev").isNotNull()) \
               .select(F.col("node").alias("id"),
                       F.col("prev").alias("anc")).localCheckpoint()
    n_reach = 1
    stride = 1  # the current jump table's span: 2^k
    for _ in range(max_doublings):
        grown = (
            reach.unionByName(
                reach.join(jump, "id")
                .select(F.col("anc").alias("id"),
                        (F.col("back") + F.lit(stride)).alias("back")))
            .groupBy("id").agg(F.min("back").alias("back"))
            .localCheckpoint()
        )
        n = grown.count()
        reach = grown
        if n == n_reach:
            break
        n_reach = n
        stride *= 2
        jump = (
            jump.alias("a")
            .join(jump.select(F.col("id").alias("mid"),
                              F.col("anc").alias("a2")).alias("b"),
                  F.col("a.anc") == F.col("mid"))
            .select(F.col("a.id").alias("id"), F.col("a2").alias("anc"))
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"least_cost_path did not converge in {max_doublings} "
            "doublings")
    path = (
        reach.join(tree, reach.id == tree.node)
        .join(cells.select("id", "px", "py"), "id")
        .crossJoin(F.broadcast(reach.agg(F.max("back").alias("plen"))))
    )
    return path.select(
        (F.col("plen") - F.col("back")).cast("int").alias("step"),
        "px", "py", F.round("dist", 9).alias("dist"),
    )


def cost_corridor(tiles: DataFrame, seeds_a: list, seeds_b: list,
                  tile: int = 64, lo: int = 1, hi: int = 254,
                  max_rounds: int = 400) -> DataFrame:
    """Least-cost corridor (the ArcGIS Corridor tool semantics): per
    cell, accumulated cost to the nearest A-seed PLUS accumulated cost
    to the nearest B-seed. The raster minimum of ``corridor`` equals the
    least A->B path cost, and thresholding at ``min + delta`` yields the
    corridor band every near-optimal route passes through — the standard
    wildlife-connectivity / routing-envelope product.

    Pure composition: two :func:`cost_distance` fixpoints (each the
    deterministic synchronous relaxation) joined on the cell key; only
    cells reached from BOTH sides appear. Returns
    (px, py, dist_a, dist_b, corridor).
    """
    da = cost_distance(tiles, seeds_a, tile, lo, hi, max_rounds) \
        .withColumnRenamed("dist", "dist_a")
    db = cost_distance(tiles, seeds_b, tile, lo, hi, max_rounds) \
        .withColumnRenamed("dist", "dist_b")
    return da.join(db, ["px", "py"]).select(
        "px", "py", "dist_a", "dist_b",
        F.round(F.col("dist_a") + F.col("dist_b"), 9).alias("corridor"))


def cost_allocation(tiles: DataFrame, seeds: list, tile: int = 64,
                    lo: int = 1, hi: int = 254,
                    max_rounds: int = 400) -> DataFrame:
    """Cost allocation (ArcGIS Cost Allocation / GRASS r.cost
    start_points with nearest-id output): every cell is labeled with
    the SEED whose accumulated travel cost to it is least — the
    weighted-Voronoi partition that :func:`proximity`'s Euclidean
    allocation cannot give on a cost surface (service areas over
    terrain, catchment assignment along networks).

    Same grid graph and synchronous relaxation as
    :func:`cost_distance`, but the state carries (dist, seed) and the
    per-node combine is the LEXICOGRAPHIC struct minimum — ties at the
    exactly-equal minimal cost break to the smallest seed key, so the
    partition is deterministic and an unrolled SQL relaxation carrying
    the same pair reproduces it bit-for-bit. Returns
    (px, py, dist, seed_px, seed_py)."""
    cells, edges = _grid_cost_graph(tiles, tile, lo, hi)
    seed_ids = [int(y) * 65536 + int(x) for x, y in seeds]
    from lib_gdal_spark.session import local_df
    state = local_df(
        cells.sparkSession, [(s, 0.0, s) for s in seed_ids],
        "node long, dist double, seed long").localCheckpoint()
    prev_sig = None
    for _ in range(max_rounds):
        cand = (
            edges.join(state.select(F.col("node").alias("u"),
                                    F.col("dist").alias("du"),
                                    F.col("seed").alias("s0")), "u")
            .select(F.col("v").alias("node"),
                    (F.col("du") + F.col("w")).alias("dist"),
                    F.col("s0").alias("seed"))
        )
        merged = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.min_by(F.struct("dist", "seed"),
                          F.struct("dist", "seed")).alias("s"))
            .select("node", F.col("s.dist").alias("dist"),
                    F.col("s.seed").alias("seed"))
            .localCheckpoint()
        )
        b = merged.agg(F.count(F.lit(1)), F.sum("dist"),
                       F.sum("seed")).first()
        sig = (b[0], b[1], b[2])
        state = merged
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"cost_allocation did not converge in {max_rounds} rounds")
    return (
        cells.join(state, cells["id"] == state["node"])
        .select("px", "py", F.round("dist", 9).alias("dist"),
                (F.col("seed") % 65536).alias("seed_px"),
                (F.col("seed") / 65536).cast("long").alias("seed_py"))
    )
