"""Distributed contour: per-tile marching squares with halo exchange.

Re-expresses ``core/alg/contour.cpp`` (SURVEY.md §2.9) over the tile table.
Cells straddling tile boundaries need the neighbor's edge pixels, so the
operator reuses the DEM halo-exchange shuffle (operators.dem._emit_strips):
each tile computes cells whose **top-left pixel** it owns (using right/
bottom halo columns), which partitions the global cell grid exactly — no
duplicate and no missing segments across tiles.

Output: one row per segment (raster_id, band, level, x1, y1, x2, y2) in
world coordinates. Segment-chaining into polylines is a consumer-side
concern (the reference's GDAL_CG_FeedLine incremental merge); the segment
set itself is the complete, exact contour geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.kernels import contour as CK
from lib_gdal_spark.operators.dem import _STRIP_SCHEMA, _emit_strips

_SEG_SCHEMA = (
    "raster_id string, band int, level double, "
    "x1 double, y1 double, x2 double, y2 double"
)


def contour_segments(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """Tile table -> contour segments at each level (world coordinates)."""
    strips = tiles.mapInPandas(_emit_strips, schema=_STRIP_SCHEMA)

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        center = pdf[(pdf["src_dx"] == 0) & (pdf["src_dy"] == 0)]
        cols = ["raster_id", "band", "level", "x1", "y1", "x2", "y2"]
        if center.empty:
            return pd.DataFrame({c: [] for c in cols})
        crow = center.iloc[0]
        th, tw = int(crow["tile_h"]), int(crow["tile_w"])
        # pad only right/bottom (+1): cells owned by this tile are those
        # whose top-left pixel is local; they reach one pixel right/down.
        pad = np.full((th + 1, tw + 1), np.nan)
        for _, r in pdf.iterrows():
            dx, dy = int(r["src_dx"]), int(r["src_dy"])
            if dx == 1 or dy == 1:
                continue  # left/top halo never needed
            sh, sw = int(r["strip_h"]), int(r["strip_w"])
            piece = np.asarray(r["pixels"], dtype=np.float64).reshape(sh, sw)
            y0 = th if dy == -1 else 0
            x0 = tw if dx == -1 else 0
            pad[y0 : y0 + sh, x0 : x0 + sw] = piece
        gt = [crow[f"gt{i}"] for i in range(6)]
        out = []
        for level in levels:
            segs = CK.marching_squares(pad, float(level))
            if not len(segs):
                continue
            # pixel-center -> world: center of local pixel p is (p + 0.5)
            wx1 = gt[0] + (segs[:, 0] + 0.5) * gt[1]
            wy1 = gt[3] + (segs[:, 1] + 0.5) * gt[5]
            wx2 = gt[0] + (segs[:, 2] + 0.5) * gt[1]
            wy2 = gt[3] + (segs[:, 3] + 0.5) * gt[5]
            out.append(pd.DataFrame({
                "raster_id": crow["raster_id"], "band": int(crow["band"]),
                "level": float(level),
                "x1": wx1, "y1": wy1, "x2": wx2, "y2": wy2,
            }))
        if not out:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(out, ignore_index=True)[cols]

    return strips.groupBy(
        "raster_id", "band", "zoom", F.col("dst_x").alias("tile_x"),
        F.col("dst_y").alias("tile_y"),
    ).applyInPandas(per_tile, schema=_SEG_SCHEMA)


def contour_polylines(
    tiles: DataFrame,
    levels: list[float],
    spark=None,
) -> DataFrame:
    """Segments -> chained polyline features, one row per connected line
    (the role of the reference's GDAL_CG_FeedLine incremental merger,
    ``core/alg/contour.cpp``).

    Marching-squares endpoints on shared cell edges are BITWISE identical
    (same two pixel values, same interpolation orientation), so endpoint
    identity is an exact equi-key. Shape: segments -> endpoint-key edges ->
    connected components (operators.components, the same large-star
    machinery as polygonize) -> per-component chain walk in one
    applyInPandas. Output: (raster_id, band, level, n_points, length,
    closed, wkb LineString).
    """
    from lib_gdal_spark.functions import geometry as G
    from lib_gdal_spark.operators.components import connected_components

    segs = contour_segments(tiles, levels)
    spark = spark or tiles.sparkSession
    k1 = F.xxhash64(F.col("level"), F.col("x1"), F.col("y1"))
    k2 = F.xxhash64(F.col("level"), F.col("x2"), F.col("y2"))
    segs = segs.withColumn("u", k1).withColumn("v", k2).localCheckpoint()

    mapping = connected_components(segs.select("u", "v"))
    segc = segs.join(mapping, segs["u"] == mapping["label"], "left").select(
        segs["*"], F.coalesce("component", segs["u"]).alias("component")
    )

    def chain(key, pdf: pd.DataFrame) -> pd.DataFrame:
        comp = int(key[0])
        r0 = pdf.iloc[0]
        pts1 = pdf[["x1", "y1"]].to_numpy(np.float64)
        pts2 = pdf[["x2", "y2"]].to_numpy(np.float64)
        n = len(pdf)
        adj: dict[tuple, list[int]] = {}
        for i in range(n):
            adj.setdefault(tuple(pts1[i]), []).append(i)
            adj.setdefault(tuple(pts2[i]), []).append(i)
        # start at a degree-1 endpoint if the line is open, else anywhere
        start_pt = None
        for p, lst in adj.items():
            if len(lst) == 1:
                start_pt = p
                break
        used = np.zeros(n, dtype=bool)
        if start_pt is None:
            start_pt = tuple(pts1[0])
        path = [start_pt]
        cur = start_pt
        while True:
            nxt_i = None
            for i in adj.get(cur, []):
                if not used[i]:
                    nxt_i = i
                    break
            if nxt_i is None:
                break
            used[nxt_i] = True
            a, b = tuple(pts1[nxt_i]), tuple(pts2[nxt_i])
            cur = b if a == cur else a
            path.append(cur)
        arr = np.asarray(path, dtype=np.float64)
        closed = bool(len(arr) > 2 and tuple(arr[0]) == tuple(arr[-1]))
        length = float(np.sum(np.hypot(*(np.diff(arr, axis=0).T))))
        return pd.DataFrame([{
            "raster_id": r0["raster_id"], "band": int(r0["band"]),
            "level": float(r0["level"]), "component": comp,
            "n_points": int(len(arr)), "length": length,
            "closed": closed,
            "wkb": bytearray(G.wkb_linestring(arr)),
        }])

    return segc.groupBy("component").applyInPandas(
        chain,
        schema="raster_id string, band int, level double, component long, "
               "n_points int, length double, closed boolean, wkb binary",
    )


def contour_polygons(
    tiles: DataFrame,
    spark,
    grid_w: int,
    levels: list[float],
    tile: int = 64,
) -> DataFrame:
    """gdal_contour -p analog (``apps/gdal_contour.cpp`` POLYGONIZE mode,
    ``alg/contour/``): polygons of the regions BETWEEN fixed levels, each
    carrying its elevation bounds (the reference's ELEV_MIN/ELEV_MAX
    fields).

    Band classification (``band = #levels <= v``, i.e. band b covers
    ``levels[b-1] <= v < levels[b]``) runs JVM-side as a transform over the
    pixel arrays; ring geometry comes from the distributed polygonizer
    (WKB MultiPolygons, holes included). Boundaries are pixel-quantized —
    each pixel belongs wholly to its band; the sub-pixel marching-squares
    interpolation is the contour LINE path above.

    Returns (component, band, elev_min, elev_max, n_pixels, n_rings,
    area_px, wkb); elev_min is NULL below the first level, elev_max NULL
    above the last, mirroring the reference's open outer intervals.
    """
    from lib_gdal_spark.operators.polygonize import polygonize_rings

    lvl = sorted(float(x) for x in levels)
    case = "CASE " + " ".join(
        f"WHEN v >= CAST({x!r} AS DOUBLE) THEN {b + 1}.0D"
        for b, x in reversed(list(enumerate(lvl)))
    ) + " ELSE 0.0D END"
    banded = tiles.withColumn("pixels",
                              F.expr(f"transform(pixels, v -> {case})"))
    rings = polygonize_rings(banded, spark, grid_w, tile=tile,
                             background=None)
    band = F.col("value").cast("int")
    arr = F.array([F.lit(x) for x in lvl])
    elev_min = F.when(band > 0, F.element_at(arr, band)).otherwise(F.lit(None))
    elev_max = F.when(band < len(lvl),
                      F.element_at(arr, band + 1)).otherwise(F.lit(None))
    return rings.select(
        "component", band.alias("band"),
        elev_min.cast("double").alias("elev_min"),
        elev_max.cast("double").alias("elev_max"),
        "n_pixels", "n_rings", "area_px", "wkb",
    )
