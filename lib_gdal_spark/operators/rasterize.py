"""Distributed rasterize: burn vector geometries into a tiled raster table.

Re-expresses ``GDALRasterizeGeometries`` (``core/alg/gdalrasterize.cpp:722``,
options ``MERGE_ALG=REPLACE/ADD`` at ``:540-580``) as a DataFrame program
(SURVEY.md §2.9 "raster↔vector round trip"):

1. **Tile cover**: each geometry envelope maps to the pixel-grid tiles it
   intersects (pandas UDF over the small polygon side, exploded).
2. **Broadcast equi-join** of cover keys with the geometry payload — the big
   side (the tile grid) never shuffles; Catalyst broadcasts the dim.
3. **groupBy(tile) + applyInPandas**: each output tile burns its geometries
   with the even-odd pixel-center scanline fill (kernels.scanline, the exact
   rule of ``core/alg/llrasterize.cpp:92-246``), in ascending fid order
   (deterministic stand-in for the reference's layer feature order).

At scale the tile grid is the partitioning: skewed geometry (one huge
polygon covering many tiles) fans out as many (tile, fid) rows and AQE
balances the groupBy; no tile ever needs more than its own geometries.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.kernels import scanline as S
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA


@dataclass(frozen=True)
class GridSpec:
    """Target pixel grid: 6-coeff geotransform + size + tile size.

    North-up only (gt2 == gt4 == 0), like the vast majority of rasterize
    targets; pixel (0,0) is the top-left corner
    (``core/alg/gdaltransformer.cpp:3761``).
    """

    gt: tuple[float, float, float, float, float, float]
    width: int
    height: int
    tile: int = 64

    def world_to_px(self, x: np.ndarray, y: np.ndarray):
        g = self.gt
        return (x - g[0]) / g[1], (y - g[3]) / g[5]

    def n_tiles(self) -> tuple[int, int]:
        t = self.tile
        return (self.width + t - 1) // t, (self.height + t - 1) // t


def world_grid(width: int = 256, height: int = 256, tile: int = 64) -> GridSpec:
    """Whole-world EPSG:4326 grid (the standard test target)."""
    return GridSpec(
        (-180.0, 360.0 / width, 0.0, 90.0, 0.0, -180.0 / height),
        width, height, tile,
    )


def rasterize_polygons(
    polygons: DataFrame,
    grid: GridSpec,
    raster_id: str = "rasterized",
    merge_alg: str = "replace",
    background: float = 0.0,
    dtype: str = "float64",
    dense: bool = False,
    all_touched: bool = False,
    invert: bool = False,
) -> DataFrame:
    """polygons(fid long, geom_wkb binary, burn double) -> tile table.

    By default only tiles intersected by at least one geometry envelope are
    emitted (sparse output, like the reference writing into an existing
    dataset); ``dense=True`` emits every grid tile, background-filled.

    ``invert=True`` is gdal_rasterize -i (``gdal_rasterize_lib.cpp``
    bInvertRasterize): the burn value lands on every pixel NOT covered by
    any geometry; covered pixels keep the background. Implies dense output
    (the uncovered region spans the whole grid), and like the reference's
    -i it uses ONE burn value for the whole layer (the first feature's).
    """
    invert_burn = None
    if invert:
        dense = True
        # one layer-wide burn value — the first feature's (fid order),
        # like -burn; polygons is the small broadcast side, so this
        # driver lookup is O(1)
        row0 = polygons.select("burn", "fid").orderBy("fid").first()
        invert_burn = float(row0["burn"]) if row0 is not None else 1.0
    ntx, nty = grid.n_tiles()

    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in ("tile_x", "tile_y", "fid")}
            for fid, wkb in zip(b["fid"], b["geom_wkb"]):
                minx, miny, maxx, maxy = G.envelope(bytes(wkb))
                px0, py0 = grid.world_to_px(np.array([minx]), np.array([maxy]))
                px1, py1 = grid.world_to_px(np.array([maxx]), np.array([miny]))
                tx0 = max(int(np.floor(px0[0])) // grid.tile, 0)
                tx1 = min(int(np.ceil(px1[0])) // grid.tile, ntx - 1)
                ty0 = max(int(np.floor(py0[0])) // grid.tile, 0)
                ty1 = min(int(np.ceil(py1[0])) // grid.tile, nty - 1)
                for ty in range(ty0, ty1 + 1):
                    for tx in range(tx0, tx1 + 1):
                        out["tile_x"].append(tx)
                        out["tile_y"].append(ty)
                        out["fid"].append(fid)
            yield pd.DataFrame(out)

    cov = polygons.select("fid", "geom_wkb").mapInPandas(
        cover, schema="tile_x int, tile_y int, fid long"
    )
    geoms = F.broadcast(polygons.select("fid", "geom_wkb", "burn"))
    tasks = cov.join(geoms, "fid", "inner")
    if dense:
        spark = polygons.sparkSession
        keys = spark.range(ntx * nty).select(
            (F.col("id") % ntx).cast("int").alias("tile_x"),
            (F.col("id") / ntx).cast("int").alias("tile_y"),
        )
        tasks = keys.join(tasks, ["tile_x", "tile_y"], "left")

    tile = grid.tile
    gt = grid.gt
    W, H = grid.width, grid.height

    def burn_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        arr = np.full((th, tw), background, dtype=np.float64)
        for _, row in pdf.sort_values("fid").iterrows():
            if row["geom_wkb"] is None:  # dense background tile
                continue
            rings = G.polygon_rings(bytes(row["geom_wkb"]))
            px_rings = []
            for r in rings:
                px, py = grid.world_to_px(r[:, 0], r[:, 1])
                px_rings.append(np.column_stack([px - x0, py - y0]))
            burn = (background + 1.0) if invert else float(row["burn"])
            S.burn_values(arr, px_rings, burn,
                          merge_alg="replace" if invert else merge_alg,
                          all_touched=all_touched)
        if invert:
            arr = np.where(arr == background, invert_burn, background)
        tgt = (
            gt[0] + x0 * gt[1], gt[1], 0.0,
            gt[3] + y0 * gt[5], 0.0, gt[5],
        )
        return pd.DataFrame([
            dict(
                raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
                dtype=dtype, tile_w=tw, tile_h=th,
                gt0=tgt[0], gt1=tgt[1], gt2=tgt[2],
                gt3=tgt[3], gt4=tgt[4], gt5=tgt[5],
                nodata=None, pixels=arr.ravel().tolist(),
            )
        ])

    return tasks.groupBy("tile_x", "tile_y").applyInPandas(
        burn_group, schema=RASTER_SCHEMA
    )


def burned_pixel_counts(tiles: DataFrame, background: float = 0.0) -> DataFrame:
    """Per-(tile, value) burned-pixel counts — JVM-side only (higher-order
    array functions), the oracle-friendly summary of a rasterize result."""
    px = F.explode("pixels").alias("v")
    return (
        tiles.select("tile_x", "tile_y", px)
        .where(F.col("v") != background)
        .groupBy("tile_x", "tile_y", F.col("v").alias("burn"))
        .agg(F.count(F.lit(1)).alias("n_pixels"))
    )


def rasterize_lines(
    lines: DataFrame,
    grid: GridSpec,
    raster_id: str = "rasterized_lines",
    merge_alg: str = "replace",
    background: float = 0.0,
    all_touched: bool = False,
) -> DataFrame:
    """lines(fid long, geom_wkb binary LineString, burn double) -> tiles.

    Reference: ``core/alg/llrasterize.cpp:277`` (GDALdllImageLine,
    Bresenham on floored endpoints) / ``:411`` (AllTouched DDA).
    """
    ntx, nty = grid.n_tiles()

    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in ("tile_x", "tile_y", "fid")}
            for fid, wkb in zip(b["fid"], b["geom_wkb"]):
                minx, miny, maxx, maxy = G.envelope(bytes(wkb))
                px0, py0 = grid.world_to_px(np.array([minx]), np.array([maxy]))
                px1, py1 = grid.world_to_px(np.array([maxx]), np.array([miny]))
                tx0 = max(int(np.floor(px0[0])) // grid.tile, 0)
                tx1 = min(int(np.ceil(px1[0])) // grid.tile, ntx - 1)
                ty0 = max(int(np.floor(py0[0])) // grid.tile, 0)
                ty1 = min(int(np.ceil(py1[0])) // grid.tile, nty - 1)
                for ty in range(ty0, ty1 + 1):
                    for tx in range(tx0, tx1 + 1):
                        out["tile_x"].append(tx)
                        out["tile_y"].append(ty)
                        out["fid"].append(fid)
            yield pd.DataFrame(out)

    cov = lines.select("fid", "geom_wkb").mapInPandas(
        cover, schema="tile_x int, tile_y int, fid long"
    )
    geoms = F.broadcast(lines.select("fid", "geom_wkb", "burn"))
    tasks = cov.join(geoms, "fid", "inner")
    tile = grid.tile
    gt = grid.gt
    W, H = grid.width, grid.height

    def burn_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        arr = np.full((th, tw), background, dtype=np.float64)
        for _, row in pdf.sort_values("fid").iterrows():
            gtype, payload = G.parse_wkb(bytes(row["geom_wkb"]))
            pts = np.asarray(payload, dtype=np.float64)
            px, py = grid.world_to_px(pts[:, 0], pts[:, 1])
            px = px - x0
            py = py - y0
            cells = [S.line_cells(px[i], py[i], px[i + 1], py[i + 1],
                                  all_touched=all_touched)
                     for i in range(len(px) - 1)]
            cells = np.vstack(cells) if cells else np.empty((0, 2), np.int64)
            ok = ((cells[:, 0] >= 0) & (cells[:, 0] < tw)
                  & (cells[:, 1] >= 0) & (cells[:, 1] < th))
            c = np.unique(cells[ok], axis=0)
            if merge_alg == "add":
                arr[c[:, 1], c[:, 0]] += float(row["burn"])
            else:
                arr[c[:, 1], c[:, 0]] = float(row["burn"])
        tgt = (gt[0] + x0 * gt[1], gt[1], 0.0,
               gt[3] + y0 * gt[5], 0.0, gt[5])
        return pd.DataFrame([dict(
            raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
            dtype="float64", tile_w=tw, tile_h=th,
            gt0=tgt[0], gt1=tgt[1], gt2=tgt[2],
            gt3=tgt[3], gt4=tgt[4], gt5=tgt[5],
            nodata=None, pixels=arr.ravel().tolist(),
        )])

    return tasks.groupBy("tile_x", "tile_y").applyInPandas(
        burn_group, schema=RASTER_SCHEMA
    )


def rasterize_points(
    points: DataFrame,
    grid: GridSpec,
    raster_id: str = "rasterized_points",
    merge_alg: str = "replace",
    background: float = 0.0,
    point_cols: tuple[str, str, str] = ("fid", "x", "y"),
    burn_col: str = "burn",
) -> DataFrame:
    """points(fid, x, y, burn) -> tiles: burn at floor(px), floor(py)
    (``llrasterize.cpp:254`` GDALdllImagePoint). Fully native cover: one
    groupBy on the computed tile key, per-tile scatter in Arrow."""
    fid, xcol, ycol = point_cols
    tile = grid.tile
    gt = grid.gt
    W, H = grid.width, grid.height
    px = F.floor((F.col(xcol) - gt[0]) / gt[1]).cast("long")
    py = F.floor((F.col(ycol) - gt[3]) / gt[5]).cast("long")
    tagged = points.select(
        F.col(fid).alias("fid"), F.col(burn_col).alias("burn"),
        px.alias("px"), py.alias("py"),
    ).where(
        (F.col("px") >= 0) & (F.col("px") < W)
        & (F.col("py") >= 0) & (F.col("py") < H)
    ).withColumn("tile_x", (F.col("px") / tile).cast("int")) \
     .withColumn("tile_y", (F.col("py") / tile).cast("int"))

    def burn_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        arr = np.full((th, tw), background, dtype=np.float64)
        pdf = pdf.sort_values("fid")
        lx = pdf["px"].to_numpy(np.int64) - x0
        ly = pdf["py"].to_numpy(np.int64) - y0
        bv = pdf["burn"].to_numpy(np.float64)
        if merge_alg == "add":
            np.add.at(arr, (ly, lx), bv)
        else:
            arr[ly, lx] = bv  # later fids win (reference feature order)
        tgt = (gt[0] + x0 * gt[1], gt[1], 0.0,
               gt[3] + y0 * gt[5], 0.0, gt[5])
        return pd.DataFrame([dict(
            raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
            dtype="float64", tile_w=tw, tile_h=th,
            gt0=tgt[0], gt1=tgt[1], gt2=tgt[2],
            gt3=tgt[3], gt4=tgt[4], gt5=tgt[5],
            nodata=None, pixels=arr.ravel().tolist(),
        )])

    return tagged.groupBy("tile_x", "tile_y").applyInPandas(
        burn_group, schema=RASTER_SCHEMA
    )
