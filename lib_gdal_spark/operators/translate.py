"""Translate / windowed read / point query / mosaic over the tile table.

- ``translate_window``: ``gdal_translate -srcwin/-outsize`` (reference
  ``apps/gdal_translate_lib.cpp:530``; decimation semantics of
  ``core/gcore/rasterio.cpp:68``): tile-key predicate selects only the
  intersecting tiles (partition pruning at the scan), slices are assembled
  per *output* tile and resampled with the overview kernels.
- ``location_info``: ``gdallocationinfo`` — world coord -> geotransform
  inverse -> tile-key equi-join -> pixel lookup, all as one broadcast join.
- ``mosaic``: ``gdalbuildvrt`` compositing — nodata-aware "last source
  wins" per pixel across rasters sharing a tile grid (reference order =
  ascending raster_id here, like the VRT's source order).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.kernels import resample as R
from lib_gdal_spark.sources.rasters import RASTER_COLS, RASTER_SCHEMA


def projwin_to_srcwin(
    gt: tuple[float, float, float, float, float, float],
    projwin: tuple[float, float, float, float],
) -> tuple[int, int, int, int]:
    """gdal_translate -projwin (ulx uly lrx lry, world units) -> pixel
    srcwin, the reference's exact conversion (``gdal_translate_lib.cpp``:
    offsets ``floor(+0.001)``, sizes ``floor(+0.5)`` of the window span —
    the 0.001-pixel epsilon forgives coordinates that sit on cell edges).
    North-up geotransforms only, like the reference's -projwin path."""
    ulx, uly, lrx, lry = projwin
    xoff = int(math.floor((ulx - gt[0]) / gt[1] + 0.001))
    yoff = int(math.floor((uly - gt[3]) / gt[5] + 0.001))
    xsize = int(math.floor((lrx - ulx) / gt[1] + 0.5))
    ysize = int(math.floor((lry - uly) / gt[5] + 0.5))
    return xoff, yoff, xsize, ysize


def translate_projwin(
    tiles: DataFrame,
    raster_id: str,
    projwin: tuple[float, float, float, float],
    gt: tuple[float, float, float, float, float, float],
    **kw,
) -> DataFrame:
    """gdal_translate -projwin: world-coordinate window -> the pixel-window
    translate path (tile-range pruning included)."""
    return translate_window(tiles, raster_id,
                            projwin_to_srcwin(gt, projwin), **kw)


def translate_window(
    tiles: DataFrame,
    raster_id: str,
    srcwin: tuple[int, int, int, int],
    outsize: tuple[int, int] | None = None,
    alg: str = "nearest",
    tile: int = 64,
    out_id: str = "translated",
) -> DataFrame:
    """Window (xoff, yoff, xsize, ysize) + optional decimation -> tile table.

    The tile-key range predicate is a native filter, so Catalyst prunes
    non-intersecting tiles at the scan (the Spark form of the reference's
    windowed block loop).
    """
    xoff, yoff, xs, ys = srcwin
    ow, oh = outsize or (xs, ys)
    if xs * ys > 256 * 1024 * 1024:
        # the window is assembled in ONE task by design (a windowed read
        # IS one output window); don't let that become a silent OOM
        raise ValueError(
            f"translate_window assembles the {xs}x{ys} source window in "
            f"one task ({xs * ys} px > 268M cap); split the request into "
            f"smaller windows or keep data in the tile table"
        )
    tx0, tx1 = xoff // tile, (xoff + xs - 1) // tile
    ty0, ty1 = yoff // tile, (yoff + ys - 1) // tile

    sel = tiles.where(
        (F.col("raster_id") == raster_id)
        & F.col("tile_x").between(tx0, tx1)
        & F.col("tile_y").between(ty0, ty1)
    )

    def cut(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(key[1])
        window = np.full((ys, xs), np.nan)
        gt = None
        # The nominal `tile` parameter is the global stride; per-tile w/h may
        # be smaller on ragged edges, so never derive the stride from the
        # selected tiles (a window of edge-only tiles would misplace pixels).
        for _, r in pdf.iterrows():
            arr = np.asarray(r["pixels"], dtype=np.float64).reshape(
                int(r["tile_h"]), int(r["tile_w"])
            )
            gy0 = int(r["tile_y"]) * tile - yoff
            gx0 = int(r["tile_x"]) * tile - xoff
            sy0, sx0 = max(0, -gy0), max(0, -gx0)
            dy0, dx0 = max(0, gy0), max(0, gx0)
            sy1 = min(arr.shape[0], ys - gy0)
            sx1 = min(arr.shape[1], xs - gx0)
            if sy1 <= sy0 or sx1 <= sx0:
                continue
            window[dy0 : dy0 + (sy1 - sy0), dx0 : dx0 + (sx1 - sx0)] = arr[
                sy0:sy1, sx0:sx1
            ]
            if gt is None:
                # derive the raster origin from ANY present tile (sparse
                # rasters may not contain (tx0, ty0))
                g = [r[f"gt{i}"] for i in range(6)]
                og0 = g[0] - int(r["tile_x"]) * tile * g[1]
                og3 = g[3] - int(r["tile_y"]) * tile * g[5]
                gt = (
                    og0 + xoff * g[1], g[1] * xs / ow, 0.0,
                    og3 + yoff * g[5], 0.0, g[5] * ys / oh,
                )
        if gt is None:
            return pd.DataFrame(columns=RASTER_COLS)
        if (ow, oh) != (xs, ys):
            # gdal_translate -r: the resampled-read path (GRIORA_*,
            # core/gcore/rasterio.cpp:821, gdal.h:130-138) — the same
            # kernel family as the overview builder.
            if alg == "average":
                window = R.overview_average(window, (oh, ow))
            elif alg in ("cubic", "cubicspline", "lanczos", "bilinear"):
                window = R.overview_convolution(window, (oh, ow), alg=alg)
            elif alg == "gauss":
                window = R.overview_gauss(window, (oh, ow))
            elif alg == "mode":
                window = R.overview_mode(window, (oh, ow))
            elif alg == "nearest":
                window = R.overview_nearest(window, (oh, ow))
            else:
                raise ValueError(f"translate: unknown resampling {alg!r}")
        rows = []
        for ty in range(0, (oh + tile - 1) // tile):
            for tx in range(0, (ow + tile - 1) // tile):
                patch = window[ty * tile : (ty + 1) * tile,
                               tx * tile : (tx + 1) * tile]
                rows.append(dict(
                    raster_id=out_id, band=band, zoom=0, tile_x=tx, tile_y=ty,
                    dtype="float64", tile_w=patch.shape[1], tile_h=patch.shape[0],
                    gt0=gt[0] + tx * tile * gt[1], gt1=gt[1], gt2=0.0,
                    gt3=gt[3] + ty * tile * gt[5], gt4=0.0, gt5=gt[5],
                    nodata=None, pixels=patch.ravel().tolist(),
                ))
        return pd.DataFrame(rows)

    return sel.groupBy("raster_id", "band").applyInPandas(
        cut, schema=RASTER_SCHEMA
    )


def location_info(
    tiles: DataFrame,
    queries: DataFrame,
    tile: int = 64,
    query_cols: tuple[str, str, str] = ("qid", "x", "y"),
) -> DataFrame:
    """World-coordinate point query (gdallocationinfo).

    ``queries(qid, x, y)`` (small, broadcast) joins the tile table on the
    computed tile key; the pixel lookup runs inside the matched tile only.
    Output: (qid, raster_id, band, px, py, value).
    """
    qid, qx, qy = query_cols

    def locate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"qid": [], "raster_id": [], "band": [],
                   "px": [], "py": [], "value": []}
            for _, r in b.iterrows():
                arr = np.asarray(r["pixels"], dtype=np.float64).reshape(
                    int(r["tile_h"]), int(r["tile_w"])
                )
                gt = [r[f"gt{i}"] for i in range(6)]
                inv = R.gt_invert(gt)
                sx, sy = R.gt_apply(inv, np.array([r[qx]]), np.array([r[qy]]))
                ix, iy = int(np.floor(sx[0])), int(np.floor(sy[0]))
                if 0 <= ix < arr.shape[1] and 0 <= iy < arr.shape[0]:
                    out["qid"].append(r[qid])
                    out["raster_id"].append(r["raster_id"])
                    out["band"].append(int(r["band"]))
                    out["px"].append(int(r["tile_x"]) * tile + ix)
                    out["py"].append(int(r["tile_y"]) * tile + iy)
                    out["value"].append(arr[iy, ix])
            yield pd.DataFrame(out)

    joined = tiles.join(F.broadcast(queries), how="cross")
    # native prefilter: the query point must fall inside the tile's bbox
    within = (
        (F.col(qx) >= F.col("gt0"))
        & (F.col(qx) < F.col("gt0") + F.col("tile_w") * F.col("gt1"))
        & (F.col(qy) <= F.col("gt3"))
        & (F.col(qy) > F.col("gt3") + F.col("tile_h") * F.col("gt5"))
    )
    cols = [qid, qx, qy, "raster_id", "band", "tile_x", "tile_y",
            "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
            "pixels"]
    return joined.where(within).select(*cols).mapInPandas(
        locate,
        schema="qid long, raster_id string, band int, px long, py long, value double",
    )


def mosaic(
    tiles: DataFrame,
    raster_ids: list[str],
    out_id: str = "mosaic",
    nodata: float | None = None,
) -> DataFrame:
    """Compose rasters on a shared tile grid: later sources overwrite
    earlier ones except where nodata (gdalbuildvrt semantics)."""
    order = {rid: i for i, rid in enumerate(raster_ids)}
    sel = tiles.where(F.col("raster_id").isin(raster_ids))

    def compose(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, tx, ty = int(key[0]), int(key[1]), int(key[2])
        pdf = pdf.sort_values("raster_id", key=lambda s: s.map(order))
        out = None
        base = None
        for _, r in pdf.iterrows():
            arr = np.asarray(r["pixels"], dtype=np.float64).reshape(
                int(r["tile_h"]), int(r["tile_w"])
            )
            if out is None:
                out = np.full_like(arr, np.nan if nodata is None else nodata)
                base = r
            mask = ~np.isnan(arr) if nodata is None else (arr != nodata)
            out[mask] = arr[mask]
        row = {k: base[k] for k in (
            "band", "zoom", "tile_x", "tile_y", "dtype", "tile_w", "tile_h",
            "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
        )}
        row.update(raster_id=out_id, nodata=nodata, pixels=out.ravel().tolist())
        return pd.DataFrame([row])

    return sel.groupBy("band", "tile_x", "tile_y").applyInPandas(
        compose, schema=RASTER_SCHEMA
    )


def select_overview_level(available_ratios: list[int], xsize: int,
                          out_w: int) -> int:
    """GDALBandGetBestOverviewLevel2 (``core/gcore/rasterio.cpp:254``):
    pick the coarsest overview whose decimation does not exceed the
    requested ratio with the reference's 1.2 oversampling slack.

    ``available_ratios``: e.g. [1, 2, 4, 8] (2^zoom of the pyramid).
    Returns the chosen ratio (1 = base level).
    """
    if out_w <= 0:
        raise ValueError("out_w must be positive")
    desired = xsize / out_w
    best = 1
    for r in sorted(available_ratios):
        if r <= desired * 1.2:
            best = r
        else:
            break
    return best


def translate_window_auto(
    tiles: DataFrame,
    raster_id: str,
    srcwin: tuple[int, int, int, int],
    outsize: tuple[int, int],
    alg: str = "nearest",
    tile: int = 64,
    out_id: str = "translated",
) -> DataFrame:
    """translate_window with automatic overview-level selection: reads the
    pyramid level whose resolution best matches the requested decimation
    (the RasterIO fast path every GDAL reader gets for free), then applies
    the residual resampling. The window coordinates are given at BASE
    resolution."""
    zooms = [
        int(r["zoom"]) for r in
        tiles.where(F.col("raster_id") == raster_id)
        .select("zoom").distinct().collect()
    ]
    ratios = sorted(2 ** z for z in zooms)
    xoff, yoff, xs, ys = srcwin
    ow, oh = outsize
    ratio = select_overview_level(ratios, xs, ow)
    zoom = ratio.bit_length() - 1
    lvl = tiles.where(F.col("zoom") == zoom)
    win = (xoff // ratio, yoff // ratio,
           max(xs // ratio, 1), max(ys // ratio, 1))
    return translate_window(lvl, raster_id, win, (ow, oh), alg=alg,
                            tile=tile, out_id=out_id)


def tile_index(
    tiles: DataFrame,
    out_col: str = "geom_wkb",
) -> DataFrame:
    """gdaltindex (``apps/gdaltindex.cpp:4``): one footprint-polygon row per
    raster — (raster_id, band, zoom, minx, miny, maxx, maxy, geom_wkb).

    A pure JVM aggregate over the tile table: each tile's world bbox is
    column math on its geotransform, min/max per raster, the footprint
    box ring serialized in one tiny Arrow pass.
    """
    x0 = F.col("gt0")
    x1 = F.col("gt0") + F.col("tile_w") * F.col("gt1")
    y0 = F.col("gt3") + F.col("tile_h") * F.col("gt5")
    y1 = F.col("gt3")
    ext = tiles.select(
        "raster_id", "band", "zoom",
        F.least(x0, x1).alias("bx0"), F.greatest(x0, x1).alias("bx1"),
        F.least(y0, y1).alias("by0"), F.greatest(y0, y1).alias("by1"),
    ).groupBy("raster_id", "band", "zoom").agg(
        F.min("bx0").alias("minx"), F.min("by0").alias("miny"),
        F.max("bx1").alias("maxx"), F.max("by1").alias("maxy"),
    )

    def mk_wkb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lib_gdal_spark.functions import geometry as G
        for b in batches:
            b = b.copy()
            b["geom_wkb"] = [
                bytearray(G.wkb_polygon([G.box_ring(r.minx, r.miny,
                                                    r.maxx, r.maxy)]))
                for r in b.itertuples()
            ]
            yield b

    return ext.mapInPandas(
        mk_wkb,
        schema="raster_id string, band int, zoom int, minx double, "
               "miny double, maxx double, maxy double, geom_wkb binary",
    )


def translate_scale(
    tiles: DataFrame,
    src_min: float,
    src_max: float,
    dst_min: float = 0.0,
    dst_max: float = 255.0,
    exponent: float | None = None,
    out_dtype: str | None = None,
    out_id: str = "scaled",
) -> DataFrame:
    """gdal_translate -scale [-exponent] (``apps/gdal_translate_lib.cpp``
    scale params): linear (or power-law) rescale of pixel values, clipped
    to the dst range — pure JVM higher-order array math, no Python.

    linear:   out = (v - src_min) / (src_max - src_min) * dst_range + dst_min
    exponent: out = ((v - src_min) / src_range) ** exponent * dst_range
              + dst_min   (the -exponent non-linear variant)
    """
    src_range = src_max - src_min
    dst_range = dst_max - dst_min

    def scale_one(v):
        t = (v - src_min) / src_range
        t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
        if exponent is not None:
            t = F.pow(t, F.lit(float(exponent)))
        out = t * dst_range + dst_min
        if out_dtype and out_dtype not in ("float32", "float64"):
            out = F.floor(out + 0.5)
        return out

    return tiles.select(
        F.lit(out_id).alias("raster_id"), "band", "zoom", "tile_x",
        "tile_y",
        F.lit(out_dtype or "float64").alias("dtype"),
        "tile_w", "tile_h",
        "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
        F.transform("pixels", scale_one).alias("pixels"),
    )
