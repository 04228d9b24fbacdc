"""Fill nodata: inverse-distance interpolation from nearby valid pixels.

Reference: ``core/alg/rasterfill.cpp:412`` (``GDALFillNodata``). The
reference scans four directional passes to find the nearest valid pixel per
direction; this re-expression interpolates each nodata pixel by IDW
(power 2) over **all** valid pixels within ``max_dist`` — same inputs, same
reach, a symmetric (direction-free) weighting, documented here as the
intentional difference. Smoothing iterations default to 0 like the CLI.

Distributed shape: each tile ships the valid pixels of its ``max_dist``-wide
border bands to the neighbor tiles they can influence (O(perimeter *
max_dist) bytes); every tile then fills its own nodata pixels from its own
valid pixels + received bands, chunk-vectorized.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.sources.rasters import RASTER_SCHEMA


def fillnodata(
    tiles: DataFrame,
    max_dist: float,
    nodata: float,
    tile: int = 64,
    out_id: str = "filled",
) -> DataFrame:
    ring = int(math.ceil(max_dist / tile))

    def bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = int(math.ceil(max_dist))
        for b in batches:
            outs = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                vals = np.asarray(r["pixels"], dtype=np.float64).reshape(th, tw)
                py, px = np.meshgrid(np.arange(th), np.arange(tw),
                                     indexing="ij")
                band = ((px < k) | (px >= tw - k) | (py < k) | (py >= th - k))
                ok = band & (vals != nodata)
                if not ok.any():
                    continue
                gx = px[ok] + int(r["tile_x"]) * tile
                gy = py[ok] + int(r["tile_y"]) * tile
                v = vals[ok]
                for dy in range(-ring, ring + 1):
                    for dx in range(-ring, ring + 1):
                        if dx == 0 and dy == 0:
                            continue
                        outs.append(pd.DataFrame({
                            "raster_id": r["raster_id"], "band": r["band"],
                            "zoom": r["zoom"],
                            "dst_x": int(r["tile_x"]) + dx,
                            "dst_y": int(r["tile_y"]) + dy,
                            "gx": gx, "gy": gy, "v": v,
                        }))
            yield (pd.concat(outs, ignore_index=True) if outs
                   else pd.DataFrame({"raster_id": [], "band": [], "zoom": [],
                                      "dst_x": [], "dst_y": [],
                                      "gx": [], "gy": [], "v": []}))

    nb = tiles.mapInPandas(
        bands,
        schema="raster_id string, band int, zoom int, dst_x int, dst_y int, "
               "gx long, gy long, v double",
    )

    CHUNK = 8192
    md2 = max_dist * max_dist

    def per_tile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # cogroup keeps the tile's pixel array on ONE row while candidate
        # points arrive as the (narrow) right frame — no array duplication.
        if left.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in RASTER_SCHEMA.split(", ")]
            )
        r = left.iloc[0]
        th, tw = int(r["tile_h"]), int(r["tile_w"])
        vals = np.asarray(r["pixels"], dtype=np.float64).reshape(th, tw)
        x0 = int(key[3]) * tile
        y0 = int(key[4]) * tile
        hole = vals == nodata
        out = vals.copy()
        if hole.any():
            hy, hx = np.nonzero(hole)
            gx = (hx + x0).astype(np.float64)
            gy = (hy + y0).astype(np.float64)
            oy, oxp = np.nonzero(~hole)
            cx = np.concatenate([(oxp + x0).astype(np.float64),
                                 right["gx"].to_numpy(np.float64)])
            cy = np.concatenate([(oy + y0).astype(np.float64),
                                 right["gy"].to_numpy(np.float64)])
            cv = np.concatenate([vals[~hole],
                                 right["v"].to_numpy(np.float64)])
            num = np.zeros(len(gx))
            den = np.zeros(len(gx))
            for c0 in range(0, len(cx), CHUNK):
                d2 = (gx[:, None] - cx[None, c0:c0 + CHUNK]) ** 2 + (
                    gy[:, None] - cy[None, c0:c0 + CHUNK]
                ) ** 2
                w = np.where(d2 <= md2, 1.0 / np.maximum(d2, 1e-300), 0.0)
                num += (w * cv[None, c0:c0 + CHUNK]).sum(axis=1)
                den += w.sum(axis=1)
            filled = np.where(den > 0, num / np.where(den == 0, 1, den),
                              nodata)
            out[hy, hx] = filled
        row = {k2: r[k2] for k2 in (
            "band", "zoom", "tile_x", "tile_y", "dtype", "tile_w", "tile_h",
            "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
        )}
        row["raster_id"] = out_id
        row["pixels"] = out.ravel().tolist()
        return pd.DataFrame([row])

    return (
        tiles.groupBy("raster_id", "band", "zoom", "tile_x", "tile_y")
        .cogroup(nb.groupBy("raster_id", "band", "zoom", "dst_x", "dst_y"))
        .applyInPandas(per_tile, schema=RASTER_SCHEMA)
    )
