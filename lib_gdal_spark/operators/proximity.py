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
from pyspark.sql import DataFrame
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
