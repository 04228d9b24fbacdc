"""Vertical datum shift + mask flattening over tiled rasters.

Spark-first re-expression of two reference utilities:

* ``apply_vertical_shift_grid`` — ``core/alg/gdalapplyverticalshiftgrid.cpp``
  (formula at :268-298): ``out = (src*srcUnitToMeter ± grid)/dstUnitToMeter``
  with the shift grid resampled *bilinearly* onto the source raster's own
  pixel grid and source nodata passed through untouched.  Shift grids
  (geoid models) are small by construction, so the grid side is gathered
  once (guarded) and shipped to every executor in the task closure —
  the DEM side is the 100-TB side and streams through ``mapInPandas``
  one Arrow batch at a time.  No shuffle at all.

* ``flatten_mask`` — ``apps/gdalflattenmask.c`` (:263-295): burn the mask
  band into the data band (mask==0 → nodata; with an alpha-style mask the
  threshold is ``<128``).  Pure JVM ``zip_with`` over the two pixel
  arrays after a co-located equi-join on the tile key — broadcastable
  when the mask raster is small, shuffle-free when both sides share a
  bucketing on the tile key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.sources.rasters import RASTER_COLS

_MAX_GRID_CELLS = 32 * 1024 * 1024  # gather guard: geoid grids are ~MBs


def _assemble_grid(grid_tiles: DataFrame, tile: int = 64):
    """Gather the (small) shift grid into one array + geotransform.

    Guarded the same way the repo's other driver-sized gathers are
    (graph.py, grid.py): refuse loudly past ``_MAX_GRID_CELLS`` instead
    of silently OOMing an executor at scale.
    """
    n_cells = grid_tiles.agg(
        F.sum(F.col("tile_w").cast("long") * F.col("tile_h"))
    ).collect()[0][0]
    if n_cells is None:
        raise ValueError("vertical shift grid is empty")
    if n_cells > _MAX_GRID_CELLS:
        raise ValueError(
            f"shift grid has {n_cells} cells > {_MAX_GRID_CELLS}; "
            "vertical shift grids are expected to be broadcast-sized"
        )
    rows = grid_tiles.select(*RASTER_COLS).collect()
    max_tx = max(r.tile_x for r in rows)
    max_ty = max(r.tile_y for r in rows)
    w = tile * max_tx + next(r.tile_w for r in rows if r.tile_x == max_tx)
    h = tile * max_ty + next(r.tile_h for r in rows if r.tile_y == max_ty)
    grid = np.full((h, w), np.inf)
    gt = None
    for r in rows:
        arr = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        grid[r.tile_y * tile : r.tile_y * tile + r.tile_h,
             r.tile_x * tile : r.tile_x * tile + r.tile_w] = arr
        if r.tile_x == 0 and r.tile_y == 0:
            gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
    if gt is None:
        raise ValueError("shift grid has no (0,0) anchor tile")
    return grid, gt


def _bilinear_sample(grid: np.ndarray, gx: np.ndarray, gy: np.ndarray):
    """Edge-clamped bilinear sample at fractional pixel coords (centers)."""
    h, w = grid.shape
    x0 = np.clip(np.floor(gx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(gy).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(gx - x0, 0.0, 1.0)
    fy = np.clip(gy - y0, 0.0, 1.0)
    v00 = grid[y0, x0]
    v10 = grid[y0, x1]
    v01 = grid[y1, x0]
    v11 = grid[y1, x1]
    top = v00 + (v10 - v00) * fx
    bot = v01 + (v11 - v01) * fx
    return top + (bot - top) * fy


def apply_vertical_shift_grid(
    src_tiles: DataFrame,
    grid_tiles: DataFrame,
    inverse: bool = False,
    src_unit_to_meter: float = 1.0,
    dst_unit_to_meter: float = 1.0,
    tile: int = 64,
) -> DataFrame:
    """``gdalapplyverticalshiftgrid``: shift a DEM by a (bilinear-sampled)
    vertical datum grid.

    out = (src*srcUnit - grid)/dstUnit if ``inverse`` else
          (src*srcUnit + grid)/dstUnit     — nodata pixels untouched
    (``core/alg/gdalapplyverticalshiftgrid.cpp:284-295``).

    Sampling outside the grid extent raises (the reference errors on a
    missing grid value — the assembled grid is Inf-filled where absent).
    """
    grid, ggt = _assemble_grid(grid_tiles, tile=tile)
    if abs(ggt[2]) > 1e-12 or abs(ggt[4]) > 1e-12:
        raise ValueError("rotated shift-grid geotransforms unsupported")
    sign = -1.0 if inverse else 1.0
    su, du = float(src_unit_to_meter), float(dst_unit_to_meter)
    schema = src_tiles.select(*RASTER_COLS).schema

    def shift(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for r in pdf.itertuples(index=False):
                arr = np.asarray(r.pixels, dtype=np.float64).reshape(
                    r.tile_h, r.tile_w)
                jj, ii = np.meshgrid(
                    np.arange(r.tile_h), np.arange(r.tile_w), indexing="ij")
                # world coords of source pixel centers
                X = r.gt0 + (ii + 0.5) * r.gt1 + (jj + 0.5) * r.gt2
                Y = r.gt3 + (ii + 0.5) * r.gt4 + (jj + 0.5) * r.gt5
                # fractional grid pixel coords (center-aligned)
                gx = (X - ggt[0]) / ggt[1] - 0.5
                gy = (Y - ggt[3]) / ggt[5] - 0.5
                g = _bilinear_sample(grid, gx, gy)
                gh, gw = grid.shape
                outside = ((gx < -0.5) | (gx > gw - 0.5)
                           | (gy < -0.5) | (gy > gh - 0.5))
                valid = np.ones_like(arr, dtype=bool)
                if r.nodata is not None and not np.isnan(r.nodata):
                    valid = arr != r.nodata
                if (np.isinf(g[valid]) | outside[valid]).any():
                    raise ValueError(
                        "missing vertical grid value inside source extent")
                out = arr.copy()
                out[valid] = (arr[valid] * su + sign * g[valid]) / du
                out_px.append(out.ravel())
            pdf = pdf.copy()
            pdf["pixels"] = out_px
            yield pdf[[f.name for f in schema.fields]]

    return src_tiles.select(*RASTER_COLS).mapInPandas(shift, schema=schema)


def flatten_mask(
    tiles: DataFrame,
    mask_tiles: DataFrame,
    nodata: float,
    alpha_threshold: int | None = None,
) -> DataFrame:
    """``gdalflattenmask``: replace pixels whose mask is 0 (or, for
    alpha-style masks, ``< alpha_threshold``) with ``nodata``
    (``apps/gdalflattenmask.c:275-295``).

    JVM-only: equi-join on the tile key + ``zip_with`` over the two
    pixel arrays — no Python, no row explosion.  The mask side is
    broadcast when small; co-partitioned tile tables join shuffle-free.
    """
    key = ["raster_id", "zoom", "tile_x", "tile_y"]
    m = mask_tiles.select(
        *key, F.col("pixels").alias("mask_pixels"))
    thr = float(alpha_threshold if alpha_threshold is not None else 1)
    joined = tiles.join(m, on=key, how="inner")
    out_pixels = F.zip_with(
        "pixels", "mask_pixels",
        lambda v, mk: F.when(mk < F.lit(thr), F.lit(float(nodata)))
                       .otherwise(v),
    )
    return joined.select(
        *[c for c in RASTER_COLS if c not in ("pixels", "nodata")],
        F.lit(float(nodata)).alias("nodata"),
        out_pixels.alias("pixels"),
    ).select(*RASTER_COLS)
