"""Point-in-polygon spatial join: the engine's flagship operator.

Plan shape (SURVEY.md §7 step 3 — the Spark-first re-expression of the
reference's spatial filter + layer-algebra nested loop,
``drivers/ogrlayer.cpp:1357-1462,2062-2245``):

1. **Cell cover** of each polygon: cells intersecting the polygon envelope at
   a chosen resolution, exploded to (cell, fid) rows. The polygon layer is a
   small dimension — the cover is computed in a pandas UDF and the result is
   **broadcast**, so the big side never shuffles.
2. **Equi-join** points.cell == cover.cell (Catalyst broadcast hash join; no
   shuffle of the page table).
3. **Envelope pre-test** as a native column predicate — the cheap bbox
   shortcut of ``drivers/ogrlayer.cpp:1377-1384`` — prunes most candidates
   inside whole-stage codegen before any Python runs.
4. **Exact even-odd ray cast** in an Arrow-batched UDF (mapInPandas — no
   groupBy, so one hot polygon cannot skew a shuffle; each batch parses its
   few distinct polygons once and vectorizes over points).

At 100 TB this plan reads the page table exactly once, shuffles nothing on
the big side, and the only Python cost is the ray cast over
envelope-surviving candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.functions import geometry as G

COVER_SCHEMA = "fid long, cell long, minx double, miny double, maxx double, maxy double"


def polygon_cover(polygons: DataFrame, res: int) -> DataFrame:
    """Explode each polygon into its envelope's covering cells at ``res``.

    Input: (fid long, geom_wkb binary [, ...]). Output one row per
    (fid, cell) with the envelope attached for the bbox pre-test.
    """

    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("fid", "cell", "minx", "miny", "maxx", "maxy")}
            for fid, wkb in zip(b["fid"], b["geom_wkb"]):
                minx, miny, maxx, maxy = G.envelope(bytes(wkb))
                x0, y0 = C.lonlat_to_tile(np.array([minx]), np.array([maxy]), res)
                x1, y1 = C.lonlat_to_tile(np.array([maxx]), np.array([miny]), res)
                # 1-cell margin: tolerates points whose cell key came from a
                # 1-ulp-different libm (cells.cell_expr); extra candidates
                # are discarded by the envelope pre-test anyway.
                n = np.int64(1) << res
                xs = np.arange(max(int(x0[0]) - 1, 0),
                               min(int(x1[0]) + 1, int(n) - 1) + 1, dtype=np.int64)
                ys = np.arange(max(int(y0[0]) - 1, 0),
                               min(int(y1[0]) + 1, int(n) - 1) + 1, dtype=np.int64)
                gx, gy = np.meshgrid(xs, ys)
                cs = C.pack_cell(res, gx.ravel(), gy.ravel())
                k = len(cs)
                out["fid"].extend([fid] * k)
                out["cell"].extend(cs.tolist())
                out["minx"].extend([minx] * k)
                out["miny"].extend([miny] * k)
                out["maxx"].extend([maxx] * k)
                out["maxy"].extend([maxy] * k)
            yield pd.DataFrame(out)

    return polygons.select("fid", "geom_wkb").mapInPandas(cover, schema=COVER_SCHEMA)


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    points_res: int = 12,
    point_cols: tuple[str, str, str] = ("url", "lon", "lat"),
    cell_col: str = "cell",
) -> DataFrame:
    """Join points to containing polygons -> (point key, fid).

    ``points`` must carry (key, lon, lat, cell@points_res) with
    ``points_res >= res`` — coarser cover cells are derived via the quadtree
    parent bit-shift, entirely in native Spark expressions. ``polygons`` is
    (fid, geom_wkb, ...), small enough to broadcast.
    """
    key, lon, lat = point_cols
    cover = F.broadcast(polygon_cover(polygons, res))
    wkb_by_fid = F.broadcast(polygons.select("fid", "geom_wkb"))

    pts = points.where(F.col(cell_col).isNotNull())
    pts = pts.withColumn(
        "__cover_cell", _cell_parent_col(F.col(cell_col), points_res, res)
    )

    cand = pts.join(cover, pts["__cover_cell"] == cover["cell"], "inner")
    # Envelope pre-test in native Spark (whole-stage codegen), before Python.
    cand = cand.where(
        (F.col(lon) >= F.col("minx"))
        & (F.col(lon) <= F.col("maxx"))
        & (F.col(lat) >= F.col("miny"))
        & (F.col(lat) <= F.col("maxy"))
    ).select(key, lon, lat, "fid")
    cand = cand.join(wkb_by_fid, "fid", "inner")

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[int, list[np.ndarray]] = {}
        for b in batches:
            if not len(b):
                continue
            keep = np.zeros(len(b), dtype=bool)
            px = b[lon].to_numpy(dtype=np.float64)
            py = b[lat].to_numpy(dtype=np.float64)
            fids = b["fid"].to_numpy()
            for fid in np.unique(fids):
                if fid not in ring_cache:
                    wkb = bytes(b["geom_wkb"][b["fid"] == fid].iloc[0])
                    ring_cache[fid] = G.polygon_rings(wkb)
                sel = fids == fid
                keep[sel] = G.points_in_rings(px[sel], py[sel], ring_cache[fid])
            yield pd.DataFrame({key: b[key][keep], "fid": b["fid"][keep]})

    return cand.mapInPandas(exact, schema=f"{key} string, fid long")


def _cell_parent_col(cell: F.Column, child_res: int, parent_res: int) -> F.Column:
    """cell_parent as a native Spark expression (no Python).

    Mirrors ``functions.cells.cell_parent`` bit math: res in bits 58+, x in
    bits 29..57, y in bits 0..28; parent x/y drop ``child_res - parent_res``
    low bits. Constant shifts keep this inside whole-stage codegen.
    """
    shift = child_res - parent_res
    if shift < 0:
        raise ValueError("points_res must be >= cover res")
    x = F.shiftrightunsigned(cell, 29).bitwiseAND(F.lit((1 << 29) - 1))
    y = cell.bitwiseAND(F.lit((1 << 29) - 1))
    px = F.shiftrightunsigned(x, shift)
    py = F.shiftrightunsigned(y, shift)
    return (
        F.lit(parent_res << 58).cast("long")
        + px * F.lit(1 << 29).cast("long")
        + py
    )
