"""Dataset reporting + raster->vector export operators.

Covers the last four reference command-line apps without an engine analog:

- ``apps/gdalinfo_lib.cpp`` — dataset report: size, geotransform, corner
  coordinates (UL/LR from the affine transform), per-band statistics
  (``GDALInfoReportCorner`` at :140, stats block around :1100).
- ``apps/gdal2ogr.c`` — raster values -> OGR feature layer: one POINT per
  sampled pixel at the cell *center* ``(j + .5, i + .5)`` through the
  geotransform with the pixel value as z / attribute, a ``-step`` stride,
  and a POLYGON mode emitting the pixel box ``(j,i)..(j+1,i+1)``
  (main loop at gdal2ogr.c:269-316).
- ``apps/dumpoverviews.cpp`` — materialize every overview level of a band
  as its own raster.
- ``apps/ogrinfo.cpp`` — layer summary (``-so``): feature count, extent,
  geometry type tally.

Scale shape: everything here is either a metadata-sized catalog aggregate
(map-side combinable ``groupBy`` over tile headers — no pixel shuffle), a
JVM-side ``posexplode`` projection (gdal2ogr: no Python in the hot path,
output is streamed straight to the sink), or one Arrow-batched envelope
pass (ogrinfo). Nothing gathers a raster into one task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tile_grid_size(tiles: DataFrame) -> DataFrame:
    """Per (raster_id, band, zoom): full-raster width/height in pixels.

    Interior tiles are full-size, edge tiles keep their true size
    (``sources/rasters.py:tiles_from_array``), so with T = max(tile_w):
    ``width = max(tile_x * T + tile_w)`` — a pure tile-header aggregate.
    """
    t = tiles.groupBy("raster_id", "band", "zoom").agg(
        F.max("tile_w").alias("tw"), F.max("tile_h").alias("th")
    )
    j = tiles.join(F.broadcast(t), ["raster_id", "band", "zoom"])
    return j.groupBy("raster_id", "band", "zoom").agg(
        F.max(F.col("tile_x") * F.col("tw") + F.col("tile_w")).alias("width"),
        F.max(F.col("tile_y") * F.col("th") + F.col("tile_h")).alias("height"),
        F.max("tw").alias("tw"),
        F.max("th").alias("th"),
    )


def raster_info(tiles: DataFrame, ndigits: int = 6) -> DataFrame:
    """gdalinfo report as a table: one row per (raster_id, band, zoom).

    Columns mirror the text report (``apps/gdalinfo_lib.cpp``): ``Size is
    W, H``; ``Origin`` / corner coordinates UL and LR driven through the
    affine geotransform (``GDALInfoReportCorner`` gdalinfo_lib.cpp:1440:
    ``x = gt0 + px*gt1 + py*gt2``); band min/max/mean/stddev with GDAL's
    population stddev (``gdalrasterband.cpp:3821`` ComputeStatistics).

    Two metadata aggregates + one JVM pixel-moment pass — no shuffle of
    pixel data, safe at any raster count.
    """
    from lib_gdal_spark.operators.stats import band_statistics

    size = _tile_grid_size(tiles)
    # UL corner = geotransform of tile (0,0); min() collapses the
    # single matching row per group without a second scan.
    ul = tiles.groupBy("raster_id", "band", "zoom").agg(
        *[
            F.min(
                F.when((F.col("tile_x") == 0) & (F.col("tile_y") == 0), F.col(c))
            ).alias(c)
            for c in ("gt0", "gt1", "gt2", "gt3", "gt4", "gt5")
        ]
    )
    stats = band_statistics(tiles)
    out = (
        size.join(ul, ["raster_id", "band", "zoom"])
        .join(stats, ["raster_id", "band", "zoom"])
    )
    lrx = F.col("gt0") + F.col("width") * F.col("gt1") + F.col("height") * F.col("gt2")
    lry = F.col("gt3") + F.col("width") * F.col("gt4") + F.col("height") * F.col("gt5")
    return out.select(
        "raster_id", "band", "zoom", "width", "height",
        F.col("gt0").alias("ulx"), F.col("gt3").alias("uly"),
        lrx.alias("lrx"), lry.alias("lry"),
        "n", F.col("min").alias("vmin"), F.col("max").alias("vmax"),
        F.round("mean", ndigits).alias("mean"),
        F.round("stddev", ndigits).alias("stddev"),
    )


def raster_to_points(
    tiles: DataFrame,
    band: int = 1,
    step: int = 1,
    polygon: bool = False,
) -> DataFrame:
    """gdal2ogr: one feature per sampled pixel (``apps/gdal2ogr.c:269``).

    POINT25D mode (default): ``x = gt(j + .5, i + .5)`` pixel-center
    coordinates, ``z`` = pixel value (gdal2ogr.c:284). ``step`` strides
    both axes on *global* pixel indices (gdal2ogr.c loop increments).
    ``polygon=True`` emits the pixel box corners ``(j,i)..(j+1,i+1)``
    (gdal2ogr.c:305-310) as a WKB polygon built in one Arrow pass.

    The point path is a pure JVM posexplode + column math projection —
    per-tile geotransforms already carry the tile origin, so no join and
    no shuffle; output order is (fid) = global row-major pixel index.
    """
    size = _tile_grid_size(tiles)
    t = tiles.where(F.col("band") == band).join(
        F.broadcast(size.select("raster_id", "band", "zoom", "tw", "th", "width")),
        ["raster_id", "band", "zoom"],
    )
    e = t.select(
        "raster_id", "band", "zoom", "tile_x", "tile_y", "tile_w",
        "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "tw", "th", "width",
        F.posexplode("pixels").alias("i", "v"),
    )
    px = F.col("i") % F.col("tile_w")
    py = (F.col("i") / F.col("tile_w")).cast("int")
    gpx = F.col("tile_x") * F.col("tw") + px
    gpy = F.col("tile_y") * F.col("th") + py
    e = e.select(
        "raster_id",
        (gpy * F.col("width") + gpx).alias("fid"),
        gpx.alias("gpx"), gpy.alias("gpy"),
        px.alias("px"), py.alias("py"),
        "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "v",
    )
    if step > 1:
        e = e.where((F.col("gpx") % step == 0) & (F.col("gpy") % step == 0))
    if not polygon:
        cx = F.col("px") + 0.5
        cy = F.col("py") + 0.5
        return e.select(
            "raster_id", "fid",
            (F.col("gt0") + cx * F.col("gt1") + cy * F.col("gt2")).alias("x"),
            (F.col("gt3") + cx * F.col("gt4") + cy * F.col("gt5")).alias("y"),
            F.col("v").alias("z"),
        )

    sel = e.select("raster_id", "fid", "px", "py",
                   "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "v")

    def boxes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lib_gdal_spark.functions import geometry as G

        for b in batches:
            if len(b) == 0:
                continue
            wkbs = []
            for px_, py_, g0, g1, g2, g3, g4, g5 in zip(
                b["px"], b["py"], b["gt0"], b["gt1"], b["gt2"],
                b["gt3"], b["gt4"], b["gt5"]
            ):
                # corner order matches gdal2ogr.c:305-310
                corners = [(px_, py_), (px_ + 1, py_),
                           (px_ + 1, py_ + 1), (px_, py_ + 1), (px_, py_)]
                ring = np.array(
                    [
                        (g0 + j * g1 + i * g2, g3 + j * g4 + i * g5)
                        for j, i in corners
                    ],
                    dtype=np.float64,
                )
                wkbs.append(G.wkb_polygon([ring]))
            yield pd.DataFrame(
                {
                    "raster_id": b["raster_id"],
                    "fid": b["fid"],
                    "geom_wkb": wkbs,
                    "value": b["v"],
                }
            )

    return sel.mapInPandas(
        boxes, schema="raster_id string, fid long, geom_wkb binary, value double"
    )


def dump_overviews(
    tiles: DataFrame,
    levels: int,
    alg: str = "average",
    tile: int = 64,
) -> DataFrame:
    """dumpoverviews: materialize levels 0..``levels`` of the pyramid
    (``apps/dumpoverviews.cpp`` — each overview band extracted as its own
    raster). Level k is the overview cascade applied k times (gdaladdo's
    successive-level build), tagged in the ``level`` column.

    Each level halves per the reference overview kernel
    (``core/gcore/overview.cpp``) via :func:`pyramid_level` — the
    children->parent groupBy shape, never a whole-raster gather.
    """
    from lib_gdal_spark.operators.raster import pyramid_level

    size = (
        _tile_grid_size(tiles)
        .groupBy()
        .agg(F.max("width").alias("w0"), F.max("height").alias("h0"))
        .collect()[0]  # metadata-sized: one row
    )
    w, h = int(size["w0"]), int(size["h0"])
    out = tiles.withColumn("level", F.lit(0))
    cur = tiles
    for k in range(1, levels + 1):
        w, h = (w + 1) // 2, (h + 1) // 2  # GDAL overview size rule
        cur = _crop_to_extent(pyramid_level(cur, alg=alg, tile=tile), w, h)
        out = out.unionByName(cur.withColumn("level", F.lit(k)))
    return out


def _crop_to_extent(tiles: DataFrame, width: int, height: int) -> DataFrame:
    """Trim tiles (and their zero-padding) to the raster's true WxH.

    :func:`pyramid_level` pads levels smaller than the tile size with
    zeros/nodata; this drops out-of-extent tiles and slices each row of
    the pixel array down to the valid region — all JVM higher-order
    array functions, no Python."""
    vw = F.least(F.lit(width) - F.col("tile_x") * F.col("tile_w"),
                 F.col("tile_w"))
    vh = F.least(F.lit(height) - F.col("tile_y") * F.col("tile_h"),
                 F.col("tile_h"))
    t = tiles.where((vw > 0) & (vh > 0)).withColumn("_vw", vw).withColumn(
        "_vh", vh
    )
    trimmed = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.col("_vh") - 1),
            lambda r: F.slice(
                F.col("pixels"), r * F.col("tile_w") + 1, F.col("_vw")
            ),
        )
    )
    return (
        t.withColumn("pixels", trimmed)
        .withColumn("tile_w", F.col("_vw"))
        .withColumn("tile_h", F.col("_vh"))
        .drop("_vw", "_vh")
    )


def layer_summary(df: DataFrame, geom_col: str = "geom_wkb") -> DataFrame:
    """ogrinfo -so layer summary (``apps/ogrinfo.cpp``): feature count,
    extent, geometry-type tally — one row per WKB geometry *type*, plus
    totals derivable by the caller.

    Geometry type is read JVM-side from WKB bytes 2-5 (little-endian
    uint32, ``ogrgeometry.cpp:1368`` importFromWkb header); the envelope
    (``OGR_L_GetExtent`` semantics: union of feature envelopes) runs in
    one Arrow-batched pass with per-batch partial min/max, then a
    metadata-sized groupBy — no geometry shuffle.
    """
    # uint32 LE type code from hex chars 3..10, byte-reversed
    h = F.hex(F.col(geom_col))
    code = F.conv(
        F.concat(
            F.substring(h, 9, 2), F.substring(h, 7, 2),
            F.substring(h, 5, 2), F.substring(h, 3, 2),
        ),
        16, 10,
    ).cast("int")
    typed = df.select(F.col(geom_col).alias("g"), code.alias("geom_type"))

    def env_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lib_gdal_spark.functions import geometry as G

        for b in batches:
            if len(b) == 0:
                continue
            rows: dict[int, list[float]] = {}
            for g, t in zip(b["g"], b["geom_type"]):
                e = G.envelope(bytes(g))
                r = rows.get(t)
                if r is None:
                    rows[t] = [1, e[0], e[1], e[2], e[3]]
                else:
                    r[0] += 1
                    r[1] = min(r[1], e[0])
                    r[2] = min(r[2], e[1])
                    r[3] = max(r[3], e[2])
                    r[4] = max(r[4], e[3])
            yield pd.DataFrame(
                [
                    {"geom_type": t, "n": r[0], "minx": r[1], "miny": r[2],
                     "maxx": r[3], "maxy": r[4]}
                    for t, r in rows.items()
                ]
            )

    part = typed.mapInPandas(
        env_partial,
        schema="geom_type int, n long, minx double, miny double, "
               "maxx double, maxy double",
    )
    return part.groupBy("geom_type").agg(
        F.sum("n").alias("n_features"),
        F.min("minx").alias("minx"), F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
    )
