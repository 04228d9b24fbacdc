"""gdalcompare: pixel-difference statistics between two rasters.

Re-expresses ``swig/python/gdal-utils/osgeo_utils/gdalcompare.py`` (the
reference's golden-image comparison tool: band-by-band checksum + pixel
difference count) as a single co-partitioned equi-join over the tiled
raster table.

Scale: the join shuffles on the tile key only (both sides hash-partition on
(band, zoom, tile_x, tile_y)); the per-tile diff is a JVM ``zip_with`` +
``aggregate`` over the pixel arrays — no Python, no explode — and the final
per-band reduce is map-side combinable. Comparing two 100 TB mosaics costs
one shuffle of tile metadata + arrays, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_KEYS = ("band", "zoom", "tile_x", "tile_y")


def compare_rasters(
    a: DataFrame, b: DataFrame, keys: tuple[str, ...] = TILE_KEYS
) -> DataFrame:
    """Per-band difference stats: (band, n_pixels, n_diff, max_abs_diff,
    sum_abs_diff).

    Tiles present on one side only are counted as fully different with the
    full-outer join (missing side reads as all-NULL -> every pixel differs),
    mirroring gdalcompare's size/band mismatch findings.
    """
    pa = a.select(*keys, F.col("pixels").alias("pa"))
    pb = b.select(*keys, F.col("pixels").alias("pb"))
    j = pa.join(pb, on=list(keys), how="full_outer")
    j = j.withColumn(
        "dd",
        F.when(
            F.col("pa").isNotNull() & F.col("pb").isNotNull(),
            F.zip_with("pa", "pb", lambda x, y: F.abs(x - y)),
        ).otherwise(
            F.expr("transform(coalesce(pa, pb), v -> CAST('Infinity' AS DOUBLE))")
        ),
    )
    per_tile = j.select(
        "band",
        F.size("dd").alias("n_px"),
        F.expr(
            "aggregate(dd, 0L, (acc, v) -> acc + CASE WHEN v > 0.0D THEN 1 "
            "ELSE 0 END)"
        ).alias("n_diff"),
        F.array_max("dd").alias("mx"),
        F.expr("aggregate(dd, 0.0D, (acc, v) -> acc + v)").alias("sm"),
    )
    return per_tile.groupBy("band").agg(
        F.sum("n_px").alias("n_pixels"),
        F.sum("n_diff").alias("n_diff"),
        F.max("mx").alias("max_abs_diff"),
        F.sum("sm").alias("sum_abs_diff"),
    )
