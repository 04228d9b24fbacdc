"""gdal_footprint: polygon footprint of a raster's valid-data region.

Re-expresses ``apps/gdal_footprint.cpp`` (GDAL 3.8 utility) for the tiled
raster table: the valid mask (pixel != nodata) is binarized JVM-side with a
``transform`` over the pixel arrays (no Python in the mask pass), then the
existing distributed polygonizer traces each connected valid region's
boundary rings — outer rings positive, holes negative — exactly the
mask-band -> GDALPolygonize pipeline the reference utility runs
(``gdal_footprint.cpp`` GDALFootprintProcess).

Scale: the mask binarization is a narrow per-tile map; everything after is
the polygonize path (large-star/small-star component merge on O(perimeter)
rows), so the footprint of a 100 TB mosaic shuffles boundary segments only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lib_gdal_spark.operators.polygonize import polygonize_rings


def footprint(
    tiles: DataFrame,
    spark: SparkSession,
    grid_w: int,
    tile: int = 64,
    nodata: float | None = 0.0,
    gt: tuple[float, float, float, float, float, float] | None = None,
) -> DataFrame:
    """Raster tile table -> footprint polygons of the valid-data mask.

    Returns one row per connected valid region: (component, n_pixels,
    n_rings, area_px, wkb, area) where ``wkb`` is a MultiPolygon in world
    coordinates when ``gt`` is given (pixel coordinates otherwise) and
    ``area`` is ``area_px`` scaled by ``|det(gt)|`` (the per-pixel world
    area for an affine geotransform).
    """
    if nodata is None:
        mask_px = F.expr("transform(pixels, v -> 1.0D)")
    else:
        mask_px = F.expr(
            f"transform(pixels, v -> CASE WHEN v IS NOT NULL AND "
            f"v <> CAST({nodata!r} AS DOUBLE) THEN 1.0D ELSE 0.0D END)"
        )
    mask = tiles.withColumn("pixels", mask_px)
    rings = polygonize_rings(mask, spark, grid_w, tile=tile,
                             background=0.0, gt=gt)
    det = abs(gt[1] * gt[5] - gt[2] * gt[4]) if gt is not None else 1.0
    return rings.where(F.col("value") == 1.0).select(
        "component", "n_pixels", "n_rings", "area_px", "wkb",
        (F.col("area_px") * F.lit(det)).alias("area"),
    )
