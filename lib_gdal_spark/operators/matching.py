"""Image correlation: SURF feature points + GCP matching over tile tables.

Spark-first re-expression of ``core/alg/gdalmatching.cpp``
(``GatherFeaturePoints`` / ``GDALComputeMatchingPoints``): the reference
correlates two whole images on one node; here each *image* is a group —
feature extraction is a ``groupBy(raster_id).applyInPandas`` over the
tile table, so a 100-TB corpus of frames fans out one image per task,
and matching fans out one image *pair* per task.  The per-image kernels
(``kernels/surf.py``) are fully vectorized NumPy over the integral
image.

Sizing contract: one image must fit one task (aerial frames, not
continental mosaics) — the same contract as the reference, which holds
both images in RAM; the *scale axis* is the number of images/pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.kernels import surf

FP_SCHEMA = ("raster_id string, fp_id int, x int, y int, scale int, "
             "radius int, sign int, descriptor array<double>")
GCP_SCHEMA = ("pair_id string, gcp_id int, pixel double, line double, "
              "gcp_x double, gcp_y double, dist double")

_MAX_IMAGE_CELLS = 64 * 1024 * 1024


def _assemble_image(pdf: pd.DataFrame, tile: int) -> dict[int, np.ndarray]:
    """Tile rows of one raster -> {band: full array}."""
    bands: dict[int, np.ndarray] = {}
    for band, g in pdf.groupby("band"):
        w = int((g["tile_x"] * tile + g["tile_w"]).max())
        h = int((g["tile_y"] * tile + g["tile_h"]).max())
        if w * h > _MAX_IMAGE_CELLS:
            raise ValueError(
                f"image {w}x{h} exceeds the one-task sizing contract "
                f"({_MAX_IMAGE_CELLS} cells); matching operates per frame")
        arr = np.zeros((h, w))
        for r in g.itertuples(index=False):
            arr[r.tile_y * tile: r.tile_y * tile + r.tile_h,
                r.tile_x * tile: r.tile_x * tile + r.tile_w] = \
                np.asarray(r.pixels, np.float64).reshape(r.tile_h, r.tile_w)
        bands[int(band)] = arr
    return bands


def _to_luminosity(bands: dict[int, np.ndarray]) -> np.ndarray:
    """gdalmatching.cpp:213-227: >=3 bands -> RGB luminosity, else
    band 1 stands in for all three channels."""
    keys = sorted(bands)
    if len(keys) >= 3:
        r, g, b = bands[keys[0]], bands[keys[1]], bands[keys[2]]
    else:
        r = g = b = bands[keys[0]]
    return surf.luminosity(r, g, b)


def extract_feature_points(
    tiles: DataFrame,
    octave_start: int = 2,
    octave_end: int = 2,
    threshold: float = 0.001,
    tile: int = 64,
    to_gray: bool = True,
) -> DataFrame:
    """GatherFeaturePoints (gdalmatching.cpp:98-180) for every raster in
    the tile table — one image per task, collection order preserved via
    ``fp_id``."""
    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bands = _assemble_image(pdf, tile)
        img = _to_luminosity(bands) if to_gray else bands[min(bands)]
        pts = surf.extract_feature_points(
            img, octave_start, octave_end, threshold)
        return pd.DataFrame({
            "raster_id": [key[0]] * len(pts),
            "fp_id": np.arange(len(pts), dtype=np.int32),
            "x": [p["x"] for p in pts],
            "y": [p["y"] for p in pts],
            "scale": [p["scale"] for p in pts],
            "radius": [p["radius"] for p in pts],
            "sign": [p["sign"] for p in pts],
            "descriptor": [p["descriptor"] for p in pts],
        })

    return tiles.groupBy("raster_id").applyInPandas(gather, schema=FP_SCHEMA)


def hessian_layer(
    tiles: DataFrame,
    octave: int,
    interval: int,
    tile: int = 64,
    to_gray: bool = True,
) -> DataFrame:
    """One fast-Hessian octave layer (gdal_octave.cpp:171-226) as rows —
    the inspectable building block of the correlator, one image per
    task."""
    def compute(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bands = _assemble_image(pdf, tile)
        img = _to_luminosity(bands) if to_gray else bands[min(bands)]
        layer = surf.OctaveLayer(octave, interval).compute(
            surf.integral_image(img))
        h, w = layer.det.shape
        radius = layer.radius
        rs = np.arange(radius, h - radius + 1)
        cs = np.arange(radius, w - radius + 1)
        R, C = np.meshgrid(rs, cs, indexing="ij")
        return pd.DataFrame({
            "raster_id": key[0],
            "r": R.ravel(), "c": C.ravel(),
            "det": layer.det[R, C].ravel(),
            "sign": layer.sign[R, C].ravel(),
        })

    return tiles.groupBy("raster_id").applyInPandas(
        compute, schema="raster_id string, r int, c int, det double, "
                        "sign int")


def match_pairs(
    points: DataFrame,
    pairs: DataFrame,
    matching_threshold: float = 0.015,
) -> DataFrame:
    """GDALComputeMatchingPoints' matching+GCP stage
    (gdalmatching.cpp:252-316) fanned out over image pairs.

    ``pairs``: (pair_id, first_id, second_id).  Feature points are
    attached to each pair via two broadcastable equi-joins, then each
    pair is matched independently in one task (the greedy reference
    matcher is order-dependent and inherently per-pair sequential).
    GCPs carry first-image pixel/line and second-image x/y, both
    +0.5-centered like the reference.
    """
    fp = points.select(
        "raster_id", "fp_id", "x", "y", "sign", "descriptor")
    p1 = pairs.join(
        fp.withColumnRenamed("raster_id", "first_id"), on="first_id"
    ).select("pair_id", F.lit(1).alias("side"), "fp_id", "x", "y",
             "sign", "descriptor")
    p2 = pairs.join(
        fp.withColumnRenamed("raster_id", "second_id"), on="second_id"
    ).select("pair_id", F.lit(2).alias("side"), "fp_id", "x", "y",
             "sign", "descriptor")
    both = p1.unionByName(p2)

    def match(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["side", "fp_id"])
        def side(s):
            g = pdf[pdf["side"] == s]
            return [dict(x=int(r.x), y=int(r.y), sign=int(r.sign),
                         descriptor=np.asarray(r.descriptor))
                    for r in g.itertuples(index=False)]
        f1, f2 = side(1), side(2)
        out = []
        for n, (i, j, d) in enumerate(
                surf.match_feature_points(f1, f2, matching_threshold)):
            out.append((key[0], n, f1[i]["x"] + 0.5, f1[i]["y"] + 0.5,
                        f2[j]["x"] + 0.5, f2[j]["y"] + 0.5, d))
        return pd.DataFrame(out, columns=[
            "pair_id", "gcp_id", "pixel", "line", "gcp_x", "gcp_y", "dist"])

    return both.groupBy("pair_id").applyInPandas(match, schema=GCP_SCHEMA)


def compute_matching_points(
    tiles1: DataFrame,
    tiles2: DataFrame,
    octave_start: int = 2,
    octave_end: int = 2,
    surf_threshold: float = 0.001,
    matching_threshold: float = 0.015,
    tile: int = 64,
) -> DataFrame:
    """GDALComputeMatchingPoints (gdalmatching.cpp:188-316) for one image
    pair, end-to-end on the cluster: extract on both (parallel tasks),
    match in a third."""
    t1 = tiles1.withColumn("raster_id", F.lit("__first"))
    t2 = tiles2.withColumn("raster_id", F.lit("__second"))
    fps = extract_feature_points(
        t1.unionByName(t2), octave_start, octave_end, surf_threshold, tile)
    spark = tiles1.sparkSession
    pairs = spark.createDataFrame(
        [("pair", "__first", "__second")],
        "pair_id string, first_id string, second_id string")
    return match_pairs(fps, pairs, matching_threshold).drop("pair_id")
