"""Pansharpen: weighted-Brovey fusion over the tile table, fully JVM-side.

Reference: ``core/alg/gdalpansharpen.cpp:416-460`` — for each pixel,
``pseudo = Σ w_i * spectral_i``; ``ratio = pan / pseudo``;
``out_i = spectral_i * ratio``.

Spark shape: the band tables pivot to one row per tile carrying every band's
pixel array, then the per-pixel math is ``zip_with``/``transform`` higher-
order functions — whole-stage codegen, zero Python. This is the pattern for
any multi-band per-pixel arithmetic (NDVI, band ratios, pca-free indices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pansharpen(
    tiles: DataFrame,
    spectral_bands: list[int],
    pan_band: int,
    weights: list[float] | None = None,
    out_id: str = "pansharpened",
) -> DataFrame:
    """Tile table with bands ``spectral_bands + [pan_band]`` -> fused tiles.

    Output keeps one row per (tile, spectral band) with float64 pixels.
    Zero-pseudo pixels pass the pan value through unscaled (ratio := 1),
    mirroring the reference's guard against division by zero.
    """
    w = weights or [1.0 / len(spectral_bands)] * len(spectral_bands)
    keep = tiles.where(F.col("band").isin(spectral_bands + [pan_band]))

    piv = (
        keep.groupBy("raster_id", "zoom", "tile_x", "tile_y",
                     "tile_w", "tile_h",
                     "gt0", "gt1", "gt2", "gt3", "gt4", "gt5")
        .pivot("band", spectral_bands + [pan_band])
        .agg(F.first("pixels"))
    )

    # pseudo = w1*b1 + w2*b2 + ... via chained zip_with (JVM-side)
    pseudo = F.transform(F.col(str(spectral_bands[0])),
                         lambda x: x * F.lit(w[0]))
    for wi, b in zip(w[1:], spectral_bands[1:]):
        pseudo = F.zip_with(pseudo, F.col(str(b)),
                            lambda acc, x: acc + x * F.lit(wi))
    piv = piv.withColumn("__pseudo", pseudo)
    ratio = F.zip_with(
        F.col(str(pan_band)), F.col("__pseudo"),
        lambda p, q: F.when(q != 0.0, p / q).otherwise(F.lit(1.0)),
    )
    piv = piv.withColumn("__ratio", ratio)

    outs = []
    for b in spectral_bands:
        fused = F.zip_with(F.col(str(b)), F.col("__ratio"),
                           lambda x, r: x * r)
        outs.append(
            piv.select(
                F.lit(out_id).alias("raster_id"),
                F.lit(b).alias("band"), "zoom", "tile_x", "tile_y",
                F.lit("float64").alias("dtype"), "tile_w", "tile_h",
                "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
                F.lit(None).cast("double").alias("nodata"),
                fused.alias("pixels"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
