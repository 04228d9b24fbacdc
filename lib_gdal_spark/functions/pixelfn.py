"""The VRT derived-band pixel-function REGISTRY — all 17 names that
``GDALRegisterDefaultPixelFunc`` installs
(``drivers/raster/vrt/pixelfunctions.cpp:36-121`` and the register list at
the file's end), dispatchable by name over tile tables.

Real-dtype functions are pure JVM column expressions through
``operators.raster.band_calc`` (whole-stage codegen; no Python in the
loop); complex ones delegate to ``functions.complexfn``. Semantics match
the C source exactly: ``log10``/``dB`` take ``fabs`` first, ``sqrt`` does
NOT (NaN for negative input, like the C ``sqrt``), ``dB2amp`` =
``10^(x/20)``, ``dB2pow`` = ``10^(x/10)``, ``complex`` pairs two real
bands into one interleaved complex band.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.functions import complexfn as CF

# name -> (n_sources, column lambda) for the real-dtype family
REAL_FUNCS = {
    "sum": (None, lambda *bs: reduce(lambda a, b: a + b, bs)),
    "diff": (2, lambda a, b: a - b),
    "mul": (None, lambda *bs: reduce(lambda a, b: a * b, bs)),
    "inv": (1, lambda x: F.lit(1.0) / x),
    "sqrt": (1, F.sqrt),
    "log10": (1, lambda x: F.log10(F.abs(x))),
    "dB": (1, lambda x: F.lit(20.0) * F.log10(F.abs(x))),
    "dB2amp": (1, lambda x: F.pow(F.lit(10.0), x / F.lit(20.0))),
    "dB2pow": (1, lambda x: F.pow(F.lit(10.0), x / F.lit(10.0))),
}

# complex family: column -> column over interleaved-word pixel arrays
COMPLEX_FUNCS = {
    "real": CF.real,
    "imag": CF.imag,
    "mod": CF.modulus,
    "phase": CF.phase,
    "conj": CF.conj,
    "intensity": CF.intensity,
}

PIXEL_FUNCTION_NAMES = (
    tuple(REAL_FUNCS) + tuple(COMPLEX_FUNCS) + ("cmul", "complex")
)


def complex_from(real_px: Column, imag_px: Column) -> Column:
    """'complex' pixel function: two real bands -> one interleaved complex
    band (ComplexPixelFunc)."""
    return F.flatten(
        F.zip_with(real_px, imag_px, lambda r, i: F.array(r, i))
    )


def apply_pixel_function(
    tiles: DataFrame,
    name: str,
    bands: list[int],
    out_id: str = "pixfn",
    is_complex: bool = False,
) -> DataFrame:
    """Dispatch a registered pixel function by name over a tile table —
    the engine's VRTDerivedRasterBand. Single-source complex functions
    and ``cmul``/``complex`` operate on the ``pixels`` arrays directly;
    real functions go through ``band_calc``'s zip_with chain."""
    from lib_gdal_spark.operators.raster import band_calc

    if name in REAL_FUNCS:
        nsrc, fn = REAL_FUNCS[name]
        if nsrc is not None and len(bands) != nsrc:
            raise ValueError(f"{name} needs exactly {nsrc} band(s)")
        return band_calc(tiles, fn, bands=bands, out_id=out_id)
    if name in COMPLEX_FUNCS:
        if len(bands) != 1:
            raise ValueError(f"{name} needs exactly 1 band")
        fn = COMPLEX_FUNCS[name]
        return tiles.where(F.col("band") == bands[0]).withColumn(
            "pixels", fn(F.col("pixels"), is_complex=is_complex)
        ).withColumn("raster_id", F.lit(out_id))
    if name in ("cmul", "complex"):
        if len(bands) != 2:
            raise ValueError(f"{name} needs exactly 2 bands")
        a = tiles.where(F.col("band") == bands[0])
        b = tiles.where(F.col("band") == bands[1]).select(
            "raster_id", "zoom", "tile_x", "tile_y",
            F.col("pixels").alias("px_b"),
        )
        j = a.join(b, ["raster_id", "zoom", "tile_x", "tile_y"])
        col = (CF.cmul(F.col("pixels"), F.col("px_b")) if name == "cmul"
               else complex_from(F.col("pixels"), F.col("px_b")))
        return j.withColumn("pixels", col).drop("px_b") \
            .withColumn("raster_id", F.lit(out_id))
    raise ValueError(
        f"unknown pixel function {name!r}; registered: "
        f"{sorted(PIXEL_FUNCTION_NAMES)}"
    )
