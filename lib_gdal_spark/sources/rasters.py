"""Raster fixtures as tiled tables — the engine's raster data model.

A raster is a table: one row per (raster_id, band, zoom, tile_x, tile_y)
carrying a fixed-size pixel patch plus its own geotransform (SURVEY.md §1.1
"Spark mapping"). Fixtures follow the reference's golden-data strategy
(``tests/gcore/data/byte.tif`` — 20×20 GDT_Byte, checksum 4672,
``tests/cpp/test_gdal_gtiff.cpp:70``).

``BYTE20`` is the canonical 20×20 byte raster: the pixel *data* of the
reference's ``byte.tif`` (NW Oregon UTM zone 11 sample), embedded as
zlib+base85 so the checksum-4672 anchor reproduces bit-for-bit without GDAL.
"""

from __future__ import annotations

import base64
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# Pixel payload of tests/gcore/data/byte.tif (400 bytes, row-major).
_BYTE20_Z = (
    "eJwlkCFyRDEMQ+/XI4QaGgqKChoahgYGfriwdK+zsJXbZDKZsWT5JUlBKknprSR2w1fjoJIM"
    "0Vps2ENXCqJ9QCJbpJsJ70QnLGpPGAA2D5Wpzde93Wj3QTum5Z3ft6sUk6m5dGnHuMpZcnww"
    "njCP8IdIKlybyVVR4ZEyg0XmINrhmGwLdV3i/ykjYuVNr5l2O0aJfN10VFTe6nl3OF1RBrDN"
    "bFnL8cu4fsuAhU5vOgYeHjGQi3jdqgOtwHLNCf6c/ZjAtPwycG0dA9/Pz1umaZ3TNczJ59m9"
    "9340Pz4Lkb94T8YT"
)

# Geotransform of byte.tif: (440720, 60, 0, 3751320, 0, -60) UTM11 NAD27.
BYTE20_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

RASTER_SCHEMA = (
    "raster_id string, band int, zoom int, tile_x int, tile_y int, "
    "dtype string, tile_w int, tile_h int, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, gt5 double, "
    "nodata double, pixels array<double>"
)

RASTER_COLS = [c.split()[0] for c in RASTER_SCHEMA.split(", ")]


def byte20() -> np.ndarray:
    """The canonical 20×20 uint8 raster (checksum 4672)."""
    raw = zlib.decompress(base64.b64decode(_BYTE20_Z))
    return np.frombuffer(raw, dtype=np.uint8).reshape(20, 20).copy()


def gradient(n: int = 256, dtype: str = "uint8") -> np.ndarray:
    """Linear gradient fixture — closed-form expectations for resampling."""
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = (i + j) * (255.0 / (2 * (n - 1)))
    return vals.astype(dtype)


def checkerboard(n: int = 64, sq: int = 8, lo: int = 20, hi: int = 235) -> np.ndarray:
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return np.where(((i // sq) + (j // sq)) % 2 == 0, lo, hi).astype(np.uint8)


def radial(n: int = 128) -> np.ndarray:
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    c = (n - 1) / 2.0
    r = np.sqrt((i - c) ** 2 + (j - c) ** 2)
    return np.clip(255.0 * (1.0 - r / c), 0, 255).astype(np.uint8)


def world4326(n: int = 256) -> tuple[np.ndarray, tuple]:
    """World-extent EPSG:4326 fixture for warp-to-mercator goldens."""
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = ((np.sin(i * 0.19) + np.cos(j * 0.13)) * 60 + 128).astype(np.uint8)
    # geotransform: full world, north-up
    gt = (-180.0, 360.0 / n, 0.0, 90.0, 0.0, -180.0 / n)
    return vals, gt


def tiles_from_array(
    raster_id: str,
    arr: np.ndarray,
    gt: tuple,
    tile: int = 64,
    band: int = 1,
    zoom: int = 0,
    nodata: float | None = None,
) -> list[dict]:
    """Slice a full array into tile-table rows (edge tiles keep true size).

    Each tile's geotransform is the parent's shifted by the tile origin —
    the per-tile analog of ``core/alg/gdaltransformer.cpp:3761``.
    """
    h, w = arr.shape
    rows = []
    for ty in range(0, (h + tile - 1) // tile):
        for tx in range(0, (w + tile - 1) // tile):
            y0, x0 = ty * tile, tx * tile
            patch = arr[y0 : y0 + tile, x0 : x0 + tile]
            tgt = (
                gt[0] + x0 * gt[1] + y0 * gt[2],
                gt[1], gt[2],
                gt[3] + x0 * gt[4] + y0 * gt[5],
                gt[4], gt[5],
            )
            rows.append(
                dict(
                    raster_id=raster_id, band=band, zoom=zoom,
                    tile_x=tx, tile_y=ty, dtype=str(arr.dtype),
                    tile_w=patch.shape[1], tile_h=patch.shape[0],
                    gt0=tgt[0], gt1=tgt[1], gt2=tgt[2],
                    gt3=tgt[3], gt4=tgt[4], gt5=tgt[5],
                    nodata=nodata,
                    pixels=patch.astype(np.float64).ravel().tolist(),
                )
            )
    return rows


def complex_tiles_from_array(
    raster_id: str,
    re: np.ndarray,
    im: np.ndarray,
    gt: tuple,
    dtype: str,
    tile: int = 64,
    band: int = 1,
    zoom: int = 0,
) -> list[dict]:
    """Complex raster -> tile rows with INTERLEAVED words in ``pixels``.

    ``tile_w``/``tile_h`` count logical (complex) pixels; the pixels array
    holds ``2*w*h`` doubles ``[re, im, re, im, ...]`` — the layout
    ``GDALChecksumImage`` walks word-by-word (kernels/complexpx.py).
    """
    assert dtype in ("cint16", "cint32", "cfloat32", "cfloat64"), dtype
    h, w = re.shape
    rows = []
    for ty in range(0, (h + tile - 1) // tile):
        for tx in range(0, (w + tile - 1) // tile):
            y0, x0 = ty * tile, tx * tile
            pr = re[y0 : y0 + tile, x0 : x0 + tile].astype(np.float64)
            pi = im[y0 : y0 + tile, x0 : x0 + tile].astype(np.float64)
            words = np.empty((pr.shape[0], 2 * pr.shape[1]))
            words[:, 0::2] = pr
            words[:, 1::2] = pi
            tgt = (
                gt[0] + x0 * gt[1] + y0 * gt[2], gt[1], gt[2],
                gt[3] + x0 * gt[4] + y0 * gt[5], gt[4], gt[5],
            )
            rows.append(
                dict(
                    raster_id=raster_id, band=band, zoom=zoom,
                    tile_x=tx, tile_y=ty, dtype=dtype,
                    tile_w=pr.shape[1], tile_h=pr.shape[0],
                    gt0=tgt[0], gt1=tgt[1], gt2=tgt[2],
                    gt3=tgt[3], gt4=tgt[4], gt5=tgt[5],
                    nodata=None, pixels=words.ravel().tolist(),
                )
            )
    return rows


def complex_field(n: int = 128) -> tuple[np.ndarray, np.ndarray]:
    """Analytic complex fixture: closed forms over (col i, row j) so SQL
    oracles can recompute any word exactly."""
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    # integer adds OUTSIDE the trunc: a trunc(-0.x) = -0.0 plus an integer
    # is always +0.0, so no signed zero survives (Spark normalizes -0.0 to
    # +0.0, which would flip atan2 at the +-pi branch cut vs the oracle)
    re = np.trunc(np.cos(i * 0.11) * 40.0) + (j % 17) * 3.0
    im = np.trunc(np.sin(j * 0.07) * 40.0) - (i % 13) * 2.0 - 1.0
    return re, im


def fixture_complex_rasters(spark: SparkSession, tile: int = 64) -> DataFrame:
    """byte20 as all four complex dtypes (im = 0 — the reference's
    cint16.tif family, checksum **5028**) plus an analytic complex field."""
    b = byte20().astype(np.float64)
    z = np.zeros_like(b)
    rows: list[dict] = []
    for dt in ("cint16", "cint32", "cfloat32", "cfloat64"):
        rows += complex_tiles_from_array(f"byte20_{dt}", b, z, BYTE20_GT,
                                         dtype=dt, tile=tile)
    re, im = complex_field(128)
    rows += complex_tiles_from_array(
        "cplx128", re, im, (0.0, 1.0, 0.0, 128.0, 0.0, -1.0),
        dtype="cfloat32", tile=tile,
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def multiband(n: int = 128) -> dict[int, np.ndarray]:
    """Analytic multi-band fixture (bands 1-3 spectral, 4 = pan).

    Every band is a closed form over (col i, row j), so SQL oracles can
    recompute any per-pixel band math exactly.
    """
    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    b1 = np.trunc((i + j) * 0.5)
    b2 = np.trunc((np.sin(i * 0.19) + np.cos(j * 0.13)) * 60.0 + 128.0)
    b3 = ((i * 13 + j * 7) % 255).astype(np.float64)
    pan = np.trunc((b1 + b2 + b3) / 3.0)
    return {1: b1, 2: b2, 3: b3, 4: pan}


def multiband_tiles(spark: SparkSession, n: int = 128, tile: int = 64) -> DataFrame:
    rows: list[dict] = []
    gt = (0.0, 1.0, 0.0, float(n), 0.0, -1.0)
    for band, arr in multiband(n).items():
        rows += tiles_from_array("mb", arr.astype(np.float64), gt,
                                 tile=tile, band=band)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def fixture_rasters(spark: SparkSession, tile: int = 64) -> DataFrame:
    """The standard fixture raster table (byte20 + gradients + world)."""
    rows: list[dict] = []
    rows += tiles_from_array("byte20", byte20(), BYTE20_GT, tile=tile)
    rows += tiles_from_array(
        "gradient256", gradient(256), (0.0, 1.0, 0.0, 256.0, 0.0, -1.0), tile=tile
    )
    rows += tiles_from_array(
        "checker64", checkerboard(64), (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=tile
    )
    world, wgt = world4326(256)
    rows += tiles_from_array("world4326", world, wgt, tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)
