"""SRTM .hgt elevation source — the reference's SRTMHGT driver
(``drivers/raster/srtmhgt/srtmhgtdataset.cpp``): a bare grid of
big-endian int16 elevations, n×n with n ∈ {1201, 3601} (3″/1″ SRTM),
georeference encoded ONLY in the file name (``N43W080.hgt`` = cell with
lower-left corner at 43°N 80°W), -32768 as void/nodata, rows stored
north→south, and the outermost row/column shared with the neighboring
cell (so the geotransform extends half a pixel beyond the degree cell).

Distributed shape: the SRTM mission tiles land in one file per degree
cell — the canonical many-small-files corpus; `binaryFile` + narrow map.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.sources.rasters import RASTER_COLS, tiles_from_array

_NAME_RE = re.compile(r"([NS])(\d{1,2})([EW])(\d{1,3})\.hgt", re.I)
NODATA = -32768.0


def parse_hgt_name(name: str) -> tuple[int, int]:
    """'N43W080.hgt' -> (lat, lon) of the cell's lower-left corner."""
    m = _NAME_RE.search(name)
    if not m:
        raise ValueError(f"not an SRTM hgt name: {name}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def parse_hgt(name: str, data: bytes) -> tuple[np.ndarray, tuple]:
    """(file name, raw bytes) -> (north-up array, geotransform)."""
    n2 = len(data) // 2
    n = int(round(n2 ** 0.5))
    if n * n != n2:
        raise ValueError(f"not square: {n2} samples")
    lat, lon = parse_hgt_name(name)
    arr = np.frombuffer(data, dtype=">i2", count=n * n) \
        .reshape(n, n).astype(np.float64)
    step = 1.0 / (n - 1)
    gt = (lon - step / 2, step, 0.0, lat + 1 + step / 2, 0.0, -step)
    return arr, gt


def write_hgt(arr: np.ndarray) -> bytes:
    return arr.astype(">i2").tobytes()


def parse_hgt_documents(files: DataFrame, content_col: str = "content",
                        id_col: str = "path",
                        tile: int = 256) -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for rid, blob in zip(b[id_col], b[content_col]):
                arr, gt = parse_hgt(str(rid), bytes(blob))
                rows.extend(tiles_from_array(str(rid), arr, gt,
                                             tile=tile, nodata=NODATA))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return files.select(id_col, content_col).mapInPandas(
        work, schema=RASTER_SCHEMA)


def read_hgt(spark: SparkSession, path: str, tile: int = 256) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)
    return parse_hgt_documents(files, tile=tile)
