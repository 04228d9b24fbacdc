"""DTED elevation codec — the reference's DTED driver
(``drivers/raster/dted/dteddataset.cpp``, ``dted_api.c``), from the
public MIL-PRF-89020B layout: 80-byte UHL + 648-byte DSI + 2700-byte
ACC headers, then one 0xAA-sentinel record per longitude column —
3-byte block count, 2-byte lon/lat indices, big-endian SIGNED-MAGNITUDE
elevations south→north, 4-byte byte-sum checksum.

Validated against the reference's own ``tests/cpp/data/n43.dt0``
(checksum anchor 49187, ``test_gdal_dted.cpp:73``).

Distributed shape: one task per .dt0/.dt1/.dt2 cell file via
``binaryFile`` — DTED tiles the world in 1°×1° cells, so a global DEM
is naturally a many-file corpus (the same narrow map as every codec
here).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.sources.rasters import RASTER_COLS, tiles_from_array

_UHL, _DSI, _ACC = 80, 648, 2700


def _angle(field: bytes) -> float:
    """DDDMMSSH (or DDMMSSH-padded) -> signed degrees."""
    txt = field.decode("ascii").strip()
    hemi = txt[-1]
    digits = txt[:-1]
    ss = int(digits[-2:])
    mm = int(digits[-4:-2])
    dd = int(digits[:-4])
    val = dd + mm / 60.0 + ss / 3600.0
    return -val if hemi in ("W", "S") else val


def parse_dted(data: bytes) -> tuple[np.ndarray, tuple]:
    """DTED bytes -> (north-up (nlat, nlon) float array, geotransform)."""
    if data[:4] != b"UHL1":
        raise ValueError("not DTED: missing UHL1")
    lon0 = _angle(data[4:12])
    lat0 = _angle(data[12:20])
    dx = int(data[20:24]) / 36000.0  # tenths of arcsec -> degrees
    dy = int(data[24:28]) / 36000.0
    nlon = int(data[47:51])
    nlat = int(data[51:55])
    off = _UHL + _DSI + _ACC
    rec = 8 + 2 * nlat + 4
    arr = np.empty((nlat, nlon), dtype=np.float64)
    for i in range(nlon):
        o = off + i * rec
        if data[o] != 0xAA:
            raise ValueError(f"bad record sentinel in column {i}")
        col = np.frombuffer(data, dtype=">u2", count=nlat, offset=o + 8) \
            .astype(np.int64)
        neg = (col & 0x8000) != 0
        val = np.where(neg, -(col & 0x7FFF), col)
        arr[:, i] = val[::-1]  # south->north on disk; north-up out
    gt = (lon0 - dx / 2, dx, 0.0, lat0 + nlat * dy - dy / 2, 0.0, -dy)
    return arr, gt


def write_dted(arr: np.ndarray, lon0: int, lat0: int) -> bytes:
    """North-up integer elevation array (whole-degree cell origin) ->
    DTED bytes with correct record checksums."""
    nlat, nlon = arr.shape
    dxs = 3600 * 10 // (nlon - 1)  # tenths of arcsec
    dys = 3600 * 10 // (nlat - 1)

    # both angle fields are DDDMMSS + hemisphere (8 bytes)
    lon_f = f"{abs(lon0):03d}0000".encode() + (b"W" if lon0 < 0 else b"E")
    lat_f = f"{abs(lat0):03d}0000".encode() + (b"S" if lat0 < 0 else b"N")
    uhl = (b"UHL1" + lon_f + lat_f
           + f"{dxs:04d}".encode() + f"{dys:04d}".encode()
           + b"0020" + b"U  " + b" " * 12
           + f"{nlon:04d}".encode() + f"{nlat:04d}".encode()
           + b"0" + b" " * 24)
    assert len(uhl) == _UHL, len(uhl)
    dsi = (b"DSIU" + b" " * (_DSI - 4))
    acc = (b"ACC " + b" " * (_ACC - 4))
    out = bytearray(uhl + dsi + acc)
    vals = arr.astype(np.int64)
    mag = np.where(vals < 0, (-vals) | 0x8000, vals).astype(">u2")
    for i in range(nlon):
        body = bytearray(b"\xaa") + int(i).to_bytes(3, "big")
        body += struct.pack(">HH", i, 0)
        body += mag[::-1, i].tobytes()  # south->north
        body += struct.pack(">I", sum(body))
        out += body
    return bytes(out)


def parse_dted_documents(files: DataFrame, content_col: str = "content",
                         id_col: str = "path",
                         tile: int = 256) -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for rid, blob in zip(b[id_col], b[content_col]):
                arr, gt = parse_dted(bytes(blob))
                rows.extend(tiles_from_array(str(rid), arr, gt,
                                             tile=tile))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return files.select(id_col, content_col).mapInPandas(
        work, schema=RASTER_SCHEMA)


def read_dted(spark: SparkSession, path: str, tile: int = 256) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)
    return parse_dted_documents(files, tile=tile)
