"""ESRI .hdr / ENVI flat-binary raster source — the reference's EHdr
and ENVI drivers (``drivers/raster/ehdr/ehdrdataset.cpp``,
``drivers/raster/envi/envidataset.cpp``): a plain text header sidecar
describing a raw pixel block in BIL / BIP / BSQ interleave.

Header keys handled (case-insensitive, EHdr vocabulary): ``ncols nrows
nbands nbits pixeltype byteorder layout ulxmap ulymap xdim ydim
nodata``. ``pixeltype`` SIGNEDINT/FLOAT selects the dtype family, and
``ulxmap/ulymap`` are CELL CENTERS (the EHdr convention — the
geotransform shifts out half a cell, ehdrdataset.cpp).

Distributed shape: (.hdr, binary) sidecar pairs matched by path stem —
identical to the shapefile pair join; parsing is a narrow map.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lib_gdal_spark.sources.rasters import RASTER_COLS, tiles_from_array


def parse_ehdr_header(text: str) -> dict:
    hdr: dict[str, str] = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) >= 2:
            hdr[parts[0].lower()] = parts[1]
    return hdr


def _dtype(hdr: dict) -> np.dtype:
    nbits = int(hdr.get("nbits", "8"))
    ptype = hdr.get("pixeltype", "UNSIGNEDINT").upper()
    order = "<" if hdr.get("byteorder", "I").upper() in ("I", "LSBFIRST") \
        else ">"
    if ptype == "FLOAT":
        return np.dtype(f"{order}f{nbits // 8}")
    kind = "i" if ptype == "SIGNEDINT" else "u"
    return np.dtype(f"{order}{kind}{nbits // 8}")


def parse_ehdr(hdr_text: str, blob: bytes) \
        -> tuple[list[np.ndarray], tuple, float | None]:
    """(.hdr text, raw bytes) -> (per-band arrays, geotransform,
    nodata)."""
    hdr = parse_ehdr_header(hdr_text)
    w = int(hdr["ncols"])
    h = int(hdr["nrows"])
    nb = int(hdr.get("nbands", "1"))
    layout = hdr.get("layout", "BIL").upper()
    dt = _dtype(hdr)
    arr = np.frombuffer(blob, dtype=dt, count=w * h * nb)
    if layout == "BIL":  # row-interleaved: (h, nb, w)
        cube = arr.reshape(h, nb, w)
        bands = [np.ascontiguousarray(cube[:, b, :]) for b in range(nb)]
    elif layout == "BIP":  # pixel-interleaved: (h, w, nb)
        cube = arr.reshape(h, w, nb)
        bands = [np.ascontiguousarray(cube[:, :, b]) for b in range(nb)]
    else:  # BSQ: band-sequential
        cube = arr.reshape(nb, h, w)
        bands = [np.ascontiguousarray(cube[b]) for b in range(nb)]
    dx = float(hdr.get("xdim", "1"))
    dy = float(hdr.get("ydim", "1"))
    # ulxmap/ulymap are the CENTER of the upper-left cell
    ulx = float(hdr.get("ulxmap", dx / 2))
    uly = float(hdr.get("ulymap", -dy / 2))
    gt = (ulx - dx / 2, dx, 0.0, uly + dy / 2, 0.0, -dy)
    nodata = float(hdr["nodata"]) if "nodata" in hdr else None
    return bands, gt, nodata


def write_ehdr(bands: list[np.ndarray] | np.ndarray, gt: tuple,
               layout: str = "BIL",
               nodata: float | None = None) -> tuple[str, bytes]:
    """Band arrays -> (.hdr text, raw bytes), little-endian."""
    if isinstance(bands, np.ndarray):
        bands = [bands]
    h, w = bands[0].shape
    nb = len(bands)
    dt = bands[0].dtype
    ptype = {"f": "FLOAT", "i": "SIGNEDINT", "u": "UNSIGNEDINT"}[dt.kind]
    lines = [f"ncols {w}", f"nrows {h}", f"nbands {nb}",
             f"nbits {dt.itemsize * 8}", f"pixeltype {ptype}",
             "byteorder I", f"layout {layout}",
             f"ulxmap {(gt[0] + gt[1] / 2)!r}",
             f"ulymap {(gt[3] + gt[5] / 2)!r}",
             f"xdim {gt[1]!r}", f"ydim {(-gt[5])!r}"]
    if nodata is not None:
        lines.append(f"nodata {nodata!r}")
    cube = np.stack([b.astype(dt.newbyteorder("<")) for b in bands])
    if layout.upper() == "BIL":
        raw = np.moveaxis(cube, 0, 1)          # (h, nb, w)
    elif layout.upper() == "BIP":
        raw = np.moveaxis(cube, 0, 2)          # (h, w, nb)
    else:
        raw = cube                              # (nb, h, w)
    return "\n".join(lines) + "\n", np.ascontiguousarray(raw).tobytes()


def parse_ehdr_documents(pairs: DataFrame, hdr_col: str = "hdr",
                         blob_col: str = "bil", id_col: str = "src",
                         tile: int = 256) -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for _, r in b.iterrows():
                bands, gt, nodata = parse_ehdr(str(r[hdr_col]),
                                               bytes(r[blob_col]))
                for bi, arr in enumerate(bands, start=1):
                    rows.extend(tiles_from_array(
                        str(r[id_col]), arr, gt, tile=tile, band=bi,
                        nodata=nodata))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return pairs.mapInPandas(work, schema=RASTER_SCHEMA)


def read_ehdr(spark: SparkSession, path: str, tile: int = 256) -> DataFrame:
    """EHdr raster(s): ``path`` globs the binary part (e.g. ``*.bil``);
    ``.hdr`` sidecars matched by stem."""
    blobs = spark.read.format("binaryFile").load(path).select(
        F.regexp_replace("path", r"\.[^.]*$", "").alias("src"),
        F.col("content").alias("bil"))
    hdrs = spark.read.format("binaryFile") \
        .load(path.rsplit(".", 1)[0] + ".hdr" if "." in
              path.rsplit("/", 1)[-1] else path).select(
        F.regexp_replace("path", r"\.hdr$", "").alias("src"),
        F.col("content").cast("string").alias("hdr"))
    return parse_ehdr_documents(blobs.join(hdrs, "src"), tile=tile)
