"""ASCII raster formats — Arc/Info ASCII Grid (``drivers/raster/
aaigrid/aaigriddataset.cpp``) and the XYZ point-grid format
(``drivers/raster/xyz/xyzdataset.cpp``), both from their public format
descriptions.

AAIGrid: ``ncols/nrows/xllcorner|xllcenter/yllcorner|yllcenter/
cellsize/NODATA_value`` header then row-major values, north-up
(first value row is the TOP row); the corner/center distinction shifts
the geotransform by half a cell exactly as the reference does.

XYZ: one ``x y z`` triple per line over a regular grid; the reader
infers the grid from the distinct sorted x/y values (the reference's
column-stepping autodetect) and tolerates either row ordering.

Both are whole-text-file formats: the scalable unit is many files
(``spark.read.text(wholetext)`` → Arrow-batched parse → tile rows),
the same narrow-map shape as the other codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.sources.rasters import RASTER_COLS, tiles_from_array


# ------------------------------------------------------------ AAIGrid
def parse_aaigrid(text: str) -> tuple[np.ndarray, tuple, float | None]:
    """AAIGrid text -> (array float64, geotransform, nodata)."""
    toks = text.split()
    hdr: dict[str, float] = {}
    i = 0
    while i + 1 < len(toks):
        key = toks[i].lower()
        if key in ("ncols", "nrows", "xllcorner", "yllcorner",
                   "xllcenter", "yllcenter", "cellsize", "dx", "dy",
                   "nodata_value"):
            hdr[key] = float(toks[i + 1])
            i += 2
        else:
            break
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    dx = hdr.get("dx", hdr.get("cellsize", 1.0))
    dy = hdr.get("dy", hdr.get("cellsize", 1.0))
    if "xllcorner" in hdr:
        x0 = hdr["xllcorner"]
    else:  # llcenter: shift out half a cell (aaigriddataset.cpp)
        x0 = hdr["xllcenter"] - dx / 2
    if "yllcorner" in hdr:
        y0 = hdr["yllcorner"]
    else:
        y0 = hdr["yllcenter"] - dy / 2
    vals = np.asarray(toks[i:i + w * h], dtype=np.float64).reshape(h, w)
    gt = (x0, dx, 0.0, y0 + h * dy, 0.0, -dy)
    return vals, gt, hdr.get("nodata_value")


def write_aaigrid(arr: np.ndarray, gt: tuple,
                  nodata: float | None = None) -> str:
    h, w = arr.shape
    assert gt[2] == 0.0 and gt[4] == 0.0 and abs(gt[1]) == abs(gt[5]), \
        "AAIGrid requires north-up square cells"
    lines = [f"ncols        {w}", f"nrows        {h}",
             f"xllcorner    {gt[0]!r}",
             f"yllcorner    {(gt[3] + h * gt[5])!r}",
             f"cellsize     {gt[1]!r}"]
    if nodata is not None:
        lines.append(f"NODATA_value {nodata!r}")
    body = "\n".join(" ".join(repr(v) for v in row) for row in
                     arr.astype(np.float64).tolist())
    return "\n".join(lines) + "\n" + body + "\n"


# ---------------------------------------------------------------- XYZ
def parse_xyz(text: str) -> tuple[np.ndarray, tuple]:
    """XYZ text (regular grid of ``x y z`` lines, any row order) ->
    (array, geotransform); cell centers at the x/y coordinates."""
    data = np.asarray(text.split(), dtype=np.float64).reshape(-1, 3)
    xs = np.unique(data[:, 0])
    ys = np.unique(data[:, 1])
    dx = float(xs[1] - xs[0]) if len(xs) > 1 else 1.0
    dy = float(ys[1] - ys[0]) if len(ys) > 1 else 1.0
    w, h = len(xs), len(ys)
    arr = np.full((h, w), np.nan)
    ix = np.rint((data[:, 0] - xs[0]) / dx).astype(int)
    iy = np.rint((data[:, 1] - ys[0]) / dy).astype(int)
    arr[h - 1 - iy, ix] = data[:, 2]  # top row = max y
    gt = (xs[0] - dx / 2, dx, 0.0, ys[-1] + dy / 2, 0.0, -dy)
    return arr, gt


def write_xyz(arr: np.ndarray, gt: tuple) -> str:
    """North-up array -> ``x y z`` lines, top row first (the reference
    writer's order, xyzdataset.cpp CreateCopy)."""
    h, w = arr.shape
    out = []
    for j in range(h):
        y = gt[3] + (j + 0.5) * gt[5]
        for i in range(w):
            x = gt[0] + (i + 0.5) * gt[1]
            out.append(f"{x!r} {y!r} {arr[j, i]!r}")
    return "\n".join(out) + "\n"


# ---------------------------------------------------- Spark integration
def _docs_to_tiles(docs: DataFrame, parse, doc_col: str, id_col: str,
                   tile: int, band: int = 1) -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for rid, txt in zip(b[id_col], b[doc_col]):
                arr, gt, nodata = parse(str(txt))
                rows.extend(tiles_from_array(str(rid), arr, gt,
                                             tile=tile, band=band,
                                             nodata=nodata))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return docs.select(id_col, doc_col).mapInPandas(work,
                                                    schema=RASTER_SCHEMA)


def parse_aaigrid_documents(docs: DataFrame, doc_col: str = "asc",
                            id_col: str = "raster_id",
                            tile: int = 256) -> DataFrame:
    return _docs_to_tiles(docs, lambda t: parse_aaigrid(t), doc_col,
                          id_col, tile)


def parse_xyz_documents(docs: DataFrame, doc_col: str = "xyz",
                        id_col: str = "raster_id",
                        tile: int = 256) -> DataFrame:
    return _docs_to_tiles(docs, lambda t: (*parse_xyz(t), None),
                          doc_col, id_col, tile)


def read_aaigrid(spark: SparkSession, path: str,
                 tile: int = 256) -> DataFrame:
    files = spark.read.text(path, wholetext=True) \
        .withColumnRenamed("value", "asc")
    from pyspark.sql import functions as F
    files = files.withColumn("raster_id", F.input_file_name())
    return parse_aaigrid_documents(files, tile=tile)


def read_xyz(spark: SparkSession, path: str, tile: int = 256) -> DataFrame:
    files = spark.read.text(path, wholetext=True) \
        .withColumnRenamed("value", "xyz")
    from pyspark.sql import functions as F
    files = files.withColumn("raster_id", F.input_file_name())
    return parse_xyz_documents(files, tile=tile)
