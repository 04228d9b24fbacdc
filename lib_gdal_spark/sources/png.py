"""PNG codec — the reference's PNG driver
(``drivers/raster/png/pngdataset.cpp``) reimplemented from the public
PNG (RFC 2083 / ISO 15948) spec over zlib: all five scanline filters
(None/Sub/Up/Average/Paeth), color types gray / RGB / palette /
gray+alpha / RGBA, bit depths 1/2/4/8 (gray, palette) and 8/16
(everything), tRNS transparency for palettes, and Adam7 interlaced
files at byte-aligned depths (sub-byte interlace rejected loudly).

The tile-store sink (sinks/tilestore.py) keeps its minimal gray-8
encoder; this module is the general read/write path, e.g. for consuming
real-world map tiles back OUT of an MBTiles/GPKG store.

Distributed shape: identical to the GeoTIFF codec — many files via
``binaryFile``, one Arrow-batched decode per file, zero shuffle.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.sources.rasters import RASTER_COLS, tiles_from_array

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Filtered scanlines -> (h, stride) recon bytes (PNG §6)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(
            np.int32)
        pos += 1 + stride
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            lanes = row.reshape(-1, bpp).astype(np.uint8)
            rec = np.cumsum(lanes, axis=0, dtype=np.uint8) \
                .reshape(-1).astype(np.int32)
        elif f == 2:  # Up
            rec = (row + prev) & 255
        elif f == 3:  # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth
            rec = row.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 255
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prev = rec
    return out


def _unpack_bits(row_bytes: np.ndarray, depth: int, w: int) -> np.ndarray:
    """Sub-byte gray/palette samples -> one value per pixel."""
    bits = np.unpackbits(row_bytes, axis=1)
    n = bits.shape[1] // depth
    vals = np.zeros((row_bytes.shape[0], n), dtype=np.uint8)
    for k in range(depth):
        vals = (vals << 1) | bits[:, k::depth][:, :n]
    return vals[:, :w]


class Png:
    def __init__(self, bands, depth, color_type, palette, trns):
        self.bands = bands          # list of (h, w) arrays
        self.depth = depth
        self.color_type = color_type
        self.palette = palette      # (n, 3) uint8 or None
        self.trns = trns            # per-palette-index alpha or None


def parse_png(data: bytes) -> Png:
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    idat = bytearray()
    palette = trns = None
    w = h = depth = ct = interlace = None
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4:off + 8]
        body = data[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ct, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3).copy()
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8).copy()
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    ch = _CHANNELS[ct]
    raw = zlib.decompress(bytes(idat))
    if interlace:
        if depth < 8:
            raise ValueError("Adam7 with sub-byte depth not supported")
        full = _decode_adam7(raw, w, h, ch, depth)
        bands = [np.ascontiguousarray(full[:, :, c]) for c in range(ch)]
    elif depth < 8:
        stride = (w * depth + 7) // 8
        rec = _unfilter(raw, h, stride, 1)
        vals = _unpack_bits(rec, depth, w)
        bands = [vals]
    else:
        bps = depth // 8
        stride = w * ch * bps
        rec = _unfilter(raw, h, stride, ch * bps)
        if depth == 16:
            arr = rec.reshape(h, w, ch, 2)
            full = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
        else:
            full = rec.reshape(h, w, ch)
        bands = [np.ascontiguousarray(full[:, :, c]) for c in range(ch)]
    return Png(bands, depth, ct, palette, trns)


# Adam7 pass grid: (x0, y0, x_step, y_step) — PNG §8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _decode_adam7(raw: bytes, w: int, h: int, ch: int,
                  depth: int) -> np.ndarray:
    bps = depth // 8
    dt = np.uint16 if depth == 16 else np.uint8
    full = np.zeros((h, w, ch), dtype=dt)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * ch * bps
        rec = _unfilter(raw[pos:pos + ph * (1 + stride)], ph, stride,
                        ch * bps)
        pos += ph * (1 + stride)
        if depth == 16:
            a = rec.reshape(ph, pw, ch, 2)
            sub = (a[..., 0].astype(np.uint16) << 8) | a[..., 1]
        else:
            sub = rec.reshape(ph, pw, ch)
        full[y0::ys, x0::xs] = sub
    return full


def png_to_rgb(p: Png) -> list[np.ndarray]:
    """Palette/gray expansion to RGB(A) bands — pct2rgb for PNG."""
    if p.color_type == 3:
        idx = p.bands[0]
        rgb = [p.palette[idx, c] for c in range(3)]
        if p.trns is not None:
            alpha = np.full(idx.shape, 255, np.uint8)
            m = idx < len(p.trns)
            alpha[m] = p.trns[idx[m]]
            rgb.append(alpha)
        return rgb
    return p.bands


def write_png(bands: list[np.ndarray] | np.ndarray,
              depth: int = None, filter_type: int = 2) -> bytes:
    """1/2/3/4-band arrays -> PNG bytes (gray / gray+alpha / RGB /
    RGBA; depth 8 or 16, inferred from dtype when not given)."""
    if isinstance(bands, np.ndarray):
        bands = [bands]
    if depth is None:
        depth = 16 if bands[0].dtype.itemsize > 1 else 8
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[len(bands)]
    h, w = bands[0].shape
    ch = len(bands)
    dt = np.uint16 if depth == 16 else np.uint8
    inter = np.stack([b.astype(dt) for b in bands], axis=2)
    if depth == 16:
        by = np.zeros((h, w, ch, 2), np.uint8)
        by[..., 0] = inter >> 8
        by[..., 1] = inter & 255
        rows = by.reshape(h, w * ch * 2)
    else:
        rows = inter.reshape(h, w * ch)
    stride = rows.shape[1]
    body = bytearray()
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        if filter_type == 2:  # Up: cheap and zlib-friendly
            body.append(2)
            body += (rows[y] - prev).astype(np.uint8).tobytes()
            prev = rows[y]
        else:
            body.append(0)
            body += rows[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + _chunk(b"IEND", b""))


# ---------------------------------------------------- Spark integration
def parse_png_documents(files: DataFrame, content_col: str = "content",
                        id_col: str = "path",
                        tile: int = 256) -> DataFrame:
    """(id, png bytes) rows -> RASTER_SCHEMA tile table (band per
    channel, palette expanded to RGB)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for rid, blob in zip(b[id_col], b[content_col]):
                p = parse_png(bytes(blob))
                for bi, arr in enumerate(png_to_rgb(p), start=1):
                    rows.extend(tiles_from_array(
                        str(rid), arr, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                        tile=tile, band=bi))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return files.select(id_col, content_col).mapInPandas(
        work, schema=RASTER_SCHEMA)


def read_png(spark: SparkSession, path: str, tile: int = 256) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)
    return parse_png_documents(files, tile=tile)
