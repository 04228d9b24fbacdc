"""GeoTIFF codec — the reference's flagship raster format
(``drivers/raster/gtiff/geotiff.cpp``, ``frmts/gtiff`` in upstream GDAL),
reimplemented from the public TIFF 6.0 / BigTIFF / GeoTIFF 1.1 specs as a
pure NumPy+stdlib codec over the repo's tiled raster table model.

Reader handles what real-world GDAL output uses: classic and BigTIFF,
both byte orders, strip and tile organization, compressions None / LZW /
Deflate(8 and the old 32946) / PackBits, predictors 1/2/3 (horizontal and
floating-point byte-plane differencing, TIFF Technical Note 3),
multi-band in chunky (PlanarConfiguration=1) and planar (=2) layouts,
integer/float sample formats plus GDAL's complex formats
(SAMPLEFORMAT_COMPLEXINT=5 / COMPLEXIEEEFP=6 → the repo's interleaved
complex tile layout, kernels/complexpx.py), the GeoTIFF
ModelPixelScale+ModelTiepoint and full ModelTransformation affines, the
ProjectedCSType/GeographicType GeoKeys (→ EPSG code), and the GDAL_NODATA
ASCII tag (42113).

Writer emits classic little-endian TIFF with the same tag vocabulary
(strips or tiles, all four compressions, predictor 2/3, chunky or planar,
GeoKey directory), so round-trips are byte-semantics-exact against the
reader and the golden checksum anchors (4672 / 5028) reproduce from
encoded bytes.

Distributed shape: like the other file sources the scalable unit is MANY
files — ``spark.read.format("binaryFile")`` rows fan out one task per
file, each parsed to tile rows of RASTER_SCHEMA inside an Arrow batch; a
corpus of a million GeoTIFFs is a pure narrow map. (For one monolithic
100 GB file the tile offset table would let a range reader split it; the
binaryFile source delivers whole objects, so that path is documented, not
built.)
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.sources.rasters import (
    RASTER_COLS,
    complex_tiles_from_array,
    tiles_from_array,
)

# --- TIFF tag / type constants (TIFF 6.0 §2, GeoTIFF 1.1 §7) ---
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMP, T_PHOTO = 258, 259, 262
T_STRIP_OFF, T_SPP, T_ROWS_PER_STRIP, T_STRIP_CNT = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR = 284, 317
T_TILE_W, T_TILE_H, T_TILE_OFF, T_TILE_CNT = 322, 323, 324, 325
T_SAMPLE_FMT = 339
T_PIXEL_SCALE, T_TIEPOINT, T_TRANSFORM = 33550, 33922, 34264
T_GEO_KEYS, T_GEO_DOUBLES, T_GEO_ASCII = 34735, 34736, 34737
T_GDAL_NODATA = 42113

GK_MODEL_TYPE, GK_RASTER_TYPE = 1024, 1025
GK_GEOGRAPHIC_TYPE, GK_PROJECTED_CS = 2048, 3072

# field type -> byte size (type 13 = IFD, 16/17/18 BigTIFF 8-byte ints)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 13: 4, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
             11: "f", 12: "d", 13: "I", 16: "Q", 17: "q", 18: "Q"}

# (SampleFormat, BitsPerSample) -> numpy dtype; complex formats map to
# the repo's interleaved-word model (core/gcore/gdal.h:60-76).
_DTYPES = {
    (1, 8): "uint8", (1, 16): "uint16", (1, 32): "uint32",
    (2, 8): "int8", (2, 16): "int16", (2, 32): "int32",
    (3, 32): "float32", (3, 64): "float64",
    (5, 32): "cint16", (5, 64): "cint32",
    (6, 64): "cfloat32", (6, 128): "cfloat64",
}
_COMPLEX_PART = {"cint16": "int16", "cint32": "int32",
                 "cfloat32": "float32", "cfloat64": "float64"}
_W_FMT = {v: k for k, v in _DTYPES.items()}

COMP_NONE, COMP_LZW, COMP_DEFLATE, COMP_DEFLATE_OLD, COMP_PACKBITS = (
    1, 5, 8, 32946, 32773)


# ---------------------------------------------------------------- LZW
# TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, ClearCode 256,
# EOI 257, 9→12 bit codes with the "early change" width switch (width
# bumps when the NEXT code to assign reaches 2^width - 1, one code
# earlier than GIF).

_LZW_CLEAR, _LZW_EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    pad = data + b"\x00\x00\x00"
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(pad[byte0:byte0 + 4], "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        else:
            entry = table[code] if code < len(table) else prev + prev[:1]
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    accbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(_LZW_CLEAR, width)
    run = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        if run + c in table:
            run += c
            continue
        put(table[run], width)
        table[run + c] = nxt
        nxt += 1
        # decoder (one add behind) bumps after its table hits 2^w - 1;
        # that lands here when the next code to assign reaches 2^w
        if nxt == (1 << width) and width < 12:
            width += 1
        run = c
        if nxt >= 4093:  # table nearly full: reset (libtiff clears here)
            put(table[run], width)
            put(_LZW_CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            nxt = 258
            width = 9
            run = b""
    if run:
        put(table[run], width)
    put(_LZW_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- PackBits
def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of equal bytes
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        j = i
        while (j + 1 < n and j - i < 127
               and not (j + 2 < n and data[j + 1] == data[j + 2]
                        and data[j] == data[j + 1])):
            j += 1
        out.append(j - i)
        out += data[i:j + 1]
        i = j + 1
    return bytes(out)


# ---------------------------------------------------------- predictors
def _undo_predictor(raw: np.ndarray, predictor: int, h: int, w: int,
                    spp: int, dtype: np.dtype) -> np.ndarray:
    """raw: decompressed segment bytes -> (h, w*spp) sample array."""
    if predictor == 3:  # floating-point byte-plane differencing (TTN3)
        b = dtype.itemsize
        rows = raw.reshape(h, w * spp * b)
        np.cumsum(rows, axis=1, dtype=np.uint8, out=rows)
        planes = rows.reshape(h, b, w * spp)  # plane k = byte k, MSB first
        ordered = np.moveaxis(planes, 1, 2).reshape(h, w * spp * b)
        be = np.dtype(dtype).newbyteorder(">")
        return np.frombuffer(ordered.tobytes(), dtype=be) \
            .astype(dtype).reshape(h, w * spp)
    arr = np.frombuffer(raw.tobytes(), dtype=dtype).reshape(h, w * spp)
    if predictor == 2:  # horizontal differencing, per sample channel
        a3 = arr.reshape(h, w, spp).copy()
        np.cumsum(a3, axis=1, dtype=dtype, out=a3)
        return a3.reshape(h, w * spp)
    return arr


def _apply_predictor(arr: np.ndarray, predictor: int, spp: int) -> bytes:
    """(h, w*spp) sample array -> segment bytes with predictor applied."""
    h, ws = arr.shape
    w = ws // spp
    if predictor == 3:
        b = arr.dtype.itemsize
        be = arr.astype(arr.dtype.newbyteorder(">"))
        by = np.frombuffer(be.tobytes(), dtype=np.uint8) \
            .reshape(h, w * spp, b)
        planes = np.moveaxis(by, 2, 1).reshape(h, w * spp * b)
        d = planes.copy()
        d[:, 1:] = planes[:, 1:] - planes[:, :-1]
        return d.tobytes()
    if predictor == 2:
        a3 = arr.reshape(h, w, spp)
        d = a3.copy()
        d[:, 1:, :] = a3[:, 1:, :] - a3[:, :-1, :]
        return d.astype(arr.dtype).tobytes()
    return arr.tobytes()


# -------------------------------------------------------------- reader
class GeoTiff:
    """Decoded single-IFD GeoTIFF: per-band arrays + georeferencing."""

    def __init__(self, bands, gt, nodata, epsg, dtype):
        self.bands = bands          # list of (h, w) arrays (complex ok)
        self.gt = gt                # 6-tuple geotransform
        self.nodata = nodata
        self.epsg = epsg
        self.dtype = dtype          # repo dtype string


def _read_ifd_entries(data, off, le, big):
    e = "<" if le else ">"
    if big:
        (n,) = struct.unpack_from(e + "Q", data, off)
        base, esz = off + 8, 20
    else:
        (n,) = struct.unpack_from(e + "H", data, off)
        base, esz = off + 2, 12
    tags = {}
    for i in range(n):
        o = base + i * esz
        if big:
            tag, typ, cnt = struct.unpack_from(e + "HHQ", data, o)
            inline, isz = o + 12, 8
        else:
            tag, typ, cnt = struct.unpack_from(e + "HHI", data, o)
            inline, isz = o + 8, 4
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= isz:
            voff = inline
        else:
            (voff,) = struct.unpack_from(e + ("Q" if big else "I"), data,
                                         inline)
        if typ == 2:
            val = data[voff:voff + cnt].split(b"\x00")[0].decode(
                "ascii", "replace")
        elif typ in (5, 10):
            ft = "II" if typ == 5 else "ii"
            pairs = struct.unpack_from(e + ft * cnt, data, voff)
            val = tuple(pairs[2 * i] / (pairs[2 * i + 1] or 1)
                        for i in range(cnt))
        else:
            val = struct.unpack_from(e + _TYPE_FMT[typ] * cnt, data, voff)
        tags[tag] = val
    nxt_off = base + (n * esz)
    (nxt,) = struct.unpack_from(e + ("Q" if big else "I"), data, nxt_off)
    return tags, nxt


def _geotransform(tags) -> tuple:
    if T_TRANSFORM in tags:
        m = tags[T_TRANSFORM]  # 4x4 row-major model transformation
        return (m[3], m[0], m[1], m[7], m[4], m[5])
    if T_PIXEL_SCALE in tags and T_TIEPOINT in tags:
        sx, sy = tags[T_PIXEL_SCALE][0], tags[T_PIXEL_SCALE][1]
        i, j, _, x, y = tags[T_TIEPOINT][:5]
        return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)
    return (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)  # GDAL's default


def _epsg_from_geokeys(tags) -> int | None:
    keys = tags.get(T_GEO_KEYS)
    if not keys:
        return None
    n = keys[3]
    best = None
    for i in range(1, n + 1):
        kid, loc, cnt, val = keys[4 * i:4 * i + 4]
        if kid in (GK_PROJECTED_CS, GK_GEOGRAPHIC_TYPE) and loc == 0:
            if val not in (32767, 0):  # user-defined / undefined
                best = val if kid == GK_PROJECTED_CS or best is None \
                    else best
    return best


def _decompress(seg: bytes, comp: int) -> bytes:
    if comp == COMP_NONE:
        return seg
    if comp == COMP_LZW:
        return lzw_decode(seg)
    if comp in (COMP_DEFLATE, COMP_DEFLATE_OLD):
        return zlib.decompress(seg)
    if comp == COMP_PACKBITS:
        return packbits_decode(seg)
    raise ValueError(f"unsupported TIFF compression {comp}")


def _tiff_header(data: bytes) -> tuple[bool, bool, int]:
    """-> (little_endian, bigtiff, first_ifd_offset)."""
    if data[:2] == b"II":
        le = True
    elif data[:2] == b"MM":
        le = False
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    e = "<" if le else ">"
    (ver,) = struct.unpack_from(e + "H", data, 2)
    if ver == 42:
        (ifd0,) = struct.unpack_from(e + "I", data, 4)
        return le, False, ifd0
    if ver == 43:
        (ifd0,) = struct.unpack_from(e + "Q", data, 8)
        return le, True, ifd0
    raise ValueError(f"bad TIFF version {ver}")


def parse_geotiff(data: bytes) -> GeoTiff:
    """Decode the first IFD of a (Geo)TIFF byte string."""
    le, big, ifd0 = _tiff_header(data)
    tags, _ = _read_ifd_entries(data, ifd0, le, big)
    return _decode_ifd(data, tags, le)


def parse_geotiff_all(data: bytes) -> list[GeoTiff]:
    """Decode the full IFD chain (main image + overview levels, the
    COG / internal-overview layout)."""
    le, big, off = _tiff_header(data)
    out = []
    while off:
        tags, off = _read_ifd_entries(data, off, le, big)
        out.append(_decode_ifd(data, tags, le))
    return out


def _decode_ifd(data: bytes, tags: dict, le: bool) -> GeoTiff:
    w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
    spp = tags.get(T_SPP, (1,))[0]
    bits = tags.get(T_BITS, (8,))[0]
    fmt = tags.get(T_SAMPLE_FMT, (1,))[0]
    comp = tags.get(T_COMP, (1,))[0]
    pred = tags.get(T_PREDICTOR, (1,))[0]
    planar = tags.get(T_PLANAR, (1,))[0]
    dname = _DTYPES.get((fmt, bits))
    if dname is None:
        raise ValueError(f"unsupported sample (format={fmt}, bits={bits})")
    is_complex = dname in _COMPLEX_PART
    part = _COMPLEX_PART.get(dname, dname)
    # complex samples decode as interleaved word pairs of the part dtype
    wordmul = 2 if is_complex else 1
    dt = np.dtype(part)
    if not le:
        dt = dt.newbyteorder(">")

    def segments():
        """Yield (band_or_None, y0, x0, seg_h, seg_w, raw_bytes)."""
        if T_TILE_OFF in tags:
            tw, th = tags[T_TILE_W][0], tags[T_TILE_H][0]
            offs, cnts = tags[T_TILE_OFF], tags[T_TILE_CNT]
            tx_n = (w + tw - 1) // tw
            ty_n = (h + th - 1) // th
            per_plane = tx_n * ty_n
            for i, (o, c) in enumerate(zip(offs, cnts)):
                plane, k = divmod(i, per_plane)
                ty, tx = divmod(k, tx_n)
                yield (plane if planar == 2 else None, ty * th, tx * tw,
                       th, tw, data[o:o + c])
        else:
            rps = tags.get(T_ROWS_PER_STRIP, (h,))[0]
            offs, cnts = tags[T_STRIP_OFF], tags[T_STRIP_CNT]
            per_plane = (h + rps - 1) // rps
            for i, (o, c) in enumerate(zip(offs, cnts)):
                plane, k = divmod(i, per_plane)
                y0 = k * rps
                yield (plane if planar == 2 else None, y0, 0,
                       min(rps, h - y0), w, data[o:o + c])

    nb = spp
    full = [np.zeros((h, w * wordmul), dtype=np.dtype(part))
            for _ in range(nb)]
    for plane, y0, x0, sh, sw, seg in segments():
        raw = np.frombuffer(_decompress(seg, comp), dtype=np.uint8)
        sspp = 1 if planar == 2 else spp
        want = sh * sw * sspp * wordmul * dt.itemsize
        raw = raw[:want].copy()
        arr = _undo_predictor(raw, pred, sh, sw * wordmul, sspp, dt)
        arr = arr.astype(np.dtype(part))
        eh = min(sh, h - y0)
        ew = min(sw, w - x0)
        if planar == 2:
            full[plane][y0:y0 + eh, x0 * wordmul:(x0 + ew) * wordmul] = \
                arr.reshape(sh, sw * wordmul)[:eh, :ew * wordmul]
        else:
            a4 = arr.reshape(sh, sw, sspp, wordmul)
            for b in range(nb):
                full[b][y0:y0 + eh, x0 * wordmul:(x0 + ew) * wordmul] = \
                    a4[:eh, :ew, b, :].reshape(eh, ew * wordmul)

    nodata = None
    if T_GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[T_GDAL_NODATA]).strip())
        except ValueError:
            nodata = None
    return GeoTiff(full, _geotransform(tags), nodata,
                   _epsg_from_geokeys(tags), dname)


# -------------------------------------------------------------- writer
T_SUBFILE_TYPE = 254  # NewSubfileType: 1 = reduced-resolution (overview)


def _prep_arrays(bands, dtype):
    if isinstance(bands, np.ndarray):
        bands = [bands]
    dname = dtype or str(bands[0].dtype)
    part = np.dtype(_COMPLEX_PART.get(dname, dname))
    wordmul = 2 if dname in _COMPLEX_PART else 1
    arrs = []
    for a in bands:
        if np.iscomplexobj(a):
            inter = np.empty((a.shape[0], 2 * a.shape[1]), dtype=part)
            inter[:, 0::2] = a.real
            inter[:, 1::2] = a.imag
            arrs.append(inter)
        else:
            arrs.append(np.ascontiguousarray(a, dtype=part))
    return arrs, dname, part, wordmul


def _plan_level(arrs, dname, part, wordmul, compression, predictor,
                tile, rows_per_strip, planar):
    """One image level -> (segments, tags-without-offsets, off_tag,
    cnt_tag). Offsets/counts are placed by ``_assemble_tiff``."""
    h = arrs[0].shape[0]
    w = arrs[0].shape[1] // wordmul
    spp = len(arrs)
    fmt, bits = _W_FMT[dname]
    segs: list[bytes] = []
    if tile:
        tw = th = tile
        tx_n, ty_n = (w + tw - 1) // tw, (h + th - 1) // th
        plane_iter = range(spp) if (planar or spp == 1) else [None]
        for plane in plane_iter:
            for ty in range(ty_n):
                for tx in range(tx_n):
                    y0, x0 = ty * th, tx * tw
                    buf = np.zeros((th, tw * wordmul * (1 if plane is not
                                    None else spp)), dtype=part)
                    eh = min(th, h - y0)
                    ew = min(tw, w - x0)
                    if plane is not None:
                        buf[:eh, :ew * wordmul] = arrs[plane][
                            y0:y0 + eh, x0 * wordmul:(x0 + ew) * wordmul]
                        sspp = 1
                    else:
                        sspp = spp
                        stack = np.stack(
                            [a[y0:y0 + eh,
                               x0 * wordmul:(x0 + ew) * wordmul]
                             .reshape(eh, ew, wordmul) for a in arrs],
                            axis=2)
                        buf[:eh, :ew * wordmul * spp] = stack.reshape(
                            eh, ew * spp * wordmul)
                    segs.append(_compress(_apply_predictor(
                        buf, predictor, sspp), compression))
        seg_tags = [(T_TILE_W, 3, (tw,)), (T_TILE_H, 3, (th,))]
        off_tag, cnt_tag = T_TILE_OFF, T_TILE_CNT
    else:
        rps = rows_per_strip or max(1, min(h, 8192 // max(1, w * wordmul
                                                          * part.itemsize)))
        plane_iter = range(spp) if (planar or spp == 1) else [None]
        for plane in plane_iter:
            for y0 in range(0, h, rps):
                eh = min(rps, h - y0)
                if plane is not None:
                    buf = arrs[plane][y0:y0 + eh]
                    sspp = 1
                else:
                    sspp = spp
                    stack = np.stack(
                        [a[y0:y0 + eh].reshape(eh, w, wordmul)
                         for a in arrs], axis=2)
                    buf = stack.reshape(eh, w * spp * wordmul)
                segs.append(_compress(_apply_predictor(
                    np.ascontiguousarray(buf), predictor, sspp),
                    compression))
        seg_tags = [(T_ROWS_PER_STRIP, 3, (rps,))]
        off_tag, cnt_tag = T_STRIP_OFF, T_STRIP_CNT

    tags: list[tuple[int, int, tuple]] = [
        (T_WIDTH, 3 if w < 65536 else 4, (w,)),
        (T_HEIGHT, 3 if h < 65536 else 4, (h,)),
        (T_BITS, 3, (bits,) * spp),
        (T_COMP, 3, (compression,)),
        (T_PHOTO, 3, (1,)),  # BlackIsZero
        (T_SPP, 3, (spp,)),
        (T_PLANAR, 3, (2 if (planar and spp > 1) else 1,)),
        (T_SAMPLE_FMT, 3, (fmt,) * spp),
    ]
    tags.extend(seg_tags)
    if predictor != 1:
        tags.append((T_PREDICTOR, 3, (predictor,)))
    return segs, tags, off_tag, cnt_tag


def _georef_tags(gt, nodata, epsg) -> list[tuple[int, int, tuple]]:
    tags = []
    if gt is not None:
        if gt[2] == 0.0 and gt[4] == 0.0:
            tags.append((T_PIXEL_SCALE, 12, (gt[1], -gt[5], 0.0)))
            tags.append((T_TIEPOINT, 12, (0.0, 0.0, 0.0,
                                          gt[0], gt[3], 0.0)))
        else:
            tags.append((T_TRANSFORM, 12, (
                gt[1], gt[2], 0.0, gt[0], gt[4], gt[5], 0.0, gt[3],
                0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)))
    if epsg is not None:
        projected = epsg not in range(4000, 5000)
        key = GK_PROJECTED_CS if projected else GK_GEOGRAPHIC_TYPE
        tags.append((T_GEO_KEYS, 3, (
            1, 1, 1, 3,
            GK_MODEL_TYPE, 0, 1, 1 if projected else 2,
            GK_RASTER_TYPE, 0, 1, 1,
            key, 0, 1, epsg)))
    if nodata is not None:
        txt = (repr(nodata) if nodata != int(nodata)
               else str(int(nodata))).encode() + b"\x00"
        tags.append((T_GDAL_NODATA, 2, txt))
    return tags


def _pack_vals(typ, vals) -> bytes:
    if typ == 2:
        return bytes(vals)
    return struct.pack("<" + _TYPE_FMT[typ] * len(vals), *vals)


def _ifd_size(tags) -> int:
    size = 2 + 12 * len(tags) + 4
    for _tag, typ, vals in tags:
        n = len(_pack_vals(typ, vals))
        if n > 4:
            size += n + (n & 1)
    return size


def _encode_ifd(tags, ifd_off: int, next_off: int) -> bytes:
    entries = b""
    overflow: list[bytes] = []
    over_pos = ifd_off + 2 + 12 * len(tags) + 4
    for tag, typ, vals in sorted(tags, key=lambda t: t[0]):
        raw = _pack_vals(typ, vals)
        if len(raw) <= 4:
            inline = raw.ljust(4, b"\x00")
        else:
            inline = struct.pack("<I", over_pos)
            overflow.append(raw + (b"\x00" if len(raw) & 1 else b""))
            over_pos += len(overflow[-1])
        entries += struct.pack("<HHI", tag, typ, len(vals)) + inline
    return (struct.pack("<H", len(tags)) + entries
            + struct.pack("<I", next_off) + b"".join(overflow))


def _assemble_tiff(levels) -> bytes:
    """levels: [(segs, tags, off_tag, cnt_tag)] -> classic LE TIFF with
    the cloud-optimized layout: header, then ALL IFDs (so one header
    range-read exposes every level's metadata), then segment data."""
    n_off = [len(l[0]) for l in levels]
    # IFD sizes include the not-yet-added offset/count arrays
    sizes = []
    for (segs, tags, _o, _c), n in zip(levels, n_off):
        extra = [(T_STRIP_OFF, 4, (0,) * n), (T_STRIP_CNT, 4, (0,) * n)]
        sizes.append(_ifd_size(tags + extra))
    ifd_offs = []
    cur = 8
    for sz in sizes:
        ifd_offs.append(cur)
        cur += sz
    data_pos = cur
    blocks: list[bytes] = []
    ifds: list[bytes] = []
    for i, (segs, tags, off_tag, cnt_tag) in enumerate(levels):
        offsets, counts = [], []
        for s in segs:
            offsets.append(data_pos)
            counts.append(len(s))
            blocks.append(s + (b"\x00" if len(s) & 1 else b""))
            data_pos += len(s) + (len(s) & 1)
        full = tags + [(off_tag, 4, tuple(offsets)),
                       (cnt_tag, 4, tuple(counts))]
        nxt = ifd_offs[i + 1] if i + 1 < len(levels) else 0
        ifds.append(_encode_ifd(full, ifd_offs[i], nxt))
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_offs[0]))
    for b in ifds:
        out += b
    for b in blocks:
        out += b
    return bytes(out)


def write_geotiff(
    bands: list[np.ndarray] | np.ndarray,
    gt: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    *,
    dtype: str | None = None,
    compression: int = COMP_NONE,
    predictor: int = 1,
    tile: int | None = None,
    rows_per_strip: int | None = None,
    planar: bool = False,
    nodata: float | None = None,
    epsg: int | None = None,
) -> bytes:
    """Encode band arrays as classic little-endian GeoTIFF bytes.

    ``bands``: one (h,w) array or a list of them (equal shapes). Complex
    dtypes pass ``dtype='cint16'...`` with arrays already in the repo's
    interleaved (h, 2w) word layout, or complex numpy arrays.
    """
    arrs, dname, part, wordmul = _prep_arrays(bands, dtype)
    segs, tags, off_tag, cnt_tag = _plan_level(
        arrs, dname, part, wordmul, compression, predictor, tile,
        rows_per_strip, planar)
    tags.extend(_georef_tags(gt, nodata, epsg))
    return _assemble_tiff([(segs, tags, off_tag, cnt_tag)])


def write_cog(
    levels: list,
    gt: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    *,
    dtype: str | None = None,
    compression: int = COMP_DEFLATE,
    predictor: int = 1,
    tile: int = 256,
    nodata: float | None = None,
    epsg: int | None = None,
) -> bytes:
    """Cloud-Optimized-GeoTIFF-style encode: ``levels[0]`` is the full
    resolution image (one array or a band list), ``levels[1:]`` are
    reduced-resolution overviews (tagged ``NewSubfileType=1``, the
    reference's internal-overview model — ``core/gcore/overview.cpp``).
    All IFDs precede the pixel data so a header range-read exposes the
    whole pyramid's metadata, the property the COG spec is named for."""
    planned = []
    for i, bands in enumerate(levels):
        arrs, dname, part, wordmul = _prep_arrays(bands, dtype)
        segs, tags, off_tag, cnt_tag = _plan_level(
            arrs, dname, part, wordmul, compression, predictor, tile,
            None, False)
        if i == 0:
            tags.extend(_georef_tags(gt, nodata, epsg))
        else:
            tags.append((T_SUBFILE_TYPE, 4, (1,)))
            if nodata is not None:
                tags.extend(_georef_tags(None, nodata, None))
        planned.append((segs, tags, off_tag, cnt_tag))
    return _assemble_tiff(planned)


def _compress(raw: bytes, comp: int) -> bytes:
    if comp == COMP_NONE:
        return raw
    if comp == COMP_LZW:
        return lzw_encode(raw)
    if comp in (COMP_DEFLATE, COMP_DEFLATE_OLD):
        return zlib.compress(raw, 6)
    if comp == COMP_PACKBITS:
        return packbits_encode(raw)
    raise ValueError(f"unsupported TIFF compression {comp}")


# ---------------------------------------------------- Spark integration
def geotiff_to_tile_rows(raster_id: str, data: bytes, tile: int = 256,
                         overviews: bool = False) -> list[dict]:
    """Decode one GeoTIFF byte string into RASTER_SCHEMA tile rows
    (one set per band; complex bands use the interleaved-word layout).

    With ``overviews=True`` the whole IFD chain decodes and each level
    lands at its own ``zoom`` (0 = full resolution, the layout the
    pyramid/auto-overview operators consume); overview IFDs carry no
    geotags, so level k inherits level 0's georeference scaled by the
    size ratio — the reference's overview-band model."""
    levels = parse_geotiff_all(data) if overviews else [parse_geotiff(data)]
    rows: list[dict] = []
    g0 = levels[0]
    w0 = g0.bands[0].shape[1] // (2 if g0.dtype in _COMPLEX_PART else 1)
    for z, g in enumerate(levels):
        wordmul = 2 if g.dtype in _COMPLEX_PART else 1
        gt = g.gt
        if z > 0:
            ratio = w0 / (g.bands[0].shape[1] // wordmul)
            gt = (g0.gt[0], g0.gt[1] * ratio, g0.gt[2] * ratio,
                  g0.gt[3], g0.gt[4] * ratio, g0.gt[5] * ratio)
        for b, arr in enumerate(g.bands, start=1):
            if g.dtype in _COMPLEX_PART:
                rows.extend(complex_tiles_from_array(
                    raster_id, arr[:, 0::2].astype(np.float64),
                    arr[:, 1::2].astype(np.float64), gt, g.dtype,
                    tile=tile, band=b, zoom=z))
            else:
                rows.extend(tiles_from_array(
                    raster_id, arr, gt, tile=tile, band=b,
                    nodata=g.nodata if z == 0 else g0.nodata, zoom=z))
    return rows


def parse_geotiff_documents(files: DataFrame, content_col: str = "content",
                            id_col: str = "path", tile: int = 256,
                            overviews: bool = False) -> DataFrame:
    """(id, bytes) rows -> distributed RASTER_SCHEMA tile table.

    Pure narrow map: each file decodes inside its Arrow batch; no
    shuffle, no driver involvement — a million-file corpus fans out one
    decode per row across all executors.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for rid, blob in zip(b[id_col], b[content_col]):
                rows.extend(geotiff_to_tile_rows(str(rid), bytes(blob),
                                                 tile=tile,
                                                 overviews=overviews))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return files.select(id_col, content_col).mapInPandas(
        work, schema=RASTER_SCHEMA)


def read_geotiff(spark: SparkSession, path: str, tile: int = 256,
                 overviews: bool = False) -> DataFrame:
    """GeoTIFF file(s) at ``path`` (glob ok) -> distributed tile table;
    ``overviews=True`` also maps internal overview IFDs to zoom 1..n."""
    files = spark.read.format("binaryFile").load(path)
    return parse_geotiff_documents(files, tile=tile, overviews=overviews)


def tiles_to_geotiff(tiles: DataFrame, *, compression: int = COMP_DEFLATE,
                     predictor: int = 1, tile: int = 256,
                     cog: bool = True,
                     max_pixels_per_raster: int = 64 * 1024 * 1024
                     ) -> DataFrame:
    """Tile-table rows -> one encoded GeoTIFF blob per raster_id:
    (raster_id, n_bands, n_levels, tif binary) — the export sink
    (gdal_translate-to-file parity). Zoom levels become COG overview
    IFDs when ``cog``.

    A FILE is one object, so each raster's tiles gather into ONE task
    (groupBy raster_id + applyInPandas) — inherent to any file sink,
    same contract as the MBTiles writer. ``max_pixels_per_raster``
    guards the gather: beyond it (default 64 Mpx ≈ 512 MB float64)
    the encode raises instead of silently OOMing an executor; planetary
    rasters should export per-level tile tables (MBTiles/TMS sinks) or
    shard by window first.
    """
    import pandas as _pd

    def work(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        (rid,) = key
        total_px = int((pdf["tile_w"] * pdf["tile_h"]).sum())
        if total_px > max_pixels_per_raster:
            raise ValueError(
                f"raster {rid}: {total_px} px exceeds the single-file "
                f"gather guard ({max_pixels_per_raster}); export via the "
                "tile-store sinks or shard by window")
        levels = []
        for z in sorted(pdf["zoom"].unique()):
            zp = pdf[pdf["zoom"] == z]
            bands = []
            gt = None
            for b in sorted(zp["band"].unique()):
                bp = zp[zp["band"] == b]
                x_off, acc = {}, 0
                for tx in sorted(bp["tile_x"].unique()):
                    x_off[tx] = acc
                    acc += int(bp[bp["tile_x"] == tx]["tile_w"].iloc[0])
                w = acc
                y_off, acc = {}, 0
                for ty in sorted(bp["tile_y"].unique()):
                    y_off[ty] = acc
                    acc += int(bp[bp["tile_y"] == ty]["tile_h"].iloc[0])
                h = acc
                arr = np.zeros((h, w))
                for _, r in bp.iterrows():
                    th, tw = int(r["tile_h"]), int(r["tile_w"])
                    arr[y_off[r["tile_y"]]:y_off[r["tile_y"]] + th,
                        x_off[r["tile_x"]]:x_off[r["tile_x"]] + tw] = \
                        np.asarray(r["pixels"], np.float64).reshape(th, tw)
                    if r["tile_x"] == min(x_off) and \
                            r["tile_y"] == min(y_off):
                        gt = (r["gt0"], r["gt1"], r["gt2"], r["gt3"],
                              r["gt4"], r["gt5"])
                dt = zp["dtype"].iloc[0]
                bands.append(np.ascontiguousarray(arr).astype(dt))
            levels.append((bands, gt))
        nodata = pdf["nodata"].iloc[0]
        nodata = None if _pd.isna(nodata) else float(nodata)
        if cog and len(levels) > 1:
            data = write_cog([bs for bs, _gt in levels], levels[0][1],
                             compression=compression,
                             predictor=predictor, tile=tile,
                             nodata=nodata)
        else:
            data = write_geotiff(levels[0][0], levels[0][1],
                                 compression=compression,
                                 predictor=predictor, tile=tile,
                                 nodata=nodata)
        return _pd.DataFrame({
            "raster_id": [rid], "n_bands": [len(levels[0][0])],
            "n_levels": [len(levels)], "tif": [data]})

    return tiles.groupBy("raster_id").applyInPandas(
        work, schema="raster_id string, n_bands int, n_levels int, "
                     "tif binary")
