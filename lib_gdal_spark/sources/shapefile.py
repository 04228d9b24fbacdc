"""ESRI Shapefile source/sink — the reference's most-used vector format
(``drivers/vector/shape/ogrshapelayer.cpp``, ``shpopen.c``),
reimplemented from the public ESRI Shapefile Technical Description
(July 1998) over the repo's WKB model.

Reader: ``.shp`` geometry records (Null/Point/MultiPoint/PolyLine/
Polygon and their Z/M variants — M values dropped, the repo model is
X/Y/Z), ring-orientation polygon assembly (clockwise outer rings, holes
assigned by point-in-ring containment, the shapefile analog of OGR's
``organizePolygons``), and ``.dbf`` dBase-III attributes (C/N/F/L/D
fields) exposed as a ``map<string,string>`` column.

Writer: Point/PointZ, PolyLine(Z), Polygon(Z), MultiPoint(Z) ``.shp``
plus a dBase-III ``.dbf`` with C and N fields, byte-deterministic (fixed
header date), so encode→decode round-trips are exact.

Distributed shape: like the other file sources the scalable unit is MANY
shapefiles — the ``.shp``/``.dbf`` sidecar pairs are matched by path
stem with one broadcast-free equi-join over file stems (keys only, tiny)
and each pair parses inside an Arrow batch: a million-file corpus is one
narrow map after the pair join.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G

SHP_NULL, SHP_POINT, SHP_POLYLINE, SHP_POLYGON, SHP_MULTIPOINT = \
    0, 1, 3, 5, 8
SHP_POINT_Z, SHP_POLYLINE_Z, SHP_POLYGON_Z, SHP_MULTIPOINT_Z = \
    11, 13, 15, 18
SHP_POINT_M, SHP_POLYLINE_M, SHP_POLYGON_M, SHP_MULTIPOINT_M = \
    21, 23, 25, 28

FEATURE_SCHEMA = "src string, fid long, geom_wkb binary, " \
                 "attrs map<string,string>"


# --------------------------------------------------------------- .shp
def _ring_signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    x0, y0 = x[:-1], y[:-1]
    x1, y1 = x[1:], y[1:]
    cond = (y0 <= py) != (y1 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.sum(cond & (xs > px)) & 1)


def _assemble_polygon(rings: list[np.ndarray]) -> bytes:
    """Shapefile ring soup -> WKB Polygon/MultiPolygon. Clockwise
    (negative signed area) rings are shells; each counter-clockwise ring
    becomes a hole of the shell containing its first vertex."""
    shells = [[r] for r in rings if _ring_signed_area(r) <= 0]
    holes = [r for r in rings if _ring_signed_area(r) > 0]
    if not shells:  # degenerate: treat every ring as a shell
        shells = [[r] for r in rings]
        holes = []
    for hole in holes:
        px, py = float(hole[0, 0]), float(hole[0, 1])
        target = next((s for s in shells if _point_in_ring(px, py, s[0])),
                      shells[0])
        target.append(hole)
    if len(shells) == 1:
        return G.wkb_polygon(shells[0])
    return G.wkb_multipolygon(shells)


def _read_xy(data: bytes, off: int, n: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f8", count=2 * n,
                         offset=off).reshape(n, 2)


def _shape_to_wkb(data: bytes, off: int, length: int) -> bytes | None:
    (stype,) = struct.unpack_from("<i", data, off)
    base = stype % 10 if stype else 0
    has_z = stype in (SHP_POINT_Z, SHP_POLYLINE_Z, SHP_POLYGON_Z,
                      SHP_MULTIPOINT_Z)
    o = off + 4
    if stype == SHP_NULL:
        return None
    if base == SHP_POINT:
        x, y = struct.unpack_from("<2d", data, o)
        if has_z:
            (z,) = struct.unpack_from("<d", data, o + 16)
            return G.wkb_point(x, y, z)
        return G.wkb_point(x, y)
    if base == SHP_MULTIPOINT:
        (n,) = struct.unpack_from("<i", data, o + 32)
        pts = _read_xy(data, o + 36, n)
        if has_z:
            z = np.frombuffer(data, "<f8", n, o + 36 + 16 * n + 16)
            pts = np.column_stack([pts, z])
        return G.wkb_multipoint(pts)
    # polyline / polygon share the (parts, points) layout
    nparts, npts = struct.unpack_from("<2i", data, o + 32)
    parts = np.frombuffer(data, "<i4", nparts, o + 40)
    pts_off = o + 40 + 4 * nparts
    pts = _read_xy(data, pts_off, npts)
    if has_z:
        z = np.frombuffer(data, "<f8", npts, pts_off + 16 * npts + 16)
        pts = np.column_stack([pts, z])
    bounds = np.append(parts, npts)
    pieces = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
    if base == SHP_POLYLINE:
        if len(pieces) == 1:
            return G.wkb_linestring(pieces[0])
        return G.wkb_multilinestring(pieces)
    return _assemble_polygon(pieces)


def parse_shp(data: bytes) -> list[tuple[int, bytes | None]]:
    """.shp bytes -> [(fid, wkb_or_None)] in record order (fid 0-based,
    matching the reference's shapefile FID numbering)."""
    (code,) = struct.unpack_from(">i", data, 0)
    if code != 9994:
        raise ValueError("not a shapefile: bad file code")
    (flen_words,) = struct.unpack_from(">i", data, 24)
    end = min(len(data), flen_words * 2)
    out = []
    off = 100
    fid = 0
    while off + 8 <= end:
        _recno, clen_words = struct.unpack_from(">2i", data, off)
        out.append((fid, _shape_to_wkb(data, off + 8, clen_words * 2)))
        fid += 1
        off += 8 + clen_words * 2
    return out


# --------------------------------------------------------------- .dbf
def parse_dbf(data: bytes) -> tuple[list[str], list[dict[str, str]]]:
    """dBase-III .dbf bytes -> (field names, per-record {name: text}).
    Values are trimmed text; deleted records ('*' flag) are skipped."""
    nrec, hsize, rsize = struct.unpack_from("<IHH", data, 4)
    fields = []
    off = 32
    while off < hsize - 1 and data[off] != 0x0D:
        name = data[off:off + 11].split(b"\x00")[0].decode("ascii",
                                                           "replace")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    recs = []
    off = hsize
    for _ in range(nrec):
        if off + rsize > len(data):
            break
        if data[off:off + 1] != b"*":
            row = {}
            p = off + 1
            for name, _t, flen in fields:
                row[name] = data[p:p + flen].decode("ascii",
                                                    "replace").strip()
                p += flen
            recs.append(row)
        off += rsize
    return [f[0] for f in fields], recs


# -------------------------------------------------------------- writer
def write_shp(geoms: list[tuple[int, list[np.ndarray]]],
              shape_type: int) -> bytes:
    """[(shape_type_ignored, parts)] -> .shp bytes. ``parts`` is a list
    of (n,2|3) float arrays; for Point shapes a single (1,2|3) array."""
    has_z = shape_type in (SHP_POINT_Z, SHP_POLYLINE_Z, SHP_POLYGON_Z,
                           SHP_MULTIPOINT_Z)
    base = shape_type % 10 if shape_type else 0
    recs = []
    allpts = []
    for _st, parts in geoms:
        if base == SHP_POINT:
            p = parts[0][0]
            body = struct.pack("<i2d", shape_type, p[0], p[1])
            if has_z:
                body += struct.pack("<d", p[2] if len(p) > 2 else 0.0)
            allpts.append(np.atleast_2d(p[:2]))
        else:
            pts = np.vstack(parts)
            allpts.append(pts[:, :2])
            xmin, ymin = pts[:, :2].min(axis=0)
            xmax, ymax = pts[:, :2].max(axis=0)
            if base == SHP_MULTIPOINT:
                body = struct.pack("<i4di", shape_type, xmin, ymin,
                                   xmax, ymax, len(pts))
                body += pts[:, :2].astype("<f8").tobytes()
            else:
                idx = np.cumsum([0] + [len(p) for p in parts[:-1]])
                body = struct.pack("<i4d2i", shape_type, xmin, ymin,
                                   xmax, ymax, len(parts), len(pts))
                body += idx.astype("<i4").tobytes()
                body += pts[:, :2].astype("<f8").tobytes()
            if has_z:
                z = (pts[:, 2] if pts.shape[1] > 2
                     else np.zeros(len(pts)))
                body += struct.pack("<2d", z.min(), z.max())
                body += z.astype("<f8").tobytes()
        recs.append(body)
    allxy = np.vstack(allpts) if allpts else np.zeros((1, 2))
    bbox = (allxy[:, 0].min(), allxy[:, 1].min(),
            allxy[:, 0].max(), allxy[:, 1].max())
    total = 100 + sum(8 + len(r) for r in recs)
    hdr = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total // 2)
    hdr += struct.pack("<2i4d4d", 1000, shape_type, *bbox,
                       0.0, 0.0, 0.0, 0.0)
    out = bytearray(hdr)
    for i, r in enumerate(recs):
        out += struct.pack(">2i", i + 1, len(r) // 2)
        out += r
    return bytes(out)


def write_dbf(fields: list[tuple[str, str, int]],
              rows: list[list]) -> bytes:
    """fields: [(name, 'C'|'N', width)]; rows of matching values ->
    dBase-III bytes (deterministic: fixed header date)."""
    rsize = 1 + sum(w for _n, _t, w in fields)
    hsize = 32 + 32 * len(fields) + 1
    out = bytearray(struct.pack("<B3BIHH20x", 0x03, 95, 7, 26,
                                len(rows), hsize, rsize))
    for name, ftype, width in fields:
        out += name.encode("ascii")[:11].ljust(11, b"\x00")
        out += ftype.encode("ascii")
        out += b"\x00" * 4 + bytes([width]) + b"\x00" * 15
    out += b"\x0d"
    for row in rows:
        out += b" "
        for (name, ftype, width), val in zip(fields, row):
            txt = "" if val is None else str(val)
            enc = txt.encode("ascii", "replace")[:width]
            out += enc.ljust(width, b" ") if ftype == "C" \
                else enc.rjust(width, b" ")
        # fixed-width: no terminator per record
    out += b"\x1a"
    return bytes(out)


# ---------------------------------------------------- Spark integration
def parse_shapefile(shp: bytes, dbf: bytes | None,
                    src: str = "") -> list[tuple]:
    feats = parse_shp(shp)
    attrs: list[dict[str, str] | None]
    if dbf is not None:
        _names, recs = parse_dbf(dbf)
        attrs = [recs[i] if i < len(recs) else None
                 for i in range(len(feats))]
    else:
        attrs = [None] * len(feats)
    return [(src, fid, wkb, a)
            for (fid, wkb), a in zip(feats, attrs)]


def parse_shapefile_documents(pairs: DataFrame,
                              shp_col: str = "shp",
                              dbf_col: str = "dbf",
                              id_col: str = "src") -> DataFrame:
    """(src, shp_bytes, dbf_bytes?) rows -> distributed feature table."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for _, r in b.iterrows():
                dbf = r[dbf_col] if dbf_col in b.columns else None
                rows.extend(parse_shapefile(
                    bytes(r[shp_col]),
                    bytes(dbf) if dbf is not None else None,
                    str(r[id_col])))
            yield pd.DataFrame(rows,
                               columns=["src", "fid", "geom_wkb", "attrs"])

    return pairs.mapInPandas(work, schema=FEATURE_SCHEMA)


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """Shapefile(s) at ``path`` (glob of .shp, e.g. ``dir/*.shp``) ->
    distributed feature table; ``.dbf`` sidecars matched by stem."""
    shp = spark.read.format("binaryFile").load(path).select(
        F.regexp_replace("path", r"\.shp$", "").alias("stem"),
        F.col("content").alias("shp"))
    dbf_glob = path[:-4] + ".dbf" if path.endswith(".shp") else path
    try:
        dbf = spark.read.format("binaryFile").load(dbf_glob).select(
            F.regexp_replace("path", r"\.dbf$", "").alias("stem"),
            F.col("content").alias("dbf"))
        pairs = shp.join(dbf, "stem", "left")
    except Exception:
        pairs = shp.withColumn("dbf", F.lit(None).cast("binary"))
    return parse_shapefile_documents(
        pairs.withColumnRenamed("stem", "src"))
