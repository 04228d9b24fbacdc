"""netCDF-3 classic codec — the reference's netCDF driver
(``drivers/raster/netcdf/netcdfdataset.cpp``) reads gridded CF data
through libnetcdf; this is a from-scratch pure-stdlib implementation of
the public classic file format (the NetCDF Classic Format Specification,
Unidata): magic 'CDF\\x01' (CDF-1, 32-bit offsets) / 'CDF\\x02' (CDF-2,
64-bit offsets), big-endian header with dim/gatt/var lists, fixed
variables at absolute offsets, and record variables interleaved per
record along the unlimited dimension.

Reader supports both versions, all six external types (byte, char,
short, int, float, double), fixed AND record variables, and global +
per-variable attributes. Writer emits fixed-variable CDF-1 files
(records are a read path only — the gridded-raster use case never needs
them on write; documented).

Distributed shape: one task per .nc file via ``binaryFile`` — model
output and satellite L3 products tile time/space into many files, the
same narrow map as every codec here. The 2-D variable -> tile-table
adapter derives the geotransform from evenly spaced 1-D CF coordinate
variables (lon/x ascending, lat/y either orientation, flipped north-up).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.sources.rasters import RASTER_COLS, tiles_from_array

_NC_BYTE, _NC_CHAR, _NC_SHORT, _NC_INT, _NC_FLOAT, _NC_DOUBLE = range(1, 7)
_SIZES = {_NC_BYTE: 1, _NC_CHAR: 1, _NC_SHORT: 2, _NC_INT: 4,
          _NC_FLOAT: 4, _NC_DOUBLE: 8}
_DTYPES = {_NC_BYTE: ">i1", _NC_CHAR: "S1", _NC_SHORT: ">i2",
           _NC_INT: ">i4", _NC_FLOAT: ">f4", _NC_DOUBLE: ">f8"}
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Cursor:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.o = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.d, self.o)[0]
        self.o += 4
        return v

    def i64(self) -> int:
        v = struct.unpack_from(">q", self.d, self.o)[0]
        self.o += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.d[self.o:self.o + n].decode("utf-8")
        self.o += _pad4(n)
        return s

    def values(self, nc_type: int, nelems: int):
        size = _SIZES[nc_type] * nelems
        raw = self.d[self.o:self.o + size]
        self.o += _pad4(size)
        if nc_type == _NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=_DTYPES[nc_type],
                             count=nelems).tolist()


def _att_list(c: _Cursor) -> dict:
    tag = c.u32()
    n = c.u32()
    if tag == 0 and n == 0:
        return {}
    if tag != _TAG_ATT:
        raise ValueError(f"bad attribute-list tag 0x{tag:X}")
    out = {}
    for _ in range(n):
        nm = c.name()
        t = c.u32()
        ne = c.u32()
        out[nm] = c.values(t, ne)
    return out


def parse_netcdf(data: bytes) -> dict:
    """netCDF classic bytes -> {'dims': [(name, length)], 'gatts': {...},
    'vars': {name: {'dims': [names], 'atts': {...}, 'data': ndarray}}}.
    The unlimited dimension reports its actual record count in 'dims';
    char variables decode to fixed-width bytes arrays ('S1')."""
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a netCDF classic file (CDF-1/CDF-2 magic)")
    wide = data[3] == 2
    c = _Cursor(data)
    c.o = 4
    numrecs = c.u32()

    tag = c.u32()
    n = c.u32()
    dims: list[tuple[str, int]] = []
    if tag == _TAG_DIM:
        for _ in range(n):
            nm = c.name()
            dims.append((nm, c.u32()))
    elif (tag, n) != (0, 0):
        raise ValueError(f"bad dim-list tag 0x{tag:X}")
    rec_dim = next((i for i, (_, ln) in enumerate(dims) if ln == 0), None)

    gatts = _att_list(c)

    tag = c.u32()
    n = c.u32()
    if tag not in (_TAG_VAR, 0) or (tag == 0 and n != 0):
        raise ValueError(f"bad var-list tag 0x{tag:X}")
    hdr = []
    for _ in range(n if tag == _TAG_VAR else 0):
        nm = c.name()
        nd = c.u32()
        dimids = [c.u32() for _ in range(nd)]
        atts = _att_list(c)
        t = c.u32()
        vsize = c.u32()
        begin = c.i64() if wide else c.u32()
        hdr.append((nm, dimids, atts, t, vsize, begin))

    rec_vars = [h for h in hdr if h[1] and rec_dim is not None
                and h[1][0] == rec_dim]
    # the spec's single-record-var exception: no per-record padding
    recsize = (sum(_pad4(_slab_size(h, dims)) for h in rec_vars)
               if len(rec_vars) != 1
               else _slab_size(rec_vars[0], dims))
    if numrecs == 0xFFFFFFFF:  # STREAMING sentinel: derive from length
        numrecs = ((len(data) - min(h[5] for h in rec_vars)) // recsize
                   if rec_vars and recsize else 0)

    out_vars = {}
    for h in hdr:
        nm, dimids, atts, t, _vsize, begin = h
        shape = [dims[i][1] for i in dimids]
        dt = np.dtype(_DTYPES[t])
        if rec_dim is not None and dimids and dimids[0] == rec_dim:
            slab = shape[1:]
            cnt = int(np.prod(slab, dtype=np.int64)) if slab else 1
            recs = [np.frombuffer(data, dtype=dt, count=cnt,
                                  offset=begin + r * recsize)
                    for r in range(numrecs)]
            arr = (np.stack(recs).reshape([numrecs] + slab)
                   if recs else np.empty([0] + slab, dtype=dt))
        else:
            cnt = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(data, dtype=dt, count=cnt,
                                offset=begin).reshape(shape)
        out_vars[nm] = {"dims": [dims[i][0] for i in dimids],
                        "atts": atts, "data": arr}
    rep_dims = [(nm, numrecs if ln == 0 else ln) for nm, ln in dims]
    return {"dims": rep_dims, "gatts": gatts, "vars": out_vars}


def _slab_size(h, dims) -> int:
    _nm, dimids, _atts, t, _vsize, _begin = h
    cnt = 1
    for i in dimids[1:]:
        cnt *= dims[i][1]
    return cnt * _SIZES[t]


def _enc_name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + b + b"\0" * (_pad4(len(b)) - len(b))


def _enc_atts(atts: dict) -> bytes:
    if not atts:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", _TAG_ATT, len(atts))
    for nm, val in atts.items():
        out += _enc_name(nm)
        if isinstance(val, str):
            raw = val.encode("utf-8")
            out += struct.pack(">II", _NC_CHAR, len(raw)) + raw
            out += b"\0" * (_pad4(len(raw)) - len(raw))
        else:
            vals = np.asarray(val)
            t = {"f8": _NC_DOUBLE, "f4": _NC_FLOAT, "i4": _NC_INT,
                 "i2": _NC_SHORT, "i1": _NC_BYTE}[vals.dtype.str[1:]]
            raw = vals.astype(_DTYPES[t]).tobytes()
            out += struct.pack(">II", t, vals.size) + raw
            out += b"\0" * (_pad4(len(raw)) - len(raw))
    return out


def write_netcdf(dims: list[tuple[str, int]],
                 variables: list[tuple[str, list[str], dict, np.ndarray]],
                 gatts: dict | None = None) -> bytes:
    """Fixed-variable CDF-1 writer. ``variables`` entries are
    (name, dim_names, atts, array); array dtype picks the external type
    (float64 -> double, float32 -> float, int32 -> int, int16 -> short,
    int8 -> byte, S1 -> char). No unlimited dimension (read-only path)."""
    dim_ix = {nm: i for i, (nm, _) in enumerate(dims)}
    hdr = bytearray(b"CDF\x01" + struct.pack(">I", 0))
    hdr += struct.pack(">II", _TAG_DIM, len(dims))
    for nm, ln in dims:
        hdr += _enc_name(nm) + struct.pack(">I", ln)
    hdr += _enc_atts(gatts or {})
    hdr += struct.pack(">II", _TAG_VAR, len(variables))

    bodies = []
    var_hdrs = []
    for nm, dnames, atts, arr in variables:
        arr = np.asarray(arr)
        t = {"f8": _NC_DOUBLE, "f4": _NC_FLOAT, "i4": _NC_INT,
             "i2": _NC_SHORT, "i1": _NC_BYTE, "S1": _NC_CHAR}[
                 arr.dtype.str[1:]]
        raw = (arr.tobytes() if t == _NC_CHAR
               else arr.astype(_DTYPES[t]).tobytes())
        vsize = _pad4(len(raw))
        vh = _enc_name(nm) + struct.pack(">I", len(dnames))
        for d in dnames:
            vh += struct.pack(">I", dim_ix[d])
        vh += _enc_atts(atts) + struct.pack(">II", t, vsize)
        var_hdrs.append((vh, vsize))
        bodies.append(raw + b"\0" * (vsize - len(raw)))

    base = len(hdr) + sum(len(vh) + 4 for vh, _ in var_hdrs)
    begin = base
    for (vh, vsize), body in zip(var_hdrs, bodies):
        hdr += vh + struct.pack(">I", begin)
        begin += vsize
    return bytes(hdr) + b"".join(bodies)


def write_netcdf_grid(arr: np.ndarray, gt: tuple,
                      var: str = "z", units: str = "1") -> bytes:
    """North-up 2-D array + geotransform -> a CF-style classic file with
    1-D 'lon'/'lat' coordinate variables (cell centers) and a double
    data variable. The inverse of the parse path's gt derivation."""
    h, w = arr.shape
    lon = gt[0] + gt[1] * (np.arange(w) + 0.5)
    lat = gt[3] + gt[5] * (np.arange(h) + 0.5)
    return write_netcdf(
        [("lat", h), ("lon", w)],
        [("lat", ["lat"], {"units": "degrees_north"}, lat.astype(np.float64)),
         ("lon", ["lon"], {"units": "degrees_east"}, lon.astype(np.float64)),
         (var, ["lat", "lon"], {"units": units}, arr.astype(np.float64))],
        gatts={"Conventions": "CF-1.6"})


def grid_from_netcdf(data: bytes, var: str | None = None
                     ) -> tuple[np.ndarray, tuple]:
    """2-D variable + evenly spaced 1-D coord vars -> (north-up array,
    geotransform). ``var`` defaults to the first 2-D non-coordinate
    variable; descending-latitude files flip to north-up."""
    nc = parse_netcdf(data)
    names = {nm for nm, _ in nc["dims"]}
    if var is None:
        var = next(nm for nm, v in nc["vars"].items()
                   if len(v["dims"]) == 2 and nm not in names)
    v = nc["vars"][var]
    ydim, xdim = v["dims"]
    xs = nc["vars"][xdim]["data"].astype(np.float64)
    ys = nc["vars"][ydim]["data"].astype(np.float64)
    dx = float(xs[1] - xs[0]) if len(xs) > 1 else 1.0
    dy = float(ys[1] - ys[0]) if len(ys) > 1 else -1.0
    arr = v["data"].astype(np.float64)
    if dy > 0:  # south-up on disk -> flip
        arr = arr[::-1]
        ys = ys[::-1]
        dy = -dy
    gt = (float(xs[0]) - dx / 2, dx, 0.0,
          float(ys[0]) - dy / 2, 0.0, dy)
    return arr, gt


def parse_netcdf_documents(files: DataFrame, content_col: str = "content",
                           id_col: str = "path", var: str | None = None,
                           tile: int = 256) -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for rid, blob in zip(b[id_col], b[content_col]):
                arr, gt = grid_from_netcdf(bytes(blob), var=var)
                rows.extend(tiles_from_array(str(rid), arr, gt, tile=tile))
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA
    return files.select(id_col, content_col).mapInPandas(
        work, schema=RASTER_SCHEMA)


def read_netcdf(spark: SparkSession, path: str, var: str | None = None,
                tile: int = 256) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)
    return parse_netcdf_documents(files, var=var, tile=tile)
