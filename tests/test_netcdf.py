"""netCDF-3 classic codec (sources/netcdf.py): header/type/record-var
coverage per the Unidata NetCDF Classic Format Specification."""

import struct

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.sources.netcdf import (
    grid_from_netcdf, parse_netcdf, parse_netcdf_documents,
    write_netcdf, write_netcdf_grid)


def _name(s):
    b = s.encode()
    return struct.pack(">I", len(b)) + b + b"\0" * ((-len(b)) % 4)


def test_grid_roundtrip_and_southup_flip():
    arr = (np.arange(12, dtype=float)[:, None] * 3
           + np.arange(15)[None, :]) % 7
    gt = (-5.0, 0.25, 0.0, 42.0, 0.0, -0.125)
    a2, gt2 = grid_from_netcdf(write_netcdf_grid(arr, gt))
    assert np.array_equal(arr, a2) and gt2 == pytest.approx(gt, abs=1e-12)
    # ascending-latitude (south-up) coords must flip back to north-up
    h, w = arr.shape
    lat_up = gt[3] + gt[5] * (np.arange(h) + 0.5)
    blob = write_netcdf(
        [("lat", h), ("lon", w)],
        [("lat", ["lat"], {}, lat_up[::-1].astype(float)),
         ("lon", ["lon"], {},
          (gt[0] + gt[1] * (np.arange(w) + 0.5)).astype(float)),
         ("z", ["lat", "lon"], {}, arr[::-1].astype(float))])
    a3, gt3 = grid_from_netcdf(blob)
    assert np.array_equal(arr, a3) and gt3 == pytest.approx(gt, abs=1e-12)


def test_all_types_and_attributes():
    vs = [("b", ["d"], {"k": "v"}, np.array([-3, 0, 5], dtype=np.int8)),
          ("s", ["d"], {}, np.array([-300, 0, 500], dtype=np.int16)),
          ("i", ["d"], {}, np.array([-7, 0, 9], dtype=np.int32) * 10**6),
          ("f", ["d"], {}, np.array([0.5, -1.25, 3], dtype=np.float32)),
          ("dd", ["d"], {}, np.array([1e-9, -2.5, 0], dtype=np.float64)),
          ("c", ["d"], {}, np.frombuffer(b"abc", dtype="S1"))]
    nc = parse_netcdf(write_netcdf(
        [("d", 3)], vs,
        gatts={"title": "t", "levels": np.array([1, 2], dtype=np.int32)}))
    for nm, _, atts, a in vs:
        v = nc["vars"][nm]
        assert np.array_equal(v["data"].astype(a.dtype), a), nm
        assert v["atts"] == atts
    assert nc["gatts"] == {"title": "t", "levels": [1, 2]}
    assert nc["dims"] == [("d", 3)]


def _record_file(numrecs_field, nrec=3):
    hdr = b"CDF\x01" + struct.pack(">I", numrecs_field)
    hdr += struct.pack(">II", 0x0A, 2) + _name("t") + struct.pack(">I", 0) \
        + _name("x") + struct.pack(">I", 2)
    hdr += struct.pack(">II", 0, 0)
    hdr += struct.pack(">II", 0x0B, 2)
    vh_u = _name("u") + struct.pack(">I", 2) + struct.pack(">II", 0, 1) \
        + struct.pack(">II", 0, 0) + struct.pack(">II", 3, 4)
    vh_v = _name("v") + struct.pack(">I", 1) + struct.pack(">I", 0) \
        + struct.pack(">II", 0, 0) + struct.pack(">II", 4, 4)
    base = len(hdr) + len(vh_u) + 4 + len(vh_v) + 4
    hdr += vh_u + struct.pack(">I", base) + vh_v + struct.pack(">I", base + 4)
    body = b"".join(struct.pack(">hh", r, r * 10) + struct.pack(">i", 100 + r)
                    for r in range(nrec))
    return hdr + body


def test_record_variables_interleaved():
    nc = parse_netcdf(_record_file(3))
    assert nc["vars"]["u"]["data"].tolist() == [[0, 0], [1, 10], [2, 20]]
    assert nc["vars"]["v"]["data"].tolist() == [100, 101, 102]
    assert dict(nc["dims"])["t"] == 3


def test_streaming_numrecs_derived_from_length():
    nc = parse_netcdf(_record_file(0xFFFFFFFF, nrec=4))
    assert dict(nc["dims"])["t"] == 4
    assert nc["vars"]["v"]["data"].tolist() == [100, 101, 102, 103]


def test_cdf2_64bit_offsets():
    # same single fixed var, version byte 2, begin as int64
    hdr = b"CDF\x02" + struct.pack(">I", 0)
    hdr += struct.pack(">II", 0x0A, 1) + _name("d") + struct.pack(">I", 2)
    hdr += struct.pack(">II", 0, 0)
    hdr += struct.pack(">II", 0x0B, 1)
    vh = _name("w") + struct.pack(">I", 1) + struct.pack(">I", 0) \
        + struct.pack(">II", 0, 0) + struct.pack(">II", 6, 16)
    base = len(hdr) + len(vh) + 8
    hdr += vh + struct.pack(">q", base)
    nc = parse_netcdf(hdr + struct.pack(">dd", 2.5, -1.5))
    assert nc["vars"]["w"]["data"].tolist() == [2.5, -1.5]


def test_rejects_non_netcdf():
    with pytest.raises(ValueError, match="CDF-1/CDF-2"):
        parse_netcdf(b"HDF\x01" + b"\0" * 64)


def test_distributed_parse(spark):
    arr = (np.arange(20, dtype=float)[:, None]
           + np.arange(30)[None, :]) % 11
    blob = write_netcdf_grid(arr, (0.0, 1.0, 0.0, 20.0, 0.0, -1.0))
    files = spark.createDataFrame(
        pd.DataFrame([("a.nc", blob), ("b.nc", blob)],
                     columns=["path", "content"]))
    tiles = parse_netcdf_documents(files, tile=16).collect()
    assert {t["raster_id"] for t in tiles} == {"a.nc", "b.nc"}
    total = sum(sum(t["pixels"]) for t in tiles
                if t["raster_id"] == "a.nc")
    assert total == arr.sum()
