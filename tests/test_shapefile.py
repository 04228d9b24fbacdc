"""ESRI Shapefile source/sink (sources/shapefile.py)."""

import numpy as np

from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.shapefile import (
    SHP_MULTIPOINT, SHP_POINT, SHP_POINT_Z, SHP_POLYGON, SHP_POLYLINE,
    SHP_POLYLINE_Z,
    parse_dbf, parse_shapefile_documents, parse_shp, read_shapefile,
    write_dbf, write_shp,
)


def _pts(*xy):
    return np.asarray(xy, dtype=np.float64)


def test_point_roundtrip():
    shp = write_shp([(0, [_pts((3.5, -2.25))]),
                     (0, [_pts((10.0, 20.0))])], SHP_POINT)
    feats = parse_shp(shp)
    assert [f[0] for f in feats] == [0, 1]
    assert wkb_to_wkt(feats[0][1]) == "POINT (3.5 -2.25)"
    assert wkb_to_wkt(feats[1][1]) == "POINT (10 20)"
    shpz = write_shp([(0, [np.array([[1.0, 2.0, 7.5]])])], SHP_POINT_Z)
    assert wkb_to_wkt(parse_shp(shpz)[0][1]) == "POINT Z (1 2 7.5)"


def test_polyline_and_multipart():
    one = write_shp([(0, [_pts((0, 0), (1, 1), (2, 1))])], SHP_POLYLINE)
    assert wkb_to_wkt(parse_shp(one)[0][1]) == "LINESTRING (0 0, 1 1, 2 1)"
    two = write_shp(
        [(0, [_pts((0, 0), (1, 0)), _pts((5, 5), (6, 5), (7, 6))])],
        SHP_POLYLINE)
    assert wkb_to_wkt(parse_shp(two)[0][1]) == \
        "MULTILINESTRING ((0 0, 1 0), (5 5, 6 5, 7 6))"
    z = write_shp([(0, [np.array([[0, 0, 1], [1, 0, 2]], float)])],
                  SHP_POLYLINE_Z)
    assert wkb_to_wkt(parse_shp(z)[0][1]) == "LINESTRING Z (0 0 1, 1 0 2)"


def test_multipoint():
    shp = write_shp([(0, [_pts((1, 2), (3, 4))])], SHP_MULTIPOINT)
    assert wkb_to_wkt(parse_shp(shp)[0][1]) == "MULTIPOINT ((1 2), (3 4))"


def test_polygon_ring_assembly():
    # shell clockwise, hole counter-clockwise (shapefile convention)
    shell = _pts((0, 0), (0, 10), (10, 10), (10, 0), (0, 0))
    hole = _pts((2, 2), (4, 2), (4, 4), (2, 4), (2, 2))
    shp = write_shp([(0, [shell, hole])], SHP_POLYGON)
    wkt = wkb_to_wkt(parse_shp(shp)[0][1])
    assert wkt == ("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), "
                   "(2 2, 4 2, 4 4, 2 4, 2 2))")
    # two shells + one hole -> MultiPolygon with hole in the right shell
    shell2 = _pts((20, 0), (20, 5), (25, 5), (25, 0), (20, 0))
    shp = write_shp([(0, [shell, shell2, hole])], SHP_POLYGON)
    wkt = wkb_to_wkt(parse_shp(shp)[0][1])
    assert wkt.startswith("MULTIPOLYGON")
    assert "(2 2, 4 2, 4 4, 2 4, 2 2)" in wkt
    assert "(20 0, 20 5, 25 5, 25 0, 20 0)" in wkt


def test_null_shape():
    import struct
    body = struct.pack("<i", 0)
    shp = write_shp([(0, [_pts((0, 0))])], SHP_POINT)
    # splice a null record: simpler — parse a hand-built null-only file
    hdr = shp[:100]
    rec = struct.pack(">2i", 1, len(body) // 2) + body
    data = bytearray(hdr + rec)
    struct.pack_into(">i", data, 24, len(data) // 2)
    feats = parse_shp(bytes(data))
    assert feats == [(0, None)]


def test_dbf_roundtrip():
    fields = [("NAME", "C", 10), ("POP", "N", 8)]
    dbf = write_dbf(fields, [["wien", 1900000], ["graz", 290000]])
    names, recs = parse_dbf(dbf)
    assert names == ["NAME", "POP"]
    assert recs == [{"NAME": "wien", "POP": "1900000"},
                    {"NAME": "graz", "POP": "290000"}]


def test_distributed_parse(spark, tmp_path):
    for i in range(3):
        shp = write_shp([(0, [_pts((i, 0), (i + 1, 1))])], SHP_POLYLINE)
        dbf = write_dbf([("TAG", "C", 6)], [[f"f{i}"]])
        (tmp_path / f"s{i}.shp").write_bytes(shp)
        (tmp_path / f"s{i}.dbf").write_bytes(dbf)
    out = read_shapefile(spark, str(tmp_path / "*.shp")).collect()
    assert len(out) == 3
    tags = sorted(r["attrs"]["TAG"] for r in out)
    assert tags == ["f0", "f1", "f2"]
    assert all(r["geom_wkb"] is not None and r["fid"] == 0 for r in out)


def test_distributed_parse_no_dbf(spark):
    import pandas as pd
    shp = write_shp([(0, [_pts((5, 5))])], SHP_POINT)
    df = spark.createDataFrame(
        pd.DataFrame({"src": ["a"], "shp": [shp]}),
        schema="src string, shp binary")
    out = parse_shapefile_documents(df, dbf_col="missing").collect()
    assert len(out) == 1 and out[0]["attrs"] is None
    assert wkb_to_wkt(out[0]["geom_wkb"]) == "POINT (5 5)"


def test_reference_poly_shp():
    """The reference's own poly.shp/.dbf fixture (test_ogr_shape.cpp,
    the classic OGR autotest layer): 10 polygon features whose EAS_ID
    sequence is pinned across the reference's test suite, and whose
    shoelace areas must match the stored AREA attribute."""
    import os
    import pytest as _pt
    base = "/root/reference/tests/cpp/data"
    if not os.path.exists(f"{base}/poly.shp"):
        _pt.skip("reference test data not present")
    from lib_gdal_spark.functions import geometry as G
    feats = parse_shp(open(f"{base}/poly.shp", "rb").read())
    names, recs = parse_dbf(open(f"{base}/poly.dbf", "rb").read())
    assert len(feats) == 10 and names == ["AREA", "EAS_ID", "PRFEDEA"]
    assert [r["EAS_ID"] for r in recs] == \
        ["168", "179", "171", "173", "172", "169", "166", "158",
         "165", "170"]
    for (_fid, wkb), rec in zip(feats, recs):
        area = G.shoelace_area(G.polygon_rings(wkb))
        assert abs(area - float(rec["AREA"])) / float(rec["AREA"]) < 1e-6
