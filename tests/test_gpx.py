"""GPX source (drivers/vector/gpx parity)."""

import pandas as pd

from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.gpx import parse_gpx, parse_gpx_documents

DOC = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
  <wpt lat="48.2" lon="16.37"><ele>151</ele><name>Wien</name></wpt>
  <wpt lat="52.5" lon="13.4"><name>Berlin</name></wpt>
  <rte><name>R1</name>
    <rtept lat="0" lon="0"/><rtept lat="1" lon="1"/><rtept lat="2" lon="1"/>
  </rte>
  <trk><name>T1</name>
    <trkseg><trkpt lat="10" lon="20"><ele>5</ele></trkpt>
            <trkpt lat="11" lon="21"><ele>6</ele></trkpt></trkseg>
    <trkseg><trkpt lat="12" lon="22"/><trkpt lat="13" lon="23"/></trkseg>
  </trk>
</gpx>"""


def test_parse_gpx_layers():
    rows = parse_gpx(DOC)
    by_layer = {}
    for r in rows:
        by_layer.setdefault(r[0], []).append(r)
    assert {k: len(v) for k, v in by_layer.items()} == {
        "waypoints": 2, "routes": 1, "route_points": 3,
        "tracks": 1, "track_points": 4,
    }
    wpt = by_layer["waypoints"][0]
    assert wkb_to_wkt(wpt[2]) == "POINT Z (16.37 48.2 151)"
    assert wpt[3] == "Wien" and wpt[4] == 151.0
    assert wkb_to_wkt(by_layer["waypoints"][1][2]) == "POINT (13.4 52.5)"
    assert wkb_to_wkt(by_layer["routes"][0][2]) == \
        "LINESTRING (0 0, 1 1, 1 2)"
    assert wkb_to_wkt(by_layer["tracks"][0][2]) == \
        "MULTILINESTRING ((20 10, 21 11), (22 12, 23 13))"
    # track_points carry (track_fid, seg_id, point_id) back-references
    tp = [(r[5], r[6], r[7]) for r in by_layer["track_points"]]
    assert tp == [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)]


def test_parse_gpx_distributed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "gpx": [DOC, DOC]}),
        schema="doc_id long, gpx string",
    )
    out = parse_gpx_documents(docs)
    assert out.count() == 22
    got = out.where("layer = 'track_points' AND doc_id = 2").count()
    assert got == 4
    names = {r["name"] for r in
             out.where("layer = 'waypoints'").collect()}
    assert names == {"Wien", "Berlin"}
