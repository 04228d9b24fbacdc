"""OSM XML source (sources/osm.py) — distributed way assembly."""

import pandas as pd

from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.osm import (
    parse_osm, parse_osm_documents, way_geometries,
)

DOC_A = """<?xml version="1.0"?>
<osm version="0.6">
 <node id="1" lon="0.0" lat="0.0"/>
 <node id="2" lon="1.0" lat="0.0"><tag k="amenity" v="cafe"/></node>
 <node id="3" lon="1.0" lat="1.0"/>
 <node id="4" lon="0.0" lat="1.0"/>
 <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="3"/>
   <tag k="highway" v="residential"/></way>
 <way id="11"><nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/>
   <nd ref="1"/><tag k="building" v="yes"/></way>
 <relation id="20"><member type="way" ref="10" role="outer"/>
   <tag k="type" v="multipolygon"/></relation>
</osm>"""

# nodes referenced by DOC_A's way live partly in another document
DOC_B = """<osm><node id="5" lon="5.0" lat="5.0"/>
 <way id="12"><nd ref="5"/><nd ref="1"/></way></osm>"""


def test_parse_osm():
    rows = parse_osm(DOC_A)
    kinds = [r[0] for r in rows]
    assert kinds == ["node"] * 4 + ["way"] * 2 + ["relation"]
    node2 = rows[1]
    assert node2[1] == 2 and node2[2] == 1.0 and node2[6] == \
        {"amenity": "cafe"}
    way10 = rows[4]
    assert way10[4] == [1, 2, 3] and way10[6] == {"highway": "residential"}
    rel = rows[6]
    assert rel[5] == [("way", 10, "outer")]


def test_way_geometries_distributed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"osm": [DOC_A, DOC_B]}), schema="osm string")
    els = parse_osm_documents(docs)
    ways = {r["way_id"]: r for r in way_geometries(els).collect()}
    assert wkb_to_wkt(ways[10]["geom_wkb"]) == \
        "LINESTRING (0 0, 1 0, 1 1)"
    assert not ways[10]["is_closed"]
    # closed + building tag -> Polygon
    assert wkb_to_wkt(ways[11]["geom_wkb"]) == \
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    assert ways[11]["is_closed"]
    # cross-document node reference resolves through the join
    assert wkb_to_wkt(ways[12]["geom_wkb"]) == "LINESTRING (5 5, 0 0)"
