"""KML source (drivers/vector/kml parity)."""

import pandas as pd

from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.kml import parse_kml, parse_kml_documents

DOC = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Folder><name>F</name>
  <Placemark><name>P1</name><description>a point</description>
    <Point><coordinates>16.37,48.2,151</coordinates></Point>
    <ExtendedData><Data name="pop"><value>1900000</value></Data></ExtendedData>
  </Placemark>
  <Placemark><name>L1</name>
    <LineString><coordinates>0,0 1,1 1,2</coordinates></LineString>
  </Placemark>
 </Folder>
 <Placemark><name>PG</name>
   <Polygon>
     <outerBoundaryIs><LinearRing>
       <coordinates>0,0 10,0 10,10 0,10 0,0</coordinates>
     </LinearRing></outerBoundaryIs>
     <innerBoundaryIs><LinearRing>
       <coordinates>2,2 4,2 4,4 2,4 2,2</coordinates>
     </LinearRing></innerBoundaryIs>
   </Polygon>
 </Placemark>
 <Placemark><name>MG</name>
   <MultiGeometry>
     <Point><coordinates>1,2</coordinates></Point>
     <Point><coordinates>3,4</coordinates></Point>
   </MultiGeometry>
 </Placemark>
 <Placemark><name>MIX</name>
   <MultiGeometry>
     <Point><coordinates>9,9</coordinates></Point>
     <LineString><coordinates>0,0 1,0</coordinates></LineString>
   </MultiGeometry>
 </Placemark>
</Document></kml>"""


def test_parse_kml():
    rows = parse_kml(DOC)
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0][1] == "P1" and rows[0][2] == "a point"
    assert wkb_to_wkt(rows[0][3]) == "POINT Z (16.37 48.2 151)"
    assert rows[0][4] == {"pop": "1900000"}
    assert wkb_to_wkt(rows[1][3]) == "LINESTRING (0 0, 1 1, 1 2)"
    assert wkb_to_wkt(rows[2][3]) == (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 4 2, 4 4, 2 4, 2 2))")
    assert wkb_to_wkt(rows[3][3]) == "MULTIPOINT ((1 2), (3 4))"
    assert wkb_to_wkt(rows[4][3]) == (
        "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 0))")


def test_parse_kml_distributed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "kml": [DOC, DOC]}),
        schema="doc_id long, kml string")
    out = parse_kml_documents(docs)
    assert out.count() == 10
    got = {(r["doc_id"], r["name"]) for r in
           out.where("name in ('P1','PG')").collect()}
    assert got == {(1, "P1"), (1, "PG"), (2, "P1"), (2, "PG")}
