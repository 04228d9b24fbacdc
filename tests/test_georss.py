"""GeoRSS source (sources/georss.py)."""

import pandas as pd

from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.georss import (
    parse_georss, parse_georss_documents,
)

DOC = """<?xml version="1.0"?>
<rss version="2.0" xmlns:georss="http://www.georss.org/georss"
     xmlns:geo="http://www.w3.org/2003/01/geo/wgs84_pos#">
 <channel><title>feed</title>
  <item><title>A</title><link>https://x/1</link>
    <pubDate>Tue, 02 Jan 2024 03:04:05 GMT</pubDate>
    <georss:point>45.256 -71.92</georss:point></item>
  <item><title>B</title>
    <georss:line>45 -110 46 -109 47 -108</georss:line></item>
  <item><title>C</title>
    <georss:polygon>45 -110 45 -109 46 -109 45 -110</georss:polygon></item>
  <item><title>D</title><geo:lat>55.7</geo:lat><geo:long>12.5</geo:long></item>
  <item><title>E</title></item>
 </channel>
</rss>"""


def test_parse_georss():
    rows = parse_georss(DOC, "f")
    assert len(rows) == 5
    # GeoRSS order is LAT LON -> WKB is lon lat
    assert wkb_to_wkt(rows[0][5]) == "POINT (-71.92 45.256)"
    assert rows[0][2] == "A" and rows[0][3] == "https://x/1"
    assert rows[0][4].startswith("Tue, 02 Jan")
    assert wkb_to_wkt(rows[1][5]) == \
        "LINESTRING (-110 45, -109 46, -108 47)"
    assert wkb_to_wkt(rows[2][5]) == \
        "POLYGON ((-110 45, -109 45, -109 46, -110 45))"
    assert wkb_to_wkt(rows[3][5]) == "POINT (12.5 55.7)"  # W3C geo
    assert rows[4][5] is None  # geometry-less item kept


def test_distributed(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b"], "rss": [DOC, DOC]}),
        schema="src string, rss string")
    out = parse_georss_documents(df)
    assert out.count() == 10
    assert out.where("geom_wkb IS NOT NULL").count() == 8
