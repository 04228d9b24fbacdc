"""JSON-LD geo mining: Place extraction, non-Place and script-less
pages stay NULL, malformed JSON degrades to NULL (not an error), and
the hex cell matches the point helpers."""

from pyspark.sql import functions as F

from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.operators.geo import jsonld_geo
from lib_gdal_spark.session import local_df


def _pages(spark, rows):
    return local_df(spark, rows, "url long, html string")


def _place(lat_i, lon_i):
    return ('<html><script type="application/ld+json">'
            '{"@type":"Place","geo":{"latitude":%d,"longitude":%d}}'
            "</script></html>" % (lat_i, lon_i))


def test_extraction_and_nulls(spark):
    rows = [
        (1, _place(482100, 164000)),
        (2, '<html><script type="application/ld+json">'
            '{"@type":"Article"}</script></html>'),
        (3, "<html><body>no script</body></html>"),
        (4, '<html><script type="application/ld+json">{oops'
            "</script></html>"),                         # malformed
        (5, _place(-335500, 1512000)),
    ]
    out = {r["url"]: r for r in jsonld_geo(_pages(spark, rows)).collect()}
    assert (out[1]["lat"], out[1]["lon"]) == (48.21, 16.4)
    assert (out[5]["lat"], out[5]["lon"]) == (-33.55, 151.2)
    for u in (2, 3, 4):
        assert out[u]["lat"] is None and out[u]["hq"] is None


def test_hex_cell_matches_helper(spark):
    rows = [(1, _place(482100, 164000))]
    r = jsonld_geo(_pages(spark, rows)).collect()[0]
    h = (local_df(spark, [(16.41, 48.21)], "lon double, lat double")
         .select(C.hex_axial_expr(F.col("lon"), F.col("lat"), 4.0)
                 .alias("h")).first()["h"])
    # lon 16.4 vs helper-at-16.41 — same 4-deg hex cell
    assert (r["hq"], r["hr"]) == (h["q"], h["r"])
