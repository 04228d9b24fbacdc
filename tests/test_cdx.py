"""CDX/SURT index generation (operators/cdx.py)."""

import datetime as dt

from pyspark.sql import functions as F

from lib_gdal_spark.operators.cdx import cdx_index, surt_key
from lib_gdal_spark.session import local_df


def test_surt_key(spark):
    cases = [
        ("https://News.Example.com:443/A/b?z=1&a=2",
         "com,example,news)/a/b?a=2&z=1"),
        ("http://www.example.com/", "com,example)/"),
        ("http://example.com:80/path#frag", "com,example)/path"),
        ("https://sub.host.org/X", "org,host,sub)/x"),
        ("http://example.com", "com,example)/"),
    ]
    df = local_df(spark, [(u,) for u, _ in cases], "url string")
    got = [r["s"] for r in
           df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == [w for _, w in cases]


def test_cdx_index_sorted(spark):
    rows = [
        ("https://b.example/p", dt.datetime(2024, 1, 2, 3, 4, 5),
         200, "text/html", b"abc"),
        ("https://a.example/p", dt.datetime(2024, 2, 1, 0, 0, 0),
         200, "text/html", b"xy"),
        ("https://a.example/p", dt.datetime(2024, 1, 1, 0, 0, 0),
         301, "text/html", b"x"),
    ]
    df = local_df(spark, rows, "url string, warc_ts timestamp, "
                               "http_status int, content_type string, "
                               "body binary")
    out = cdx_index(df, buckets=2).collect()
    keys = [(r["surt"], r["ts"]) for r in out]
    assert keys == sorted(keys)  # globally ordered across buckets
    assert keys[0] == ("example,a)/p", "20240101000000")
    assert out[0]["length"] == 1 and out[0]["status"] == 301
    import hashlib
    assert out[0]["digest"] == hashlib.md5(b"x").hexdigest()
