"""Sitemap source (sources/sitemap.py)."""

import pandas as pd

from lib_gdal_spark.sources.sitemap import (
    parse_sitemap, parse_sitemap_documents,
)

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc>https://a.example/p1</loc><lastmod>2024-01-05</lastmod>
   <changefreq>daily</changefreq><priority>0.8</priority></url>
 <url><loc>https://a.example/p2</loc></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <sitemap><loc>https://a.example/s1.xml</loc>
   <lastmod>2024-02-01</lastmod></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index():
    rows = parse_sitemap(URLSET, "a")
    assert rows[0] == ("a", "url", "https://a.example/p1", "2024-01-05",
                       "daily", 0.8)
    assert rows[1] == ("a", "url", "https://a.example/p2", None, None,
                       None)
    idx = parse_sitemap(INDEX, "a")
    assert idx == [("a", "sitemap", "https://a.example/s1.xml",
                    "2024-02-01", None, None)]


def test_distributed(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b"], "sitemap": [URLSET, INDEX]}),
        schema="src string, sitemap string")
    out = parse_sitemap_documents(df).collect()
    assert len(out) == 3
    kinds = sorted((r["src"], r["kind"]) for r in out)
    assert kinds == [("a", "url"), ("a", "url"), ("b", "sitemap")]
