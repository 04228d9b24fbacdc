"""Link-graph construction from HTML (operators/links.py)."""

from pyspark.sql import functions as F

from lib_gdal_spark.operators.links import (
    extract_links, host_in_degree, host_link_graph, url_host,
)
from lib_gdal_spark.session import local_df


PAGES = [
    ("https://a.example/p1",
     '<html><a href="https://b.example/x">b</a>'
     '<a rel="no" href="https://c.example/y?q=1">c</a>'
     '<a href="/relative">r</a><a href="https://a.example/self">s</a></html>'),
    ("https://b.example/p2",
     '<a href="https://c.example/z">c</a><a href="https://c.example/w">c</a>'),
    ("https://c.example/p3", "<html>no links</html>"),
]


def test_extract_links_and_host(spark):
    df = local_df(spark, PAGES, "url string, html string")
    row = df.select(extract_links(F.col("html")).alias("l"),
                    url_host(F.col("url")).alias("h")).collect()[0]
    assert row["l"] == ["https://b.example/x", "https://c.example/y?q=1",
                        "/relative", "https://a.example/self"]
    assert row["h"] == "a.example"
    # binary html decodes through the same path
    bdf = local_df(
        spark, [(PAGES[0][1].encode(),)], "html binary"
    )
    assert bdf.select(extract_links(F.col("html")).alias("l")) \
              .collect()[0]["l"][0] == "https://b.example/x"


def test_host_link_graph(spark):
    df = local_df(spark, PAGES, "url string, html string")
    edges = {(r["src_host"], r["dst_host"]): r["n_links"]
             for r in host_link_graph(df).collect()}
    # relative + self links dropped; duplicate b->c edges aggregated
    assert edges == {
        ("a.example", "b.example"): 1,
        ("a.example", "c.example"): 1,
        ("b.example", "c.example"): 2,
    }
    indeg = {r["dst_host"]: (r["in_links"], r["n_src_hosts"])
             for r in host_in_degree(host_link_graph(df)).collect()}
    assert indeg == {"b.example": (1, 1), "c.example": (3, 2)}


def test_anchor_texts(spark):
    from lib_gdal_spark.operators.links import anchor_text_pairs
    df = local_df(spark, [
        ("https://a.example/p",
         '<a href="https://b.example/x">Click <b>here</b></a>'
         '<a class="z" href="/rel">  rel text </a>'
         '<a href="https://c.example/y"><img src="i.png"/></a>'),
    ], "url string, html string")
    rows = anchor_text_pairs(df).collect()
    got = [(r["href"], r["anchor"]) for r in rows]
    assert got == [("https://b.example/x", "Click here"),
                   ("/rel", "rel text"),
                   ("https://c.example/y", "")]
    assert all(r["src_host"] == "a.example" for r in rows)
