"""Web link-graph construction from raw page HTML — the edge-list side
of the crawl pipeline (what ``operators/graph.pagerank`` and
``triangle_counts`` consume).

Everything here is pure JVM column work: href extraction is one
``regexp_extract_all`` over the decoded html, host parsing one
``regexp_extract`` — no Python touches the corpus, so the whole stage
is a zero-shuffle narrow map until the final keys-only edge aggregate.
At 10^12 pages the shuffle carries only (src_host, dst_host) pairs,
never page bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# double-quoted href values of <a> tags; the reference-free, both-engine
# (Java regex / RE2) subset — no lookaround
HREF_RE = r'<a[^>]*\shref="([^"]*)"'
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def extract_links(html_col: Column) -> Column:
    """html (string or binary) -> array of href values, in document order."""
    s = html_col.cast("string")
    return F.regexp_extract_all(s, F.lit(HREF_RE), 1)


def url_host(url_col: Column) -> Column:
    """Absolute URL -> lower-cased host ('' for relative links)."""
    return F.lower(F.regexp_extract(url_col, HOST_RE, 1))


def host_link_graph(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> host-level edge list (src_host, dst_host, n_links),
    self-links and relative (host-less) links dropped.

    One explode of the per-page href array (O(links) rows, strings only)
    followed by a map-side-combinable groupBy on the host pair.
    """
    edges = (
        pages.select(
            url_host(F.col(url_col)).alias("src_host"),
            F.explode(extract_links(F.col(html_col))).alias("href"),
        )
        .select("src_host", url_host(F.col("href")).alias("dst_host"))
        .where((F.col("dst_host") != "") & (F.col("dst_host") != F.col("src_host")))
    )
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("n_links")
    )


def host_in_degree(host_edges: DataFrame) -> DataFrame:
    """Edge list -> per-destination-host (in_links, n_src_hosts)."""
    return host_edges.groupBy("dst_host").agg(
        F.sum("n_links").cast("long").alias("in_links"),
        F.count("*").cast("long").alias("n_src_hosts"),
    )


ANCHOR_RE = r'<a[^>]*\shref="([^"]*)"[^>]*>(.*?)</a>'


def anchor_texts(html_col: Column) -> Column:
    """html -> array<struct<href,anchor>>: the (link, anchor text)
    pairs anchor-text datasets are built from. Two regexp_extract_all
    passes over the SAME pattern (one per capture group — Spark extracts
    one group at a time) stay index-aligned by construction; inner
    markup strips with a JVM transform, so the whole extraction is
    codegen'd column work."""
    s = html_col.cast("string")
    hrefs = F.regexp_extract_all(s, F.lit(ANCHOR_RE), 1)
    inner = F.regexp_extract_all(s, F.lit(ANCHOR_RE), 2)
    text = F.transform(
        inner, lambda t: F.trim(F.regexp_replace(t, r"<[^>]*>", "")))
    return F.arrays_zip(hrefs.alias("href"), text.alias("anchor"))


def anchor_text_pairs(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """pages -> (src_host, href, anchor) rows — the anchor-text corpus
    (one explode, strings only; zero shuffle)."""
    return pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(anchor_texts(F.col(html_col))).alias("a"),
    ).select("src_host", F.col("a.href").alias("href"),
             F.col("a.anchor").alias("anchor"))


def co_citation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_out_degree: int = 1000,
) -> DataFrame:
    """Co-citation counts (Small 1973, the web-graph similarity classic):
    for every unordered page pair (a, b), how many distinct sources link
    BOTH — the "cited together" signal HITS/SALSA build on. Returns
    (dst_a, dst_b, n_common) with dst_a < dst_b.

    Scale shape: one distinct on (src, dst), one combinable out-degree
    count, then the per-source pair explode — quadratic ONLY in a single
    source's out-degree, which ``max_out_degree`` caps (sources above it
    are dropped, the standard hub-cutoff; a nav-bar hub linking 10^4
    pages contributes 10^8 meaningless pairs otherwise). The pair join
    itself is a self equi-join on src — never a cross product.
    """
    d = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).distinct()
    deg = d.groupBy("s").agg(F.count(F.lit(1)).alias("__deg"))
    kept = d.join(
        deg.where(F.col("__deg") <= max_out_degree).select("s"), "s")
    a = kept.select("s", F.col("t").alias("dst_a"))
    b = kept.select("s", F.col("t").alias("dst_b"))
    return (
        a.join(b, "s")
        .where(F.col("dst_a") < F.col("dst_b"))
        .groupBy("dst_a", "dst_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def bibliographic_coupling(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_in_degree: int = 1000,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): for every source pair, how
    many distinct targets BOTH link — co_citation on the transposed
    graph. Returns (src_a, src_b, n_common); ``max_in_degree`` caps the
    per-target explode (a page cited by everyone pairs everyone)."""
    out = co_citation(
        edges.select(F.col(dst_col).alias("src"),
                     F.col(src_col).alias("dst")),
        max_out_degree=max_in_degree,
    )
    return out.select(
        F.col("dst_a").alias("src_a"), F.col("dst_b").alias("src_b"),
        "n_common")
