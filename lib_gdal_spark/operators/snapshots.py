"""Crawl-snapshot change detection over (url, crawl, content_hash).

Common Crawl-style corpora carry every page many times, once per crawl
(the input-hint schema's (url, warc_ts) pair); incremental pipelines
need, per snapshot row, whether the page is NEW, CHANGED, or UNCHANGED
versus its previous capture, and which urls have disappeared by the
final crawl (GONE). The reference has no analog (it stops at raster
band deltas — `gdalcompare` semantics, apps/gdalcompare.py in spirit);
this is the webtext companion built the Spark-native way.

Scale shape: one window keyed by url (keys-only shuffle of
(url, crawl, hash) — content never moves), and the gone-set is a
groupBy(url).max(crawl) anti-filter, combinable map-side. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_history(snaps: DataFrame, key_col: str = "url",
                     crawl_col: str = "crawl",
                     hash_col: str = "content_hash") -> DataFrame:
    """Per snapshot row: status = new | changed | unchanged, by lag of
    the content hash within each url's capture sequence."""
    w = Window.partitionBy(key_col).orderBy(crawl_col)
    prev = F.lag(hash_col).over(w)
    status = (F.when(prev.isNull(), F.lit("new"))
              .when(prev == F.col(hash_col), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return snaps.select(key_col, crawl_col, status.alias("status"))


def snapshot_gone(snaps: DataFrame, last_crawl: int,
                  key_col: str = "url",
                  crawl_col: str = "crawl") -> DataFrame:
    """Urls whose final capture precedes ``last_crawl`` — reported as
    one (url, last_crawl, 'gone') row each."""
    return (snaps.groupBy(key_col)
            .agg(F.max(crawl_col).alias("_last"))
            .filter(F.col("_last") < last_crawl)
            .select(key_col, F.lit(last_crawl).alias(crawl_col),
                    F.lit("gone").alias("status")))


def snapshot_delta(snaps: DataFrame, last_crawl: int,
                   key_col: str = "url", crawl_col: str = "crawl",
                   hash_col: str = "content_hash") -> DataFrame:
    """Full per-row change log: history statuses plus gone rows."""
    return (snapshot_history(snaps, key_col, crawl_col, hash_col)
            .unionByName(snapshot_gone(snaps, last_crawl,
                                       key_col, crawl_col)))
