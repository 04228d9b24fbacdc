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


def snapshot_intervals(snaps: DataFrame, key_col: str = "url",
                       crawl_col: str = "crawl",
                       hash_col: str = "content_hash") -> DataFrame:
    """SCD2-style version history: consecutive same-hash captures of a
    url collapse into one validity row —
    (url, version, content_hash, from_crawl, to_crawl, n_captures,
    is_current) — version numbering from 1 in capture order and
    ``is_current`` marking each url's latest version. The time-travel
    companion of :func:`snapshot_history`: joining a crawl id against
    [from_crawl, to_crawl] reconstructs the corpus as of that crawl
    without scanning every capture.

    Shape: one lag window to flag content changes, one running-sum
    window for the version id (both keyed by url — keys-only shuffle,
    payload hashes never move), then a combinable groupBy(url, version)
    and one max window for the current flag. No UDFs.
    """
    w = Window.partitionBy(key_col).orderBy(crawl_col)
    prev = F.lag(hash_col).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(hash_col)),
                 F.lit(1)).otherwise(F.lit(0))
    runs = snaps.select(
        key_col, crawl_col, hash_col,
        F.sum(chg).over(w).alias("version"),
    )
    iv = runs.groupBy(key_col, "version").agg(
        F.min_by(hash_col, crawl_col).alias(hash_col),
        F.min(crawl_col).alias("from_crawl"),
        F.max(crawl_col).alias("to_crawl"),
        F.count(F.lit(1)).alias("n_captures"),
    )
    wk = Window.partitionBy(key_col)
    return iv.select(
        key_col, "version", hash_col, "from_crawl", "to_crawl",
        "n_captures",
        (F.col("version") == F.max("version").over(wk)).alias("is_current"),
    )
