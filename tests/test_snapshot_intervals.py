"""SCD2 snapshot_intervals: hand-built capture histories with known
version runs, the as-of reconstruction property, and agreement with
snapshot_history's change classification."""

from pyspark.sql import functions as F

from lib_gdal_spark.operators.snapshots import (
    snapshot_history,
    snapshot_intervals,
)
from lib_gdal_spark.session import local_df


def _snaps(spark, rows):
    return local_df(spark, rows, "url string, crawl long, content_hash string")


def test_runs_collapse(spark):
    rows = [
        ("a", 0, "h1"), ("a", 1, "h1"), ("a", 2, "h2"), ("a", 3, "h2"),
        ("a", 4, "h1"),                       # content reverts: NEW version
        ("b", 1, "x"),                        # single capture
    ]
    out = {(r["url"], r["version"]): r
           for r in snapshot_intervals(_snaps(spark, rows)).collect()}
    assert len(out) == 4
    a1 = out[("a", 1)]
    assert (a1["content_hash"], a1["from_crawl"], a1["to_crawl"],
            a1["n_captures"], a1["is_current"]) == ("h1", 0, 1, 2, False)
    a2 = out[("a", 2)]
    assert (a2["content_hash"], a2["from_crawl"], a2["to_crawl"]) == ("h2", 2, 3)
    a3 = out[("a", 3)]
    assert (a3["content_hash"], a3["is_current"]) == ("h1", True)
    b1 = out[("b", 1)]
    assert (b1["from_crawl"], b1["to_crawl"], b1["is_current"]) == (1, 1, True)


def test_as_of_reconstruction(spark):
    # joining crawl c against [from_crawl, to_crawl] yields exactly the
    # hash captured at c for every url present at c
    rows = [("u%d" % i, c, "h%d" % ((i * 3 + c) // 2))
            for i in range(20) for c in range(4) if (i + c) % 5 != 0]
    snaps = _snaps(spark, rows)
    iv = snapshot_intervals(snaps)
    for c in (0, 2, 3):
        asof = (iv.where((F.col("from_crawl") <= c)
                         & (F.col("to_crawl") >= c))
                .select("url", "content_hash"))
        want = sorted((u, h) for (u, cc, h) in rows if cc == c)
        got = sorted(map(tuple, asof.collect()))
        assert got == want


def test_version_count_matches_history_changes(spark):
    rows = [("a", 0, "h1"), ("a", 1, "h2"), ("a", 2, "h2"), ("a", 3, "h3"),
            ("b", 0, "y"), ("b", 2, "y")]
    snaps = _snaps(spark, rows)
    hist = snapshot_history(snaps)
    n_versions = {r["url"]: r["v"] for r in
                  snapshot_intervals(snaps).groupBy("url")
                  .agg(F.max("version").alias("v")).collect()}
    n_changes = {r["url"]: r["n"] for r in
                 hist.where(F.col("status") != "unchanged")
                 .groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n_versions == n_changes  # new + changed rows == version count
