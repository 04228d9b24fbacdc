"""Regression tests for OGR SQL plan helpers (VERDICT r1 #10).

- first_match_left_join must emit one row per primary ROW, not per primary
  key (reference semantics: drivers/ogr_gensql.cpp:1294-1325 iterates
  primary features, so duplicate join keys keep their own output rows).
- limit_offset with OFFSET != 0 must honor the caller's ORDER BY across a
  multi-partition input (the old monotonically_increasing_id window could
  skip the wrong rows after an exchange).
"""

from pyspark.sql import functions as F

from lib_gdal_spark.plans import ogr_sql as O


def test_first_match_join_duplicate_primary_keys(spark):
    primary = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, tag string"
    ).repartition(4)
    secondary = spark.createDataFrame(
        [(1, 10, "x"), (1, 11, "y"), (2, 20, "z")], "sk long, fid long, sv string"
    )
    out = O.first_match_left_join(
        primary, secondary,
        on=primary["k"] == secondary["sk"],
        primary_key="k", secondary_order="fid",
    )
    rows = {(r["k"], r["tag"]): (r["fid"], r["sv"]) for r in out.collect()}
    # one output row per primary row, duplicates preserved
    assert len(rows) == 4
    # first match (lowest fid) for both duplicate-key rows
    assert rows[(1, "a")] == (10, "x")
    assert rows[(1, "b")] == (10, "x")
    assert rows[(2, "c")] == (20, "z")
    # unmatched primary row NULL-padded
    assert rows[(3, "d")] == (None, None)


def test_limit_offset_multi_partition_order(spark):
    df = (
        spark.range(0, 1000, 1, 16)
        .select(F.col("id"), (999 - F.col("id")).alias("v"))
        .repartition(16)
    )
    ordered = O.order_by(df, ("v", True))
    out = O.limit_offset(ordered, limit=5, offset=10, order=[("v", True)])
    got = [r["v"] for r in out.orderBy("v").collect()]
    assert got == [10, 11, 12, 13, 14]


def test_limit_offset_requires_order(spark):
    df = spark.range(10)
    try:
        O.limit_offset(df, limit=2, offset=3)
    except ValueError as e:
        assert "order" in str(e)
    else:
        raise AssertionError("expected ValueError for OFFSET without order")
