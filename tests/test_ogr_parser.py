"""OGR SQL string front-end vs direct DataFrame expressions."""

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.plans.ogr_parser import execute_sql


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return {
        "customer": spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "lineitem": spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
    }


def test_select_where_like(tables):
    out = execute_sql(
        tables,
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_mktsegment LIKE '%build%'",
    )
    want = tables["customer"].where(
        F.lower(F.col("c_mktsegment")).like("%build%")
    ).count()
    assert out.count() == want > 0
    assert out.columns == ["c_custkey", "c_name"]


def test_two_valued_null_and_in(tables):
    out = execute_sql(
        tables,
        "SELECT l_orderkey FROM lineitem "
        "WHERE NOT l_tax > 0.05 AND l_returnflag IN ('A', 'R')",
    )
    # two-valued: NULL > 0.05 is FALSE, NOT FALSE = TRUE -> NULLs included
    df = tables["lineitem"]
    want = df.where(
        ~F.coalesce(F.col("l_tax") > 0.05, F.lit(False))
        & F.coalesce(F.col("l_returnflag").isin("A", "R"), F.lit(False))
    ).count()
    assert out.count() == want


def test_summary_aggregates(tables):
    row = execute_sql(
        tables,
        "SELECT COUNT(*) AS n, MIN(l_quantity) AS mn, MAX(l_quantity) AS mx, "
        "COUNT(DISTINCT l_returnflag) AS nf FROM lineitem",
    ).collect()[0]
    df = tables["lineitem"]
    assert row["n"] == df.count()
    assert row["mn"] == df.agg(F.min("l_quantity")).first()[0]
    assert row["nf"] == df.select("l_returnflag").distinct().count()


def test_order_limit_offset(tables):
    out = execute_sql(
        tables,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5 OFFSET 2",
    ).collect()
    ref = (
        tables["orders"]
        .orderBy(F.col("o_totalprice").desc_nulls_last(),
                 F.col("o_orderkey").asc_nulls_first())
        .limit(7).collect()[2:]
    )
    assert [r["o_orderkey"] for r in out] == [r["o_orderkey"] for r in ref]


def test_distinct_and_expressions(tables):
    out = execute_sql(
        tables, "SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag"
    ).collect()
    vals = [r["l_returnflag"] for r in out]
    assert vals == sorted(vals)
    out2 = execute_sql(
        tables,
        "SELECT c_custkey, c_custkey % 7 AS bucket, "
        "CAST(c_acctbal AS INTEGER) AS bal, "
        "CONCAT(c_name, '#x') AS tag FROM customer LIMIT 3",
    )
    assert out2.columns == ["c_custkey", "bucket", "bal", "tag"]
    assert out2.count() == 3


def test_left_join_first_match(tables):
    out = execute_sql(
        tables,
        "SELECT c_custkey, o_orderkey FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey",
    )
    # first-match-only: one row per customer
    assert out.count() == tables["customer"].count()


def test_union_all_and_multi_join(tables):
    out = execute_sql(
        tables,
        "SELECT c_custkey AS k, c_name AS name FROM customer "
        "UNION ALL SELECT o_orderkey AS k, o_orderpriority AS name FROM orders",
    )
    assert out.count() == (tables["customer"].count()
                           + tables["orders"].count())
    assert out.columns == ["k", "name"]
