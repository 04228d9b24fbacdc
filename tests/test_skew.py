"""Salting / skew machinery: identical results, spread load."""

from __future__ import annotations

from pyspark.sql import functions as F

from lib_gdal_spark.operators import skew as SK


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share one key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("cell"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("cell"), (F.col("id") * 100).alias("attr")
    )
    plain = big.join(small, "cell").select("cell", "payload", "attr")
    salted = SK.salted_join(big, small, "cell", n_salt=8).select(
        "cell", "payload", "attr"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_detect_hot_keys(spark):
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("cell")
    )
    hot = SK.detect_hot_keys(big, "cell", threshold_ratio=3.0).collect()
    assert [r["cell"] for r in hot] == [7]


def test_spatial_repartition_orders_cells(spark):
    df = spark.range(1000).select((F.col("id") * 7919 % 997).alias("cell"))
    parts = SK.spatial_repartition(df, "cell", num_partitions=8)
    # range partitioning: per-partition max(cell) is non-overlapping
    import pandas as pd

    def bounds(it):
        for b in it:
            if len(b):
                yield pd.DataFrame({"lo": [b["cell"].min()],
                                    "hi": [b["cell"].max()]})

    rows = parts.mapInPandas(bounds, "lo long, hi long").collect()
    spans = sorted((r["lo"], r["hi"]) for r in rows)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2
