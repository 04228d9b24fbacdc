"""Streaming hourly-count rollup equals the batch time-series spine
on the same input — ties the session-12 time-series family into the
Structured Streaming surface (the counts that feed ACF/decomposition
come from a watermarked tumbling-window rollup in production)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.timeseries import hourly_counts


@pytest.fixture(scope="module")
def staged(spark):
    d = tempfile.mkdtemp(prefix="ts_stream_")
    src = os.path.join(d, "src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(4).write.parquet(src)
    yield d, src


def test_stream_hourly_counts_match_batch(spark, staged):
    d, src = staged
    batch_src = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_src.schema).parquet(src)
    # parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    rolled = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select(F.col("w.start").alias("h_start"), "x")
    )
    q = (
        rolled.writeStream.format("memory").queryName("ts_stream")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(d, "ck_ts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {int(r["h_start"].timestamp()) // 3600: r["x"]
           for r in spark.table("ts_stream").collect()}

    # batch spine: same hours, same counts (stream omits silent hours;
    # the spine zero-fills them — compare the non-zero support exactly)
    base = batch_src.agg(
        F.min(F.floor(F.unix_timestamp("ts") / 3600))).first()[0]
    dense = {int(r["t"]) + int(base): r["x"]
             for r in hourly_counts(batch_src).collect()}
    assert set(got) == {h for h, x in dense.items() if x > 0}
    for h, x in got.items():
        assert dense[h] == x
