"""Streaming link graph: the BATCH operator (operators/links.py)
runs unchanged on a Structured Streaming source — declare once, run
either way (the Spark-first property the engine is built around)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import links as LK


@pytest.fixture(scope="module")
def staged_pages(spark):
    d = tempfile.mkdtemp(prefix="links_stream_")
    src = os.path.join(d, "src")
    pages = spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".example/p")).alias("url"),
        F.concat(
            F.lit('<a href="https://h'),
            ((F.col("id") * 3 + 1) % 50).cast("string"),
            F.lit('.example/x">a</a><a href="https://h'),
            ((F.col("id") * 7 + 2) % 50).cast("string"),
            F.lit('.example/y">b</a>')).alias("html"))
    pages.repartition(4).write.parquet(src)
    yield d, src


def test_stream_link_graph_matches_batch(spark, staged_pages):
    d, src = staged_pages
    stream = spark.readStream.schema("url string, html string") \
        .parquet(src)
    q = (LK.host_link_graph(stream)
         .writeStream.format("memory").queryName("lg_stream")
         .outputMode("complete")
         .option("checkpointLocation", os.path.join(d, "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in spark.table("lg_stream").collect()}
    want = {(r["src_host"], r["dst_host"]): r["n_links"]
            for r in LK.host_link_graph(
                spark.read.parquet(src)).collect()}
    assert got == want and len(want) > 50
