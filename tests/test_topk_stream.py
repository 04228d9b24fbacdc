"""Streaming Space-Saving heavy hitters: exact parity with the batch
count when k exceeds per-partition vocabulary; bounded state, the
count >= true >= count - err sandwich, and the N/k retention guarantee
under small k — all stated per partition over the LATEST snapshot,
exactly the operator's consumer contract."""

import os
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lib_gdal_spark.streaming import topk_stream as TS

N_PARTS = 4


@pytest.fixture(scope="module")
def staged_tokens(spark):
    d = tempfile.mkdtemp(prefix="topk_stream_")
    src = os.path.join(d, "src")
    # Zipf-ish: token t{j} appears (40 - j) times, j in 0..39
    rows = []
    i = 0
    for j in range(40):
        for _ in range(40 - j):
            rows.append((i, "t%02d" % j))
            i += 1
    df = spark.createDataFrame(rows, "seq long, token string")
    df.repartition(5).write.parquet(src)     # 5 micro-batches
    yield d, src


def _run(spark, src, d, name, k):
    stream = (spark.readStream.schema("seq long, token string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (TS.heavy_hitters_stream(stream, k=k, n_parts=N_PARTS)
         .writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", os.path.join(d, "ck_" + name))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    out = spark.table(name)
    w = Window.partitionBy("part")
    return (out.withColumn("__mt", F.max("trig").over(w))
            .where(F.col("trig") == F.col("__mt"))
            .select("part", "token", "count", "err"))


def _true_per_part(spark, src):
    t = spark.read.parquet(src).select(
        F.pmod(F.xxhash64("token"), F.lit(N_PARTS)).cast("int").alias("part"),
        "token")
    return {(r["part"], r["token"]): r["n"] for r in
            t.groupBy("part", "token").agg(F.count(F.lit(1)).alias("n"))
            .collect()}


def test_exact_parity_when_k_covers_vocab(spark, staged_tokens):
    d, src = staged_tokens
    snap = _run(spark, src, d, "hh_big", k=64)
    got = {(r["part"], r["token"]): r["count"] for r in snap.collect()}
    assert got == _true_per_part(spark, src)
    assert snap.agg(F.max("err")).first()[0] == 0  # nothing evicted


def test_small_k_bounds_state_with_guarantees(spark, staged_tokens):
    d, src = staged_tokens
    k = 6
    snap = _run(spark, src, d, "hh_small", k=k).collect()
    true = _true_per_part(spark, src)
    per_part_rows = {}
    for r in snap:
        per_part_rows.setdefault(r["part"], []).append(r)
    n_part = {}
    for (p, _), n in true.items():
        n_part[p] = n_part.get(p, 0) + n
    for p, rows in per_part_rows.items():
        assert len(rows) <= k                      # bounded state
        for r in rows:                             # sandwich invariant
            t = true.get((p, r["token"]), 0)
            assert r["count"] >= t
            assert r["count"] - r["err"] <= t
        # retention guarantee: true count > N_part / k => present
        present = {r["token"] for r in rows}
        for (pp, tok), n in true.items():
            if pp == p and n > n_part[p] / k:
                assert tok in present, (p, tok, n, n_part[p])
