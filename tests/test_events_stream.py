"""Streaming session windows equal batch sessionization on same input."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import events as EV
from lib_gdal_spark.streaming import events_stream as ES

GAP_S = 8 * 3600  # 8h — same gap the batch driver query uses


@pytest.fixture(scope="module")
def staged(spark):
    d = tempfile.mkdtemp(prefix="events_stream_")
    src = os.path.join(d, "src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(4).write.parquet(src)
    yield d, src


def test_stream_sessions_match_batch(spark, staged):
    d, src = staged
    batch_src = spark.read.parquet(src)
    # no event gap ties the 8h boundary exactly (semantics note in the
    # module docstring) — assert the precondition, then exact parity
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    ties = batch_src.withColumn("g", us - F.lag(us).over(w)).where(
        F.col("g") == GAP_S * 1_000_000).count()
    assert ties == 0

    stream = spark.readStream.schema(batch_src.schema).parquet(src)
    sess = ES.sessionize_stream(stream, gap=f"{GAP_S} seconds",
                                watermark=None)
    q = (
        sess.writeStream.format("memory").queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(d, "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["w_start"]): r
        for r in spark.table("sess_stream").collect()
    }

    batch = EV.session_stats(batch_src, gap_us=GAP_S * 1_000_000)
    exp = batch.select(
        "user_id", "session_idx", "n_events", "start_us", "end_us"
    ).collect()
    assert len(got) == len(exp)
    for r in exp:
        key = None
        for (u, ws), g in got.items():
            if u == r["user_id"] and int(ws.timestamp() * 1e6) == r["start_us"]:
                key = (u, ws)
                break
        assert key is not None, r
        g = got[key]
        assert g["n_events"] == r["n_events"]
        # session_window end = last event + gap
        assert int(g["w_end"].timestamp() * 1e6) - GAP_S * 1_000_000 == \
            r["end_us"]
