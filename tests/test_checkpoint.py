"""Resumable checkpointed stages: per-partition lineage + metrics (north rule)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.sources import pages as PG
from lib_gdal_spark.streaming.checkpoint import CheckpointedStage


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ckpt")


def _partition_df(spark, key: str):
    lo = int(key) * 1000
    pg = PG.generate_pages(spark, 1000, partitions=2)
    # shift ids into this partition's range deterministically via the url id
    return pg.withColumn("part_key", F.lit(key)).where(F.length("url") > 0)


def test_run_and_resume(spark, root):
    stage = CheckpointedStage(spark, root, "enrich")
    keys = [str(i) for i in range(4)]
    assert stage.pending(keys) == keys

    # first run: complete only half, as if the job died mid-pipeline
    for k in keys[:2]:
        m = stage.run_partition(k, lambda: _partition_df(spark, k))
        assert m["rows"] == 1000 and m["wall_sec"] >= 0

    assert stage.pending(keys) == keys[2:]

    # resume: only the remainder runs; completed partitions are no-ops
    calls = []

    def make(k):
        def f():
            calls.append(k)
            return _partition_df(spark, k)
        return f

    for k in keys:
        stage.run_partition(k, make(k))
    assert calls == keys[2:]
    assert stage.pending(keys) == []

    out = stage.read_output()
    assert out.count() == 4000
    # metrics are durable lineage: one manifest entry per partition
    for k in keys:
        m = stage.read_metrics(k)
        assert m["partition"] == k and m["rows"] == 1000
        assert "committed_at" in m


def test_interrupted_partition_not_visible(spark, root):
    stage = CheckpointedStage(spark, root, "s")
    # simulate a crash that left a temp dir behind
    tmp = os.path.join(stage.root, "_tmp_part=7")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "garbage"), "w") as f:
        f.write("x")
    assert stage.pending(["7"]) == ["7"]  # not committed -> still pending
    m = stage.run_partition("7", lambda: _partition_df(spark, "7"))
    assert m["rows"] == 1000
    assert stage.pending(["7"]) == []
    assert stage.read_output().count() == 1000


def test_idempotent_rerun_returns_same_metrics(spark, root):
    stage = CheckpointedStage(spark, root, "s2")
    m1 = stage.run_partition("0", lambda: _partition_df(spark, "0"))
    m2 = stage.run_partition("0", lambda: 1 / 0)  # must not be called
    assert m1 == m2
