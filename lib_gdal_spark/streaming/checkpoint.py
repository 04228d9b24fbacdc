"""Per-partition lineage + metrics checkpointing with resume.

North-rule requirement: "every stage checkpoints per-partition lineage and
metrics ... so jobs resume mid-pipeline". The reference has no streaming
subsystem (SURVEY.md §1.4), so this is **idempotent batch**: work is split
into deterministic partitions (e.g. id ranges or cell-key buckets); each
completed partition writes its output under ``part=<key>`` plus a row in a
``_done`` manifest; resume = anti-join pending partitions against the
manifest and process only the remainder.

On a real cluster the same layout maps 1:1 onto Iceberg partitioned tables +
snapshot metadata; here it is plain partitioned parquet (no Iceberg jars in
the sandbox), with the manifest as the commit log. Writes are
atomic-by-rename per partition directory, so a killed job never leaves a
partition half-visible in the manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class CheckpointedStage:
    """A resumable stage writing partitioned output under ``root``."""

    def __init__(self, spark: SparkSession, root: str, stage: str):
        self.spark = spark
        self.root = os.path.join(root, stage)
        self.manifest = os.path.join(self.root, "_done")
        os.makedirs(self.root, exist_ok=True)
        os.makedirs(self.manifest, exist_ok=True)

    def done_keys(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.manifest)
            if f.endswith(".json")
        }

    def pending(self, keys: list[str]) -> list[str]:
        done = self.done_keys()
        return [k for k in keys if k not in done]

    def run_partition(self, key: str, make_df: Callable[[], DataFrame]) -> dict:
        """Compute + commit one partition; no-op if already committed."""
        if key in self.done_keys():
            return self.read_metrics(key)
        t0 = time.time()
        out_dir = os.path.join(self.root, f"part={key}")
        tmp_dir = os.path.join(self.root, f"_tmp_part={key}")
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        df = make_df()
        df.write.mode("overwrite").parquet(tmp_dir)
        rows = self.spark.read.parquet(tmp_dir).count()
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp_dir, out_dir)
        metrics = {
            "partition": key,
            "rows": rows,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp_m = os.path.join(self.manifest, f".{key}.json.tmp")
        with open(tmp_m, "w") as f:
            json.dump(metrics, f)
        os.rename(tmp_m, os.path.join(self.manifest, f"{key}.json"))
        return metrics

    def read_metrics(self, key: str) -> dict:
        with open(os.path.join(self.manifest, f"{key}.json")) as f:
            return json.load(f)

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "part=*"))
