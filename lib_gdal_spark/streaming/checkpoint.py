"""Per-partition lineage + metrics checkpointing with resume, snapshots,
time travel, and rollback.

North-rule requirement: "every stage checkpoints per-partition lineage and
metrics ... so jobs resume mid-pipeline". The reference has no streaming
subsystem (SURVEY.md §1.4), so this is **idempotent batch**: work is split
into deterministic partitions (e.g. id ranges or cell-key buckets); each
completed partition writes its output under ``part=<key>`` plus a row in a
``_done`` manifest; resume = anti-join pending partitions against the
manifest and process only the remainder.

On a real cluster the same layout maps 1:1 onto Iceberg partitioned tables;
here it is plain partitioned parquet (no Iceberg jars in the sandbox), and
the Iceberg *metadata* semantics are reproduced directly: every partition
commit also appends an ordered snapshot entry under ``_snapshots`` (the
commit log), ``read_output(as_of=...)`` time-travels to any snapshot id,
and ``rollback(to)`` rewinds the manifest + log so rerun recomputes the
rolled-back partitions (data dirs are kept until overwritten, matching
Iceberg's rollback-then-expire split). Writes are atomic-by-rename per
partition directory AND reads are manifest-driven, so a job killed between
the data rename and the manifest commit never exposes a half-committed
partition (the orphan dir is invisible and the partition reruns on resume).
Single-writer per stage, like the manifest itself.
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
        self.snapshots = os.path.join(self.root, "_snapshots")
        os.makedirs(self.root, exist_ok=True)
        os.makedirs(self.manifest, exist_ok=True)
        os.makedirs(self.snapshots, exist_ok=True)

    def done_keys(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.manifest)
            if f.endswith(".json")
        }

    def pending(self, keys: list[str]) -> list[str]:
        done = self.done_keys()
        return [k for k in keys if k not in done]

    # ------------------------------------------------------ snapshot log
    def _snapshot_files(self) -> list[str]:
        return sorted(f for f in os.listdir(self.snapshots)
                      if f.endswith(".json"))

    def current_snapshot(self) -> int:
        """Highest committed snapshot id (0 = empty stage)."""
        files = self._snapshot_files()
        return int(files[-1].split(".")[0]) if files else 0

    def snapshot_log(self) -> list[dict]:
        """The ordered commit log (one entry per partition commit)."""
        out = []
        for f in self._snapshot_files():
            with open(os.path.join(self.snapshots, f)) as fh:
                out.append(json.load(fh))
        return out

    def keys_as_of(self, snapshot_id: int | None = None) -> list[str]:
        """Partition keys visible at ``snapshot_id`` (None = latest).

        Intersected with the manifest: the manifest is the single source
        of visibility, so a log entry whose manifest commit never landed
        (crash between the two writes) is ignored here, exactly as an
        orphan ``part=`` dir is ignored by ``read_output``."""
        done = self.done_keys()
        keys = []
        for e in self.snapshot_log():
            if snapshot_id is not None and e["snapshot_id"] > snapshot_id:
                break
            if e["partition"] in done:
                keys.append(e["partition"])
        return keys

    def rollback(self, to_snapshot: int) -> list[str]:
        """Rewind the stage to ``to_snapshot``; later partitions become
        pending again (their data dirs stay until overwritten — the
        Iceberg rollback/expire split). Returns the rolled-back keys."""
        rolled = []
        for f in self._snapshot_files():
            sid = int(f.split(".")[0])
            if sid > to_snapshot:
                with open(os.path.join(self.snapshots, f)) as fh:
                    key = json.load(fh)["partition"]
                os.remove(os.path.join(self.snapshots, f))
                m = os.path.join(self.manifest, f"{key}.json")
                if os.path.exists(m):
                    os.remove(m)
                rolled.append(key)
        return rolled

    # ------------------------------------------------------ commit path
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
        snapshot_id = self.current_snapshot() + 1
        metrics = {
            "partition": key,
            "rows": rows,
            "snapshot_id": snapshot_id,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # Snapshot-log entry FIRST, manifest LAST: the manifest is the
        # single source of visibility (done_keys / read_output), so every
        # visible key is guaranteed a log entry. A crash between the two
        # leaves only an orphan log entry, which keys_as_of ignores and
        # which is swept here on the rerun before recommitting.
        if len(self._snapshot_files()) != len(self.done_keys()):
            for f_name in self._snapshot_files():
                p = os.path.join(self.snapshots, f_name)
                with open(p) as fh:
                    if json.load(fh)["partition"] == key:
                        os.remove(p)  # orphan from a crash mid-commit
        tmp_s = os.path.join(self.snapshots, f".{snapshot_id:012d}.json.tmp")
        with open(tmp_s, "w") as f:
            json.dump(metrics, f)
        os.rename(tmp_s,
                  os.path.join(self.snapshots, f"{snapshot_id:012d}.json"))
        tmp_m = os.path.join(self.manifest, f".{key}.json.tmp")
        with open(tmp_m, "w") as f:
            json.dump(metrics, f)
        os.rename(tmp_m, os.path.join(self.manifest, f"{key}.json"))
        return metrics

    def read_metrics(self, key: str) -> dict:
        with open(os.path.join(self.manifest, f"{key}.json")) as f:
            return json.load(f)

    def read_output(self, as_of: int | None = None) -> DataFrame:
        """Committed output, optionally time-traveled to snapshot
        ``as_of``. Manifest/log-driven: orphan ``part=`` dirs from a
        crash before the manifest commit are never read."""
        if as_of is None:
            keys = sorted(self.done_keys())
        else:
            keys = self.keys_as_of(as_of)
        if not keys:
            raise ValueError(
                f"stage {self.root} has no committed partitions"
                + (f" at snapshot {as_of}" if as_of is not None else ""))
        paths = [os.path.join(self.root, f"part={k}") for k in keys]
        return self.spark.read.parquet(*paths)
