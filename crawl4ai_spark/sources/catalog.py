"""Snapshot catalog: wave-level checkpoint/resume with lineage.

The design target is an Iceberg catalog (`frontier`, `seen`, `results`,
`images`, `host_state`, `lineage` tables; one snapshot per scheduling
wave; resume = read latest snapshot — mirroring the reference's
resume_state, bfs_strategy.py:166-179).  The Iceberg runtime jar is not
available in-sandbox, so this module provides an API-compatible shim on
parquet + an atomically-renamed JSON manifest; table semantics are kept
Iceberg-shaped so the swap is a config change:

* ``seen`` and ``images`` are **append-only deltas** per wave (never
  rewritten — at 10^10 frontier scale a full rewrite of the seen set per
  wave would dominate the job; appends are O(wave), reads are a
  partition-pruned union of deltas).
* ``frontier`` / ``host_state`` are small per-wave state tables written
  whole (O(open frontier), not O(history)).
* every commit records per-partition lineage
  (wave_id, partition_id, urls_in, urls_out, dedup_hits, fetched,
  failed, duration_ms) — the north-rule metrics table.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("wave_id", T.IntegerType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("urls_in", T.LongType()),
        T.StructField("urls_out", T.LongType()),
        T.StructField("dedup_hits", T.LongType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_STATE_TABLES = ("frontier", "host_state")  # rewritten per snapshot
_APPEND_TABLES = ("seen", "images", "results", "lineage", "bloom", "markdown")  # per-wave deltas


class SnapshotCatalog:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def latest_snapshot(self) -> dict | None:
        snaps = self._read_manifest()["snapshots"]
        return snaps[-1] if snaps else None

    # -- commit ------------------------------------------------------------
    def commit_wave(
        self,
        wave_id: int,
        state: dict[str, DataFrame] | None = None,
        appends: dict[str, DataFrame] | None = None,
        resets: dict[str, DataFrame] | None = None,
    ) -> dict:
        """Write a wave's state + deltas, then atomically publish the
        snapshot. A crash before the manifest rename leaves the previous
        snapshot live (same guarantee Iceberg gives via metadata swap).

        ``resets`` rewrites an append-table's whole history as one new
        baseline delta (compaction / format migration — e.g. a bloom
        rebuilt under a new hash scheme); prior delta files stay on disk
        but drop out of the snapshot's read set."""
        snap = {"snapshot_id": wave_id, "wave_id": wave_id, "ts": time.time(), "tables": {}}
        prev = self.latest_snapshot()
        if prev:
            snap["tables"].update(prev["tables"])  # carry forward unreplaced state
            snap["appends"] = {k: list(v) for k, v in prev.get("appends", {}).items()}
        else:
            snap["appends"] = {}

        import sys
        from concurrent.futures import ThreadPoolExecutor

        prof = bool(os.environ.get("SPARK_CRAWL_PROFILE"))

        def write(df, path):
            t = time.time()
            df.write.mode("overwrite").parquet(path)
            if prof:
                print(f"    commit write {path.split('/')[-2]}: {time.time() - t:.2f}s",
                      file=sys.stderr, flush=True)

        # the snapshot's tables are independent — write them CONCURRENTLY
        # (Spark actions are thread-safe per session); the manifest rename
        # below stays the single atomic commit point, so a failure in any
        # write still aborts the whole snapshot
        todo: list[tuple] = []
        for name, df in (state or {}).items():
            path = os.path.join(self.root, name, f"snap={wave_id}")
            todo.append((df, path))
            snap["tables"][name] = path
        for name, df in (appends or {}).items():
            path = os.path.join(self.root, name, f"wave={wave_id}")
            todo.append((df, path))
            snap["appends"].setdefault(name, []).append(path)
        for name, df in (resets or {}).items():
            path = os.path.join(self.root, name, f"reset={wave_id}")
            todo.append((df, path))
            snap["appends"][name] = [path]
        if len(todo) > 1:
            with ThreadPoolExecutor(max_workers=min(len(todo), 6)) as ex:
                futures = [ex.submit(write, df, path) for df, path in todo]
                for f in futures:
                    f.result()  # propagate the first failure before publishing
        else:
            for df, path in todo:
                write(df, path)

        manifest = self._read_manifest()
        manifest["snapshots"].append(snap)
        self._write_manifest(manifest)
        return snap

    # -- read --------------------------------------------------------------
    def read(self, name: str, snapshot: dict | None = None) -> DataFrame | None:
        snap = snapshot or self.latest_snapshot()
        if snap is None:
            return None
        if name in snap["tables"]:
            return self.spark.read.parquet(snap["tables"][name])
        paths = snap.get("appends", {}).get(name)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def lineage(self) -> DataFrame:
        df = self.read("lineage")
        if df is None:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return df


def lineage_from_wave(
    wave_id: int,
    frontier_df: DataFrame,
    expanded_df: DataFrame | None,
) -> DataFrame:
    """Per-partition lineage aggregate for one wave.

    `urls_in` counts frontier rows per partition; `urls_out` / `dedup_hits`
    come from the expansion stage (rows tagged with `dedup_hit` boolean
    before the seen anti-join filtered them).
    """
    fin = (
        frontier_df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("urls_in"),
            F.sum(F.when(F.col("status") == "FAILED", 1).otherwise(0)).alias("failed"),
            F.sum(F.when(F.col("status") != "FAILED", 1).otherwise(0)).alias("fetched"),
        )
    )
    if expanded_df is not None:
        out = (
            expanded_df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.sum(F.when(~F.col("dedup_hit"), 1).otherwise(0)).alias("urls_out"),
                F.sum(F.when(F.col("dedup_hit"), 1).otherwise(0)).alias("dedup_hits"),
            )
        )
        fin = fin.join(out, "partition_id", "full_outer")
    else:
        fin = fin.withColumn("urls_out", F.lit(0)).withColumn("dedup_hits", F.lit(0))
    return fin.select(
        F.lit(wave_id).cast("int").alias("wave_id"),
        F.col("partition_id").cast("int"),
        F.coalesce("urls_in", F.lit(0)).cast("long").alias("urls_in"),
        F.coalesce("urls_out", F.lit(0)).cast("long").alias("urls_out"),
        F.coalesce("dedup_hits", F.lit(0)).cast("long").alias("dedup_hits"),
        F.coalesce("fetched", F.lit(0)).cast("long").alias("fetched"),
        F.coalesce("failed", F.lit(0)).cast("long").alias("failed"),
        F.lit(0).cast("long").alias("duration_ms"),
    )
