"""Per-sink table writer with idempotent snapshot-commit semantics.

Reference sink: Solr ``addBeans`` in 500-doc batches under a global commit
lock, retried ≤5 times, idempotent because the doc key overwrites
(SolrClientManager.java:41-58, LogHarvesterTask.java:442-489).

Spark-first replacement: ONE write job for all sinks —
``partitionBy("sink")`` — landing each run's delta in an isolated
``run=<run_id>`` directory, then an atomic pointer-file commit.  This is
the parquet stand-in for an Iceberg snapshot commit (the Iceberg runtime
jar is not available in this sandbox; on a real cluster the same call
sites become ``df.writeTo(tbl).append()`` and the pointer file is the
Iceberg metadata pointer — the abstraction is deliberately thin).

Idempotency contract (north_rule):
- rows carry the deterministic identity event_id = conv_id "." turn_idx;
- a run directory is referenced only after its _COMMIT pointer lands, so
  a killed run leaves garbage that is never read (atomic visibility);
- re-harvest overlaps are removed on read (and by ``compact``) with the
  same rank-1 window used in-pipeline — the reader-side analog of Solr's
  unique-key overwrite.

NEVER a per-sink filter+write loop over the full input: that would scan
the routed frame once per sink.  partitionBy scans once.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

COMMITS_FILE = "_commits.json"


def _commits_path(base_dir: str) -> str:
    return os.path.join(base_dir, COMMITS_FILE)


def read_commits(base_dir: str) -> list[dict]:
    path = _commits_path(base_dir)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)


def _append_commit(base_dir: str, entry: dict) -> None:
    """Atomic pointer update: write-temp + rename (POSIX atomic)."""
    commits = read_commits(base_dir)
    commits.append(entry)
    tmp = _commits_path(base_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(commits, fh, indent=1)
    os.replace(tmp, _commits_path(base_dir))


def write_snapshot(
    routed: DataFrame,
    base_dir: str,
    run_id: str,
    source_snapshot_id: str = "",
    extra: dict | None = None,
) -> dict:
    """Write one run's routed delta as a snapshot; returns the commit entry."""
    os.makedirs(base_dir, exist_ok=True)
    run_dir = os.path.join(base_dir, f"run={run_id}")
    (
        routed.write.mode("overwrite")
        .partitionBy("sink")
        .parquet(run_dir)
    )
    entry = {
        "run_id": run_id,
        "path": run_dir,
        "source_snapshot_id": source_snapshot_id,
        "committed_at_unix": int(time.time()),
        **(extra or {}),
    }
    _append_commit(base_dir, entry)
    return entry


DEDUP_KEY = ["conv_id", "turn_idx"]
DEDUP_TIEBREAK = ["text", "ts", "role", "tool"]


def read_sinks(spark: SparkSession, base_dir: str) -> DataFrame:
    """Union of all COMMITTED snapshots, overlap-deduped on the natural key.

    Uncommitted (killed-run) directories are invisible: only paths in the
    commit log are read.
    """
    commits = read_commits(base_dir)
    if not commits:
        raise FileNotFoundError(f"no committed snapshots under {base_dir}")
    df = spark.read.option("basePath", commits[0]["path"]).parquet(
        commits[0]["path"]
    )
    for c in commits[1:]:
        nxt = spark.read.option("basePath", c["path"]).parquet(c["path"])
        df = df.unionByName(nxt, allowMissingColumns=True)
    tiebreak = [c for c in DEDUP_TIEBREAK if c in df.columns]
    w = Window.partitionBy(*DEDUP_KEY).orderBy(
        *[F.col(c).asc_nulls_first() for c in tiebreak]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def compact(spark: SparkSession, base_dir: str, run_id: str) -> dict:
    """Rewrite all committed snapshots as one deduped snapshot and truncate
    the commit log to it (Iceberg rewrite_data_files analog)."""
    merged = read_sinks(spark, base_dir)
    run_dir = os.path.join(base_dir, f"run={run_id}")
    merged.write.mode("overwrite").partitionBy("sink").parquet(run_dir)
    tmp = _commits_path(base_dir) + f".tmp.{uuid.uuid4().hex}"
    entry = {
        "run_id": run_id,
        "path": run_dir,
        "compacted": True,
        "committed_at_unix": int(time.time()),
    }
    with open(tmp, "w") as fh:
        json.dump([entry], fh, indent=1)
    os.replace(tmp, _commits_path(base_dir))
    return entry
