"""Per-partition checkpoints with lineage — the LDAP ``logLastAggregated``
replacement (NodeRegistryLogAggregationFacade.java:31-108, advanced at
LogHarvesterTask.java:493-496).

The reference checkpoints one timestamp per member node and relies on
idempotent Solr keys to absorb the +overlap re-harvest.  Here the partition
unit is a stable hash bucket of conv_id (a per-conversation checkpoint
would mean 10^9+ checkpoint rows at 10^12 turns; buckets keep the
checkpoint table O(parallelism)).  Each checkpoint row carries the lineage
required by the north_rule: (source snapshot-id, partition/bucket, max
turn_idx, max ts, row count, run id).

Resume semantics (mirrors LogHarvesterTask.java:189-204):
- new run reads the checkpoint table, keeps only input rows with
  ``ts > bucket.max_ts`` (the reference harvests from checkpoint+1ms);
- overlap or replay is harmless because sinks dedup on event_id
  (sinks/writer.py) — nothing counts as done until the snapshot commit,
  and re-committing the same rows is a no-op after dedup.

Checkpoint commit ordering: sinks first, checkpoint LAST (write-ahead of
the watermark would lose data on crash; write-behind merely re-processes —
the idempotent direction, same as the reference which advances LDAP only
after successful Solr submission, LogHarvesterTask.java:475-496).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def bucket_col(conv_id: str = "conv_id", n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(F.col(conv_id)), F.lit(n_buckets)).cast("int")


def checkpoint_rows(
    routed: DataFrame, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Aggregate the routed output into per-bucket checkpoint rows."""
    return (
        routed.withColumn("bucket", bucket_col("conv_id", n_buckets))
        .groupBy("bucket")
        .agg(
            F.max("ts").alias("max_ts"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def write_checkpoint(
    routed: DataFrame,
    path: str,
    run_id: str,
    source_snapshot_id: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
) -> list[dict]:
    """Collect per-bucket rows and commit them atomically (tmp+rename).

    The checkpoint table is tiny (n_buckets rows) — driver-side JSON is
    deliberate; at 10^12 scale it stays n_buckets rows.
    """
    rows = [
        {
            "bucket": r["bucket"],
            "max_ts": r["max_ts"].isoformat(),
            "max_turn_idx": r["max_turn_idx"],
            "n_rows": r["n_rows"],
            "run_id": run_id,
            "source_snapshot_id": source_snapshot_id,
        }
        for r in checkpoint_rows(routed, n_buckets).collect()
    ]
    merged = {r["bucket"]: r for r in read_checkpoint(path)}
    for r in rows:
        prev = merged.get(r["bucket"])
        if prev is None or r["max_ts"] > prev["max_ts"]:
            merged[r["bucket"]] = r
    out = sorted(merged.values(), key=lambda r: r["bucket"])
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(out, fh, indent=1)
    os.replace(tmp, path)
    return out


def read_checkpoint(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)


def filter_new(
    spark: SparkSession,
    transcripts: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Keep only rows newer than each bucket's checkpointed watermark.

    Broadcast join on the tiny checkpoint table; buckets without a
    checkpoint pass through whole (first harvest of that partition).
    """
    cps = read_checkpoint(path)
    if not cps:
        return transcripts
    cp_df = spark.createDataFrame(
        [(r["bucket"], r["max_ts"]) for r in cps],
        "bucket int, max_ts_str string",
    ).withColumn("cp_max_ts", F.to_timestamp("max_ts_str"))
    keyed = transcripts.withColumn("bucket", bucket_col("conv_id", n_buckets))
    out = keyed.join(F.broadcast(cp_df), "bucket", "left")
    return out.filter(
        F.col("cp_max_ts").isNull() | (F.col("ts") > F.col("cp_max_ts"))
    ).drop("bucket", "max_ts_str", "cp_max_ts")
