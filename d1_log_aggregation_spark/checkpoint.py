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

Bucket hash: md5-derived 32-bit (same ``hash32`` family as the dedup
operators) rather than xxhash64 — a few ns/row slower JVM-side, but
reproducible by the DuckDB oracle, so the bucket table itself is
CORRECTNESS-gated (query ``checkpoint_buckets``) instead of trusted.

Watermark encoding: epoch MICROSECONDS (int64), never a rendered
timestamp string.  A collect() → datetime → isoformat → to_timestamp
roundtrip silently shifts by the driver's OS timezone offset when it is
not UTC; integers can't drift.  The ISO string is kept alongside for
humans only.

Resume semantics (mirrors LogHarvesterTask.java:189-204):
- new run reads the checkpoint table, keeps only input rows with
  ``unix_micros(ts) > bucket.max_ts_us`` (the reference harvests from
  checkpoint+1ms);
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


def ts_micros(c: F.Column) -> F.Column:
    """Epoch micros of a TIMESTAMP or TIMESTAMP_NTZ column.  NTZ values are
    interpreted in the session timezone (pin spark.sql.session.timeZone=UTC
    in deployment); the same expression runs at write AND read so the
    comparison is self-consistent either way."""
    return F.unix_micros(c.cast("timestamp"))


def bucket_col(conv_id: str = "conv_id", n_buckets: int = DEFAULT_BUCKETS):
    h = F.conv(F.substring(F.md5(F.col(conv_id)), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def bucket_sql(conv_id: str = "conv_id", n_buckets: int = DEFAULT_BUCKETS) -> str:
    """DuckDB twin of bucket_col (hash is non-negative, so % == pmod)."""
    return (
        f"cast(try_cast(('0x' || substr(md5({conv_id}), 1, 8)) AS bigint)"
        f" % {n_buckets} AS int)"
    )


def checkpoint_rows(
    routed: DataFrame, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Aggregate the routed output into per-bucket checkpoint rows."""
    return (
        routed.withColumn("bucket", bucket_col("conv_id", n_buckets))
        .groupBy("bucket")
        .agg(
            F.max(ts_micros(F.col("ts"))).alias("max_ts_us"),
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
            "max_ts_us": r["max_ts_us"],
            "max_ts_iso": r["max_ts"].isoformat(),  # display only
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
        if prev is None or r["max_ts_us"] > prev["max_ts_us"]:
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
    The comparison is integer epoch-micros on both sides — no string or
    timezone roundtrip anywhere.
    """
    cps = read_checkpoint(path)
    if not cps:
        return transcripts
    cp_df = spark.createDataFrame(
        [(r["bucket"], r["max_ts_us"]) for r in cps],
        "bucket int, cp_max_ts_us long",
    )
    keyed = transcripts.withColumn("bucket", bucket_col("conv_id", n_buckets))
    out = keyed.join(F.broadcast(cp_df), "bucket", "left")
    return out.filter(
        F.col("cp_max_ts_us").isNull()
        | (ts_micros(F.col("ts")) > F.col("cp_max_ts_us"))
    ).drop("bucket", "cp_max_ts_us")
