"""Sysmeta-change re-enrichment — the listener path (reference E3).

Reference: a Hazelcast map listener fires per changed SystemMetadata entry,
queries Solr ``pid:<escaped>`` paged 1000, rewrites matching docs with
fresh sysmeta fields and ``dateUpdated = now`` in batches of 100
(SystemMetadataEntryListener.java:109-218).

Spark-first replacement: one set-oriented pass instead of per-entry
point-updates — read the committed sinks, broadcast-join the (small) batch
of changed sysmeta rows on pid, overwrite the sysmeta-derived columns for
matched rows, stamp date_updated, and commit the rewrite as a new compacted
snapshot.  On Iceberg this is literally::

    MERGE INTO sinks s USING changes c ON s.pid = c.pid
    WHEN MATCHED THEN UPDATE SET format_id = c.format_id, ...

(the parquet stand-in rewrites; same semantics, one atomic commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import writer

SYSMETA_FIELDS = ["format_id", "format_type", "size", "rights_holder"]


def apply_sysmeta_changes(
    sinks: DataFrame,
    changes: DataFrame,
    date_updated: str = "2026-01-02 00:00:00",
) -> DataFrame:
    """Return the sinks frame with changed sysmeta applied.

    changes: (pid, format_id, format_type, size, rights_holder) — one row
    per changed pid (the analog of one listener event each).
    """
    ch = changes
    for f in SYSMETA_FIELDS:
        ch = ch.withColumnRenamed(f, f"_new_{f}")
    out = sinks.join(F.broadcast(ch), "pid", "left")
    matched = F.col("_new_format_id").isNotNull() | F.col(
        "_new_rights_holder"
    ).isNotNull()
    for f in SYSMETA_FIELDS:
        out = out.withColumn(
            f, F.coalesce(F.col(f"_new_{f}"), F.col(f))
        )
    out = out.withColumn(
        "date_updated",
        F.when(matched, F.lit(date_updated).cast("timestamp")).otherwise(
            F.col("date_updated")
        ),
    )
    return out.drop(*[f"_new_{f}" for f in SYSMETA_FIELDS])


def reenrich_sinks(
    spark: SparkSession,
    base_dir: str,
    changes: DataFrame,
    run_id: str,
    date_updated: str = "2026-01-02 00:00:00",
) -> dict:
    """Read committed sinks → apply changes → commit as ONE new compacted
    snapshot (replaces the reference's paged query+rewrite loop)."""
    import os
    import time

    old = writer.read_commits(base_dir)
    merged = writer.read_sinks(spark, base_dir)
    updated = apply_sysmeta_changes(merged, changes, date_updated)
    run_dir = os.path.join(base_dir, f"run={run_id}")
    updated.write.mode("overwrite").partitionBy("sink").parquet(run_dir)
    # commit the rewrite, then retire the snapshots it replaced (same
    # reader-safe ordering as writer.compact)
    entry = writer._write_commit(
        base_dir,
        {
            "run_id": run_id,
            "path": run_dir,
            "compacted": True,
            "reenriched": True,
            "committed_at_unix": int(time.time()),
        },
    )
    writer.retire_commits(base_dir, old)
    return entry
