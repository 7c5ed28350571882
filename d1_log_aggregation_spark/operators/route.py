"""Fan-out routing to per-sink tables (per-role, per-tool, error/DLQ).

Analog of the reference's per-member-node harvest streams landing in one
Solr index: here the enriched rows fan out to per-sink Iceberg/parquet
tables (north_star: "routing stage fans rows out to per-sink Iceberg tables
(per-role, per-tool, error/DLQ)").

Routing rules:
- DLQ: unparsable text (no EVT line) or blank pid — the reference logs and
  skips blank pids (LogHarvesterTask.java:338-341) and skips records whose
  enrichment throws (LogHarvesterTask.java:364-394); we keep them, routed.
- role sink:  one per role value (the routing COLUMN, not N jobs — a
  single shuffle-free pass computes `sink`; per-sink writes are
  partition-pruned scans of the routed frame or a partitionBy write).
- tool sink:  same, for non-null/non-blank tool.

``route()`` adds a single ``sink`` column; ``split_sinks`` materializes the
per-sink frames.  At scale the write is ONE job:
``routed.write.partitionBy("sink")`` — never a per-sink filter+write loop
over the full input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DLQ = "dlq"


def route(df: DataFrame) -> DataFrame:
    """Adds ``sink`` (primary routing: dlq > role sink) and ``tool_sink``
    (secondary fan-out; null when tool is absent/blank)."""
    is_dlq = (~F.col("is_parsable")) | (~F.col("has_pid"))
    return df.withColumns(
        {
            "sink": F.when(is_dlq, F.lit(DLQ)).otherwise(
                F.concat(F.lit("role_"), F.col("role"))
            ),
            "tool_sink": F.when(
                (~is_dlq)
                & F.col("tool").isNotNull()
                & (F.col("tool") != ""),
                F.concat(F.lit("tool_"), F.col("tool")),
            ),
        }
    )


ROUTE_SINK_SQL = (
    "CASE WHEN event = '' OR pid = '' THEN 'dlq' "
    "ELSE 'role_' || role END"
)
ROUTE_TOOL_SQL = (
    "CASE WHEN event <> '' AND pid <> '' AND tool IS NOT NULL "
    "AND tool <> '' THEN 'tool_' || tool END"
)


def split_sinks(routed: DataFrame) -> dict[str, DataFrame]:
    """Materialize per-sink DataFrames (test/small-scale convenience; the
    scale path writes once with partitionBy('sink'))."""
    sinks = [r["sink"] for r in routed.select("sink").distinct().collect()]
    return {s: routed.filter(F.col("sink") == s) for s in sorted(sinks)}
