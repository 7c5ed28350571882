"""Per-sink aggregate counts + harvest metrics.

The reference tracks two counters per harvest (retrieved / submitted,
LogHarvesterTask.java:106-107,512-523) and its golden test asserts
enrichment-flag counts over a fixture (238 full-robot / 235 partial / 9
repeat-visit over 256 rows, LogEntryProcessorTest.java:338-340).  Our
aggregate stage generalizes both: per-sink row counts plus classification
counts plus max ts (the checkpoint watermark input, A1:
mostRecentLoggedDate = max(dateLogged), LogHarvesterTask.java:493-496).

One hash aggregation; Catalyst does partial (map-side) + final automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_counts(routed: DataFrame) -> DataFrame:
    return (
        routed.groupBy("sink")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("in_full_robot_list").cast("int")).alias("n_robot_full"),
            F.sum(F.col("in_partial_robot_list").cast("int")).alias(
                "n_robot_partial"
            ),
            F.sum(F.col("is_repeat_visit").cast("int")).alias("n_repeat_visit"),
            F.max("ts").alias("max_ts"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .orderBy("sink")
    )


def sink_counts_sql(inner: str) -> str:
    """DuckDB equivalent over a relation exposing the routed columns."""
    return f"""
SELECT sink,
       count(*) AS n_rows,
       sum(CASE WHEN in_full_robot_list THEN 1 ELSE 0 END) AS n_robot_full,
       sum(CASE WHEN in_partial_robot_list THEN 1 ELSE 0 END) AS n_robot_partial,
       sum(CASE WHEN is_repeat_visit THEN 1 ELSE 0 END) AS n_repeat_visit,
       max(ts) AS max_ts,
       max(turn_idx) AS max_turn_idx
FROM ({inner})
GROUP BY sink ORDER BY sink
"""


def harvest_metrics(routed: DataFrame) -> DataFrame:
    """Retrieved/submitted metric analog (MetricLogEntry
    LOG_AGGREGATION_HARVEST_RETRIEVED/_SUBMITTED)."""
    return routed.agg(
        F.count(F.lit(1)).alias("retrieved"),
        F.sum((F.col("sink") != "dlq").cast("long")).alias("submitted"),
        F.sum((F.col("sink") == "dlq").cast("long")).alias("dlq_rows"),
    )
