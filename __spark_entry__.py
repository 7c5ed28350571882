"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship pipeline query at sf0.001;
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) → DataFrame callable; ``oracle_sql()`` returns the DuckDB
equivalents (same column names/aliases) built in
d1_log_aggregation_spark.oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d1_log_aggregation_spark import dims, oracle
from d1_log_aggregation_spark.operators.aggregate import (
    harvest_metrics,
    sink_counts,
)
from d1_log_aggregation_spark.operators.dedup import dedup_turns
from d1_log_aggregation_spark.operators.parse import parse_events
from d1_log_aggregation_spark.pipeline import (
    ROUTED_COLUMNS,
    PipelineConfig,
    run_from_dir,
)
from d1_log_aggregation_spark.transcripts import load_transcripts

SF_CFG = PipelineConfig(
    repeat_visit_interval_seconds=oracle.SF_REPEAT_INTERVAL_SECONDS,
    with_geohash=False,  # geohash has no SQL oracle; covered separately
)


def _routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_from_dir(spark, sf_dir, SF_CFG)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_flagship(spark, "/root/testdata/sf0.001")


def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_transcripts(spark, sf_dir)


def _q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_turns(load_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = parse_events(dedup_turns(load_transcripts(spark, sf_dir)))
    return df.select(
        "event_id", "conv_id", "turn_idx", "event", "pid", "ip", "ua",
        "subj", "ip_long", "schema_version", "is_parsable", "has_pid",
    )


def _q_robot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select(
        "event_id", "in_partial_robot_list", "in_full_robot_list"
    )


def _q_repeat_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select("event_id", "is_repeat_visit")


def _q_enrich_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select(
        "event_id", "node_id", "country", "region", "city", "lat", "lon",
        "location",
    )


def _q_enrich_sysmeta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select(
        "event_id", "format_id", "format_type", "size", "rights_holder"
    )


def _q_routed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select(*ROUTED_COLUMNS)


def _q_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sink_counts(_routed(spark, sf_dir))


def _q_tool_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _routed(spark, sf_dir)
        .filter(F.col("tool_sink").isNotNull())
        .groupBy("tool_sink")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.max("ts").alias("max_ts"))
        .orderBy("tool_sink")
    )


def _q_harvest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return harvest_metrics(_routed(spark, sf_dir))


def _q_checkpoint_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _routed(spark, sf_dir)
        .filter(F.col("sink") != "dlq")
        .groupBy(F.col("conv_id").alias("partition_key"))
        .agg(
            F.max("turn_idx").alias("max_turn_idx"),
            F.max("ts").alias("max_ts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("partition_key")
    )


def _q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _routed(spark, sf_dir)
    return (
        r.filter(
            (F.col("sink") != "dlq")
            & (F.col("event") == "read")
            & ~F.col("in_full_robot_list")
            & ~F.col("in_partial_robot_list")
            & ~F.col("is_repeat_visit")
        )
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_clean_reads"),
            F.countDistinct("pid").alias("n_distinct_pids"),
        )
        .orderBy("role")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": _q_transcripts,
        "dedup_turns": _q_dedup,
        "parse_events": _q_parse,
        "robot_flags": _q_robot_flags,
        "repeat_visits": _q_repeat_visits,
        "enrich_registry": _q_enrich_registry,
        "enrich_sysmeta": _q_enrich_sysmeta,
        "routed_rows": _q_routed_rows,
        "sink_counts": _q_sink_counts,
        "tool_sink_counts": _q_tool_sink_counts,
        "harvest_metrics": _q_harvest_metrics,
        "checkpoint_rows": _q_checkpoint_rows,
        "flagship_clean_reads_per_role": _q_flagship,
    }


def oracle_sql() -> dict[str, str]:
    return oracle.oracle_queries()
