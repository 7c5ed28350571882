"""Bucketed co-located join (the shuffle-free big⨝big strategy).

The pipeline's dims broadcast, so no production join here needs it —
this test exercises and PROVES the technique the 100 TB posture calls
for when both sides are large (e.g. routed sinks ⨝ a per-conversation
reference table): write both sides with ``bucketBy(N, key)`` and the
sort-merge join reads bucket-aligned files with NO Exchange on either
side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d1_log_aggregation_spark import dims
from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
from d1_log_aggregation_spark.pipeline import PipelineConfig, run_pipeline
from d1_log_aggregation_spark.transcripts import load_transcripts

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def routed(spark):
    cfg = PipelineConfig(
        repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
        with_geohash=False,
    )
    return run_pipeline(
        load_transcripts(spark, SF),
        dims.registry_df(spark, SF),
        dims.sysmeta_df(spark, SF),
        cfg,
    )


def test_bucketed_join_has_no_exchange(spark, routed, tmp_path):
    # warehouse dir is a static conf — bucketed (managed) tables land in
    # the session default; DROP TABLE below removes their files
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    try:
        (
            routed.select("conv_id", "turn_idx", "event_id", "sink")
            .write.mode("overwrite")
            .bucketBy(8, "conv_id")
            .sortBy("conv_id")
            .saveAsTable("bktest.routed_b")
        )
        (
            routed.groupBy("conv_id")
            .agg(F.max("turn_idx").alias("max_turn"))
            .write.mode("overwrite")
            .bucketBy(8, "conv_id")
            .sortBy("conv_id")
            .saveAsTable("bktest.conv_stats_b")
        )
        a = spark.table("bktest.routed_b")
        b = spark.table("bktest.conv_stats_b")
        # force SMJ (both sides are tiny here; at scale neither broadcasts)
        joined = a.hint("merge").join(b, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-aligned: no shuffle at all
        # and the join is correct
        n = joined.count()
        assert n == routed.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bktest.routed_b")
        spark.sql("DROP TABLE IF EXISTS bktest.conv_stats_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")
