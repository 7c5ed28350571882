"""Re-enrichment MERGE analog (reference E3,
SystemMetadataEntryListener.java:109-218)."""

from __future__ import annotations

from pyspark.sql import functions as F

from d1_log_aggregation_spark import dims
from d1_log_aggregation_spark.job import run_harvest
from d1_log_aggregation_spark.operators.reenrich import reenrich_sinks
from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
from d1_log_aggregation_spark.pipeline import PipelineConfig
from d1_log_aggregation_spark.sinks import writer
from d1_log_aggregation_spark.transcripts import load_transcripts

SF = "/root/testdata/sf0.001"
CFG = PipelineConfig(
    repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
    with_geohash=False,
)


def test_reenrich_updates_matched_rows_only(spark, tmp_path):
    out = str(tmp_path / "sinks")
    t = load_transcripts(spark, SF)
    run_harvest(
        spark, t, dims.registry_df(spark, SF), dims.sysmeta_df(spark, SF),
        out, CFG, "base",
    )
    before = writer.read_sinks(spark, out)
    target_pid = before.filter(F.col("pid").isNotNull()).first()["pid"]

    changes = spark.createDataFrame(
        [(target_pid, "fmt-NEW", "METADATA", 999, "org-NEW")],
        "pid string, format_id string, format_type string, size long, "
        "rights_holder string",
    )
    reenrich_sinks(spark, out, changes, "reenrich1")

    after = writer.read_sinks(spark, out)
    assert after.count() == before.count()
    changed = after.filter(F.col("pid") == target_pid).collect()
    assert changed and all(r["format_id"] == "fmt-NEW" for r in changed)
    assert all(r["size"] == 999 for r in changed)
    assert all(str(r["date_updated"]).startswith("2026-01-02") for r in changed)
    # untouched rows keep the sentinel date_updated (1900-01-01)
    untouched = after.filter(
        (F.col("pid") != target_pid) | F.col("pid").isNull()
    )
    assert (
        untouched.filter(
            ~F.col("date_updated").cast("string").startswith("1900-01-01")
        ).count()
        == 0
    )
