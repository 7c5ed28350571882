"""End-to-end golden-count test at sf0.001 — the analog of the reference's
LogEntryProcessorTest (238 full / 235 partial / 9 repeat over 256 rows,
LogEntryProcessorTest.java:338-340), plus idempotency.

Golden numbers were cross-validated against the independent DuckDB oracle
(tests/oracle_harness.py) before being committed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
from d1_log_aggregation_spark.operators.aggregate import sink_counts
from d1_log_aggregation_spark.pipeline import PipelineConfig, run_from_dir

SF = "/root/testdata/sf0.001"
CFG = PipelineConfig(
    repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
    with_geohash=False,
)

# (sink, n_rows, n_robot_full, n_robot_partial, n_repeat_visit)
GOLDEN = {
    "dlq": (23, 2, 3, 0),
    "role_assistant": (244, 29, 44, 26),
    "role_system": (245, 39, 53, 26),
    "role_tool": (244, 59, 59, 18),
    "role_user": (244, 66, 63, 21),
}


def test_golden_sink_counts(spark):
    got = {
        r["sink"]: (
            r["n_rows"], r["n_robot_full"], r["n_robot_partial"],
            r["n_repeat_visit"],
        )
        for r in sink_counts(run_from_dir(spark, SF, CFG)).collect()
    }
    assert got == GOLDEN


def test_idempotent_rerun(spark):
    """Re-running over re-harvested (duplicated) input yields identical
    routed rows — the Solr unique-key overwrite analog."""
    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.pipeline import run_pipeline
    from d1_log_aggregation_spark.transcripts import load_transcripts

    t = load_transcripts(spark, SF)
    reg = dims.registry_df(spark, SF)
    sm = dims.sysmeta_df(spark, SF)
    once = run_pipeline(t, reg, sm, CFG)
    twice = run_pipeline(t.unionByName(t), reg, sm, CFG)
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0
