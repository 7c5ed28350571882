"""Sink layout compaction (sinks/layout.py): row preservation +
footer-stats clustering the pruning depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
from d1_log_aggregation_spark.pipeline import PipelineConfig, run_from_dir
from d1_log_aggregation_spark.sinks.layout import (
    clustering_stats,
    optimize_layout,
)

from .conftest import SF_TINY


def test_layout_preserves_rows_and_clusters_row_groups(spark, tmp_path):
    routed = run_from_dir(
        spark,
        SF_TINY,
        PipelineConfig(
            repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
            with_geohash=False,
        ),
    ).select("conv_id", "turn_idx", "role", "event", "pid", "sink")
    raw = str(tmp_path / "raw")
    opt = str(tmp_path / "opt")
    # ingestion-order layout: interleave convs across many files
    routed.repartition(8).write.parquet(raw)
    optimize_layout(spark.read.parquet(raw), opt, n_files=8)

    # 1. pure rewrite: row multiset unchanged
    key = lambda r: tuple(r)  # noqa: E731
    a = sorted(map(key, spark.read.parquet(raw).collect()))
    b = sorted(map(key, spark.read.parquet(opt).collect()))
    assert a == b

    # 2. clustering: optimized row groups are (near-)disjoint on
    # conv_id, so a point lookup overlaps ~1 row group; the raw layout
    # overlaps ~all of them (every file spans the whole key range).
    # Range boundaries may duplicate a boundary key across adjacent
    # groups, so assert the average, not strict disjointness.
    s_raw = clustering_stats(spark, raw)
    s_opt = clustering_stats(spark, opt)
    assert s_raw["n_row_groups"] >= 8
    assert s_raw["avg_overlapping_row_groups"] >= 0.9 * s_raw["n_row_groups"]
    assert s_opt["avg_overlapping_row_groups"] <= 2.0
    # 3. and Spark's scan actually prunes: a conv_id-filtered read of
    # the optimized table touches fewer files than the raw one (file
    # skipping via parquet footer stats happens at task level; the
    # partition count reflects file-range packing, so compare data read
    # via the scan's pushed filter + selected files metric proxy:
    # count rows per file via input_file_name)
    one = routed.select("conv_id").first()["conv_id"]
    raw_files = (
        spark.read.parquet(raw)
        .filter(F.col("conv_id") == one)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    opt_files = (
        spark.read.parquet(opt)
        .filter(F.col("conv_id") == one)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    # rows of one conv live in ≤2 optimized files (boundary straddle)
    # but are spread across ~all raw files
    assert opt_files <= 2
    assert raw_files >= 4

def test_clustering_stats_tolerates_missing_statistics(tmp_path):
    """ADVICE r4: row-group statistics can be None (writer disabled) —
    the audit must count such groups separately, not crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"conv_id": ["a", "b", "c"], "x": [1, 2, 3]})
    dest = tmp_path / "nostats"
    dest.mkdir()
    pq.write_table(
        t, dest / "part-00000.parquet", write_statistics=False
    )
    pq.write_table(t, dest / "part-00001.parquet")  # stats on
    s = clustering_stats(None, str(dest))
    assert s["n_row_groups"] == 1
    assert s["n_row_groups_without_stats"] == 1
    assert s["disjoint"] is True
