"""Batch job entrypoint: incremental, resumable, idempotent harvest run.

The Quartz/Hazelcast/LDAP orchestration of the reference
(LogAggregationScheduleManager.java:81-457) collapses to this single
idempotent driver program run per period (cron / Airflow / manual):

  1. read checkpoint table → filter input to rows newer than each
     bucket's watermark  (logLastAggregated analog)
  2. run the parse → enrich → classify → route pipeline
  3. commit all sinks as ONE snapshot   (Solr addBeans+commit analog)
  4. advance the checkpoint             (LDAP write analog — LAST)
  5. emit metrics                        (MetricLogEntry analog)

Concurrency: no global lock (the reference holds a per-node
``aggregateLogs`` LDAP lock, jobs/LogAggregationHarvestJob.java:78-94).
Instead, each run commits its own O_EXCL file under ``_commits/`` — two
racing runs cannot drop each other's snapshot — and double-running merely
re-commits rows the sink's last-write-wins dedup absorbs.  The checkpoint
file itself is a single-writer artifact; racing runs can only regress it
to an older (still-safe, re-processing) watermark, never skip data.

Ship with:  spark-submit --py-files d1_log_aggregation_spark.zip \
                -m d1_log_aggregation_spark.job <sf_dir> <out_dir>
"""

from __future__ import annotations

import json
import sys
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import checkpoint as cp
from . import dims
from .operators.aggregate import harvest_metrics, sink_counts
from .pipeline import PipelineConfig, run_pipeline
from .sinks import writer
from .transcripts import load_transcripts


def run_harvest(
    spark: SparkSession,
    transcripts: DataFrame,
    registry: DataFrame,
    sysmeta: DataFrame,
    out_dir: str,
    config: PipelineConfig | None = None,
    run_id: str | None = None,
    source_snapshot_id: str = "",
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    ckpt_path = f"{out_dir}/_checkpoint.json"

    fresh = cp.filter_new(spark, transcripts, ckpt_path)
    routed = run_pipeline(fresh, registry, sysmeta, config)
    # cache: routed feeds the sink write, the checkpoint agg, and metrics
    routed = routed.cache()
    try:
        n_routed = routed.count()
        if n_routed == 0:
            return {
                "run_id": run_id,
                "n_routed": 0,
                "skipped": True,
            }
        commit = writer.write_snapshot(
            routed, out_dir, run_id, source_snapshot_id
        )
        cp.write_checkpoint(routed, ckpt_path, run_id, source_snapshot_id)
        metrics = harvest_metrics(routed).collect()[0].asDict()
        counts = [r.asDict() for r in sink_counts(routed).collect()]
        return {
            "run_id": run_id,
            "n_routed": n_routed,
            "commit": commit,
            "metrics": metrics,
            "sink_counts": [
                {k: (str(v) if k == "max_ts" else v) for k, v in c.items()}
                for c in counts
            ],
        }
    finally:
        routed.unpersist()


def main(argv: list[str]) -> None:
    from .oracle import SF_REPEAT_INTERVAL_SECONDS
    from .session import get_spark

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    out_dir = argv[2] if len(argv) > 2 else "/tmp/d1_sinks"
    spark = get_spark(app_name="d1-harvest")
    cfg = PipelineConfig(
        repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS
    )
    result = run_harvest(
        spark,
        load_transcripts(spark, sf_dir),
        dims.registry_df(spark, sf_dir),
        dims.sysmeta_df(spark, sf_dir),
        out_dir,
        cfg,
        source_snapshot_id=sf_dir,
    )
    print(json.dumps(result, default=str))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv)
