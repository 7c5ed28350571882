#!/usr/bin/env python
"""Benchmark: end-to-end parse → enrich → route → aggregate throughput.

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "throughput_turns_per_sec": N}

Full-column materialization via the `noop` sink (count() alone would let
Catalyst prune the enrichment columns and flatter the numbers).

--scaling: run the same job at two parallelism levels (local[8] vs
local[32]) on the same input and report throughput at both plus
efficiency = (T_8 / T_32) / 4 — the sandbox evidence for BASELINE.json's
"≥0.8 scaling efficiency from N to 4N executors" rule.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


TRANSCRIPTS_PATH = "/tmp/bench_transcripts.parquet"


def _mat(df) -> None:
    """Materialize every column (noop sink — no count(), which would both
    double-execute and let Catalyst prune)."""
    df.write.format("noop").mode("overwrite").save()


def _setup_transcripts(spark) -> int:
    """UNTIMED: materialize the synthetic transcripts table to parquet.
    In production the Iceberg transcripts table already exists — synthesis
    is test scaffolding, not pipeline work."""
    from d1_log_aggregation_spark.transcripts import load_transcripts

    df = load_transcripts(spark, SF_DIR)
    df.write.mode("overwrite").parquet(TRANSCRIPTS_PATH)
    return spark.read.parquet(TRANSCRIPTS_PATH).count()


def run_once(master: str, shuffle_partitions: int) -> dict:
    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
    from d1_log_aggregation_spark.operators.aggregate import (
        harvest_metrics,
        sink_counts,
    )
    from d1_log_aggregation_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from d1_log_aggregation_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
    )
    cfg = PipelineConfig(
        repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
        with_geohash=True,
    )
    n_turns = _setup_transcripts(spark)
    registry = dims.registry_df(spark, SF_DIR)
    sysmeta = dims.sysmeta_df(spark, SF_DIR)

    def routed():
        return run_pipeline(
            spark.read.parquet(TRANSCRIPTS_PATH), registry, sysmeta, cfg
        )

    # warm-up: one full untimed pass — JVM JIT, whole-stage codegen
    # compilation, Python worker pool spawn (excluded, like any real
    # long-running cluster; limit() warmups don't work because AQE
    # short-circuits most stages)
    _mat(routed())

    queries = {}
    t_all = time.monotonic()

    t = time.monotonic()
    r = routed()
    _mat(r)
    queries["pipeline_routed_full"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    _mat(sink_counts(routed()))
    queries["sink_counts"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    _mat(harvest_metrics(routed()))
    queries["harvest_metrics"] = round(time.monotonic() - t, 3)

    total = round(time.monotonic() - t_all, 3)
    n_routed = r.count()
    spark.stop()
    return {
        "total_sec": total,
        "pipeline_sec": queries["pipeline_routed_full"],
        "n_turns": n_turns,
        "n_routed": n_routed,
        "queries": queries,
        "throughput_turns_per_sec": round(
            n_turns / queries["pipeline_routed_full"], 1
        ),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        lo = run_once("local[8]", 8)
        hi = run_once("local[32]", 32)
        eff = (lo["pipeline_sec"] / hi["pipeline_sec"]) / 4
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency local[8]->local[32]",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "sf": SF_DIR,
                    "t_n8_sec": lo["pipeline_sec"],
                    "t_n32_sec": hi["pipeline_sec"],
                    "throughput_n8": lo["throughput_turns_per_sec"],
                    "throughput_n32": hi["throughput_turns_per_sec"],
                }
            )
        )
        return

    r = run_once(f"local[{CPUS}]", int(CPUS) if CPUS.isdigit() else 32)
    print(
        json.dumps(
            {
                "metric": "parse→enrich→route→aggregate wall time",
                "value": r["total_sec"],
                "unit": "sec",
                "queries": r["queries"],
                "sf": SF_DIR,
                "n_turns": r["n_turns"],
                "n_routed": r["n_routed"],
                "throughput_turns_per_sec": r["throughput_turns_per_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
