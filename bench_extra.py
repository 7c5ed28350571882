#!/usr/bin/env python
"""Round-8 extra benchmark legs (bench.py is FROZEN for measurement —
supplementary evidence lives here; cited in OPTIMIZATION_r08.md).

Legs:
  --bpe       bpe_merges at n_merges 8 vs 500 (driver-local trainer:
              wall time and Spark job count must be O(1) in n_merges;
              the r7 loop was 2 jobs/round)
  --classify  fullscale UA classification: memoized batch path vs the
              pre-r8 inline per-row alternation, same parsed input
  --assign    centroid assignment: fused argmax (with_best_centroid)
              vs the r7 fan-out+window+join (_assign path), corpus at
              sf0.1
  --pipeline  repeat-visit stage isolation: pipeline prefix timings at
              the sf1-replicated input (noop sink, guide §1.4)

Prints one JSON line per leg.  Methodology matches bench.py: warm
passes, min-of-3, noop materialization, same session config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, warm: int = 2, reps: int = 3) -> tuple[float, list[float]]:
    for _ in range(warm):
        fn()
    samples = []
    for _ in range(reps):
        t = time.monotonic()
        fn()
        samples.append(time.monotonic() - t)
    return min(samples), [round(s, 3) for s in samples]


def _spark(name: str):
    from d1_log_aggregation_spark.session import get_spark

    return get_spark(
        app_name=name,
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32,
    )


def leg_bpe() -> dict:
    from d1_log_aggregation_spark.datapipe import textstats

    spark = _spark("bench-extra-bpe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sc = spark.sparkContext
    out = {"leg": "bpe_merges_local", "sf": SF_DIR}
    for n in (8, 500):
        best, samples = _timed(
            lambda: _mat(textstats.bpe_merges(docs, n_merges=n))
        )
        out[f"n{n}_sec"] = round(best, 3)
        out[f"n{n}_samples"] = samples
    # Spark job count at n_merges=500 (the r7 loop would launch ~1000)
    sc.setJobGroup("bpe_extra_jobs", "bpe 500 merges")
    textstats.bpe_merges(docs, n_merges=500).collect()
    sc.setJobGroup(None, None)
    out["jobs_at_n500"] = len(
        sc.statusTracker().getJobIdsForGroup("bpe_extra_jobs")
    )
    out["sec_ratio_500_over_8"] = round(
        out["n500_sec"] / out["n8_sec"], 3
    )
    spark.stop()
    return out


def leg_classify() -> dict:
    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.operators.classify import classify_robots
    from d1_log_aggregation_spark.operators.dedup import dedup_turns
    from d1_log_aggregation_spark.operators.parse import parse_events
    from d1_log_aggregation_spark.transcripts import load_transcripts

    spark = _spark("bench-extra-classify")
    parsed = parse_events(dedup_turns(load_transcripts(spark, SF_DIR)))
    full = dims.full_robot_patterns_fullscale()
    part = dims.partial_robot_patterns_fullscale()
    out = {"leg": "classify_fullscale", "sf": SF_DIR}
    for tag, memo in (("memoized", True), ("inline_r7", False)):
        best, samples = _timed(
            lambda m=memo: _mat(
                classify_robots(
                    parsed, full_patterns=full, partial_patterns=part,
                    ua_flags_memoized=m,
                )
            )
        )
        out[f"{tag}_sec"] = round(best, 3)
        out[f"{tag}_samples"] = samples
    out["speedup"] = round(out["inline_r7_sec"] / out["memoized_sec"], 2)
    spark.stop()
    return out


def leg_assign() -> dict:
    from d1_log_aggregation_spark.datapipe import ann

    spark = _spark("bench-extra-assign")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = ann.with_qvec(embs).select("vec_id", "qvec", "qnorm2")
    cent_rows = ann._seed_centroid_rows(base, 16)
    out = {"leg": "centroid_assignment", "sf": SF_DIR}
    for tag, fn in (
        ("fused", lambda: _mat(
            ann.with_best_centroid(base, cent_rows)
        )),
        ("fanout_window_r7", lambda: _mat(ann._assign(base, cent_rows))),
    ):
        best, samples = _timed(fn)
        out[f"{tag}_sec"] = round(best, 3)
        out[f"{tag}_samples"] = samples
    out["speedup"] = round(out["fanout_window_r7_sec"] / out["fused_sec"], 2)
    spark.stop()
    return out


def leg_pipeline() -> dict:
    from pyspark.sql import functions as F

    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.operators.classify import classify_robots
    from d1_log_aggregation_spark.operators.dedup import dedup_turns
    from d1_log_aggregation_spark.operators.enrich import (
        enrich_registry,
        enrich_sysmeta,
    )
    from d1_log_aggregation_spark.operators.parse import parse_events
    from d1_log_aggregation_spark.operators.repeat_visit import (
        flag_repeat_visits,
    )
    from d1_log_aggregation_spark.operators.route import route
    from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
    from d1_log_aggregation_spark.transcripts import load_transcripts

    spark = _spark("bench-extra-pipeline")
    # sf1-equivalent replicated input, the bench.py recipe
    t = load_transcripts(spark, SF_DIR)
    reps = spark.range(10).select(F.col("id").cast("string").alias("rep"))
    t = t.crossJoin(F.broadcast(reps)).withColumn(
        "conv_id", F.concat_ws("_", "conv_id", "rep")
    ).drop("rep")
    path = "/tmp/bench_extra_sf1.parquet"
    t.repartition(128).write.mode("overwrite").parquet(path)
    t = spark.read.parquet(path)
    registry = dims.registry_df(spark, SF_DIR)
    sysmeta = dims.sysmeta_df(spark, SF_DIR)

    def prefix(stage: int):
        df = parse_events(t)
        if stage >= 1:
            df = dedup_turns(df)
        if stage >= 2:
            df = enrich_sysmeta(df, sysmeta)
            df = enrich_registry(df, registry)
        if stage >= 3:
            df = flag_repeat_visits(
                df,
                interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
                fuse_geohash=True,
            )
        if stage >= 4:
            df = classify_robots(df)
            df = route(df)
        return df

    out = {"leg": "pipeline_prefixes_sf1", "sf": SF_DIR}
    names = ["parse", "dedup", "enrich", "repeat_arrow", "route_full"]
    for _ in range(2):
        _mat(prefix(4))
    for s, n in enumerate(names):
        best, samples = _timed(lambda s=s: _mat(prefix(s)), warm=0)
        out[f"{n}_sec"] = round(best, 3)
        out[f"{n}_samples"] = samples
    spark.stop()
    return out


def main() -> None:
    legs = {
        "--bpe": leg_bpe,
        "--classify": leg_classify,
        "--assign": leg_assign,
        "--pipeline": leg_pipeline,
    }
    chosen = [a for a in sys.argv[1:] if a in legs] or list(legs)
    for a in chosen:
        print(json.dumps(legs[a]()))


if __name__ == "__main__":
    main()
