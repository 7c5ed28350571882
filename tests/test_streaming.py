"""Structured Streaming variant: availableNow file-source run must match
the batch pipeline's stateless results, and the stateful repeat-visit
operator must reproduce the batch anchor semantics across micro-batches."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from d1_log_aggregation_spark import dims
from d1_log_aggregation_spark.operators.dedup import dedup_turns
from d1_log_aggregation_spark.operators.parse import parse_events
from d1_log_aggregation_spark.streaming.stream_pipeline import (
    flag_repeat_visits_stream,
    read_transcript_stream,
    start_pipeline,
    streaming_routed,
)
from d1_log_aggregation_spark.transcripts import load_transcripts

SF = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_streaming_matches_batch_stateless(spark, tmp_path):
    inp = str(tmp_path / "in")
    load_transcripts(spark, SF).repartition(6).write.parquet(inp)

    reg = dims.registry_df(spark, SF)
    sm = dims.sysmeta_df(spark, SF)
    stream = read_transcript_stream(spark, inp, max_files_per_trigger=2)
    # files are not time-ordered, so the allowed lateness must cover the
    # corpus span (30 days); production inputs arrive roughly in order and
    # use a tight watermark
    routed = streaming_routed(stream, reg, sm, watermark_delay="45 days")

    out = str(tmp_path / "out")
    q = (
        routed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # batch equivalent (same dedup-on-event_id semantics)
    batch = dedup_turns(parse_events(load_transcripts(spark, SF)))
    assert got.count() == batch.count()
    # routed sink counts agree with batch routing
    bs = {
        (r["sink"],): r["cnt"]
        for r in got.groupBy("sink").agg(F.count("*").alias("cnt")).collect()
    }
    assert sum(v for v in bs.values()) == batch.count()
    assert ("dlq",) in bs


def test_streaming_repeat_visit_state_across_batches(spark, tmp_path):
    """Rows arriving in separate in-order micro-batches must produce the
    same flags as one batch scan (state carries the anchor)."""
    rows_a = [  # batch 1: anchor at t0, repeats at +5/+15
        ("c1", 0, "user", 'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "", T0),
        ("c1", 1, "user", 'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "", T0 + dt.timedelta(seconds=5)),
        ("c1", 2, "user", 'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "", T0 + dt.timedelta(seconds=15)),
    ]
    rows_b = [  # batch 2: +29 repeat (anchor still t0), +31 re-anchor, +35 repeat
        ("c1", 3, "user", 'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "", T0 + dt.timedelta(seconds=29)),
        ("c1", 4, "user", 'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "", T0 + dt.timedelta(seconds=31)),
        ("c1", 5, "user", 'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "", T0 + dt.timedelta(seconds=35)),
    ]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    inp = str(tmp_path / "in")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    # file source orders by modification time; ensure two files exist
    assert len(glob.glob(f"{inp}/part-*")) == 2

    stream = read_transcript_stream(spark, inp, max_files_per_trigger=1)
    flags = flag_repeat_visits_stream(parse_events(stream), interval_seconds=30)
    out = str(tmp_path / "flags")
    q = (
        flags.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["event_id"]: r["is_repeat_visit"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        "c1.0": False, "c1.1": True, "c1.2": True,
        "c1.3": True, "c1.4": False, "c1.5": True,
    }


def test_streaming_windowed_sink_counts_match_batch(spark, tmp_path):
    """Watermarked tumbling-window aggregation (append mode) over the
    stream equals the same windowed groupBy over the batch frame."""
    from d1_log_aggregation_spark.streaming.stream_pipeline import (
        streaming_sink_counts,
    )

    inp = str(tmp_path / "in")
    # ONE file → one micro-batch → no cross-batch disorder; a tight
    # watermark then closes (and emits) every window except the last
    # day's (append mode holds windows until the watermark passes them)
    load_transcripts(spark, SF).coalesce(1).write.parquet(inp)
    reg, sm = dims.registry_df(spark, SF), dims.sysmeta_df(spark, SF)

    stream = read_transcript_stream(spark, inp, max_files_per_trigger=2)
    routed = streaming_routed(stream, reg, sm, watermark_delay="1 hour")
    agg = streaming_sink_counts(routed, "1 day")
    out = str(tmp_path / "agg")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_agg"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["sink"]): (r["n_rows"], r["n_robot_full"])
        for r in spark.read.parquet(out).collect()
    }

    from d1_log_aggregation_spark.operators.classify import classify_robots
    from d1_log_aggregation_spark.operators.dedup import dedup_turns
    from d1_log_aggregation_spark.operators.enrich import (
        enrich_registry,
        enrich_sysmeta,
    )
    from d1_log_aggregation_spark.operators.parse import parse_events
    from d1_log_aggregation_spark.operators.route import route

    b = parse_events(load_transcripts(spark, SF))
    b = dedup_turns(b)
    b = classify_robots(b)
    b = enrich_sysmeta(b, sm)
    b = enrich_registry(b, reg)
    b = route(b)
    expected = {
        (r["ws"], r["sink"]): (r["n_rows"], r["n_robot_full"])
        for r in b.groupBy(
            F.window("ts", "1 day").alias("w"), "sink"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("in_full_robot_list").cast("int")).alias(
                "n_robot_full"
            ),
        )
        .select(F.col("w.start").alias("ws"), "sink", "n_rows", "n_robot_full")
        .collect()
    }
    # append mode holds back windows not yet past the final watermark
    # (the corpus's last day), so assert emitted ⊆ expected with exact
    # values and ≥80% coverage
    assert got and all(expected[k] == v for k, v in got.items())
    assert len(got) >= 0.8 * len(expected)


def test_start_pipeline_writes_cross_batch_flags(spark, tmp_path):
    """The WRITTEN output of the end-to-end streaming query must carry
    cross-batch-correct repeat-visit flags (VERDICT r1 item 4: the old
    writer computed batch-local flags, so a repeat straddling a micro-batch
    boundary was written false)."""
    mk = lambda idx, secs: (  # noqa: E731
        "c1", idx, "user",
        'EVT type=read pid=d1 ip=1.1.1.1 ua="x" subj="s"', "",
        T0 + dt.timedelta(seconds=secs),
    )
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    inp = str(tmp_path / "in")
    # batch 1: anchor at t0 + one in-window repeat
    spark.createDataFrame([mk(0, 0), mk(1, 5)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    # batch 2: +20 is still inside the t0 anchor window → repeat ONLY if
    # the anchor survived the batch boundary; +45 re-anchors
    spark.createDataFrame([mk(2, 20), mk(3, 45)], schema).coalesce(
        1
    ).write.mode("append").parquet(inp)
    assert len(glob.glob(f"{inp}/part-*")) == 2

    out = str(tmp_path / "out")
    q = start_pipeline(
        spark,
        input_path=inp,
        output_path=out,
        checkpoint_path=str(tmp_path / "ckpt3"),
        registry=dims.registry_df(spark, SF),
        sysmeta=dims.sysmeta_df(spark, SF),
        interval_seconds=30,
    )
    q.awaitTermination(300)

    written = spark.read.option("basePath", out).parquet(f"{out}/batch=*")
    got = {
        r["event_id"]: r["is_repeat_visit"]
        for r in written.select("event_id", "is_repeat_visit").collect()
    }
    assert got == {"c1.0": False, "c1.1": True, "c1.2": True, "c1.3": False}
    # routing survived the stateful pass
    sinks = {r["sink"] for r in written.select("sink").distinct().collect()}
    assert sinks and "dlq" not in sinks


def test_session_window_gap_boundary(spark):
    """session_window semantics pinned on hand-built events (batch
    execution of the same aggregate the streaming gate runs): events
    merge while the inter-event gap is AT MOST the 30-min gap (Spark
    merges overlapping-or-touching ranges: an event at exactly
    prev + 30 min CONTINUES the session); a session breaks only on a
    strictly larger gap, and session end = last event + gap.  The DuckDB
    twin mirrors this boundary (oracle.py streaming_session_counts)."""
    from d1_log_aggregation_spark.streaming.stream_pipeline import (
        streaming_session_counts,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # ip A: 0, 29m59s, 59m59s (touching: exactly +30 from the 2nd)
        # → ONE session; 90m00.000001s is strictly past +30 → NEW session
        ("a", 0, "10.0.0.1", "read", "role_user", mins(0)),
        ("a", 1, "10.0.0.1", "read", "role_user",
         t0 + dt.timedelta(minutes=29, seconds=59)),
        ("a", 2, "10.0.0.1", "create", "role_user",
         t0 + dt.timedelta(minutes=59, seconds=59)),
        ("a", 3, "10.0.0.1", "update", "role_user",
         t0 + dt.timedelta(minutes=90, microseconds=1)),
        # ip B: single event; dlq row must be excluded
        ("b", 0, "10.0.0.2", "read", "role_user", mins(5)),
        ("b", 1, "10.0.0.2", "", "dlq", mins(6)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ip string, event string,"
        " sink string, ts timestamp",
    )
    out = {
        (r["ip"], r["session_start"]): r
        for r in streaming_session_counts(df, "30 minutes").collect()
    }
    a1 = out[("10.0.0.1", mins(0))]
    assert a1["n_events"] == 3 and a1["n_reads"] == 2
    # session end = last event + gap
    assert a1["session_end"] == t0 + dt.timedelta(minutes=89, seconds=59)
    a2 = out[("10.0.0.1", t0 + dt.timedelta(minutes=90, microseconds=1))]
    assert a2["n_events"] == 1 and a2["n_reads"] == 0
    b = out[("10.0.0.2", mins(5))]
    assert b["n_events"] == 1
    assert len(out) == 3
