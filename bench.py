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
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


TRANSCRIPTS_PATH = "/tmp/bench_transcripts.parquet"

# --scaling replicates the input so the job is compute-bound rather than
# overhead-bound (at sf0.1 the warm pipeline is ~2.5 s — scheduling and
# Python-worker fixed costs swamp any core-count signal).  Replicas get
# shifted conv_ids, preserving key cardinality ratios.
SCALING_REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "16"))


def _mat(df) -> None:
    """Materialize every column (noop sink — no count(), which would both
    double-execute and let Catalyst prune)."""
    df.write.format("noop").mode("overwrite").save()


def _setup_transcripts(spark, replicate: int = 1, path: str = TRANSCRIPTS_PATH) -> int:
    """UNTIMED: materialize the synthetic transcripts table to parquet.
    In production the Iceberg transcripts table already exists — synthesis
    is test scaffolding, not pipeline work.  Written as many files so any
    parallelism level can scan in parallel (a real 100 TB table has
    thousands of files)."""
    from pyspark.sql import functions as F

    from d1_log_aggregation_spark.transcripts import load_transcripts

    df = load_transcripts(spark, SF_DIR)
    if replicate > 1:
        reps = spark.range(replicate).select(
            F.col("id").cast("string").alias("rep")
        )
        df = df.crossJoin(F.broadcast(reps)).withColumn(
            "conv_id", F.concat_ws("_", "conv_id", "rep")
        ).drop("rep")
    df.repartition(128).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def run_once(
    master: str,
    shuffle_partitions: int,
    replicate: int = 1,
    tag: str = "",
    pipeline_only: bool = False,
) -> dict:
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
    # tag keeps concurrent variants (the sf1 replicated run) off the
    # 1x paths that run_round_ops reads afterwards
    tpath = TRANSCRIPTS_PATH.replace(".parquet", f"{tag}.parquet")
    n_turns = _setup_transcripts(spark, replicate, tpath)
    registry = dims.registry_df(spark, SF_DIR)
    sysmeta = dims.sysmeta_df(spark, SF_DIR)

    def routed():
        return run_pipeline(
            spark.read.parquet(tpath), registry, sysmeta, cfg
        )

    # warm-up: full untimed passes — JVM JIT of the giant codegen'd
    # methods takes several executions to converge (measured 125→40→25 s
    # on the first three runs at local[32], and 6.3→2.3 s at sf0.1);
    # limit() warmups don't work because AQE short-circuits most stages
    for _ in range(2):
        _mat(routed())

    # Every headline row is warm-up + min-of-N with the PER-REP times kept
    # in the artifact (VERDICT r4 item 1: the r4 driver run recorded
    # 2.5-3.7× regressions that a quiet-box rerun of the same code could
    # not reproduce; a single cold sample cannot distinguish a code
    # regression from neighbor load — the rep spread can).
    queries: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    t_all = time.monotonic()

    def timed(name: str, fn, reps: int) -> None:
        # min over RAW durations; round only at the artifact boundary
        # (ADVICE r6: rounding each rep before min is a 0.5 ms
        # quantization that shifted artifact semantics vs pre-r6 rows)
        samples = []
        for _ in range(reps):
            t = time.monotonic()
            fn()
            samples.append(time.monotonic() - t)
        rep_times[name] = [round(s, 3) for s in samples]
        queries[name] = round(min(samples), 3)

    timed(
        "pipeline_routed_full",
        lambda: _mat(routed()),
        reps=5 if replicate > 1 else 3,
    )

    if pipeline_only:
        # scaling legs only need the headline row — skipping the sink
        # battery halves leg time so --scaling can afford to INTERLEAVE
        # the two parallelism levels (see main) instead of measuring
        # them minutes apart on a drifting box
        total = round(time.monotonic() - t_all, 3)
        spark.stop()
        return {
            "total_sec": total,
            "pipeline_sec": queries["pipeline_routed_full"],
            "n_turns": n_turns,
            "queries": queries,
            "rep_times": rep_times,
            "throughput_turns_per_sec": round(
                n_turns / queries["pipeline_routed_full"], 1
            ),
        }

    # Pipeline executions landing in the real sink (timed), and the
    # aggregates run over the WRITTEN table — the production decomposition
    # (r1 bench triple-executed the pipeline for each aggregate, inflating
    # "value" 3×).  The write is idempotent (mode=overwrite), so min-of-3
    # measures the same work each rep.
    sink_path = f"/tmp/bench_routed{tag}.parquet"

    def write_sink() -> None:
        routed().write.mode("overwrite").partitionBy("sink").parquet(
            sink_path
        )

    timed("sink_write_parquet", write_sink, reps=3)

    written = spark.read.parquet(sink_path)
    for _ in range(1):  # warm the written-table scan
        _mat(sink_counts(written))
    timed("sink_counts", lambda: _mat(sink_counts(written)), reps=3)
    timed("harvest_metrics", lambda: _mat(harvest_metrics(written)), reps=3)

    total = round(time.monotonic() - t_all, 3)
    n_routed = written.count()
    spark.stop()
    return {
        "total_sec": total,
        "pipeline_sec": queries["pipeline_routed_full"],
        "n_turns": n_turns,
        "n_routed": n_routed,
        "queries": queries,
        "rep_times": rep_times,
        "throughput_turns_per_sec": round(
            n_turns / queries["pipeline_routed_full"], 1
        ),
    }


def _timed_rows(
    spark,
    jobs: dict,
    rep_times: dict[str, list[float]],
    warm: int = 2,
    reps: int = 3,
) -> dict[str, float]:
    """warm + min-of-N with PER-REP times kept for EVERY row (VERDICT r5
    item 1: the r5 artifact hardened only the 4 headline rows, so two
    non-headline rows shipped as single contended samples 2.8-3.5× above
    quiet-box numbers — indistinguishable from a real regression without
    the rep spread).  Caches cleared between rows so later jobs aren't
    timed under earlier jobs' dead cached relations."""
    out: dict[str, float] = {}
    for name, fn in jobs.items():
        for _ in range(warm):
            _mat(fn())
        # raw-float min, round only for the artifact (ADVICE r6)
        samples = []
        for _ in range(reps):
            t = time.monotonic()
            _mat(fn())
            samples.append(time.monotonic() - t)
        rep_times[name] = [round(s, 3) for s in samples]
        out[name] = round(min(samples), 3)
        spark.catalog.clearCache()
    return out


class _ScratchDirs:
    """Fresh-dir-per-call scratch allocator that REMOVES everything it
    handed out (ADVICE r3: mkdtemp per timed invocation leaked a
    corpus-scale parquet index per call; repeated bench runs filled
    /tmp).  Use as a context manager around the warm+timed loop."""

    def __init__(self, prefix: str):
        self._prefix = prefix
        self._dirs: list[str] = []

    def fresh(self) -> str:
        d = tempfile.mkdtemp(prefix=self._prefix)
        self._dirs.append(d)
        return d

    def __enter__(self) -> "_ScratchDirs":
        return self

    def __exit__(self, *exc) -> None:
        import shutil

        for d in self._dirs:
            shutil.rmtree(d, ignore_errors=True)


def run_datapipe(spark, rep_times: dict[str, list[float]]) -> dict:
    """Dedup-suite bench over the dup-planted corpus at SF_DIR (VERDICT r1
    item 1: the candidate-only LSH and 16-bit-band SimHash need a bench
    entry, not just green correctness)."""
    from d1_log_aggregation_spark.datapipe import dedup
    from d1_log_aggregation_spark.datapipe.corpus import load_corpus

    from d1_log_aggregation_spark.datapipe import ann, vectors

    corpus = load_corpus(spark, SF_DIR)
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vcorp = vectors.load_vector_corpus(spark, SF_DIR)
    with _ScratchDirs("bench_lsh_scratch_") as scratch:
        jobs = {
            # EXPLICIT lineage-persist leg (test-only plan since r7 —
            # the default now auto-scratches); kept as the comparison
            # row against the production _lsh scratch path below
            "dedup_corpus_deduped": lambda: dedup.corpus_deduped(
                corpus, lineage_persist=True
            ),
            # production path: shingle index + banded sigs + losers
            # written to parquet (timed — the index write IS the
            # production cost); fresh tracked dir per invocation (the
            # scratch contract), all removed when the suite finishes
            "dedup_corpus_deduped_lsh": lambda: dedup.corpus_deduped_lsh(
                corpus, scratch_dir=scratch.fresh()
            ),
            "dedup_minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(
                corpus
            ),
            "dedup_simhash_pairs": lambda: dedup.simhash_pairs(corpus),
            "ann_ivf_topk": lambda: ann.ivf_topk(embs),
            # r7: relation-joined large-nlist IVF at gate params; its
            # ×16 nlist-growth leg lives in --datapipe-scale
            "ann_ivf_bigk": lambda: ann.ivf_topk_bigk(embs),
            "embedding_neardup_pairs":
                lambda: vectors.embedding_neardup_pairs(vcorp),
            "semdedup": lambda: vectors.semdedup(vcorp),
        }
        return _timed_rows(spark, jobs, rep_times)


def run_round_ops(spark, rep_times: dict[str, list[float]]) -> dict:
    """Timed rows for the operator families the r2/r3 rounds added
    (VERDICT r2 item 9): funnel, exact token quantiles, as-of enrich,
    sessionization — so later rounds can see regressions on them.
    conv_funnel/token_quantiles read the already-written routed/docs
    tables; enrich_asof/session_stats run from the parse stage (their
    production shape includes the parse)."""
    import __spark_entry__ as entry
    from d1_log_aggregation_spark.datapipe import ann as dp_ann
    from d1_log_aggregation_spark.datapipe import dedup as dp_dedup
    from d1_log_aggregation_spark.datapipe import multimodal as dp_mm
    from d1_log_aggregation_spark.datapipe import sampling as dp_sampling
    from d1_log_aggregation_spark.datapipe import textstats as dp_text
    from d1_log_aggregation_spark.operators.analytics import (
        conv_funnel,
        event_transitions,
        node_staleness,
        turn_gap_quantiles,
    )

    def _dp_search():
        from d1_log_aggregation_spark.datapipe import search

        return search

    def _dp_sel():
        from d1_log_aggregation_spark.datapipe import selection

        return selection

    def _rolling_distinct_users():
        from d1_log_aggregation_spark.operators.analytics import (
            rolling_distinct_users,
        )

        return rolling_distinct_users

    def _cms():
        from d1_log_aggregation_spark.operators.analytics import (
            cms_pid_estimates,
        )

        return cms_pid_estimates

    routed = spark.read.parquet("/tmp/bench_routed.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with _ScratchDirs("bench_roundops_scratch_") as scratch:
        jobs = {
            "conv_funnel": lambda: conv_funnel(routed),
            "token_quantiles": lambda: dp_text.token_quantiles(docs),
            "enrich_asof": lambda: entry._q_enrich_asof(spark, SF_DIR),
            "session_stats": lambda: entry._q_session_stats(spark, SF_DIR),
            # r3/r4 operator families (r3 VERDICT item 4: new families
            # need timed rows so later rounds can see regressions)
            "multimodal_features": lambda: dp_mm.multimodal_features(docs),
            "multimodal_audio_features":
                lambda: dp_mm.multimodal_audio_features(docs),
            "event_transitions": lambda: event_transitions(routed),
            "rare_token_stats": lambda: dp_text.rare_token_stats(
                docs, scratch_dir=scratch.fresh()
            ),
            "turn_gap_quantiles": lambda: turn_gap_quantiles(routed),
            "node_staleness": lambda: node_staleness(routed),
            "embedding_stats": lambda: dp_ann.embedding_stats(embs),
            "corpus_split": lambda: dp_sampling.corpus_split(docs),
            "quality_rule_stats":
                lambda: dp_text.quality_rule_stats(docs),
            # r4 additions: inverted-index search on its materialized-
            # index production path, and the exact rolling distinct
            "similar_docs_topk": lambda: _dp_search().similar_docs_topk(
                docs, scratch_dir=scratch.fresh()
            ),
            "rolling_distinct_users":
                lambda: _rolling_distinct_users()(routed),
            "cms_pid_estimates": lambda: _cms()(routed),
            "bigram_novelty": lambda: dp_text.bigram_novelty(
                docs, scratch_dir=scratch.fresh()
            ),
            # r5: Gopher repetition filters — explode + two aggs, no join
            "repetition_stats":
                lambda: dp_text.repetition_stats(docs),
            # r5: segment-level exact dedup + doc rewrite — one
            # partial-agg shuffle on the block key, one join back
            "paragraph_dedup":
                lambda: dp_dedup.paragraph_dedup(docs),
            # r5: per-row char entropy — zero shuffles, pure codegen
            "entropy_stats":
                lambda: dp_text.entropy_stats(docs),
            # r5: corpus-trained bigram-LM perplexity filter — one
            # bigram partial-agg shuffle + two vocab-keyed joins
            "lm_perplexity":
                lambda: dp_text.lm_perplexity(docs),
            # r5: mixture composition — one agg + window over cells
            "corpus_mix":
                lambda: dp_text.corpus_mix(docs),
            # r5: train/eval leakage audit — shingle semi-join
            "split_leakage":
                lambda: dp_dedup.split_leakage(docs, min_common=5),
            # r5: classification at the reference list width — measures
            # the 222/214-term alternation's per-row rlike cost
            "robot_classify_fullscale":
                lambda: entry._q_robot_flags_fullscale(spark, SF_DIR),
            # r7: 8-round iterated BPE trainer — each round is one
            # vocabulary-sized pair agg + a 1-row collect; the timed
            # value includes all 8 driver-loop rounds
            "bpe_merges": lambda: dp_text.bpe_merges(docs, n_merges=8),
            # r7: checkpoint → filter_new resume round trip (write the
            # prefix watermarks, route exactly the suffix)
            "harvest_incremental":
                lambda: entry._q_harvest_incremental(spark, SF_DIR),
            # r5: DSIR importance weights — one (doc,bucket) partial-agg
            # shuffle + broadcast of the B-row log-ratio model
            "dsir_weights": lambda: _dp_sel().dsir_weights(
                docs, scratch_dir=scratch.fresh()
            ),
            # r5: duplicate-5-gram saturation — one (doc,gram) partial-
            # agg shuffle reused by the doc-frequency agg + score join
            "dup_ngram_stats": lambda: _dp_sel().dup_ngram_stats(
                docs, scratch_dir=scratch.fresh()
            ),
        }
        # layout rewrite is a writer, not a noop-materialize job: time
        # the range-cluster + sort + parquet write of the routed table
        from d1_log_aggregation_spark.sinks.layout import optimize_layout

        out = {}
        for _ in range(1):
            optimize_layout(routed, scratch.fresh(), n_files=32)
        samples = []
        for _ in range(3):
            t = time.monotonic()
            optimize_layout(routed, scratch.fresh(), n_files=32)
            samples.append(time.monotonic() - t)
        rep_times["sink_layout_rewrite"] = [round(s, 3) for s in samples]
        out["sink_layout_rewrite"] = round(min(samples), 3)
        out.update(_timed_rows(spark, jobs, rep_times))
    return out


def run_sf1_scale(master: str, shuffle_partitions: int) -> dict:
    """sf1-equivalent row: the same pipeline over SF_DIR replicated ×10
    with shifted conv_ids (~1M turns at the default sf0.1) so the headline
    bench stops being fixed-cost-dominated."""
    r = run_once(master, shuffle_partitions, replicate=10, tag="_sf1")
    return {
        "pipeline_sf1_replicated_sec": r["pipeline_sec"],
        "pipeline_sf1_rep_times": r["rep_times"]["pipeline_routed_full"],
        "n_turns_sf1": r["n_turns"],
        "throughput_sf1_turns_per_sec": r["throughput_turns_per_sec"],
    }


def run_datapipe_scale(master: str, shuffle_partitions: int, factor: int = 16) -> dict:
    """Growth-curve evidence for the dedup/vector ops: time each at 1× and
    ×factor corpus size and report the ratio (ideal ≈ factor for a
    linearithmic op; the LSH/banding designs should stay well under
    factor² — the all-pairs blowup they exist to avoid).

    The replicas get every TOKEN prefixed with the replica id (one regex
    pass, untimed setup), so each replica reproduces the planted dup
    structure internally but shares no shingles/vectors across replicas —
    replication grows the PROBLEM, not the duplicate count per doc."""
    from pyspark.sql import functions as F

    from d1_log_aggregation_spark.datapipe import dedup, textstats, vectors
    from d1_log_aggregation_spark.datapipe.corpus import load_corpus
    from d1_log_aggregation_spark.session import get_spark

    spark = get_spark(
        app_name="bench-datapipe-scale",
        master=master,
        shuffle_partitions=shuffle_partitions,
    )
    base = load_corpus(spark, SF_DIR)
    n_docs = base.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    scaled = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("$1")),
            ).alias("text"),
        )
    )
    scaled_path = "/tmp/bench_corpus_scaled.parquet"
    scaled.repartition(64).write.mode("overwrite").parquet(scaled_path)
    scaled = spark.read.parquet(scaled_path)
    n_scaled = scaled.count()

    vbase = vectors.load_vector_corpus(spark, SF_DIR)
    vreps = spark.range(factor).select(F.col("id").alias("rep"))
    vscaled = (
        vbase.crossJoin(F.broadcast(vreps))
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "vec_id"
            ),
            # per-replica Rademacher sign flip: norm-preserving, keeps
            # every INTRA-replica cosine exactly (s_i² = 1) so each
            # replica reproduces the planted near-dup structure, while
            # cross-replica cosines decorrelate (random sign agreement).
            # (The first version added a large constant to one axis —
            # that made all vectors within a replica near-parallel and
            # produced quadratically many TRUE near-dups, measuring
            # output explosion instead of engine scaling.)
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(F.col("rep"), i), F.lit(2)) == 0, x
                ).otherwise(-x).cast("float"),
            ).alias("embedding"),
        )
    )
    vpath = "/tmp/bench_vectors_scaled.parquet"
    vscaled.repartition(64).write.mode("overwrite").parquet(vpath)
    vscaled = spark.read.parquet(vpath)

    jobs = {
        "minhash_lsh_pairs": lambda d: dedup.minhash_lsh_pairs(d),
        "simhash_pairs": lambda d: dedup.simhash_pairs(d),
        "corpus_deduped": lambda d: dedup.corpus_deduped(
            d, lineage_persist=True
        ),
        # the production materialized-index path: growth includes the
        # parquet index writes (the real cost structure at scale);
        # scratch dirs tracked + removed via _ScratchDirs (each holds a
        # corpus-scale parquet index — leaking them fills /tmp)
        "corpus_deduped_scratch": lambda d: dedup.corpus_deduped(
            d, scratch_dir=scratch.fresh()
        ),
        # r5 heavy ops: one block-key partial-agg shuffle + join back;
        # one bigram partial-agg shuffle + two vocab-keyed joins (the
        # scratch hatch keeps the bigram relation off the session cache)
        "paragraph_dedup": lambda d: dedup.paragraph_dedup(d),
        "lm_perplexity": lambda d: textstats.lm_perplexity(
            d, scratch_dir=scratch.fresh()
        ),
    }
    out = {"n_docs_1x": n_docs, "n_docs_scaled": n_scaled, "factor": factor}
    with _ScratchDirs("bench_cds_scale_") as scratch:
        for name, fn in jobs.items():
            for df, tag in ((base, "1x"), (scaled, f"{factor}x")):
                for _ in range(1 if tag != "1x" else 2):
                    _mat(fn(df))
                t = time.monotonic()
                _mat(fn(df))
                out[f"{name}_{tag}_sec"] = round(time.monotonic() - t, 3)
                spark.catalog.clearCache()  # drop the op's internal persists
            out[f"{name}_growth"] = round(
                out[f"{name}_{factor}x_sec"] / out[f"{name}_1x_sec"], 2
            )
    # the sign-LSH tuning rule in action: band_bits scales with log2(N)
    # (the r2 before-number with 16-bit bands at ×16 was 143× growth —
    # N²/2^16 random collisions; 32-bit bands keep collisions linear)
    vjobs = (
        (vbase, "1x", dict()),
        (vscaled, f"{factor}x", dict(n_planes=128, band_bits=32)),
    )
    for df, tag, kw in vjobs:
        for _ in range(1 if tag != "1x" else 2):
            _mat(vectors.embedding_neardup_pairs(df, **kw))
        t = time.monotonic()
        _mat(vectors.embedding_neardup_pairs(df, **kw))
        out[f"embedding_neardup_{tag}_sec"] = round(time.monotonic() - t, 3)
        spark.catalog.clearCache()
    out["embedding_neardup_growth"] = round(
        out[f"embedding_neardup_{factor}x_sec"]
        / out["embedding_neardup_1x_sec"], 2
    )
    # semdedup's scale rule in action: n_centroids grows WITH the corpus
    # (the SemDeDup contract — cluster sizes, hence the within-cluster
    # quadratic self-join fan-out, stay constant; at fixed k the pair
    # count would grow ×factor² instead)
    sjobs = (
        (vbase, "1x", dict(n_centroids=8)),
        (vscaled, f"{factor}x", dict(n_centroids=8 * factor)),
    )
    for df, tag, kw in sjobs:
        for _ in range(1 if tag != "1x" else 2):
            _mat(vectors.semdedup(df, **kw))
            spark.catalog.clearCache()
        t = time.monotonic()
        _mat(vectors.semdedup(df, **kw))
        out[f"semdedup_{tag}_sec"] = round(time.monotonic() - t, 3)
        spark.catalog.clearCache()
    out["semdedup_growth"] = round(
        out[f"semdedup_{factor}x_sec"] / out["semdedup_1x_sec"], 2
    )
    # ivf_bigk's scale rule (VERDICT r6 item 2's growth leg): nlist
    # (n_fine) grows WITH the corpus while cell occupancy n_fine/n_coarse
    # stays constant — assignment candidates per vector stay
    # ~nprobe_coarse · occupancy, so cost should track corpus size
    # (ideal ≈ factor), NOT corpus × nlist (which would be ×factor²).
    from d1_log_aggregation_spark.datapipe import ann

    bjobs = (
        (vbase, "1x", dict(n_fine=256, n_coarse=16)),
        (
            vscaled,
            f"{factor}x",
            dict(n_fine=256 * factor, n_coarse=16 * factor),
        ),
    )
    for df, tag, kw in bjobs:
        for _ in range(1 if tag != "1x" else 2):
            _mat(ann.ivf_topk_bigk(df, **kw))
            ann.release_ivf_caches()
            spark.catalog.clearCache()
        t = time.monotonic()
        _mat(ann.ivf_topk_bigk(df, **kw))
        out[f"ann_ivf_bigk_{tag}_sec"] = round(time.monotonic() - t, 3)
        ann.release_ivf_caches()
        spark.catalog.clearCache()
    out["ann_ivf_bigk_growth"] = round(
        out[f"ann_ivf_bigk_{factor}x_sec"] / out["ann_ivf_bigk_1x_sec"], 2
    )
    spark.stop()
    return out


def run_skew(master: str, shuffle_partitions: int) -> dict:
    """Skew evidence (north_rule: "skew from hot conversations handled"):
    same replicated input, but 30% of ALL rows rewritten to ONE hot
    (ip, pid) — the repeat-visit shuffle key — and one hot conversation.
    Reports uniform vs skewed pipeline time.  The pipeline survives
    because (a) dedup keys on high-cardinality (conv_id, turn_idx),
    (b) enrichment is broadcast (key-agnostic), (c) the hot (ip, pid)
    window partition runs through the VECTORIZED anchor scan (numpy, not
    per-row Python), and (d) AQE rebalances the post-window stages.  The
    residual slowdown is the single-threaded sort of the hot window
    partition — inherent to any order-sensitive per-key scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
    from d1_log_aggregation_spark.pipeline import PipelineConfig, run_pipeline
    from d1_log_aggregation_spark.session import get_spark

    spark = get_spark(
        app_name="bench-skew",
        master=master,
        shuffle_partitions=shuffle_partitions,
    )
    n_turns = _setup_transcripts(spark, SCALING_REPLICATE)
    skew_path = "/tmp/bench_transcripts_skew.parquet"
    base = spark.read.parquet(TRANSCRIPTS_PATH)
    hot = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(100)) < 30
    skewed = base.withColumns(
        {
            "text": F.when(
                hot,
                F.regexp_replace(
                    F.regexp_replace(
                        "text", r" pid=\S* ip=\S+ ua=",
                        " pid=doc-7 ip=10.99.99.99 ua="
                    ),
                    r"subj=\"user-\d+\"", 'subj="user-hot"'
                ),
            ).otherwise(F.col("text")),
            "conv_id": F.when(hot, F.lit("conv-hot")).otherwise(
                F.col("conv_id")
            ),
            # keep (conv_id, turn_idx) unique so dedup doesn't collapse
            # the hot rows — skew the KEYS, not the row count
            "turn_idx": F.when(
                hot,
                F.row_number().over(
                    Window.partitionBy(hot.cast("int")).orderBy(
                        "conv_id", "turn_idx"
                    )
                ),
            ).otherwise(F.col("turn_idx")),
        }
    )
    skewed.repartition(128).write.mode("overwrite").parquet(skew_path)
    registry = dims.registry_df(spark, SF_DIR)
    sysmeta = dims.sysmeta_df(spark, SF_DIR)

    # wide = default pass-through scan; narrow = repeat_scan_narrow (the
    # hot-key configuration: scan-column-only window + event_id join
    # back).  All four (input × scan) legs interleave inside one session
    # so box drift lands evenly (the --scaling lesson).
    out: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    legs = [
        (inp, path, scan, narrow)
        for inp, path in (
            ("uniform", TRANSCRIPTS_PATH), ("skewed", skew_path)
        )
        for scan, narrow in (
            ("wide", False), ("narrow", True), ("auto", "auto")
        )
    ]
    jobs = {}
    for inp, path, scan, narrow in legs:
        cfg_v = PipelineConfig(
            repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
            with_geohash=True,
            repeat_scan_narrow=narrow,
        )
        jobs[f"pipeline_{inp}_{scan}"] = (
            lambda p=path, c=cfg_v: run_pipeline(
                spark.read.parquet(p), registry, sysmeta, c
            )
        )
    for name, fn in jobs.items():
        for _ in range(2):
            _mat(fn())
    raw: dict[str, list[float]] = {}
    for _ in range(3):
        for name, fn in jobs.items():
            t = time.monotonic()
            _mat(fn())
            raw.setdefault(name, []).append(time.monotonic() - t)
    for name, samples in raw.items():
        # raw-float min; round only at the artifact boundary (ADVICE r6)
        rep_times[name] = [round(s, 3) for s in samples]
        out[f"{name}_sec"] = round(min(samples), 3)
    out["pipeline_uniform_sec"] = out["pipeline_uniform_wide_sec"]
    out["pipeline_skewed_sec"] = out["pipeline_skewed_wide_sec"]
    hot_rows = spark.read.parquet(skew_path).filter(
        F.col("conv_id") == "conv-hot"
    ).count()
    spark.stop()
    return {
        "n_turns": n_turns,
        "hot_key_rows": hot_rows,
        "hot_fraction": round(hot_rows / n_turns, 3),
        **out,
        "rep_times": rep_times,
        # headline (default config) and the narrow-scan configuration's
        # slowdown — each vs ITS OWN uniform cost, plus the cross ratio
        # the config decision actually rides on: skewed-narrow vs
        # uniform-wide (what you pay under skew relative to the default
        # engine on clean traffic)
        "skew_slowdown": round(
            out["pipeline_skewed_wide_sec"]
            / out["pipeline_uniform_wide_sec"], 3
        ),
        "skew_slowdown_narrow": round(
            out["pipeline_skewed_narrow_sec"]
            / out["pipeline_uniform_narrow_sec"], 3
        ),
        "skewed_narrow_vs_uniform_wide": round(
            out["pipeline_skewed_narrow_sec"]
            / out["pipeline_uniform_wide_sec"], 3
        ),
        "narrow_uniform_overhead": round(
            out["pipeline_uniform_narrow_sec"]
            / out["pipeline_uniform_wide_sec"], 3
        ),
        # the production configuration: repeat_scan_narrow="auto" lets
        # choose_narrow_scan pick the shape per input from a ~1%
        # deterministic sample — this pair is what a real deployment
        # pays, vs the wide/narrow diagnostics above
        "skew_slowdown_auto": round(
            out["pipeline_skewed_auto_sec"]
            / out["pipeline_uniform_auto_sec"], 3
        ),
        "skewed_auto_vs_uniform_wide": round(
            out["pipeline_skewed_auto_sec"]
            / out["pipeline_uniform_wide_sec"], 3
        ),
        "auto_uniform_overhead": round(
            out["pipeline_uniform_auto_sec"]
            / out["pipeline_uniform_wide_sec"], 3
        ),
    }


def calibration_kernel(master: str, shuffle_partitions: int) -> float:
    """Pure-JVM codegen kernel (md5 + regex over 20M synthetic strings):
    measures THIS BOX's achievable thread-scaling ceiling.  A single VM
    shares memory bandwidth and clocks across all threads — a real N→4N
    EXECUTOR scale-up (separate machines) doesn't; the kernel quantifies
    that single-box penalty so pipeline efficiency can be read against
    it."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(master)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .getOrCreate()
    )
    df = spark.range(20_000_000).select(
        F.concat(F.lit("user agent string "), F.col("id").cast("string")).alias("s")
    )
    work = df.select(
        F.md5("s").alias("m"),
        F.col("s").rlike("(bot|crawler|spider|9999)").alias("r"),
    )
    agg = lambda: work.agg(  # noqa: E731
        F.count(F.when(F.col("r"), 1)), F.max("m")
    ).collect()
    agg()
    best = None
    for _ in range(3):
        t = time.monotonic()
        agg()
        dt = time.monotonic() - t
        best = dt if best is None else min(best, dt)
    spark.stop()
    return best


RESULT_PATH = os.environ.get(
    "SPARK_GRAFT_BENCH_RESULT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_result.json"),
)


def _emit(obj: dict) -> None:
    """Print the ONE JSON line the driver contract requires AND write
    the same object to bench_result.json (VERDICT r6 item 3: the driver
    artifact only captured a truncated stdout tail, so BENCH_r06.json
    carried `parsed: null`; a self-written file makes the artifact
    independent of stdout capture)."""
    line = json.dumps(obj)
    print(line)
    try:
        with open(RESULT_PATH, "w") as f:
            f.write(line + "\n")
    except OSError as e:  # read-only checkout must not fail the bench
        sys.stderr.write(f"bench: could not write {RESULT_PATH}: {e}\n")


def main() -> None:
    if "--datapipe-scale" in sys.argv:
        r = run_datapipe_scale(
            f"local[{CPUS}]", int(CPUS) if CPUS.isdigit() else 32
        )
        _emit(
                {
                    "metric": "datapipe op growth at ×16 corpus"
                    " (ideal ≈ 16 for linearithmic)",
                    "value": r["corpus_deduped_growth"],
                    "unit": "ratio",
                    "sf": SF_DIR,
                    **r,
                }
        )
        return
    if "--skew" in sys.argv:
        r = run_skew(f"local[{CPUS}]", int(CPUS) if CPUS.isdigit() else 32)
        _emit(
                {
                    "metric": "hot-key skew slowdown (30% of rows on one"
                    " (ip,pid)+conv)",
                    "value": r["skew_slowdown"],
                    "unit": "ratio",
                    "sf": SF_DIR,
                    **r,
                }
        )
        return
    if "--scaling" in sys.argv:
        # N and 4N cores; default 8→32 saturates this VM (see BASELINE.md);
        # SPARK_GRAFT_SCALING_PAIR=2,8 measures with the box unsaturated at
        # both levels, which is the closer analog of adding MACHINES.
        pair = os.environ.get("SPARK_GRAFT_SCALING_PAIR", "8,32")
        n_lo, n_hi = (int(x) for x in pair.split(","))
        # INTERLEAVE the two parallelism levels (lo,hi,lo,hi) and take
        # the min per level: the legs take minutes each, and box-state
        # drift BETWEEN legs corrupts the ratio far more than variance
        # within one (r5: back-to-back samples of the same code swung
        # raw eff 0.71-0.81 with the drift always falling on one leg).
        # pipeline_only skips the sink battery so two rounds cost what
        # one full round did.  The kernel ceiling is interleaved the
        # same way, adjacent to the legs it calibrates.
        lo_s, hi_s = [], []
        for _ in range(2):
            lo_s.append(
                run_once(f"local[{n_lo}]", n_lo, SCALING_REPLICATE,
                         pipeline_only=True)
            )
            hi_s.append(
                run_once(f"local[{n_hi}]", n_hi, SCALING_REPLICATE,
                         pipeline_only=True)
            )
        lo = min(lo_s, key=lambda r: r["pipeline_sec"])
        hi = min(hi_s, key=lambda r: r["pipeline_sec"])
        eff = (lo["pipeline_sec"] / hi["pipeline_sec"]) / 4
        k_lo_s, k_hi_s = [], []
        for _ in range(2):
            k_lo_s.append(calibration_kernel(f"local[{n_lo}]", n_lo))
            k_hi_s.append(calibration_kernel(f"local[{n_hi}]", n_hi))
        k8, k32 = min(k_lo_s), min(k_hi_s)
        kernel_eff = (k8 / k32) / 4
        _emit(
                {
                    "metric": f"scaling efficiency local[{n_lo}]->local[{n_hi}]",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "sf": SF_DIR,
                    "t_n_sec": lo["pipeline_sec"],
                    "t_4n_sec": hi["pipeline_sec"],
                    "throughput_n": lo["throughput_turns_per_sec"],
                    "throughput_4n": hi["throughput_turns_per_sec"],
                    "n_turns": lo["n_turns"],
                    # single-box ceiling: ideal-parallel JVM kernel on the
                    # same machine; pipeline eff should be read against it
                    "kernel_eff_ceiling": round(kernel_eff, 3),
                    "eff_vs_ceiling": round(eff / kernel_eff, 3),
                    "leg_samples": {
                        f"local[{n_lo}]": [r["pipeline_sec"] for r in lo_s],
                        f"local[{n_hi}]": [r["pipeline_sec"] for r in hi_s],
                        "kernel_lo": [round(k, 3) for k in k_lo_s],
                        "kernel_hi": [round(k, 3) for k in k_hi_s],
                    },
                }
        )
        return

    master = f"local[{CPUS}]"
    shuffle = int(CPUS) if CPUS.isdigit() else 32
    r = run_once(master, shuffle)
    queries = dict(r["queries"])

    # sf1 row FIRST, before the dedup/ANN suites heat the JVM and disk
    # (r3 VERDICT item 3: the sf1 row ran last and regressed 29% in the
    # driver artifact while a quiet box showed the opposite; running it
    # directly after the headline keeps its box conditions comparable
    # across rounds — and run_once itself takes best-of-5 inside)
    rep_times = dict(r["rep_times"])
    sf1 = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SF1", "") != "1":
        sf1 = run_sf1_scale(master, shuffle)
        queries["pipeline_sf1_replicated"] = sf1["pipeline_sf1_replicated_sec"]
        rep_times["pipeline_sf1_replicated"] = sf1.pop(
            "pipeline_sf1_rep_times"
        )

    from d1_log_aggregation_spark.session import get_spark

    spark = get_spark(app_name="bench-datapipe", master=master,
                      shuffle_partitions=shuffle)
    queries.update(run_datapipe(spark, rep_times))
    queries.update(run_round_ops(spark, rep_times))
    spark.stop()

    _emit(
            {
                "metric": "parse→enrich→route→aggregate wall time",
                "value": r["total_sec"],
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "n_turns": r["n_turns"],
                "n_routed": r["n_routed"],
                "throughput_turns_per_sec": r["throughput_turns_per_sec"],
                # per-rep samples for EVERY row (VERDICT r5 item 1): a
                # wide spread with a fast min = neighbor load; a
                # uniformly-slow set = a real regression
                "rep_times": rep_times,
                **{k: v for k, v in sf1.items()
                   if k != "pipeline_sf1_replicated_sec"},
            }
    )


if __name__ == "__main__":
    main()
