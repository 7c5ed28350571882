"""Data-selection operators for a pretraining corpus: DSIR-style hashed
n-gram importance weights and the duplicate-n-gram saturation diagnostic.

Both are corpus→doc-score shapes: one tokenize/explode pass builds a
(doc, feature) relation, tiny/bounded aggregates derive the model, and a
join-back + per-doc rollup scores every document.  No windows, no Python,
no driver-side state — the model relations are either broadcast-sized
(the B-bucket DSIR distributions) or key-partitioned aggregates that
reuse the explode's partitioning (the n-gram document-frequency table).

Design sources (public): Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" (hashed-ngram bucket counts, smoothed
log-likelihood-ratio weights); Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" (duplicate-substring saturation as a
corpus-quality signal).  No analog in d1_log_aggregation (log pipeline);
training-data-pipeline first-class ops (SURVEY §2 extension family).

All hashing is md5-derived (`dedup.hash32` / `dedup.shingle_key`) so the
DuckDB twins reproduce bucket and key assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..scanio import ensure_scan_parallelism

from .dedup import (
    SHINGLE_KEY_SQL,
    hash32,
    norm_text,
    shingle_key,
)

DSIR_BUCKETS = 1024  # feature-hash width B (paper uses 10k; B scales freely)
DUP_NGRAM_K = 5  # window width for the saturation diagnostic
PPM = 1_000_000


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(norm_text(F.col(text_col)), " "), lambda x: x != ""
    )


def _ngram_rows(
    docs: DataFrame, text_col: str, k: int, keep: list[str]
) -> DataFrame:
    """Exploded OVERLAPPING word-k-gram relation with multiplicity — one
    row per window position (unlike dedup.shingles_from_tokens, which is
    set-semantics for Jaccard).  The token array is materialized before
    the higher-order lambda (the CSE pitfall documented at
    dedup.shingles_from_tokens)."""
    n = F.size(F.col("_toks"))
    idx = F.when(n >= k, F.sequence(F.lit(k), n)).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.concat_ws(
        " ",
        *[
            F.element_at("_toks", F.col("i") - F.lit(k - 1 - j))
            for j in range(k)
        ],
    )
    return (
        docs.select(*keep, _tokens(text_col).alias("_toks"))
        .select(*keep, F.explode(idx).alias("i"), F.col("_toks"))
        .select(*keep, gram.alias("gram"))
    )


def dsir_weights(
    docs: DataFrame,
    target_source: str = "src0",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_feats, log_weight) per document: DSIR hashed-bigram
    importance weights against a target domain.

    Features are word bigrams hashed into ``n_buckets`` buckets
    (md5-derived, engine-reproducible).  The target distribution is the
    bucket frequency over docs whose ``source == target_source``; the
    raw distribution is the bucket frequency over the WHOLE corpus.
    With add-1 smoothing, each bucket's log-likelihood ratio is
    ``ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))`` and a document's weight is
    the sum of its bucket counts times the ratios — higher means more
    target-like (a log-likelihood RATIO: ordering is the signal; the
    absolute sign is smoothing-dominated until counts ≫ 1 per bucket).
    Selection downstream is a threshold or weighted sample over this
    relation (see sampling.sample_bernoulli for the deterministic
    sampler).

    Docs with < 2 tokens have no bigram features and drop out (the
    lm_perplexity contract).

    Scale shape (100 TB): ONE (doc, bucket) partial-aggregating shuffle
    builds the feature relation; it feeds three consumers (raw dist,
    target dist, per-doc rollup), so it is materialized (``scratch_dir``,
    fresh-dir-per-call) or persisted — the corpus is tokenized exactly
    once.  Both distributions are B-row aggregates, joined into a B-row
    ratio table that BROADCASTS to the scoring join; the per-doc rollup
    is the explode shuffle's own partitioning.  B grows the model, never
    the shuffle: 10k buckets is still a broadcast."""
    docs = ensure_scan_parallelism(docs)
    feat = _ngram_rows(docs, text_col, 2, ["doc_id", "source"]).select(
        "doc_id",
        "source",
        F.pmod(hash32(F.col("gram")), F.lit(n_buckets)).alias("b"),
    )
    per_doc = feat.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    if scratch_dir is not None:
        spark = docs.sparkSession
        per_doc.write.mode("overwrite").parquet(f"{scratch_dir}/dsir_feat")
        per_doc = spark.read.parquet(f"{scratch_dir}/dsir_feat")
    else:
        from pyspark import StorageLevel

        per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
    raw = per_doc.groupBy("b").agg(F.sum("c").alias("r"))
    tgt = (
        per_doc.filter(F.col("source") == target_source)
        .groupBy("b")
        .agg(F.sum("c").alias("t"))
    )
    dist = raw.join(tgt, "b", "left").na.fill({"t": 0})
    totals = dist.agg(
        F.sum("r").alias("r_tot"), F.sum("t").alias("t_tot")
    )
    lr = dist.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("t") + 1) / (F.col("t_tot") + F.lit(n_buckets)))
            - F.log((F.col("r") + 1) / (F.col("r_tot") + F.lit(n_buckets)))
        ).alias("lr"),
    )
    return (
        per_doc.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr")).alias("log_weight"),
        )
    )


def dsir_weights_sql(
    src: str = "documents",
    target_source: str = "src0",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> str:
    """DuckDB twin of dsir_weights: same tokenization, same md5 bucket
    hash, same smoothing.  Kept join-for-join parallel so a divergence
    localizes to a stage."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    toks = f"list_filter(string_split({norm}, ' '), x -> x != '')"
    h32 = "try_cast(('0x' || substr(md5(gram), 1, 8)) AS bigint)"
    return f"""
WITH tok AS (
  SELECT doc_id, source, {toks} AS t FROM {src}
),
grams AS (
  SELECT doc_id, source, t[i-1] || ' ' || t[i] AS gram
  FROM tok, unnest(range(2, len(t) + 1)) AS u(i)
),
feat AS (
  SELECT doc_id, source, {h32} % {n_buckets} AS b, count(*) AS c
  FROM grams GROUP BY 1, 2, 3
),
raw AS (SELECT b, sum(c) AS r FROM feat GROUP BY b),
tgt AS (
  SELECT b, sum(c) AS t FROM feat
  WHERE source = '{target_source}' GROUP BY b
),
dist AS (
  SELECT raw.b, raw.r, coalesce(tgt.t, 0) AS t
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b
),
totals AS (SELECT sum(r) AS r_tot, sum(t) AS t_tot FROM dist),
lr AS (
  SELECT b,
         ln((t + 1) / (t_tot + {n_buckets}))
           - ln((r + 1) / (r_tot + {n_buckets})) AS lr
  FROM dist, totals
)
SELECT feat.doc_id,
       sum(feat.c)::bigint AS n_feats,
       sum(feat.c * lr.lr) AS log_weight
FROM feat JOIN lr ON feat.b = lr.b
GROUP BY feat.doc_id
"""


def dup_ngram_stats(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DUP_NGRAM_K,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_ppm): per-document
    duplicate-n-gram saturation — for every overlapping ``k``-token
    window, is its n-gram present in ≥ 2 distinct documents corpus-wide?
    ``dup_ppm = floor(n_dup_windows · 10^6 / n_windows)`` — integer
    fixed-point, so the relation value-hashes exactly cross-engine.
    High saturation flags boilerplate-heavy docs that survive exact and
    near dedup (the Lee et al. 2022 signal); the filter thresholds on it.
    Docs with < k tokens have no windows and drop out.

    Scale shape (100 TB): explode → ONE (doc, gram-key) partial-agg
    shuffle (multiplicity kept — every window position counts); the
    gram document-frequency table is a second partial-agg over the
    SAME key, and the score join joins the two on that key — AQE reuses
    the hash partitioning, and hot boilerplate grams are crushed
    map-side by the partial aggregation, never funneled through one
    task (no window function anywhere).  Keys are 63-bit ints, not gram
    strings: fixed-width shuffle rows (the shingle_key rationale)."""
    docs = ensure_scan_parallelism(docs)
    win = (
        _ngram_rows(docs, text_col, k, ["doc_id"])
        .select("doc_id", shingle_key(F.col("gram")).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # win feeds TWO consumers (the gram doc-frequency agg and the score
    # join) — materialize or persist it so the corpus is tokenized and
    # exploded exactly once (the lm_perplexity / rare_token_stats
    # contract; without this the plan re-scans the corpus per consumer)
    if scratch_dir is not None:
        spark = docs.sparkSession
        win.write.mode("overwrite").parquet(f"{scratch_dir}/dupngram_win")
        win = spark.read.parquet(f"{scratch_dir}/dupngram_win")
    else:
        from pyspark import StorageLevel

        win = win.persist(StorageLevel.MEMORY_AND_DISK)
    df_g = win.groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = win.join(df_g, "g")
    n_dup = F.sum(F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(0))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_windows"),
            n_dup.cast("long").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            (
                F.floor(
                    F.col("n_dup_windows") * F.lit(PPM) / F.col("n_windows")
                )
            ).cast("long").alias("dup_ppm"),
        )
    )


def dup_ngram_stats_sql(
    src: str = "documents",
    text_col: str = "text",
    k: int = DUP_NGRAM_K,
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    toks = f"list_filter(string_split({norm}, ' '), x -> x != '')"
    gram = " || ' ' || ".join(f"t[i-{k - 1 - j}]" for j in range(k))
    key = SHINGLE_KEY_SQL.format(c="gram")
    return f"""
WITH tok AS (
  SELECT doc_id, {toks} AS t FROM {src}
),
grams AS (
  SELECT doc_id, {gram} AS gram
  FROM tok, unnest(range({k}, len(t) + 1)) AS u(i)
),
win AS (
  SELECT doc_id, {key} AS g, count(*) AS c FROM grams GROUP BY 1, 2
),
df_g AS (SELECT g, count(*) AS n_docs FROM win GROUP BY g)
SELECT win.doc_id,
       sum(win.c)::bigint AS n_windows,
       sum(CASE WHEN df_g.n_docs >= 2 THEN win.c ELSE 0 END)::bigint
         AS n_dup_windows,
       floor(sum(CASE WHEN df_g.n_docs >= 2 THEN win.c ELSE 0 END)
             * {PPM} / sum(win.c))::bigint AS dup_ppm
FROM win JOIN df_g ON win.g = df_g.g
GROUP BY win.doc_id
"""
