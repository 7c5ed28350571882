"""Deterministic corpus sampling, sharding, and sequence packing.

The remaining training-data-pipeline stages after filtering + dedup: pick
a subset (uniform or per-stratum), spread it over output shards, and pack
documents into fixed-token-budget training sequences.

Reference parity note: the reference has no sampling stage (it harvests
everything, d1_log_aggregation's pipeline is exhaustive by design); these
operators are mission-addendum training-pipeline components, same tier as
the dedup/ANN suite.

Design rules (same contract as dedup.py / textstats.py):

- sampling decisions are HASH tests, not rand(): ``keep iff
  md5-hash(salt, doc_id) % 1e6 < rate_ppm``.  Deterministic, reproducible
  in DuckDB bit-for-bit, stable under retries/re-runs (a Spark task retry
  re-samples identically — ``F.rand`` does not guarantee that across
  recomputed stages), and independent per salt.
- rates are integer parts-per-million, never floats — no float compare
  can disagree between engines.
- sharding is ``hash % n_shards`` — uniform, join-free, and any subset of
  shards can be processed independently (the property a 100 TB export
  actually needs).
- sequence packing is concat-and-chunk (the standard LM pretraining
  packing: concatenate documents in a deterministic order, split every
  ``budget`` tokens): within a shard, a document's chunk is
  ``floor(tokens_before_it / budget)``.  Window cumsum per shard — the
  shuffle key is the shard id, so parallelism = n_shards and no global
  sort exists anywhere.

Scale notes: bernoulli/stratified sampling are scan-local (filter pushes
to the parquet scan, no shuffle).  shard_stats is one groupBy(n_shards
keys).  pack_sequences is one shuffle on shard_id + an in-partition sort —
at 100 TB pick n_shards ≥ cluster cores so every executor sorts ~1/n of
the corpus (and the sort key (shard_id, doc_id) matches the natural write
order of a sharded corpus, so Spark's range-partitioned write can reuse
it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import BPE_TOKEN_RE

PPM = 1_000_000


def _hash_u32(salt: str, id_col: Column) -> Column:
    """First 8 md5 hex chars of 'salt:id' as a non-negative int64 —
    identical to dedup.hash32's construction so both engines agree."""
    key = F.concat_ws(":", F.lit(salt), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def _hash_u32_sql(salt: str, id_expr: str) -> str:
    key = f"'{salt}:' || cast({id_expr} AS varchar)"
    return f"try_cast(('0x' || substr(md5({key}), 1, 8)) AS bigint)"


# --------------------------------------------------------------------------
# 1. Uniform Bernoulli sample (deterministic TABLESAMPLE analog).
# --------------------------------------------------------------------------

def sample_bernoulli(
    docs: DataFrame,
    rate_ppm: int,
    salt: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash(salt, id) % 1e6 < rate_ppm.  Scan-local
    filter; E[kept] = rate_ppm/1e6 of the corpus, exact per-row
    reproducibility across runs/engines/retries."""
    return docs.filter(
        _hash_u32(salt, F.col(id_col)) % PPM < F.lit(int(rate_ppm))
    )


def sample_bernoulli_sql(
    src: str, rate_ppm: int, salt: str = "s0", id_expr: str = "doc_id"
) -> str:
    return (
        f"SELECT * FROM {src} "
        f"WHERE {_hash_u32_sql(salt, id_expr)} % {PPM} < {int(rate_ppm)}"
    )


# --------------------------------------------------------------------------
# 2. Stratified sample (sampleBy analog: per-stratum rates).
# --------------------------------------------------------------------------

def sample_stratified(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    strata_col: str = "lang",
    salt: str = "s0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli: stratum s keeps rate_ppm[s]/1e6 of its rows;
    strata absent from the map are dropped (DataFrameStatFunctions.sampleBy
    semantics).  The hash is salted with the stratum so two strata at the
    same rate keep INDEPENDENT row sets."""
    rate = F.lit(0)
    for s, r in sorted(rates_ppm.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(int(r))).otherwise(rate)
    h = _hash_u32(salt, F.concat_ws("|", F.col(strata_col), F.col(id_col)))
    return docs.filter(h % PPM < rate)


def sample_stratified_sql(
    src: str,
    rates_ppm: dict[str, int],
    strata_col: str = "lang",
    salt: str = "s0",
    id_expr: str = "doc_id",
) -> str:
    branches = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {int(r)}"
        for s, r in sorted(rates_ppm.items())
    )
    key = f"concat_ws('|', {strata_col}, cast({id_expr} AS varchar))"
    return (
        f"SELECT * FROM {src} WHERE {_hash_u32_sql(salt, key)} % {PPM}"
        f" < (CASE {branches} ELSE 0 END)"
    )


# --------------------------------------------------------------------------
# 3. Shard assignment + per-shard stats.
# --------------------------------------------------------------------------

def with_shard(
    docs: DataFrame,
    n_shards: int,
    salt: str = "shard",
    id_col: str = "doc_id",
) -> DataFrame:
    return docs.withColumn(
        "shard_id", (_hash_u32(salt, F.col(id_col)) % F.lit(n_shards))
    )


def shard_stats(
    docs: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard_id, n_docs, n_tokens): the export manifest a sharded corpus
    write produces.  One groupBy over n_shards keys."""
    return (
        with_shard(docs, n_shards, id_col=id_col)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.coalesce(
                    F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)),
                    F.lit(0),
                ).cast("long")
            ).alias("n_tokens"),
        )
    )


def _shard_sql(n_shards: int, id_expr: str = "doc_id") -> str:
    return f"({_hash_u32_sql('shard', id_expr)} % {n_shards})"


def shard_stats_sql(src: str, n_shards: int, text_col: str = "text") -> str:
    n_tok = (
        f"cast(len(regexp_extract_all({text_col}, '{BPE_TOKEN_RE}'))"
        f" AS bigint)"
    )
    return f"""
SELECT {_shard_sql(n_shards)} AS shard_id,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum({n_tok}) AS bigint) AS n_tokens
FROM {src}
GROUP BY 1
"""


# --------------------------------------------------------------------------
# 4. Sequence packing (concat-and-chunk within shards).
# --------------------------------------------------------------------------

def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a (shard_id, chunk_id, tok_offset): documents
    are concatenated in id order within their shard and split every
    ``budget`` tokens; a document belongs to the chunk where it STARTS
    (standard LM concat-and-chunk index mapping — long docs spill into
    the following chunk(s) at read time).

    Plan: one shuffle on shard_id, window cumsum ordered by id within the
    shard.  No global sort; skew is impossible by construction (the shard
    hash is uniform)."""
    n_tok = F.coalesce(
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)), F.lit(0)
    ).cast("long")
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_shard(docs, n_shards, id_col=id_col)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            id_col,
            "shard_id",
            F.floor(F.col("tok_offset") / budget).alias("chunk_id"),
            (F.col("tok_offset") % budget).alias("tok_in_chunk"),
            "n_tokens",
        )
    )


def pack_manifest(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard_id, chunk_id, n_docs, n_tokens): the chunk manifest —
    every chunk a training run reads, with its doc and token counts."""
    return (
        pack_sequences(docs, budget, n_shards, text_col, id_col)
        .groupBy("shard_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def pack_sequences_sql(
    src: str,
    budget: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_expr: str = "doc_id",
) -> str:
    n_tok = (
        f"cast(len(regexp_extract_all({text_col}, '{BPE_TOKEN_RE}'))"
        f" AS bigint)"
    )
    return f"""
WITH sharded AS (
  SELECT {id_expr} AS doc_id, {_shard_sql(n_shards, id_expr)} AS shard_id,
         {n_tok} AS n_tokens
  FROM {src}
), offs AS (
  SELECT doc_id, shard_id, n_tokens,
         cast(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS tok_offset
  FROM sharded
)
SELECT doc_id, shard_id,
       cast(floor(tok_offset / {budget}) AS bigint) AS chunk_id,
       tok_offset % {budget} AS tok_in_chunk,
       n_tokens
FROM offs
"""


def pack_manifest_sql(
    src: str, budget: int, n_shards: int = 8, text_col: str = "text"
) -> str:
    inner = pack_sequences_sql(src, budget, n_shards, text_col)
    return f"""
SELECT shard_id, chunk_id,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS n_tokens
FROM ({inner})
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# 5. Train/val/test split (deterministic, disjoint, exhaustive).
# --------------------------------------------------------------------------

SPLIT_PPM: dict[str, int] = {"train": 980_000, "val": 10_000, "test": 10_000}


def split_assign(
    docs: DataFrame,
    splits_ppm: dict[str, int] | None = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """(.., split): deterministic train/val/test assignment — each doc
    lands in exactly one split by cumulative ppm ranges over
    hash(salt, id) % 1e6 (disjoint + exhaustive by construction; ppm
    weights must sum to 1e6).  Hash-based, never rand(): stable across
    runs, engines, and task retries, and adding a NEW doc never moves an
    existing doc's split — the property an eval set depends on.
    Scan-local expression, no shuffle."""
    splits_ppm = splits_ppm or SPLIT_PPM
    if sum(splits_ppm.values()) != PPM:
        raise ValueError("split ppm weights must sum to 1_000_000")
    h = _hash_u32(salt, F.col(id_col)) % PPM
    expr = None
    cum = 0
    for name, ppm in sorted(splits_ppm.items()):
        cum += int(ppm)
        branch = F.when(h < cum, F.lit(name))
        expr = branch if expr is None else expr.when(h < cum, F.lit(name))
    return docs.withColumn("split", expr)


def corpus_split(
    docs: DataFrame,
    splits_ppm: dict[str, int] | None = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, split): the full assignment relation (value-hash gated —
    stronger than aggregate counts: every single doc's split must agree
    across engines)."""
    return split_assign(docs, splits_ppm, salt, id_col).select(
        id_col, "split"
    )


def corpus_split_sql(
    src: str = "documents",
    splits_ppm: dict[str, int] | None = None,
    salt: str = "split-v1",
    id_expr: str = "doc_id",
) -> str:
    splits_ppm = splits_ppm or SPLIT_PPM
    h = f"({_hash_u32_sql(salt, id_expr)} % {PPM})"
    whens = []
    cum = 0
    for name, ppm in sorted(splits_ppm.items()):
        cum += int(ppm)
        whens.append(f"WHEN {h} < {cum} THEN '{name}'")
    return (
        f"SELECT {id_expr} AS doc_id, CASE {' '.join(whens)} END AS split"
        f" FROM {src}"
    )
