"""Document similarity search over the inverted shingle index.

The text-side retrieval twin of the embedding ANN family (datapipe/ann.py):
given a set of QUERY documents, return the top-k most n-gram-Jaccard-similar
corpus documents per query — the "find near-sources of this document"
operation a training-data pipeline runs for attribution, dedup forensics,
and contamination drill-down (the reference's consumers run the analogous
Solr MoreLikeThis/facet queries over the event index).

Scale shape (the dedup_against cross-set pattern, never a self-join):
the corpus inverted index is built once — or read from the parquet index a
previous run materialized with ``dedup.write_shingle_index`` — and the
query side (≪ corpus) joins against it per shingle, with the stop-shingle
df cap bounding fan-out exactly as in jaccard_pairs.  Cost is
Σ_sh df_query(sh)·df_corpus(sh).

Determinism: Jaccard is a ratio of small exact integers (correctly-rounded
double division — bit-identical in Spark and DuckDB); ranking ties break
on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    MAX_SHINGLE_DF,
    _shingle_index,
    read_shingle_index,
    write_shingle_index,
)

SEARCH_QUERY_MOD = 37  # gate's deterministic query-set stand-in
SEARCH_K = 3
SEARCH_MIN_JACCARD = 0.1


def similar_docs_topk(
    docs: DataFrame,
    text_col: str = "text",
    query_mod: int = SEARCH_QUERY_MOD,
    k: int = SEARCH_K,
    min_jaccard: float = SEARCH_MIN_JACCARD,
    max_shingle_df: int = MAX_SHINGLE_DF,
    index: tuple[DataFrame, DataFrame] | str | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(query_id, doc_id, n_common, jaccard, rank): for each query doc
    (doc_id % query_mod == 0 — a deterministic stand-in for an external
    query batch), the ``k`` most-similar OTHER corpus docs with
    Jaccard ≥ min_jaccard, ranked (jaccard desc, doc_id asc).

    ``index`` shares a prebuilt corpus shingle index (path or
    (postings, sizes) pair — ``dedup.write_shingle_index`` output), so
    repeated query batches never re-shingle the corpus; ``scratch_dir``
    materializes a fresh index to parquet first (fresh-dir-per-call
    contract as the dedup family).  Without either, the in-lineage index
    is persisted for the duration of the computation.

    The per-query top-k window partitions on query_id — query-batch
    cardinality, each partition holding only that query's candidates
    (bounded by the df cap), so the sort task is small at any corpus
    size."""
    spark = docs.sparkSession
    if isinstance(index, str):
        sh, sizes = read_shingle_index(spark, index)
    elif index is not None:
        sh, sizes = index
    elif scratch_dir is not None:
        write_shingle_index(docs, f"{scratch_dir}/shingle_index", text_col)
        sh, sizes = read_shingle_index(
            spark, f"{scratch_dir}/shingle_index"
        )
    else:
        sh, sizes = _shingle_index(docs, text_col, persist=True)

    cap = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("sh_df"))
        .filter(F.col("sh_df") <= max_shingle_df)
        .select("sh")
    )
    capped = sh.join(cap, "sh")
    qs = capped.filter(
        F.col("doc_id") % query_mod == 0
    ).withColumnRenamed("doc_id", "query_id")
    common = (
        qs.join(capped, "sh")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        common.join(
            sizes.select(
                F.col("doc_id").alias("query_id"),
                F.col("n_sh").alias("n_q"),
            ),
            "query_id",
        )
        .join(
            sizes.withColumnRenamed("n_sh", "n_c"),
            "doc_id",
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_q") + F.col("n_c") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("jaccard").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_common", "jaccard", "rank")
    )


def similar_docs_topk_sql(
    src: str = "documents",
    query_mod: int = SEARCH_QUERY_MOD,
    k: int = SEARCH_K,
    min_jaccard: float = SEARCH_MIN_JACCARD,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> str:
    """DuckDB twin over ``src`` (same shingle key / df-cap / Jaccard
    math as the dedup oracles; QUALIFY rank formulation as the
    independent derivation of the top-k).  ``src='corpus'`` includes the
    planted-dup corpus CTE, matching the gate query's input."""
    from . import dedup as D

    key = D.SHINGLE_KEY_SQL.format(c="sh_str")
    corpus_def = ""
    if src == "corpus":
        from .corpus import corpus_sql

        corpus_def = f"corpus AS ({corpus_sql()}),\n"
    return f"""
WITH {corpus_def}sh0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str FROM {src}
),
sh AS (SELECT doc_id, {key} AS sh FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
cap AS (
  SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {max_shingle_df}
),
capped AS (SELECT s.* FROM sh s JOIN cap USING (sh)),
common AS (
  SELECT q.doc_id AS query_id, c.doc_id, count(*) AS n_common
  FROM capped q JOIN capped c ON q.sh = c.sh AND c.doc_id <> q.doc_id
  WHERE q.doc_id % {query_mod} = 0
  GROUP BY 1, 2
),
scored AS (
  SELECT cm.query_id, cm.doc_id,
         cast(cm.n_common AS bigint) AS n_common,
         cm.n_common * 1.0
           / (sq.n_sh + sc.n_sh - cm.n_common) AS jaccard
  FROM common cm
  JOIN sizes sq ON sq.doc_id = cm.query_id
  JOIN sizes sc ON sc.doc_id = cm.doc_id
)
SELECT query_id, doc_id, n_common, jaccard,
       cast(row_number() OVER (
         PARTITION BY query_id ORDER BY jaccard DESC, doc_id ASC
       ) AS bigint) AS rank
FROM scored
WHERE jaccard >= {min_jaccard}
QUALIFY rank <= {k}
"""
