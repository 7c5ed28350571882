"""Dup-planted document corpus for dedup operators.

The driver's ``documents`` table is random word soup with no duplicates, so
dedup operators would trivially return empty.  This shared SQL template
plants deterministic duplicates — executed identically by Spark and the
DuckDB oracle (same pattern as transcripts.py):

- every doc_id % 10 == 0 gets an EXACT copy at doc_id + N
  (N = max(doc_id)+1)
- every doc_id % 17 == 0 gets a NEAR-dup copy at doc_id + 2N with a short
  tail appended (high-but-not-1.0 Jaccard)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

NEAR_DUP_TAIL = " near dup tail marker alpha beta gamma"

CORPUS_SQL_TEMPLATE = """
SELECT d.doc_id, d.text FROM {documents} d
UNION ALL
SELECT d.doc_id + (SELECT max(doc_id) + 1 FROM {documents}) AS doc_id,
       d.text
FROM {documents} d WHERE d.doc_id % 10 = 0
UNION ALL
SELECT d.doc_id + 2 * (SELECT max(doc_id) + 1 FROM {documents}) AS doc_id,
       d.text || '{tail}' AS text
FROM {documents} d WHERE d.doc_id % 17 = 0
"""


def corpus_sql(documents: str = "documents") -> str:
    return CORPUS_SQL_TEMPLATE.format(documents=documents, tail=NEAR_DUP_TAIL)


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "_dp_documents"
    )
    return spark.sql(corpus_sql("_dp_documents"))
