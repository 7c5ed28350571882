"""Approximate-nearest-neighbor search over the embeddings table.

- ``brute_force_topk``: exact cosine top-k — the baseline and the recall
  oracle for the bucketed variant.
- ``ivf_topk``: IVF-style two-stage search — assign every vector to its
  nearest of C coarse centroids (here: the first C vectors of the corpus,
  a deterministic stand-in for a k-means pass), probe the best ``nprobe``
  centroid buckets per query, search only those buckets.  At 100 TB this
  is the path that matters: the corpus-side join key is the centroid id,
  so the search is a partition-pruned hash join instead of a full cross
  product.

Determinism contract: scores are computed on QUANTIZED embeddings
(round(x·1000) as int64) so dot products are exact integer arithmetic —
bit-identical in Spark and DuckDB regardless of float summation order.
The final cosine = qdot / sqrt(qn_a·qn_b) is a single float op from exact
ints.  Ranking tiebreak: (cosine desc, vec_id asc).

All vector math is JVM-side (zip_with + aggregate over the array column);
no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000


def quantize(emb: Column) -> Column:
    return F.transform(
        emb, lambda x: F.round(x.cast("double") * QUANT).cast("long")
    )


def qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def with_qvec(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    out = df.withColumn("qvec", quantize(F.col(emb_col)))
    return out.withColumn("qnorm2", qdot(F.col("qvec"), F.col("qvec")))


def cosine_col() -> Column:
    return F.col("qd") / F.sqrt(
        F.col("qn_a").cast("double") * F.col("qn_b").cast("double")
    )


def brute_force_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors of the first ``n_queries`` vectors (by
    vec_id), excluding self.  Returns (query_id, neighbor_id, rank,
    cosine)."""
    base = with_qvec(embeddings).select("vec_id", "qvec", "qnorm2")
    q = (
        base.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("qv_q"),
            F.col("qnorm2").alias("qn_a"),
        )
    )
    # broadcast the tiny query side; corpus side streams (at scale this is
    # one pass over the corpus — the right brute-force plan)
    scored = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        qdot(F.col("qv_q"), F.col("qvec")).alias("qd"),
        "qn_a",
        F.col("qnorm2").alias("qn_b"),
    ).withColumn("cosine", F.round(cosine_col(), 9))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by quantized cosine
    (deterministic tiebreak: cosine desc, centroid asc).  One broadcast
    cross join + rank-1 window — the corpus streams, centroids broadcast."""
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        qdot(F.col("qvec"), F.col("qv_c")).alias("qd"),
        F.col("qnorm2").alias("qn_a"),
        "qn_b",
    ).withColumn("cosine", F.round(cosine_col(), 9))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "centroid_id")
    )


def _seed_centroids(base: DataFrame, n_centroids: int) -> DataFrame:
    return base.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("qvec").alias("qv_c"),
        F.col("qnorm2").alias("qn_b"),
    )


def kmeans_centroids(
    embeddings: DataFrame, n_centroids: int = 16, n_iters: int = 2
) -> DataFrame:
    """Deterministic integer k-means over quantized vectors: seed = first
    n_centroids vectors, then ``n_iters`` rounds of assign → per-dimension
    floor-mean.  All arithmetic is exact (int sums, one floor(s/c) double
    op per dimension), so Spark and the DuckDB oracle produce IDENTICAL
    centroids — the property the r1 'first-C-vectors stand-in' lacked a
    training step for.

    Plan per iteration: broadcast cross join (assign) + posexplode →
    groupBy(centroid, pos) partial agg → 16-row collect_list rebuild.
    The only full-corpus shuffle is the (centroid_id, pos) agg, whose key
    cardinality is n_centroids × dim — tiny and uniform at any scale.
    Empty centroids keep their previous position."""
    base = with_qvec(embeddings).select("vec_id", "qvec", "qnorm2")
    cents = _seed_centroids(base, n_centroids)
    for _ in range(n_iters):
        assign = _assign(base, cents)
        members = base.join(assign, "vec_id").select(
            "centroid_id", F.posexplode("qvec").alias("pos", "val")
        )
        dims_agg = members.groupBy("centroid_id", "pos").agg(
            F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("cv")
        )
        rebuilt = dims_agg.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("qv_new")
        )
        cents = (
            cents.join(F.broadcast(rebuilt), "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("qv_new"), F.col("qv_c")).alias("qv_c"),
            )
            .withColumn("qn_b", qdot(F.col("qv_c"), F.col("qv_c")))
        )
    return cents


def assign_centroids(
    embeddings: DataFrame, n_centroids: int = 16, n_iters: int = 2
) -> DataFrame:
    """(vec_id, centroid_id) under the trained k-means centroids."""
    base = with_qvec(embeddings).select("vec_id", "qvec", "qnorm2")
    return _assign(base, kmeans_centroids(embeddings, n_centroids, n_iters))


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """IVF search: train k-means centroids, assign every vector to its
    nearest centroid, then per query rank centroids, take top ``nprobe``,
    search only vectors assigned to those centroids.  Same output shape as
    brute_force_topk; recall < 1.0 by construction (floor asserted against
    the brute-force oracle in pytest).

    The trained centroid table is materialized driver-side (n_centroids ×
    dim ints — dimension-table sized, like the reference's in-memory dims)
    so the probe and assignment plans reuse it without re-running the
    k-means lineage."""
    spark = embeddings.sparkSession
    base = with_qvec(embeddings).select("vec_id", "qvec", "qnorm2")
    trained = kmeans_centroids(embeddings, n_centroids, n_iters).collect()
    cents = spark.createDataFrame(
        [(r["centroid_id"], r["qv_c"], r["qn_b"]) for r in trained],
        "centroid_id long, qv_c array<long>, qn_b long",
    )
    assign = _assign(base, cents)
    corpus = base.join(assign, "vec_id")

    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("qv_q"),
        F.col("qnorm2").alias("qn_a"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "centroid_id",
        qdot(F.col("qv_q"), F.col("qv_c")).alias("qd"),
        "qn_a",
        "qn_b",
    ).withColumn("cosine", F.round(cosine_col(), 9))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "centroid_id")
    )

    cand = corpus.join(
        F.broadcast(probes), "centroid_id"
    ).join(F.broadcast(q), ["query_id"])
    scored = cand.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        qdot(F.col("qv_q"), F.col("qvec")).alias("qd"),
        "qn_a",
        F.col("qnorm2").alias("qn_b"),
    ).withColumn("cosine", F.round(cosine_col(), 9))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
