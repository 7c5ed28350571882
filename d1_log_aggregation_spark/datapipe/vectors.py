"""Embedding-cosine near-duplicate detection (the vector-space member of
the dedup family: exact / Jaccard / MinHash / SimHash / embedding-cosine).

Two paths, same contract as the text dedup operators:

- ``embedding_neardup_bruteforce``: exact all-pairs cosine ≥ threshold —
  the small-N baseline and the recall oracle.
- ``embedding_neardup_pairs``: random-hyperplane LSH (sign sketch) —
  64 Rademacher (±1) hyperplanes → 64-bit sketch → 4 × 16-bit band
  buckets (65 536 values/band, the scale-safe width) → candidate pairs →
  EXACT cosine verification of candidates only.  At corpus scale the only
  pair-producing join is the band-bucket self-join; sketches are one
  Arrow-batched int64 matmul per batch (``sketch_udf_col``) — Catalyst
  does not codegen higher-order lambdas, so the pure-expression twin
  (``_sketch_col``, kept and equality-tested) is ~50× slower.

Determinism contract: vectors are quantized (round(x·1000) int64, see
ann.py) and the hyperplane signs are generated in PYTHON from md5 and
inlined as literals into BOTH engines' plans — every sketch bit, bucket,
and cosine is bit-identical in Spark and DuckDB.  LSH banding here is
probabilistic (a near-dup pair can miss every band); both engines miss
IDENTICALLY, and the brute-force twin measures the recall honestly.

The dup-planted vector corpus mirrors corpus.py: the driver's embeddings
are random (no true near-dups at cosine 0.9), so every vec_id % 10 == 0
gets a deterministically perturbed copy at vec_id + N — executed by the
same SQL template in both engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .ann import cosine_col, qdot, qdot_pairs, with_qvec

N_PLANES = 64  # 64-bit sketch: 4 × 16-bit bands = 65 536 buckets/band
N_BANDS = 4
BAND_BITS = N_PLANES // N_BANDS
DIM = 64
INT64_MIN = -(1 << 63)

VCORPUS_SQL_TEMPLATE = """
SELECT e.vec_id, e.embedding FROM {embeddings} e
UNION ALL
SELECT e.vec_id + (SELECT max(vec_id) + 1 FROM {embeddings}) AS vec_id,
       {perturbed} AS embedding
FROM {embeddings} e WHERE e.vec_id % 10 = 0
"""

# mild deterministic perturbation: scale + per-dim nudge keeps cosine vs
# the original ≈ 0.99 — above any sane near-dup threshold
PERTURB_SPARK = (
    "transform(e.embedding,"
    " x -> cast(x * 0.97 + 0.002 AS float))"
)
PERTURB_DUCK = (
    "list_transform(e.embedding,"
    " x -> cast(x * 0.97 + 0.002 AS float))"
)


def vector_corpus_sql(embeddings: str = "embeddings", spark_dialect: bool = False) -> str:
    return VCORPUS_SQL_TEMPLATE.format(
        embeddings=embeddings,
        perturbed=PERTURB_SPARK if spark_dialect else PERTURB_DUCK,
    )


def load_vector_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "_dp_embeddings"
    )
    return spark.sql(vector_corpus_sql("_dp_embeddings", spark_dialect=True))


def plane_signs(plane: int, dim: int = DIM) -> list[int]:
    """Deterministic Rademacher hyperplane: sign_j = ±1 from md5(i_j).
    Generated driver-side and inlined as literals in BOTH engines."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}_{j}".encode()).hexdigest()
        out.append(1 - 2 * (int(h[:8], 16) & 1))
    return out


def planes_matrix(dim: int = DIM, n_planes: int = N_PLANES) -> "np.ndarray":
    """(n_planes × dim) int64 Rademacher matrix — the literal twin of the
    per-plane sign lists inlined into both engines' SQL."""
    return np.array(
        [plane_signs(i, dim) for i in range(n_planes)], dtype=np.int64
    )


def sketch_words_udf_col(
    qvec: Column, n_planes: int = N_PLANES, dim: int = DIM
) -> Column:
    """Multi-word sketch: array<long> of n_planes/64 packed words (word w
    holds planes 64w..64w+63).  Same Arrow matmul as ``sketch_udf_col``,
    generalized so band bits can SCALE WITH CORPUS SIZE: with fixed-width
    bands the random-collision count grows as n_bands·N²/2^band_bits —
    quadratic at any fixed width (the r2 ×16 growth bench measured 143×).
    The tuning rule: band_bits ≳ log2(N) + 8 keeps expected collisions
    ≤ n_bands·N/256, i.e. linear; recall is then bought back with more
    bands (cost linear in n_bands).  For planted near-identical dups
    (cosine ≥ 0.999, sign-flip prob ~1.4%/plane) a 32-bit band matches
    with p ≈ 0.63, so 4 bands give ~98% recall with collisions N²/2^32."""
    assert n_planes % 64 == 0, "sketch words are 64 planes each"
    n_words = n_planes // 64
    planes = planes_matrix(dim, n_planes)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)

    @pandas_udf("array<long>")
    def _sketch(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="object")
        m = np.vstack(qv.to_numpy())  # (batch, dim) int64 — exact
        bits = (m @ planes.T) >= 0  # (batch, n_planes)
        words = [
            (bits[:, 64 * w: 64 * (w + 1)].astype(np.uint64) * weights)
            .sum(axis=1, dtype=np.uint64)
            .view(np.int64)
            for w in range(n_words)
        ]
        stacked = np.stack(words, axis=1)  # (batch, n_words)
        return pd.Series(list(stacked))

    return _sketch(qvec)


def sketch_udf_col(qvec: Column, dim: int = DIM) -> Column:
    """Arrow-batched sketch: one int64 matmul per batch —
    (batch × dim) @ (dim × 64) → sign bits → packed uint64 viewed as
    int64.  Exact integer arithmetic, bit-identical to ``_sketch_col``
    (asserted in tests) and to the DuckDB CTE twin, but ~50× faster than
    the 4096-term interpreted higher-order expression: Catalyst does not
    codegen lambda functions, so the expression path evaluates
    64 zip_with + 64 aggregate lambdas per row."""
    planes = planes_matrix(dim)
    weights = (np.uint64(1) << np.arange(N_PLANES, dtype=np.uint64))

    @pandas_udf("long")
    def _sketch(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="int64")
        m = np.vstack(qv.to_numpy())  # (batch, dim) int64 — exact
        bits = (m @ planes.T) >= 0  # (batch, 64)
        packed = (bits.astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(packed.view(np.int64))

    return _sketch(qvec)


def _sketch_col(qvec: Column, dim: int = DIM) -> Column:
    """64-bit sign sketch: bit i = (qvec · plane_i ≥ 0).  Bit 63 enters as
    INT64_MIN so the packed value stays a valid signed int64 (same trick
    as dedup.simhash); band extraction shifts+masks, which is sign-fill
    agnostic in both engines.

    Pure-expression reference implementation — the production path is
    ``sketch_udf_col`` (same bits, Arrow-vectorized); this one is kept as
    the plan-transparent twin and equality-tested against it.

    Banding is tuned for near-IDENTICAL duplicates (planted copies sit at
    cosine ≈ 0.999 → P[band match] ≈ 0.8 per band, miss rate ~2e-3 over
    4 bands); borderline threshold-0.9 pairs have lower recall, and the
    exact-cosine verify keeps precision at 1.0 either way."""
    sketch = None
    for i in range(N_PLANES):
        signs = plane_signs(i, dim)
        plane = F.array(*[F.lit(s) for s in signs])
        dot = qdot(qvec, plane)
        weight = INT64_MIN if i == 63 else (1 << i)
        bit = F.when(dot >= 0, F.lit(weight)).otherwise(F.lit(0))
        sketch = bit if sketch is None else sketch + bit
    return sketch.cast("long")


def sketch_ctes_sql(dim: int = DIM, n_planes: int = N_PLANES) -> str:
    """DuckDB twin of the sketch as CTEs over ``vbase2``: an n_planes-row
    planes VALUES table (signs list + word index + bit weight within the
    word) cross-joined to the vectors — a flat plan instead of a
    4096-term expression (DuckDB's binder caps expression depth at 128).
    Produces CTE ``sk(vec_id, sketch)`` where sketch is a LIST of
    n_planes/64 packed BIGINT words (list index = word + 1), matching
    ``sketch_words_udf_col`` bit-for-bit."""
    rows = []
    for i in range(n_planes):
        signs = plane_signs(i, dim)
        lst = "[" + ", ".join(str(s) for s in signs) + "]"
        bit = i % 64
        if bit == 63:
            w = "(-9223372036854775807::BIGINT - 1::BIGINT)"
        else:
            w = f"{1 << bit}::BIGINT"
        rows.append(f"({lst}, {i // 64}, {w})")
    values = ",\n    ".join(rows)
    return f"""
planes AS (
  SELECT * FROM (VALUES
    {values}
  ) p(signs, word, weight)
),
dots AS (
  SELECT v.vec_id, p.word, p.weight,
         list_sum(list_transform(range(1, {dim + 1}),
                                 j -> v.qvec[j] * p.signs[j])) AS d
  FROM vbase2 v CROSS JOIN planes p
),
skw AS (
  SELECT vec_id, word,
         cast(sum(CASE WHEN d >= 0 THEN weight ELSE 0 END) AS bigint)
           AS sketch_word
  FROM dots GROUP BY vec_id, word
),
sk AS (
  SELECT vec_id, list(sketch_word ORDER BY word) AS sketch
  FROM skw GROUP BY vec_id
)"""


def embedding_neardup_bruteforce(
    embeddings: DataFrame, threshold: float = 0.9, sample_mod: int = 1
) -> DataFrame:
    """(vec_a, vec_b, cosine ≥ threshold) — exact all-pairs baseline.
    O(N²) by definition; the LSH path below is the scale path.
    ``sample_mod`` > 1 restricts to vec_id % sample_mod == 0 (the oracle
    gate runs the quadratic baseline on a deterministic 1/mod subsample —
    planted copies at vec_id + N survive any mod that divides 10)."""
    base = with_qvec(embeddings).select("vec_id", "qvec", "qnorm2")
    if sample_mod > 1:
        base = base.filter(F.col("vec_id") % sample_mod == 0)
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("qvec").alias("qv_a"),
        F.col("qnorm2").alias("qn_a"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("qvec").alias("qv_b"),
        F.col("qnorm2").alias("qn_b"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).select(
        "vec_a",
        "vec_b",
        qdot_pairs(F.col("qv_a"), F.col("qv_b")).alias("qd"),
        "qn_a",
        "qn_b",
    ).withColumn("cosine", F.round(cosine_col(), 9))
    return pairs.filter(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", "cosine"
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = N_PLANES,
    band_bits: int = BAND_BITS,
) -> DataFrame:
    """(vec_a, vec_b, cosine): sign-sketch LSH candidates (any shared
    band) verified with exact quantized cosine — candidate-only, never an
    all-pairs vector join.

    Defaults (64 planes, 16-bit bands) are the oracle-gate config; at
    corpus scale pass wider bands so collisions stay linear — see the
    tuning rule on ``sketch_words_udf_col`` (e.g. 88k vecs → n_planes=128,
    band_bits=32 cut the ×16-corpus growth from 143× to near-linear)."""
    assert 64 % band_bits == 0 and n_planes % band_bits == 0
    assert band_bits <= 32  # the band mask must fit a positive int64
    n_bands = n_planes // band_bits
    from pyspark import StorageLevel

    # persisted: base feeds the sketch AND both verify sides; Catalyst
    # re-executes un-cached subtrees per reference (no cross-branch CSE)
    base = (
        with_qvec(embeddings)
        .select("vec_id", "qvec", "qnorm2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sk = base.withColumn(
        "sketch", sketch_words_udf_col(F.col("qvec"), n_planes)
    )
    mask = (1 << band_bits) - 1
    # one explode pass over the sketches — a per-band union would rerun
    # the Arrow sketch UDF once per band (no CSE across union branches)
    keys = []
    for i in range(n_bands):
        word = (i * band_bits) // 64
        shift = (i * band_bits) % 64
        keys.append(
            F.concat_ws(
                "_",
                F.lit(str(i)),
                F.shiftright(F.element_at("sketch", word + 1), shift)
                .bitwiseAND(F.lit(mask))
                .cast("string"),
            )
        )
    # persisted: the band self-join references this twice — caching runs
    # the Arrow sketch UDF once instead of twice
    banded = sk.select(
        "vec_id", F.explode(F.array(*keys)).alias("band_key")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    va = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("qvec").alias("qv_a"),
        F.col("qnorm2").alias("qn_a"),
    )
    vb = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("qvec").alias("qv_b"),
        F.col("qnorm2").alias("qn_b"),
    )
    verified = (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            qdot_pairs(F.col("qv_a"), F.col("qv_b")).alias("qd"),
            "qn_a",
            "qn_b",
        )
        .withColumn("cosine", F.round(cosine_col(), 9))
        .filter(F.col("cosine") >= threshold)
    )
    return verified.select("vec_a", "vec_b", "cosine")


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    eps: float = 0.95,
) -> DataFrame:
    """SemDeDup-style SEMANTIC dedup (cluster-then-prune, the published
    web-scale recipe — Abbas et al. 2023, arXiv:2303.09540): k-means the
    embeddings, compare pairs only WITHIN a cluster, and for every pair
    at cosine ≥ eps drop the member MORE typical of its cluster (higher
    cosine-to-centroid — SemDeDup keeps the example farthest from the
    cluster center as the most informative representative; ties drop the
    higher vec_id, i.e. the planted copy).  Returns one row per corpus
    vector: (vec_id, centroid_id, cos_centroid, kept).

    This completes the dedup family's vector branch: exact / Jaccard /
    MinHash-LSH / SimHash / sign-sketch near-dup / SEMANTIC.  It differs
    from ``embedding_neardup_pairs`` in both recall shape and scale
    story: LSH bands catch near-IDENTICAL vectors; clustering catches
    semantically-close ones at any band distance, and the quadratic
    all-pairs cost is bounded per cluster — at 100 TB you scale
    n_centroids with the corpus (the paper runs 50k clusters on 5B
    embeddings) so cluster sizes, and hence the self-join fan-out, stay
    constant.  Centroids are trained once (driver-bounded, MLlib-style,
    exact int arithmetic — ``ann.kmeans_centroids``) and ride in the
    scorer's Arrow closure; the corpus makes ONE matmul assignment pass,
    then one shuffle on centroid_id for the within-cluster self-join
    (hot clusters → AQE skew split).

    Determinism contract (the full-value-oracle property): quantized
    int64 vectors, exact integer dots, cosines rounded to 9 places
    BEFORE every rank/threshold decision — Spark and the DuckDB twin
    (``oracle.semdedup_sql``) agree bit-for-bit on clusters, pairs, and
    drops."""
    from pyspark import StorageLevel

    from .ann import kmeans_centroids, with_best_centroid

    # persisted: feeds the assignment scorer and both pair sides
    base = (
        with_qvec(embeddings)
        .select("vec_id", "qvec", "qnorm2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    trained = kmeans_centroids(embeddings, n_centroids, n_iters).collect()
    cent_rows = [
        (r["centroid_id"], list(r["qv_c"]), r["qn_b"]) for r in trained
    ]
    # r8: fused argmax assignment — centroid_id + the winner's rounded
    # cosine appended in the scan pipeline (the r7 shape fanned the
    # corpus ×k through Python, shuffled it for the window argmax, then
    # shuffled AGAIN to join the vectors back; see
    # ann.with_best_centroid).  Persisted: referenced by both self-join
    # sides and the final output (Catalyst re-executes un-cached
    # subtrees per reference).
    sided = with_best_centroid(
        base, cent_rows, cos_col="cos_centroid"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    asg = sided.select("vec_id", "centroid_id", "cos_centroid")
    a = sided.select(
        F.col("vec_id").alias("vec_a"),
        "centroid_id",
        F.col("cos_centroid").alias("ca"),
        F.col("qvec").alias("qv_a"),
        F.col("qnorm2").alias("qn_a"),
    )
    b = sided.select(
        F.col("vec_id").alias("vec_b"),
        "centroid_id",
        F.col("cos_centroid").alias("cb"),
        F.col("qvec").alias("qv_b"),
        F.col("qnorm2").alias("qn_b"),
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "ca",
            "cb",
            "vec_a",
            "vec_b",
            qdot_pairs(F.col("qv_a"), F.col("qv_b")).alias("qd"),
            "qn_a",
            "qn_b",
        )
        .withColumn("cosine", F.round(cosine_col(), 9))
        .filter(F.col("cosine") >= eps)
    )
    dropped = (
        pairs.select(
            F.when(F.col("ca") > F.col("cb"), F.col("vec_a"))
            .otherwise(F.col("vec_b"))
            .alias("vec_id")
        )
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return asg.join(dropped, "vec_id", "left").select(
        "vec_id",
        "centroid_id",
        "cos_centroid",
        F.col("_d").isNull().alias("kept"),
    )
