"""DuckDB oracle SQL for the datapipe operators (dedup / ANN / textstats /
multimodal).  Mirrors dedup.py / ann.py / textstats.py decision-for-
decision; all hashing is md5-derived and all scores are integer-derived so
both engines agree exactly (see module docstrings there)."""

from __future__ import annotations

from . import dedup as D
from . import textstats as T
from .corpus import corpus_sql

HASH32 = "try_cast(('0x' || substr(md5({c}), 1, 8)) AS bigint)"


def _sh_cte(src: str = "corpus") -> str:
    """``src`` → exploded distinct shingles keyed by the 63-bit shingle id
    (dedup.shingle_key twin).  With the default src the planted-dup
    ``corpus`` CTE is included; pass another relation name to shingle a
    CTE defined by the caller."""
    key = D.SHINGLE_KEY_SQL.format(c="sh_str")
    corpus_def = f"corpus AS ({corpus_sql()}),\n" if src == "corpus" else ""
    return f"""
{corpus_def}sh0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str FROM {src}
),
sh AS (SELECT doc_id, {key} AS sh FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""


def _jaccard_cte(max_df: int) -> str:
    return f"""
sh_kept AS (
  SELECT s.* FROM sh s
  JOIN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {max_df}) k
    ON s.sh = k.sh
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh_kept a JOIN sh_kept b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT c.doc_a, c.doc_b, c.n_common,
         sa.n_sh AS n_a, sb.n_sh AS n_b,
         c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
  FROM common c
  JOIN sizes sa ON c.doc_a = sa.doc_id
  JOIN sizes sb ON c.doc_b = sb.doc_id
)
"""


def dedup_exact_sql() -> str:
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH corpus AS ({corpus_sql()}),
fp AS (SELECT doc_id, md5({norm}) AS fingerprint FROM corpus),
g AS (
  SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM fp GROUP BY fingerprint
)
SELECT fp.doc_id, g.canonical_id, g.group_size
FROM fp JOIN g ON fp.fingerprint = g.fingerprint
WHERE g.group_size > 1
"""


def jaccard_pairs_sql(threshold: float = 0.5, max_df: int = D.MAX_SHINGLE_DF) -> str:
    return f"""
WITH {_sh_cte()}, {_jaccard_cte(max_df)}
SELECT doc_a, doc_b, n_common, n_a, n_b, jaccard
FROM jac WHERE jaccard >= {threshold}
"""


def corpus_deduped_sql(
    threshold: float = 0.5, max_df: int = D.MAX_SHINGLE_DF
) -> str:
    """Min-canonical survivorship twin of dedup.corpus_deduped."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH {_sh_cte()}, {_jaccard_cte(max_df)},
fp AS (SELECT doc_id, md5({norm}) AS fingerprint FROM corpus),
eg AS (
  SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM fp GROUP BY fingerprint
),
losers AS (
  SELECT fp.doc_id FROM fp JOIN eg ON fp.fingerprint = eg.fingerprint
  WHERE eg.group_size > 1 AND fp.doc_id <> eg.canonical_id
  UNION
  SELECT doc_b AS doc_id FROM jac WHERE jaccard >= {threshold}
)
SELECT c.doc_id, c.text FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM losers)
"""


def corpus_deduped_lsh_sql(threshold: float = 0.5) -> str:
    """Min-canonical survivorship twin of dedup.corpus_deduped_lsh: the
    near-dup edge set is the MinHash-LSH pair relation (nested-CTE
    subquery reusing minhash_lsh_pairs_sql verbatim)."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH corpus AS ({corpus_sql()}),
lshp AS (SELECT * FROM ({minhash_lsh_pairs_sql(threshold)}) _l),
fp AS (SELECT doc_id, md5({norm}) AS fingerprint FROM corpus),
eg AS (
  SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM fp GROUP BY fingerprint
),
losers AS (
  SELECT fp.doc_id FROM fp JOIN eg ON fp.fingerprint = eg.fingerprint
  WHERE eg.group_size > 1 AND fp.doc_id <> eg.canonical_id
  UNION
  SELECT doc_b AS doc_id FROM lshp
)
SELECT c.doc_id, c.text FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM losers)
"""


def training_corpus_sql(
    threshold: float = 0.5, max_df: int = D.MAX_SHINGLE_DF
) -> str:
    """Twin of dedup.training_corpus: quality gate → dedup survivorship
    over the quality-kept docs → metadata columns."""
    ts = T.textstats_sql()
    fp = T.fingerprint_sql()
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH corpus AS ({corpus_sql()}),
st AS (
  SELECT doc_id, text,
    {ts['n_ws_tokens']} AS n_ws_tokens,
    {ts['n_bpe_tokens']} AS n_bpe_tokens,
    {ts['n_alpha']} AS n_alpha,
    {ts['n_punct']} AS n_punct,
    {ts['n_chars']} AS n_chars,
    {T.lang_id_sql()} AS lang_id,
    {fp['fingerprint64']} AS fingerprint64
  FROM corpus
),
qcorpus AS (
  SELECT * FROM st
  WHERE n_ws_tokens >= 10
    AND (CASE WHEN n_chars > 0
              THEN n_alpha * 1.0 / n_chars ELSE 0.0 END) > 0.5
    AND (CASE WHEN n_chars > 0
              THEN n_punct * 1.0 / n_chars ELSE 0.0 END) < 0.2
    AND (CASE WHEN n_ws_tokens > 0
              THEN (n_chars - n_ws_tokens + 1) * 1.0 / n_ws_tokens
              ELSE 0.0 END) BETWEEN 2.0 AND 12.0
),
{_sh_cte('qcorpus')}, {_jaccard_cte(max_df)},
fpx AS (SELECT doc_id, md5({norm}) AS fprint FROM qcorpus),
eg AS (
  SELECT fprint, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM fpx GROUP BY fprint
),
losers AS (
  SELECT fpx.doc_id FROM fpx JOIN eg ON fpx.fprint = eg.fprint
  WHERE eg.group_size > 1 AND fpx.doc_id <> eg.canonical_id
  UNION
  SELECT doc_b AS doc_id FROM jac WHERE jaccard >= {threshold}
)
SELECT q.doc_id, q.lang_id, q.n_ws_tokens, q.n_bpe_tokens,
       q.fingerprint64, q.text
FROM qcorpus q
WHERE q.doc_id NOT IN (SELECT doc_id FROM losers)
"""


def _sig_exprs() -> str:
    return ",\n  ".join(
        f"min(({D.MINHASH_A[i]} * h + {D.MINHASH_B[i]}) % {D.MINHASH_P})"
        f" AS sig_{i}"
        for i in range(D.N_HASHES)
    )


def minhash_signatures_sql() -> str:
    return f"""
WITH {_sh_cte()},
hh AS (SELECT doc_id, sh & 4294967295 AS h FROM sh)
SELECT doc_id, {_sig_exprs()}
FROM hh GROUP BY doc_id
"""


def minhash_lsh_pairs_sql(threshold: float = 0.5) -> str:
    rows = D.N_HASHES // D.N_BANDS
    band_selects = []
    for band in range(D.N_BANDS):
        cols = " || '_' || ".join(
            f"cast(sig_{band * rows + r} AS string)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, '{band}' || '_' || {cols} AS band_key FROM sigs"
        )
    bands = " UNION ALL ".join(band_selects)
    return f"""
WITH {_sh_cte()},
hh AS (SELECT doc_id, sh & 4294967295 AS h FROM sh),
sigs AS (SELECT doc_id, {_sig_exprs()} FROM hh GROUP BY doc_id),
banded AS ({bands}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
common AS (
  -- candidate-only intersection (mirrors dedup.minhash_lsh_pairs: never
  -- the all-pairs sh self-join)
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY 1, 2
),
jac AS (
  SELECT c.doc_a, c.doc_b,
         c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
  FROM common c
  JOIN sizes sa ON c.doc_a = sa.doc_id
  JOIN sizes sb ON c.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, jaccard FROM jac
WHERE jaccard >= {threshold}
"""


def simhash_sql() -> str:
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    h_lo = HASH32.format(c="tok")
    h_hi = D.HASH32_HI_SQL.format(c="tok")

    def bit_test(b: int) -> str:
        if b < 32:
            return f"(h_lo & {1 << b}) > 0"
        return f"(h_hi & {1 << (b - 32)}) > 0"

    votes = ",\n  ".join(
        f"sum(CASE WHEN {bit_test(b)} THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(D.SIMHASH_BITS)
    )
    # INT64_MIN spelled as (-(2^63-1) - 1): the bare literal would parse as
    # unary minus over an out-of-range positive INT64
    def weight(b: int) -> str:
        if b == 63:
            return "(-9223372036854775807::BIGINT - 1::BIGINT)"
        return f"{1 << b}::BIGINT"

    sim = " + ".join(
        f"(CASE WHEN v_{b} > 0 THEN {weight(b)} ELSE 0::BIGINT END)"
        for b in range(D.SIMHASH_BITS)
    )
    return f"""
WITH corpus AS ({corpus_sql()}),
toks AS (
  SELECT doc_id,
         unnest(list_distinct(string_split({norm}, ' '))) AS tok
  FROM corpus
),
hh AS (SELECT doc_id, {h_lo} AS h_lo, {h_hi} AS h_hi FROM toks),
g AS (SELECT doc_id, {votes} FROM hh GROUP BY doc_id)
SELECT doc_id, cast({sim} AS bigint) AS simhash FROM g
"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    mask = (1 << D.SIMHASH_BAND_BITS) - 1
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, '{i}' || '_' ||"
        f" cast((simhash >> {D.SIMHASH_BAND_BITS * i}) & {mask} AS string)"
        f" AS band_key FROM sim"
        for i in range(D.SIMHASH_BANDS)
    )
    return f"""
WITH sim0 AS ({simhash_sql()}),
sim AS (SELECT * FROM sim0),
banded AS ({bands})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM banded a JOIN banded b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ---- ANN -------------------------------------------------------------------

QVEC = (
    "list_transform(embedding, x ->"
    f" cast(round(cast(x AS double) * {1000}) AS bigint))"
)


def _qdot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i] * {b}[i]))"
    )


def _ann_base() -> str:
    return f"""
base AS (
  SELECT vec_id, {QVEC} AS qvec FROM embeddings
),
base2 AS (
  SELECT vec_id, qvec,
         cast({_qdot('qvec', 'qvec')} AS bigint) AS qnorm2
  FROM base
)
"""


def brute_force_topk_sql(n_queries: int = 8, k: int = 5) -> str:
    return f"""
WITH {_ann_base()},
q AS (
  SELECT vec_id AS query_id, qvec AS qv_q, qnorm2 AS qn_a
  FROM base2 WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(cast({_qdot('q.qv_q', 'b.qvec')} AS bigint)
               / sqrt(cast(q.qn_a AS double) * cast(b.qnorm2 AS double)),
               9) AS cosine
  FROM base2 b JOIN q ON b.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
"""


def embedding_stats_sql() -> str:
    """Twin of ann.embedding_stats (the oracle side may explode freely —
    DuckDB is single-node and the relation is test-sized)."""
    return f"""
WITH base AS (
  SELECT vec_id, {QVEC} AS qvec FROM embeddings
),
px AS (
  SELECT cast(generate_subscripts(qvec, 1) - 1 AS bigint) AS pos,
         unnest(qvec) AS v
  FROM base
)
SELECT pos, cast(count(*) AS bigint) AS n_vecs,
       cast(sum(v) AS bigint) AS sum_q,
       cast(min(v) AS bigint) AS min_q,
       cast(max(v) AS bigint) AS max_q,
       sum(v) * 1.0 / count(*) AS mean_q
FROM px GROUP BY pos
"""


def lsh_topk_sql(
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = 64,
    band_bits: int = 8,
) -> str:
    """Twin of ann.lsh_topk: the sketch CTEs run over ``vbase2`` (aliased
    to the plain embeddings base here — no dup-planted corpus for ANN),
    bands via the same shift/mask, candidates = corpus ⨝ query bands,
    exact-cosine rank."""
    from . import vectors as V

    mask = (1 << band_bits) - 1
    bands = " UNION ALL ".join(
        f"SELECT vec_id, '{i}' || '_' ||"
        f" cast((sketch[{(i * band_bits) // 64 + 1}]"
        f" >> {(i * band_bits) % 64}) & {mask} AS string) AS band_key"
        f" FROM sk"
        for i in range(n_planes // band_bits)
    )
    return f"""
WITH {_ann_base()},
vbase2 AS (SELECT * FROM base2),
{V.sketch_ctes_sql(n_planes=n_planes)},
banded AS ({bands}),
qb AS (
  SELECT DISTINCT vec_id AS query_id, band_key
  FROM banded WHERE vec_id < {n_queries}
),
cands AS (
  SELECT DISTINCT q.query_id, b.vec_id
  FROM banded b JOIN qb q
    ON b.band_key = q.band_key AND b.vec_id <> q.query_id
),
q AS (
  SELECT vec_id AS query_id, qvec AS qv_q, qnorm2 AS qn_a
  FROM base2 WHERE vec_id < {n_queries}
),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id,
         {_vcos('q.qn_a', 'b.qnorm2', 'q.qv_q', 'b.qvec')} AS cosine
  FROM cands c
  JOIN base2 b ON b.vec_id = c.vec_id
  JOIN q ON c.query_id = q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
"""


def _kmeans_ctes(n_centroids: int, n_iters: int, src: str = "base2") -> str:
    """Unrolled integer k-means iterations (twin of ann.kmeans_centroids):
    cents_0 = first C vectors; each round assigns by quantized cosine and
    rebuilds centroids as per-dimension floor-means (exact in both
    engines).  The final trained table is aliased ``cents``.  ``src``
    names the (vec_id, qvec, qnorm2) relation to train over — ``base2``
    (raw embeddings, the ANN path) or ``vbase2`` (the dup-planted vector
    corpus, the semdedup path)."""
    cos = (
        lambda qa, qb, a, b: f"round(cast({_qdot(a, b)} AS bigint)"
        f" / sqrt(cast({qa} AS double) * cast({qb} AS double)), 9)"
    )
    parts = [
        f"""
cents_0 AS (
  SELECT vec_id AS centroid_id, qvec AS qv_c, qnorm2 AS qn_b
  FROM {src} WHERE vec_id < {n_centroids}
)"""
    ]
    for it in range(n_iters):
        nxt = it + 1
        qv = f"coalesce(r_{it}.qv_new, c.qv_c)"
        parts.append(
            f"""
a_{it} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT b.vec_id, c.centroid_id, row_number() OVER (
      PARTITION BY b.vec_id
      ORDER BY {cos('b.qnorm2', 'c.qn_b', 'b.qvec', 'c.qv_c')} DESC,
               c.centroid_id ASC
    ) AS r
    FROM {src} b CROSS JOIN cents_{it} c
  ) WHERE r = 1
),
m_{it} AS (
  SELECT a.centroid_id,
         generate_subscripts(b.qvec, 1) AS pos,
         unnest(b.qvec) AS val
  FROM a_{it} a JOIN {src} b ON a.vec_id = b.vec_id
),
d_{it} AS (
  SELECT centroid_id, pos,
         cast(floor(sum(val) * 1.0 / count(*)) AS bigint) AS cv
  FROM m_{it} GROUP BY 1, 2
),
r_{it} AS (
  SELECT centroid_id, list(cv ORDER BY pos) AS qv_new
  FROM d_{it} GROUP BY 1
),
cents_{nxt} AS (
  SELECT c.centroid_id, {qv} AS qv_c,
         cast({_qdot(qv, qv)} AS bigint) AS qn_b
  FROM cents_{it} c LEFT JOIN r_{it} ON c.centroid_id = r_{it}.centroid_id
)"""
        )
    parts.append(f"\ncents AS (SELECT * FROM cents_{n_iters})")
    return ",".join(parts)


def ivf_topk_sql(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 2,
) -> str:
    cos = (
        lambda qa, qb, a, b: f"round(cast({_qdot(a, b)} AS bigint)"
        f" / sqrt(cast({qa} AS double) * cast({qb} AS double)), 9)"
    )
    return f"""
WITH {_ann_base()},
{_kmeans_ctes(n_centroids, n_iters)},
assign0 AS (
  SELECT b.vec_id, c.centroid_id,
         {cos('b.qnorm2', 'c.qn_b', 'b.qvec', 'c.qv_c')} AS cosine
  FROM base2 b CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC
    ) AS r FROM assign0
  ) WHERE r = 1
),
q AS (
  SELECT vec_id AS query_id, qvec AS qv_q, qnorm2 AS qn_a
  FROM base2 WHERE vec_id < {n_queries}
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, c.centroid_id,
           {cos('q.qn_a', 'c.qn_b', 'q.qv_q', 'c.qv_c')} AS cosine,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {cos('q.qn_a', 'c.qn_b', 'q.qv_q', 'c.qv_c')} DESC,
                      c.centroid_id ASC
           ) AS r
    FROM q CROSS JOIN cents c
  ) WHERE r <= {nprobe}
),
cand AS (
  SELECT p.query_id, b.vec_id, b.qvec, b.qnorm2
  FROM probes p
  JOIN assign a ON a.centroid_id = p.centroid_id
  JOIN base2 b ON b.vec_id = a.vec_id
),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id,
         {cos('q.qn_a', 'c.qnorm2', 'q.qv_q', 'c.qvec')} AS cosine
  FROM cand c JOIN q ON c.query_id = q.query_id
  WHERE c.vec_id <> c.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
"""


def ivf_topk_bigk_sql(
    n_queries: int = 8,
    k: int = 5,
    n_fine: int = 256,
    n_coarse: int = 16,
    nprobe_coarse: int = 2,
    nprobe_fine: int = 8,
) -> str:
    """Twin of ann.ivf_topk_bigk (two-level seeded coarse/fine
    quantizer).  The oracle side expresses the SAME candidate structure
    as joins; at oracle scale the bucketed joins are cheap either way."""
    cos = (
        lambda qa, qb, a, b: f"round(cast({_qdot(a, b)} AS bigint)"
        f" / sqrt(cast({qa} AS double) * cast({qb} AS double)), 9)"
    )
    return f"""
WITH {_ann_base()},
coarse AS (
  SELECT vec_id AS coarse_id, qvec AS qv_c, qnorm2 AS qn_c
  FROM base2 WHERE vec_id < {n_coarse}
),
fine AS (
  SELECT vec_id AS fine_id, qvec AS qv_f, qnorm2 AS qn_f
  FROM base2 WHERE vec_id < {n_fine}
),
fine_cells AS (
  SELECT fine_id, coarse_id FROM (
    SELECT f.fine_id, c.coarse_id,
           row_number() OVER (
             PARTITION BY f.fine_id
             ORDER BY {cos('f.qn_f', 'c.qn_c', 'f.qv_f', 'c.qv_c')} DESC,
                      c.coarse_id ASC
           ) AS r
    FROM fine f CROSS JOIN coarse c
  ) WHERE r = 1
),
vprobe AS (
  SELECT vec_id, coarse_id FROM (
    SELECT b.vec_id, c.coarse_id,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY {cos('b.qnorm2', 'c.qn_c', 'b.qvec', 'c.qv_c')} DESC,
                      c.coarse_id ASC
           ) AS r
    FROM base2 b CROSS JOIN coarse c
  ) WHERE r <= {nprobe_coarse}
),
assign AS (
  SELECT vec_id, fine_id FROM (
    SELECT v.vec_id, f.fine_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {cos('b.qnorm2', 'f.qn_f', 'b.qvec', 'f.qv_f')} DESC,
                      f.fine_id ASC
           ) AS r
    FROM vprobe v
    JOIN fine_cells fc ON fc.coarse_id = v.coarse_id
    JOIN fine f ON f.fine_id = fc.fine_id
    JOIN base2 b ON b.vec_id = v.vec_id
  ) WHERE r = 1
),
q AS (
  SELECT vec_id AS query_id, qvec AS qv_q, qnorm2 AS qn_a
  FROM base2 WHERE vec_id < {n_queries}
),
qprobe_fine AS (
  SELECT query_id, fine_id FROM (
    SELECT v.vec_id AS query_id, f.fine_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {cos('q.qn_a', 'f.qn_f', 'q.qv_q', 'f.qv_f')} DESC,
                      f.fine_id ASC
           ) AS r
    FROM vprobe v
    JOIN fine_cells fc ON fc.coarse_id = v.coarse_id
    JOIN fine f ON f.fine_id = fc.fine_id
    JOIN q ON q.query_id = v.vec_id
    WHERE v.vec_id < {n_queries}
  ) WHERE r <= {nprobe_fine}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {cos('q.qn_a', 'b.qnorm2', 'q.qv_q', 'b.qvec')} AS cosine
  FROM qprobe_fine p
  JOIN assign a ON a.fine_id = p.fine_id
  JOIN base2 b ON b.vec_id = a.vec_id
  JOIN q ON q.query_id = p.query_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
"""


# ---- embedding-cosine near-dup ----------------------------------------------

def _vec_base_cte() -> str:
    from .vectors import vector_corpus_sql

    qvec = QVEC.replace("embedding", "v.embedding")
    return f"""
vcorpus AS ({vector_corpus_sql()}),
vbase AS (SELECT v.vec_id, {qvec} AS qvec FROM vcorpus v),
vbase2 AS (
  SELECT vec_id, qvec, cast({_qdot('qvec', 'qvec')} AS bigint) AS qnorm2
  FROM vbase
)"""


def _vcos(qa: str, qb: str, a: str, b: str) -> str:
    return (
        f"round(cast({_qdot(a, b)} AS bigint)"
        f" / sqrt(cast({qa} AS double) * cast({qb} AS double)), 9)"
    )


def embedding_neardup_bruteforce_sql(
    threshold: float = 0.9, sample_mod: int = 1
) -> str:
    samp = (
        f"WHERE vec_id % {sample_mod} = 0" if sample_mod > 1 else ""
    )
    return f"""
WITH {_vec_base_cte()},
vsamp AS (SELECT * FROM vbase2 {samp})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_vcos('a.qnorm2', 'b.qnorm2', 'a.qvec', 'b.qvec')} AS cosine
FROM vsamp a JOIN vsamp b ON a.vec_id < b.vec_id
WHERE {_vcos('a.qnorm2', 'b.qnorm2', 'a.qvec', 'b.qvec')} >= {threshold}
"""


def embedding_neardup_pairs_sql(
    threshold: float = 0.9,
    n_planes: int | None = None,
    band_bits: int | None = None,
) -> str:
    from . import vectors as V

    n_planes = n_planes or V.N_PLANES
    band_bits = band_bits or V.BAND_BITS
    mask = (1 << band_bits) - 1
    bands = " UNION ALL ".join(
        f"SELECT vec_id, '{i}' || '_' ||"
        f" cast((sketch[{(i * band_bits) // 64 + 1}]"
        f" >> {(i * band_bits) % 64}) & {mask} AS string) AS band_key"
        f" FROM sk"
        for i in range(n_planes // band_bits)
    )
    return f"""
WITH {_vec_base_cte()},
{V.sketch_ctes_sql(n_planes=n_planes)},
banded AS ({bands}),
cands AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       {_vcos('a.qnorm2', 'b.qnorm2', 'a.qvec', 'b.qvec')} AS cosine
FROM cands c
JOIN vbase2 a ON a.vec_id = c.vec_a
JOIN vbase2 b ON b.vec_id = c.vec_b
WHERE {_vcos('a.qnorm2', 'b.qnorm2', 'a.qvec', 'b.qvec')} >= {threshold}
"""


def semdedup_sql(
    n_centroids: int = 8, n_iters: int = 2, eps: float = 0.95
) -> str:
    """Twin of vectors.semdedup: k-means over the dup-planted vector
    corpus (``vbase2``), within-cluster exact-cosine pairs at ≥ eps, and
    per pair drop the member MORE typical of its cluster (higher rounded
    cosine-to-centroid; tie → the higher vec_id, i.e. the planted copy)."""
    return f"""
WITH {_vec_base_cte()},
{_kmeans_ctes(n_centroids, n_iters, src="vbase2")},
assign0 AS (
  SELECT b.vec_id, c.centroid_id,
         {_vcos('b.qnorm2', 'c.qn_b', 'b.qvec', 'c.qv_c')} AS cosine
  FROM vbase2 b CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id, cosine AS cos_centroid FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC
    ) AS r FROM assign0
  ) WHERE r = 1
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.cos_centroid AS ca, b.cos_centroid AS cb
  FROM assign a
  JOIN assign b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  JOIN vbase2 va ON va.vec_id = a.vec_id
  JOIN vbase2 vb ON vb.vec_id = b.vec_id
  WHERE {_vcos('va.qnorm2', 'vb.qnorm2', 'va.qvec', 'vb.qvec')} >= {eps}
),
dropped AS (
  SELECT DISTINCT CASE WHEN ca > cb THEN vec_a ELSE vec_b END AS vec_id
  FROM pairs
)
SELECT a.vec_id, a.centroid_id, a.cos_centroid,
       (d.vec_id IS NULL) AS kept
FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


# ---- textstats / multimodal ------------------------------------------------

def doc_textstats_sql() -> str:
    ts = T.textstats_sql()
    fp = T.fingerprint_sql()
    return f"""
WITH b AS (
  SELECT doc_id,
    {ts['n_ws_tokens']} AS n_ws_tokens,
    {ts['n_bpe_tokens']} AS n_bpe_tokens,
    {ts['n_alpha']} AS n_alpha,
    {ts['n_digit']} AS n_digit,
    {ts['n_punct']} AS n_punct,
    {ts['n_stopwords']} AS n_stopwords,
    {ts['n_chars']} AS n_chars,
    {T.lang_id_sql()} AS lang_id,
    {fp['fingerprint']} AS fingerprint,
    {fp['fingerprint64']} AS fingerprint64
  FROM documents
)
SELECT doc_id, n_ws_tokens, n_bpe_tokens, n_alpha, n_digit, n_punct,
  n_stopwords,
  CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END
    AS alpha_ratio,
  CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END
    AS punct_ratio,
  CASE WHEN n_ws_tokens > 0 THEN n_stopwords * 1.0 / n_ws_tokens
       ELSE 0.0 END AS stopword_ratio,
  CASE WHEN n_ws_tokens > 0
       THEN (n_chars - n_ws_tokens + 1) * 1.0 / n_ws_tokens
       ELSE 0.0 END AS mean_token_len,
  (n_ws_tokens >= 10
   AND n_alpha * 1.0 / n_chars > 0.5
   AND n_punct * 1.0 / n_chars < 0.2
   AND (n_chars - n_ws_tokens + 1) * 1.0 / n_ws_tokens
       BETWEEN 2.0 AND 12.0) AS quality_ok,
  lang_id, fingerprint, fingerprint64
FROM b
"""


def lang_quality_counts_sql() -> str:
    inner = doc_textstats_sql()
    return f"""
WITH stats AS ({inner})
SELECT lang_id,
       count(*) AS n_docs,
       cast(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS bigint)
         AS n_quality,
       cast(sum(n_bpe_tokens) AS bigint) AS total_bpe_tokens
FROM stats GROUP BY lang_id ORDER BY lang_id
"""


def multimodal_features_sql(n_feat: int = 8) -> str:
    """Twin of multimodal.extract_features over the synthetic container
    format: 4-byte header + (1 + doc_id%3) repeats of unhex(md5(norm)),
    every byte reconstructed from hex — header fields, pixel stats,
    first-byte features, and the per-channel 4-bin histograms."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    feats = ",\n  ".join(
        f"try_cast(('0x' || substr(b.payload_hex, {2 * i + 1}, 2)) AS int)"
        f" / 255.0 AS feat_{i}"
        for i in range(n_feat)
    )
    hists = ",\n         ".join(
        f"cast(sum(CASE WHEN i % 3 = {c} AND v // 64 = {b_} THEN 1 "
        f"ELSE 0 END) AS bigint) AS hist_c{c}_b{b_}"
        for c in range(3)
        for b_ in range(4)
    )
    return f"""
WITH b AS (
  SELECT doc_id,
         repeat(md5({norm}), 1 + doc_id % 3) AS payload_hex,
         cast(n_chars % 64 + 1 AS int) AS width,
         cast(doc_id % 48 + 1 AS int) AS height,
         cast(1 + doc_id % 3 AS int) AS reps
  FROM documents
),
px0 AS (
  SELECT doc_id, payload_hex, unnest(range(0, reps * 16)) AS i FROM b
),
px AS (
  SELECT doc_id, i,
         try_cast(('0x' || substr(payload_hex, 2 * i + 1, 2))
                  AS bigint) AS v
  FROM px0
),
agg AS (
  SELECT doc_id,
         cast(count(*) AS bigint) AS n_pix_bytes,
         avg(v) AS pix_mean,
         cast(min(v) AS int) AS pix_min,
         cast(max(v) AS int) AS pix_max,
         {hists}
  FROM px GROUP BY doc_id
)
SELECT b.doc_id, b.width, b.height, cast(3 AS int) AS channels,
       agg.n_pix_bytes, agg.pix_mean, agg.pix_min, agg.pix_max,
  {feats},
  {", ".join(f"agg.hist_c{c}_b{b_}" for c in range(3) for b_ in range(4))}
FROM b JOIN agg USING (doc_id)
"""


def multimodal_audio_features_sql() -> str:
    """Twin of multimodal.extract_audio_features over the synthetic audio
    container: 4-byte header + (1 + doc_id%4) repeats of
    unhex(md5(norm_text)) read as little-endian int16 samples — every
    sample reconstructed from hex; zero-crossings via lag() over the
    sample order, mean/rms as one float op from exact integer sums."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    rate = ("CASE rate_code WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
            "WHEN 2 THEN 22050 ELSE 44100 END")
    return f"""
WITH b AS (
  SELECT doc_id,
         repeat(md5({norm}), 1 + doc_id % 4) AS wav_hex,
         cast(doc_id % 4 AS int) AS rate_code,
         cast(1 + doc_id % 4 AS int) AS reps
  FROM documents
),
sm0 AS (
  SELECT doc_id, wav_hex, unnest(range(0, reps * 8)) AS j FROM b
),
sm1 AS (
  SELECT doc_id, j,
         try_cast(('0x' || substr(wav_hex, 4 * j + 1, 2)) AS bigint) AS lo,
         try_cast(('0x' || substr(wav_hex, 4 * j + 3, 2)) AS bigint) AS hi
  FROM sm0
),
sm AS (
  SELECT doc_id, j,
         CASE WHEN lo + 256 * hi >= 32768 THEN lo + 256 * hi - 65536
              ELSE lo + 256 * hi END AS s
  FROM sm1
),
lagd AS (
  SELECT doc_id, s,
         lag(s) OVER (PARTITION BY doc_id ORDER BY j) AS ps
  FROM sm
),
agg AS (
  SELECT doc_id,
         cast(count(*) AS bigint) AS n_samples,
         cast(max(abs(s)) AS int) AS peak,
         sum(s) * 1.0 / count(*) AS mean_s,
         sqrt(sum(s * s) * 1.0 / count(*)) AS rms,
         cast(sum(CASE WHEN ps IS NOT NULL AND ((s < 0) <> (ps < 0))
                       THEN 1 ELSE 0 END) AS bigint) AS n_zero_cross
  FROM lagd GROUP BY doc_id
)
SELECT b.doc_id, b.rate_code,
       cast({rate} AS int) AS sample_rate,
       agg.n_samples, agg.peak, agg.mean_s, agg.rms, agg.n_zero_cross,
       cast(agg.n_samples * 1000000 // ({rate}) AS bigint) AS duration_us
FROM b JOIN agg USING (doc_id)
"""


def stop_shingle_stats_sql(max_df: int | None = None) -> str:
    max_df = max_df or D.MAX_SHINGLE_DF
    return f"""
WITH {_sh_cte()},
dfc AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
SELECT cast(count(*) AS bigint) AS n_shingles,
       cast(sum(CASE WHEN df > {max_df} THEN 1 ELSE 0 END) AS bigint)
         AS n_capped,
       cast(sum(df) AS bigint) AS n_postings,
       cast(sum(CASE WHEN df > {max_df} THEN df ELSE 0 END) AS bigint)
         AS n_postings_dropped
FROM dfc
"""


def contamination_flags_sql(
    bench_mod: int = 37, min_common: int = 5
) -> str:
    """Twin of dedup.contamination_flags with bench = documents whose
    doc_id % bench_mod == 0 (the gate's deterministic eval-set stand-in)."""
    key = D.SHINGLE_KEY_SQL.format(c="sh_str")
    return f"""
WITH corpus AS ({corpus_sql()}),
bench AS (SELECT * FROM documents WHERE doc_id % {bench_mod} = 0),
sh0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str FROM corpus
),
sh AS (SELECT doc_id, {key} AS sh FROM sh0),
bsh0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str FROM bench
),
bsh AS (SELECT DISTINCT {key} AS sh FROM bsh0),
common AS (
  SELECT s.doc_id, count(*) AS n
  FROM sh s JOIN bsh b ON s.sh = b.sh
  GROUP BY s.doc_id
)
SELECT c.doc_id,
       cast(coalesce(n.n, 0) AS bigint) AS n_contaminated_shingles,
       coalesce(n.n, 0) >= {min_common} AS is_contaminated
FROM corpus c LEFT JOIN common n ON c.doc_id = n.doc_id
"""


def split_leakage_sql(
    splits_ppm: dict[str, int] | None = None,
    salt: str = "split-v1",
    min_common: int = 5,
) -> str:
    """Twin of dedup.split_leakage: non-train docs scored by distinct
    shingles shared with the train split (EXISTS = the semi join)."""
    from .sampling import PPM, SPLIT_PPM, _hash_u32_sql

    splits_ppm = splits_ppm or SPLIT_PPM
    h = f"({_hash_u32_sql(salt, 'doc_id')} % {PPM})"
    whens = []
    cum = 0
    for name, ppm in sorted(splits_ppm.items()):
        cum += int(ppm)
        whens.append(f"WHEN {h} < {cum} THEN '{name}'")
    key = D.SHINGLE_KEY_SQL.format(c="sh_str")
    return f"""
WITH assigned AS (
  SELECT doc_id, text, CASE {' '.join(whens)} END AS split FROM documents
),
tsh0 AS (
  SELECT unnest({D.shingles_sql('text')}) AS sh_str
  FROM assigned WHERE split = 'train'
),
tsh AS (SELECT DISTINCT {key} AS sh FROM tsh0),
esh0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str
  FROM assigned WHERE split <> 'train'
),
esh AS (SELECT doc_id, {key} AS sh FROM esh0),
common AS (
  SELECT s.doc_id, count(*) AS n
  FROM esh s WHERE EXISTS (SELECT 1 FROM tsh t WHERE t.sh = s.sh)
  GROUP BY s.doc_id
)
SELECT e.doc_id,
       e.split,
       cast(coalesce(n.n, 0) AS bigint) AS n_common_shingles,
       coalesce(n.n, 0) >= {min_common} AS is_leaked
FROM assigned e LEFT JOIN common n ON e.doc_id = n.doc_id
WHERE e.split <> 'train'
"""


def paragraph_dedup_sql(
    src: str = "documents",
    text_col: str = "text",
    block_tokens: int = D.PARA_BLOCK_TOKENS,
) -> str:
    """Twin of dedup.paragraph_dedup: first occurrence per 63-bit block
    key survives ((doc_id, block_idx) order encoded as one int64), docs
    rewritten from kept blocks via ordered list agg."""
    w = block_tokens
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    key = D.SHINGLE_KEY_SQL.format(c="block")
    mod = D.PARA_POS_MOD
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> x <> '') AS toks
  FROM {src}
),
bl0 AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, (len(toks) + {w - 1}) // {w} + 1),
           i -> struct_pack(
             bi := i,
             b := array_to_string(toks[((i-1)*{w}+1):(i*{w})], ' ')
           ))) AS u
  FROM tk WHERE len(toks) >= 1
),
bl AS (
  SELECT doc_id, cast(u.bi AS bigint) AS block_idx, u.b AS block,
         {key} AS bk
  FROM bl0
),
firsts AS (
  SELECT bk, min(doc_id * {mod} + block_idx) AS first_pos
  FROM bl GROUP BY bk
),
marked AS (
  SELECT b.doc_id, b.block_idx, b.block,
         (b.doc_id * {mod} + b.block_idx) <> f.first_pos AS is_dup
  FROM bl b JOIN firsts f ON b.bk = f.bk
)
SELECT doc_id,
       cast(count(*) AS bigint) AS n_blocks,
       cast(coalesce(sum(CASE WHEN is_dup THEN 1 ELSE 0 END), 0)
            AS bigint) AS n_dup_blocks,
       coalesce(
         array_to_string(
           list(block ORDER BY block_idx) FILTER (WHERE NOT is_dup), ' '),
         '') AS text_deduped
FROM marked GROUP BY doc_id
"""


def dedup_components_sql(
    threshold: float = 0.5, max_df: int = D.MAX_SHINGLE_DF
) -> str:
    """Recursive-CTE twin of dedup.dedup_components: reachability closure
    over the symmetric dup-pair graph; component id = min reachable
    vertex (including self)."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH RECURSIVE {_sh_cte()}, {_jaccard_cte(max_df)},
fp AS (SELECT doc_id, md5({norm}) AS fingerprint FROM corpus),
eg AS (
  SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM fp GROUP BY fingerprint
),
pairs AS (
  SELECT eg.canonical_id AS a, fp.doc_id AS b
  FROM fp JOIN eg ON fp.fingerprint = eg.fingerprint
  WHERE eg.group_size > 1 AND fp.doc_id <> eg.canonical_id
  UNION
  SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= {threshold}
),
edges AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT v.doc_id,
       least(v.doc_id, min(r.b)) AS component_id
FROM (SELECT DISTINCT a AS doc_id FROM edges) v
LEFT JOIN reach r ON r.a = v.doc_id
GROUP BY v.doc_id
"""


def component_representatives_sql(
    threshold: float = 0.5, max_df: int = D.MAX_SHINGLE_DF
) -> str:
    """Twin of dedup.component_representatives: the recursive-CTE
    component closure nested as a subquery + per-member token counts +
    best-copy window rank."""
    n_bpe = T.textstats_sql("d.text")["n_bpe_tokens"]
    return f"""
WITH comp AS (
  SELECT * FROM ({dedup_components_sql(threshold, max_df)}) _c
),
corpus2 AS ({corpus_sql()}),
st AS (
  SELECT c.component_id, d.doc_id, {n_bpe} AS n_bpe_tokens
  FROM comp c JOIN corpus2 d ON c.doc_id = d.doc_id
),
ranked AS (
  SELECT component_id, doc_id, n_bpe_tokens,
         row_number() OVER (
           PARTITION BY component_id
           ORDER BY n_bpe_tokens DESC, doc_id ASC) AS rk,
         cast(count(*) OVER (PARTITION BY component_id) AS bigint)
           AS n_members
  FROM st
)
SELECT component_id, doc_id, n_bpe_tokens, n_members
FROM ranked WHERE rk = 1
"""


def dedup_against_sql(
    new_mod: int = 3, threshold: float = 0.5, max_df: int = D.MAX_SHINGLE_DF
) -> str:
    """Twin of dedup.dedup_against with the gate split: new batch =
    corpus docs with doc_id % new_mod == 0, base = the rest."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    key = D.SHINGLE_KEY_SQL.format(c="sh_str")
    return f"""
WITH corpus AS ({corpus_sql()}),
newb AS (SELECT * FROM corpus WHERE doc_id % {new_mod} = 0),
baseb AS (SELECT * FROM corpus WHERE doc_id % {new_mod} <> 0),
base_fp AS (SELECT DISTINCT md5({norm}) AS fingerprint FROM baseb),
survivors AS (
  SELECT n.doc_id, n.text FROM newb n
  WHERE md5({norm.replace('text', 'n.text')}) NOT IN
        (SELECT fingerprint FROM base_fp)
),
shn0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str FROM survivors
),
shn AS (SELECT doc_id, {key} AS sh FROM shn0),
sizes_n AS (SELECT doc_id, count(*) AS n_sh FROM shn GROUP BY doc_id),
shb0 AS (
  SELECT doc_id, unnest({D.shingles_sql('text')}) AS sh_str FROM baseb
),
shb AS (SELECT doc_id, {key} AS sh FROM shb0),
sizes_b AS (SELECT doc_id, count(*) AS n_sh FROM shb GROUP BY doc_id),
kept AS (
  SELECT sh FROM shb GROUP BY sh HAVING count(*) <= {max_df}
),
common AS (
  SELECT n.doc_id AS new_id, b.doc_id AS base_id, count(*) AS n_common
  FROM shn n JOIN kept k ON n.sh = k.sh JOIN shb b ON n.sh = b.sh
  GROUP BY 1, 2
),
near AS (
  SELECT DISTINCT c.new_id AS doc_id
  FROM common c
  JOIN sizes_n sn ON c.new_id = sn.doc_id
  JOIN sizes_b sb ON c.base_id = sb.doc_id
  WHERE c.n_common * 1.0 / (sn.n_sh + sb.n_sh - c.n_common)
        >= {threshold}
)
SELECT s.doc_id, s.text FROM survivors s
WHERE s.doc_id NOT IN (SELECT doc_id FROM near)
"""


def corpus_mix_sql() -> str:
    """Twin of textstats.corpus_mix: per-(source, lang_id) doc counts,
    quality-gate pass rate, and corpus token share; the inner per-row
    stats are the same textstats/lang fragments doc_textstats uses,
    plus the source column carried through."""
    ts = T.textstats_sql()
    return f"""
WITH b AS (
  SELECT doc_id, source,
    {ts['n_ws_tokens']} AS n_ws_tokens,
    {ts['n_alpha']} AS n_alpha,
    {ts['n_punct']} AS n_punct,
    {ts['n_chars']} AS n_chars,
    {T.lang_id_sql()} AS lang_id
  FROM documents
),
q AS (
  SELECT source, lang_id, n_ws_tokens,
    (n_ws_tokens >= 10
     AND CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars
              ELSE 0.0 END > 0.5
     AND CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars
              ELSE 0.0 END < 0.2
     AND CASE WHEN n_ws_tokens > 0
              THEN (n_chars - n_ws_tokens + 1) * 1.0 / n_ws_tokens
              ELSE 0.0 END BETWEEN 2.0 AND 12.0) AS quality_ok
  FROM b
),
agg AS (
  SELECT source, lang_id,
         cast(count(*) AS bigint) AS n_docs,
         cast(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS bigint)
           AS n_quality_ok,
         cast(sum(n_ws_tokens) AS bigint) AS total_tokens
  FROM q GROUP BY source, lang_id
)
SELECT source, lang_id, n_docs, n_quality_ok,
       n_quality_ok * 1.0 / n_docs AS quality_rate,
       total_tokens,
       total_tokens * 1.0 / sum(total_tokens) OVER () AS token_share
FROM agg
"""


def recall_audit_sql(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 2,
) -> str:
    """Twin of ann.recall_audit: the two published search twins as
    scoped subqueries (each carries its own WITH), overlap-joined."""
    brute = brute_force_topk_sql(n_queries, k)
    ivf = ivf_topk_sql(n_queries, k, n_centroids, nprobe, n_iters)
    return f"""
WITH b AS ({brute}),
v AS ({ivf}),
bc AS (
  SELECT query_id, cast(count(*) AS bigint) AS n_brute
  FROM b GROUP BY query_id
),
ov AS (
  SELECT b.query_id, cast(count(*) AS bigint) AS n_ov
  FROM b JOIN v ON b.query_id = v.query_id
             AND b.neighbor_id = v.neighbor_id
  GROUP BY b.query_id
)
SELECT bc.query_id, bc.n_brute,
       cast(coalesce(ov.n_ov, 0) AS bigint) AS n_overlap,
       coalesce(ov.n_ov, 0) * 1.0 / bc.n_brute AS recall_at_k
FROM bc LEFT JOIN ov ON bc.query_id = ov.query_id
"""


def dup_rate_by_segment_sql() -> str:
    """Twin of dedup.dup_rate_by_segment over the planted corpus."""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH corpus AS ({corpus_sql()}),
n0 AS (SELECT max(doc_id) + 1 AS n FROM documents),
fp AS (SELECT doc_id, md5({norm}) AS fingerprint FROM corpus),
g AS (
  SELECT fingerprint, cast(count(*) AS bigint) AS group_size
  FROM fp GROUP BY fingerprint
),
flagged AS (
  SELECT fp.doc_id, fp.fingerprint,
         CASE WHEN g.group_size > 1 THEN 1 ELSE 0 END AS is_dup
  FROM fp JOIN g ON fp.fingerprint = g.fingerprint
),
j AS (
  SELECT d.source, d.lang, f.is_dup, f.fingerprint
  FROM flagged f
  JOIN documents d ON d.doc_id = f.doc_id % (SELECT n FROM n0)
)
SELECT source, lang,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(is_dup) AS bigint) AS n_dup_docs,
       cast(count(DISTINCT fingerprint) AS bigint) AS n_groups,
       sum(is_dup) * 1.0 / count(*) AS dup_ratio
FROM j GROUP BY source, lang
"""


def containment_pairs_sql(
    threshold: float = 0.8, max_df: int = D.MAX_SHINGLE_DF
) -> str:
    """Twin of dedup.containment_pairs: the shared jaccard CTE already
    carries n_common/n_a/n_b; only the ratios and filter differ."""
    return f"""
WITH {_sh_cte()}, {_jaccard_cte(max_df)}
SELECT doc_a, doc_b, n_common, n_a, n_b,
       n_common * 1.0 / n_a AS cont_a_in_b,
       n_common * 1.0 / n_b AS cont_b_in_a
FROM jac
WHERE greatest(n_common * 1.0 / n_a, n_common * 1.0 / n_b) >= {threshold}
"""


def multimodal_video_frames_sql(
    src: str = "documents", stride: int | None = None
) -> str:
    """Twin of multimodal.multimodal_video_frames: reconstructs every
    sampled frame's bytes from the same md5 hex (the image/audio twin
    contract) and reproduces the strided per-frame stats exactly."""
    from . import multimodal as M

    stride = stride or M.VIDEO_STRIDE
    fps_list = ", ".join(str(r) for r in M.VIDEO_FPS)
    fb = M.FRAME_BYTES
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH base AS (
  SELECT doc_id,
         cast(doc_id % 6 + 1 AS int) AS n_frames,
         [{fps_list}][cast(doc_id % 3 AS int) + 1] AS fps,
         {norm} AS norm
  FROM {src}
),
fr AS (
  SELECT doc_id, n_frames, fps,
         unnest(range(0, n_frames, {stride})) AS frame_idx, norm
  FROM base
),
fh AS (
  SELECT doc_id, n_frames, fps, cast(frame_idx AS int) AS frame_idx,
         md5(norm || '_f' || cast(frame_idx AS varchar)) AS h
  FROM fr
),
fbytes AS (
  SELECT f.doc_id, f.n_frames, f.fps, f.frame_idx, b.bi,
         try_cast(('0x' || substr(f.h, cast(b.bi AS int) * 2 + 1, 2))
                  AS bigint) AS v
  FROM fh f CROSS JOIN (SELECT unnest(range({fb})) AS bi) b
),
agg AS (
  SELECT doc_id, n_frames, fps, frame_idx,
         sum(v) AS sv, min(v) AS mn, max(v) AS mx,
         max(CASE WHEN bi = 0 THEN v END) AS b0
  FROM fbytes GROUP BY doc_id, n_frames, fps, frame_idx
)
SELECT doc_id,
       n_frames,
       cast(fps AS int) AS fps,
       cast(n_frames AS bigint) * 1000000 // fps AS duration_us,
       frame_idx,
       sv * 1.0 / {fb} AS frame_mean,
       cast(mn AS int) AS frame_min,
       cast(mx AS int) AS frame_max,
       b0 / 255.0 AS f0
FROM agg
"""


def multimodal_resized_sql(
    src: str = "documents", target: int | None = None
) -> str:
    """Twin of multimodal.multimodal_resized: nearest-neighbor byte
    gather reconstructed from the same repeated-md5 pixel hex."""
    from . import multimodal as M

    target = target or M.RESIZE_TARGET
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    cols = ",\n       ".join(
        f"try_cast(('0x' || substr(ph, cast(({i} * n_pix) // {target}"
        f" AS int) * 2 + 1, 2)) AS int) AS res_{i}"
        for i in range(target)
    )
    return f"""
WITH b AS (
  SELECT doc_id,
         repeat(md5({norm}), cast(1 + doc_id % 3 AS int)) AS ph,
         cast(16 * (1 + doc_id % 3) AS bigint) AS n_pix
  FROM {src}
)
SELECT doc_id, n_pix AS n_pix_bytes,
       {cols}
FROM b
"""
