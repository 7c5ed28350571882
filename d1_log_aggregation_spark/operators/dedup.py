"""Window-ranked dedup under stable (conv_id, turn_idx) ordering.

Analog of the reference's idempotent identity: Solr's unique key
``id = nodeId + "." + entryId`` makes re-harvested records overwrite rather
than duplicate (LogHarvesterTask.java:431-435, SolrClientManager.java:41-58).
In Spark the same guarantee is a rank-1 window per natural key BEFORE the
sink append, so re-runs and replayed pages are no-ops.

Tiebreak is total and deterministic (text asc, then ts, role, tool) so a
duplicate key with *different* payloads — e.g. a retried turn — always
yields the same survivor regardless of partitioning or input order
(north_rule: per-turn text equality under stable ordering).

Scale note: this is one hash-partition shuffle on (conv_id, turn_idx); the
key is high-cardinality and uniform, so no salting is needed here.  Hot
*conversations* skew the per-conv windows used elsewhere, not this one —
turn_idx is part of the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["conv_id", "turn_idx"]
TIEBREAK = ["text", "ts", "role", "tool"]


def dedup_turns(df: DataFrame) -> DataFrame:
    w = Window.partitionBy(*KEY).orderBy(
        *[F.col(c).asc_nulls_first() for c in TIEBREAK]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def dedup_sql(inner: str, cols: str = "*") -> str:
    """DuckDB equivalent over an inline relation ``inner``."""
    return f"""
SELECT {cols} FROM (
  SELECT t.*, row_number() OVER (
    PARTITION BY conv_id, turn_idx
    ORDER BY text ASC NULLS FIRST, ts ASC NULLS FIRST,
             role ASC NULLS FIRST, tool ASC NULLS FIRST
  ) AS _rk
  FROM ({inner}) t
) WHERE _rk = 1
"""


def conv_integrity(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_rows, n_keys, min_turn_idx, max_turn_idx, n_dup_keys,
    has_gaps): per-conversation integrity audit of the natural key this
    module dedups on — the POSITIVE artifact for the reference's
    chronological-order guarantee (SURVEY W5, 'order check by
    construction': the reference trusts entryId ordering; an engine that
    merely trusts should still be able to PROVE, per conversation, that
    turn_idx is dense and duplicate keys are visible before dedup).
    n_dup_keys > 0 rows are exactly the conversations the rank-1 window
    (dedup_turns) will collapse; has_gaps uses max−min+1 vs distinct
    count so it is index-base agnostic.

    One hash-partition shuffle on conv_id (same key profile as the
    dedup window — high-cardinality, uniform); all counts exact int64."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("turn_idx").alias("n_keys"),
            F.min("turn_idx").cast("long").alias("min_turn_idx"),
            F.max("turn_idx").cast("long").alias("max_turn_idx"),
        )
        .select(
            "conv_id",
            "n_rows",
            "n_keys",
            "min_turn_idx",
            "max_turn_idx",
            (F.col("n_rows") - F.col("n_keys")).alias("n_dup_keys"),
            (
                F.col("max_turn_idx") - F.col("min_turn_idx") + 1
                != F.col("n_keys")
            ).alias("has_gaps"),
        )
    )


def conv_integrity_sql(inner: str) -> str:
    """DuckDB twin over an inline transcripts relation ``inner``."""
    return f"""
SELECT conv_id,
       cast(count(*) AS bigint) AS n_rows,
       cast(count(DISTINCT turn_idx) AS bigint) AS n_keys,
       cast(min(turn_idx) AS bigint) AS min_turn_idx,
       cast(max(turn_idx) AS bigint) AS max_turn_idx,
       cast(count(*) - count(DISTINCT turn_idx) AS bigint) AS n_dup_keys,
       (max(turn_idx) - min(turn_idx) + 1) <> count(DISTINCT turn_idx)
         AS has_gaps
FROM ({inner}) t
GROUP BY conv_id
"""


def conv_checksums(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, conv_hash): content checksum of each
    conversation's DEDUPED turns in stable turn_idx order — the
    north-rule "per-turn text equality under stable ordering" contract
    compressed to one comparable row per conversation.  Re-harvesting,
    replaying a page, or re-running the pipeline must reproduce every
    conv_hash bit-for-bit (the Solr-unique-key idempotency the reference
    gets from nodeId+entryId, LogHarvesterTask.java:431-435, as a
    verifiable artifact); diffing two runs' checksum relations localizes
    any divergence to the conversation.

    Plan: ONE fact-side exchange total — the input is pre-partitioned on
    conv_id, which satisfies ClusteredDistribution for BOTH the
    (conv_id, turn_idx) dedup window and the conv_id aggregate, so
    neither adds its own shuffle (left to themselves they would shuffle
    twice: once per key set — measured before this repartition was
    added).  The per-conv sort is array_sort over the collected
    (turn_idx, text) structs: turn counts are conversation-bounded,
    never a global orderBy.

    Encoding (ADVICE r5): the conv hash is md5 over the CONCATENATED
    PER-TURN md5 hex digests of coalesce(text, '') in turn_idx order —
    fixed-width 32-hex tokens, so turn text containing any separator
    byte cannot alias across turn boundaries (the earlier \\x01-joined
    form could), and NULL text hashes identically in both engines
    (DuckDB's string_agg over raw text returns NULL for an all-NULL
    conversation while Spark's concat_ws skips nulls — coalescing
    BEFORE the per-turn hash removes the divergence)."""
    d = dedup_turns(transcripts.repartition("conv_id"))
    ordered_digests = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
        lambda s: F.md5(F.coalesce(s["text"], F.lit("")).cast("binary")),
    )
    return d.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(F.concat_ws("", ordered_digests).cast("binary")).alias(
            "conv_hash"
        ),
    )


def conv_checksums_sql(inner: str) -> str:
    """DuckDB twin over an inline transcripts relation ``inner``."""
    deduped = dedup_sql(inner)
    return f"""
SELECT conv_id,
       cast(count(*) AS bigint) AS n_turns,
       md5(string_agg(md5(coalesce(text, '')), '' ORDER BY turn_idx))
         AS conv_hash
FROM ({deduped}) dd
GROUP BY conv_id
"""
