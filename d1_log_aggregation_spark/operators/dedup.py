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
