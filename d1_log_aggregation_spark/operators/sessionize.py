"""Gap-based sessionization of parsed events.

The classic log-pipeline operator the reference implies but never names:
its repeat-visit cache (LogEntrySolrItem.java:444-474) answers "is this
READ within the interval of the anchor?", while sessionization assigns
every event a session id — consecutive events from the same client (ip)
belong to one session until a silence gap longer than ``gap_seconds``.

Spark shape: one shuffle on the session key (ip), two window passes over
the SAME (ip × ts) sort — Catalyst executes them in a single Window
physical operator chain with one exchange + one sort:

1. ``is_new_session`` = ts - lag(ts) > gap (or first event);
2. ``session_idx``   = running sum of the flag (cumulative window);

session_id = ip ":" session_idx — deterministic, join-free, and exactly
reproducible in SQL (the DuckDB twin below).

Scale: identical posture to the repeat-visit scan — the shuffle key is
the client ip (hot NATs are the skew case, bounded by the same argument
measured in ``bench.py --skew``), state is O(1) per row (lag + cumsum),
no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 1800  # 30 min — the classic web-analytics default


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    key: str = "ip",
) -> DataFrame:
    """Adds ``is_new_session``, ``session_idx``, ``session_id``.

    Events must carry ``key`` and ``ts``; ordering within a key is
    (ts, event_id) so simultaneous events split deterministically."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    # .cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ (the parquet
    # scan's type under the UTC session) — same pattern as checkpoint.py
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap_us = us(F.col("ts")) - us(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(key).orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    df = events.withColumn("is_new_session", new_sess)
    df = df.withColumn(
        "session_idx", F.sum("is_new_session").over(cum).cast("long")
    )
    return df.withColumn(
        "session_id",
        F.concat_ws(":", F.col(key), F.col("session_idx").cast("string")),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    key: str = "ip",
) -> DataFrame:
    """(session_id, key, n_events, n_reads, session_start, session_end,
    duration_seconds): the per-session rollup an analytics consumer
    reads.  One extra groupBy on session_id after the window pass."""
    s = sessionize(events, gap_seconds, key)
    return (
        s.groupBy("session_id", key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event") == "read").cast("long")).alias("n_reads"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (
                (
                    F.unix_micros(F.max("ts").cast("timestamp"))
                    - F.unix_micros(F.min("ts").cast("timestamp"))
                )
                / F.lit(1_000_000.0)
            ).alias("duration_seconds"),
        )
    )


# ---- DuckDB oracle twin ----------------------------------------------------

def session_stats_sql(
    parsed_cte: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    key: str = "ip",
) -> str:
    """Twin over a CTE named ``parsed_cte`` exposing (event_id, {key},
    ts, event)."""
    gap_us = gap_seconds * 1_000_000
    return f"""
flags AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
         THEN 1 ELSE 0 END AS is_new_session
  FROM {parsed_cte}
  WINDOW w AS (PARTITION BY {key} ORDER BY ts, event_id)
),
sess AS (
  SELECT *,
    cast(sum(is_new_session) OVER (
      PARTITION BY {key} ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
      AS session_idx
  FROM flags
),
sessions AS (
  SELECT {key} || ':' || cast(session_idx AS string) AS session_id,
         {key}, event_id, ts, event
  FROM sess
)
SELECT session_id, {key},
       cast(count(*) AS bigint) AS n_events,
       cast(sum(CASE WHEN event = 'read' THEN 1 ELSE 0 END) AS bigint)
         AS n_reads,
       min(ts) AS session_start,
       max(ts) AS session_end,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
         AS duration_seconds
FROM sessions
GROUP BY session_id, {key}
"""
