"""Repeat-visit detection — the one genuinely custom stateful operator.

Reference semantics (LogEntrySolrItem.java:444-474 + LogHarvesterTask.java
151,399-429, config repeatVisitIntervalSeconds=30):

- key = ipAddress + pid; events processed in chronological order (harvest
  pages are entryId-ordered, comment at LogEntrySolrItem.java:449-452).
- Keep an anchor time per key.  For each event at time t:
    * no anchor yet            → anchor = t,  repeat = false
    * anchor < t < anchor + (interval+1 s)  (strictly; JodaTime interval
      end is exclusive, +1 s applied at LogEntrySolrItem.java:341-342)
                               → repeat = true, anchor NOT advanced
    * otherwise (incl. t == anchor) → anchor = t, repeat = false
- Only events in events_to_check enter the cache at all (the method
  returns early for others — non-read events neither read nor write it).

``lag()`` windows CANNOT express this (the anchor only advances on
non-repeats — "first click anchors the window"), so this is a grouped
ordered scan.  Physical strategy: hash-repartition on (ip, pid) +
sortWithinPartitions + ``mapInPandas`` — ONE linear pass per partition with
anchor state carried across Arrow batches.  This deliberately avoids
``groupBy().applyInPandas``: per-group pandas dispatch costs ~tens of ms and
keys here are numerous-and-tiny (one client × one document), which measured
~10× slower at sf0.1.  The repartition guarantees a key lives in exactly one
partition; the sort guarantees chronological order within the key — the same
ordering contract the reference gets from entryId-ordered harvest pages
(LogEntrySolrItem.java:449-452).

Hot keys (a scraper hammering one doc) are bounded by the run's time range;
for the streaming variant the same scan runs under
``applyInPandasWithState`` with a watermark-driven TTL replacing the
reference's size-capped purge (LogHarvesterTask.java:395-429).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_INTERVAL_SECONDS = 30  # logAggregation.properties:24


def anchor_scan(ts_us: np.ndarray, interval_us: int) -> np.ndarray:
    """One ordered pass: returns boolean repeat flags.

    Exclusive bounds: repeat iff anchor < t < anchor + interval_us
    (interval_us already includes the reference's +1 s)."""
    n = len(ts_us)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    anchor = ts_us[0]
    for i in range(1, n):
        t = ts_us[i]
        if anchor < t < anchor + interval_us:
            out[i] = True
        else:
            anchor = t
    return out


def flag_repeat_visits(
    df: DataFrame,
    interval_seconds: int = DEFAULT_INTERVAL_SECONDS,
    events_to_check: tuple[str, ...] = ("read",),
    order_tiebreak: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Adds boolean ``is_repeat_visit``.

    Non-checked events bypass the scan entirely (constant false) and are
    NOT shuffled — the filter before the groupBy keeps the stateful path
    narrow, mirroring the reference's early return.
    """
    interval_us = (interval_seconds + 1) * 1_000_000  # +1 s, exclusive end
    checked = F.lower(F.trim(F.col("event"))).isin(list(events_to_check))

    scan_in = df.filter(checked).select(
        "event_id", "ip", "pid", "ts", *order_tiebreak
    )
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = scan_in.repartition(n_parts, "ip", "pid").sortWithinPartitions(
        "ip", "pid", "ts", *order_tiebreak
    )

    def scan_partition(batches):
        # anchor state survives across Arrow batches of one partition
        last_key: tuple | None = None
        anchor = 0
        for pdf in batches:
            ips = pdf["ip"].values
            pids = pdf["pid"].values
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype(np.int64)
            out = np.zeros(len(pdf), dtype=bool)
            lk, a = last_key, anchor
            for i in range(len(pdf)):
                k = (ips[i], pids[i])
                t = ts_us[i]
                if k != lk:
                    lk, a = k, t
                elif a < t < a + interval_us:
                    out[i] = True
                else:
                    a = t
            last_key, anchor = lk, a
            yield pd.DataFrame(
                {"event_id": pdf["event_id"].values, "is_repeat_visit": out}
            )

    flags = part.mapInPandas(
        scan_partition, schema="event_id string, is_repeat_visit boolean"
    )

    out = df.join(flags, "event_id", "left")
    return out.withColumn(
        "is_repeat_visit", F.coalesce(F.col("is_repeat_visit"), F.lit(False))
    )


# ---- Oracle-side (DuckDB) equivalent: recursive CTE scan ------------------

def repeat_visit_sql(
    inner: str,
    interval_seconds: int = DEFAULT_INTERVAL_SECONDS,
    events_to_check: tuple[str, ...] = ("read",),
) -> str:
    """DuckDB recursive-CTE reproduction of the anchor scan over relation
    ``inner`` which must expose (event_id, event, ip, pid, ts, conv_id,
    turn_idx).  Returns (event_id, is_repeat_visit) for ALL rows."""
    evs = ", ".join(f"'{e}'" for e in events_to_check)
    usec = (interval_seconds + 1) * 1_000_000
    return f"""
WITH RECURSIVE _rows AS (
  SELECT event_id, ip, pid, ts,
         row_number() OVER (
           PARTITION BY ip, pid ORDER BY ts, conv_id, turn_idx
         ) AS rn
  FROM ({inner}) WHERE lower(trim(event)) IN ({evs})
),
_scan AS (
  SELECT event_id, ip, pid, ts, rn, ts AS anchor, false AS is_repeat
  FROM _rows WHERE rn = 1
  UNION ALL
  SELECT r.event_id, r.ip, r.pid, r.ts, r.rn,
         CASE WHEN r.ts > s.anchor
                   AND epoch_us(r.ts) < epoch_us(s.anchor) + {usec}
              THEN s.anchor ELSE r.ts END,
         (r.ts > s.anchor
          AND epoch_us(r.ts) < epoch_us(s.anchor) + {usec})
  FROM _scan s
  JOIN _rows r ON r.ip = s.ip AND r.pid = s.pid AND r.rn = s.rn + 1
)
SELECT i.event_id,
       coalesce(s.is_repeat, false) AS is_repeat_visit
FROM ({inner}) i LEFT JOIN _scan s ON i.event_id = s.event_id
"""
