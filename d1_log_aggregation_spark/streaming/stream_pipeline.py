"""Structured Streaming variant of the harvest pipeline.

The reference is micro-batch pull (Quartz-triggered paged REST harvests);
its streaming-shaped concepts map onto Structured Streaming directly
(SURVEY §2.8):

- endDateTime watermark ("never harvest the current period",
  LogHarvesterTask.java:160-179)        → ``withWatermark("ts", ...)``
- readEventCache with size-capped purge (LogHarvesterTask.java:395-429,
  ReadEventCounterCache.java:113-186)   → ``applyInPandasWithState`` with
  event-time timeout (state TTL = repeat-visit interval past the
  watermark — the principled version of the reference's ad-hoc 5%-growth
  cap)
- Solr unique-key overwrite              → ``dropDuplicates`` on event_id
  within the watermark + idempotent sink append
- per-node incremental scheduling        → one always-on query instead of
  per-node Quartz triggers

Stateless stages (parse, classify, enrich, route) are the SAME functions
as the batch pipeline — they are plain Column expressions, so both engines
share one code path.  Repeat-visit is the only stage that changes shape.

Ordering caveat: anchor semantics assume in-order arrival per (ip, pid)
within the allowed lateness — the same contract the reference gets from
entryId-ordered harvest pages (LogEntrySolrItem.java:449-452).  Rows are
sorted inside each micro-batch; cross-batch disorder beyond the watermark
is dropped by Spark, matching the reference's "never re-harvest the past"
checkpoint rule.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.classify import classify_robots
from ..operators.enrich import enrich_registry, enrich_sysmeta
from ..operators.parse import parse_events
from ..operators.route import route

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def flag_repeat_visits_stream(
    df: DataFrame,
    interval_seconds: int = 30,
    events_to_check: tuple[str, ...] = ("read",),
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming repeat-visit: per-(ip,pid) anchor state with event-time
    TTL.  Emits (event_id, is_repeat_visit) for checked events."""
    interval_us = (interval_seconds + 1) * 1_000_000
    checked = F.lower(F.trim(F.col("event"))).isin(list(events_to_check))
    scan_in = (
        df.withWatermark("ts", watermark_delay)
        .filter(checked)
        .select("event_id", "ip", "pid", "ts", "conv_id", "turn_idx")
    )

    def scan(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL purge — the principled ReadEventCounterCache prune
            state.remove()
            yield pd.DataFrame(
                {"event_id": pd.Series([], dtype="object"),
                 "is_repeat_visit": pd.Series([], dtype="bool")}
            )
            return
        (anchor_us,) = state.get if state.exists else (None,)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
        ts_us = pdf["ts"].values.astype("datetime64[us]").astype(np.int64)
        out = np.zeros(len(pdf), dtype=bool)
        a = anchor_us
        for i in range(len(ts_us)):
            t = int(ts_us[i])
            if a is None:
                a = t
            elif a < t < a + interval_us:
                out[i] = True
            else:
                a = t
        state.update((int(a),))
        # state lives until interval past the last anchor (event time)
        state.setTimeoutTimestamp(int(a) // 1000 + (interval_seconds + 1) * 1000)
        yield pd.DataFrame(
            {"event_id": pdf["event_id"].values, "is_repeat_visit": out}
        )

    return scan_in.groupBy("ip", "pid").applyInPandasWithState(
        scan,
        outputStructType="event_id string, is_repeat_visit boolean",
        stateStructType="anchor_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_routed(
    stream: DataFrame,
    registry: DataFrame,
    sysmeta: DataFrame,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stateless streaming path: parse → watermark-dedup → classify →
    enrich → route.  Repeat-visit flags are joined in via foreachBatch in
    ``start_pipeline`` (stream-stream joins of the flag stream would need
    equal watermarks; the per-batch join is simpler and exact under
    in-order file arrival)."""
    df = parse_events(stream)
    df = df.withWatermark("ts", watermark_delay).dropDuplicates(["event_id"])
    df = classify_robots(df)
    df = enrich_sysmeta(df, sysmeta)
    df = enrich_registry(df, registry)
    df = df.withColumns(
        {
            "date_aggregated": F.current_timestamp(),
            "date_updated": F.lit("1900-01-01 00:00:00").cast("timestamp"),
        }
    )
    return route(df)


def start_pipeline(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    registry: DataFrame,
    sysmeta: DataFrame,
    interval_seconds: int = 30,
    trigger_available_now: bool = True,
):
    """End-to-end streaming query writing per-sink parquet via foreachBatch
    (the streaming analog of sinks/writer.py: each micro-batch is one
    idempotent partitionBy(sink) append keyed by batch_id)."""
    from ..operators.repeat_visit import flag_repeat_visits

    stream = read_transcript_stream(spark, input_path)
    routed = streaming_routed(stream, registry, sysmeta)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch-local repeat-visit (exact within batch; cross-batch state
        # handled by flag_repeat_visits_stream when running the stateful
        # variant)
        flagged = flag_repeat_visits(batch_df, interval_seconds)
        (
            flagged.write.mode("overwrite")
            .partitionBy("sink")
            .parquet(f"{output_path}/batch={batch_id}")
        )

    writer = (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
