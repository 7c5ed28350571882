"""As-of (temporal) join: each event row picks the LATEST dimension
version whose ``valid_from`` ≤ event ``ts`` — the point-in-time lookup a
log pipeline needs once its enrichment dimensions are slowly changing
(the reference reloads dimension data per harvest run — the web-robot
IP/UA lists at LogHarvesterTask.java:237-294 — i.e. enrichment is
implicitly "as of harvest time"; a replayed backfill needs the explicit
temporal form implemented here).

Spark has no ASOF JOIN operator (DuckDB/Pandas do), so this implements it
Spark-first, two physical strategies with identical semantics:

- ``broadcast`` (default; dim ≪ corpus): pack each key's versions into ONE
  sorted array<struct> row, broadcast-join on the equi-key, then pick the
  last element with valid_from ≤ ts via pure nested-type expressions
  (F.filter + element_at — JVM codegen, NO extra shuffle, NO per-event
  fan-out).  At 100 TB this costs exactly one broadcast hash join.
- ``sorted`` (big-big path): union events + versions, one shuffle+sort on
  (keys, ts) with version rows ordered before events at equal ts, then
  last(payload, ignorenulls) over an unbounded-preceding window — the
  classic merge-scan as-of.  One shuffle of corpus+dim, no join blowup;
  the right shape when the version table is itself corpus-sized.

Ties: an event AT a version boundary (ts == valid_from) sees that version
(inclusive <=, matching DuckDB ``ASOF JOIN ... ON e.ts >= v.valid_from``).
Events whose key misses every version (or has NULL key) get NULL payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    versions: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    valid_from_col: str = "valid_from",
    payload_cols: list[str] | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """Left as-of join: events + (payload_cols, valid_from) of the latest
    version per key with valid_from ≤ ts.

    ``versions`` must be unique on (keys, valid_from); payload_cols
    defaults to every version column that is neither a key nor the
    valid_from timestamp.  Output column names must not collide with
    event columns (rename the dim side first if they do).
    """
    if payload_cols is None:
        payload_cols = [
            c
            for c in versions.columns
            if c not in keys and c != valid_from_col
        ]
    if strategy == "broadcast":
        return _asof_broadcast(
            events, versions, keys, ts_col, valid_from_col, payload_cols
        )
    if strategy == "sorted":
        return _asof_sorted(
            events, versions, keys, ts_col, valid_from_col, payload_cols
        )
    raise ValueError(f"unknown asof strategy: {strategy}")


def _version_struct(
    valid_from_col: str, payload_cols: list[str]
) -> Column:
    # valid_from FIRST so array_sort orders by it (struct sort compares
    # fields left-to-right); (key, valid_from) uniqueness makes the sort
    # a total order within each key's array
    return F.struct(
        F.col(valid_from_col).alias("_vf"),
        *[F.col(c) for c in payload_cols],
    )


def _asof_broadcast(
    events: DataFrame,
    versions: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from_col: str,
    payload_cols: list[str],
) -> DataFrame:
    packed = versions.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(_version_struct(valid_from_col, payload_cols))
        ).alias("_vers")
    )
    out = events.join(F.broadcast(packed), keys, "left")
    matches = F.filter(
        F.col("_vers"), lambda v: v["_vf"] <= F.col(ts_col)
    )
    # size(NULL array) = -1 → missed keys fall through to NULL hit
    hit = F.when(F.size(matches) > 0, F.element_at(matches, -1))
    cols = {c: hit[c] for c in payload_cols}
    cols[valid_from_col] = hit["_vf"]
    return out.withColumns(cols).drop("_vers")


def _asof_sorted(
    events: DataFrame,
    versions: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from_col: str,
    payload_cols: list[str],
) -> DataFrame:
    pay = _version_struct(valid_from_col, payload_cols).alias("_pay")
    v = versions.select(
        *[F.col(k) for k in keys],
        F.col(valid_from_col).alias("_ats"),
        pay,
        F.lit(False).alias("_is_event"),
    )
    pay_type = dict(zip(v.schema.names, v.schema.fields))["_pay"].dataType
    e = events.select(
        "*",
        F.col(ts_col).alias("_ats"),
        F.lit(None).cast(pay_type).alias("_pay"),
        F.lit(True).alias("_is_event"),
    )
    u = e.unionByName(v, allowMissingColumns=True)
    # versions sort BEFORE events at equal _ats (False < True) → inclusive
    # <= semantics; the fill value is identical for same-_ats event rows,
    # so the within-group event order does not affect the output
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_is_event").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "_fill", F.last("_pay", ignorenulls=True).over(w)
    )
    hit = F.col("_fill")
    cols = {c: hit[c] for c in payload_cols}
    cols[valid_from_col] = hit["_vf"]
    return (
        filled.filter(F.col("_is_event"))
        .withColumns(cols)
        .drop("_ats", "_pay", "_is_event", "_fill")
    )
