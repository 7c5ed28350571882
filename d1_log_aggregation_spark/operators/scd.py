"""SCD2 dimension build: change log → validity intervals.

The reference keeps only the CURRENT node registry in its Hazelcast maps
(harvests re-read the live map, NodeRegistryService lookups); a warehouse
pipeline instead materializes the slowly-changing dimension as SCD
type-2 rows — each change becomes an interval [valid_from, valid_to) with
an is_current flag — which is exactly what the as-of join
(operators/asof.py) consumes from the other side.  This operator builds
those intervals from an append-only change log (the CDC / MERGE pattern).

Scale shape: one window over the DIMENSION keyed by the natural key —
dimension cardinality, never the event stream; per-key partitions hold
only that key's versions.  Interval arithmetic is timestamp/lead() only —
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "valid_from",
) -> DataFrame:
    """Append-only change rows → SCD2 intervals: ``valid_to`` = the next
    change's ``valid_from`` for the same key (NULL = open interval),
    ``is_current`` flags the newest row per key, ``valid_days`` is the
    closed interval's whole-day length (NULL while open).

    Ordering within a key is (ts_col, version) when a ``version`` column
    exists, else ts_col alone — ties must be impossible upstream (a CDC
    log with two changes at one timestamp has no well-defined order)."""
    key_cols = key_cols or ["registry_key"]
    order = [F.col(ts_col)]
    if "version" in changes.columns:
        order.append(F.col("version"))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes.withColumn("valid_to", F.lead(ts_col).over(w))
    return out.select(
        *changes.columns,
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        F.when(
            F.col("valid_to").isNotNull(),
            F.floor(
                (
                    F.unix_micros(F.col("valid_to").cast("timestamp"))
                    - F.unix_micros(F.col(ts_col).cast("timestamp"))
                )
                / F.lit(86_400_000_000)
            ),
        )
        .cast("long")
        .alias("valid_days"),
    )


def scd2_registry_sql() -> str:
    """DuckDB twin over the versioned registry change log (dims
    versioned_registry_sql)."""
    from ..dims import versioned_registry_sql

    return f"""
WITH vreg AS ({versioned_registry_sql()}),
iv AS (
  SELECT *, lead(valid_from) OVER (
    PARTITION BY registry_key ORDER BY valid_from, version
  ) AS valid_to
  FROM vreg
)
SELECT registry_key, node_id, city, version, valid_from, valid_to,
       valid_to IS NULL AS is_current,
       cast(CASE WHEN valid_to IS NOT NULL
            THEN floor((epoch_us(valid_to) - epoch_us(valid_from))
                       / 86400000000.0) END AS bigint) AS valid_days
FROM iv
"""
