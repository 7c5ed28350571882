"""Time-series and cohort analytics over the routed rows.

The reporting layer the reference feeds into Solr facets
(d1_log_aggregation's consumers run date-histogram + facet queries over
the event index); here they are first-class DataFrame rollups with exact
DuckDB twins.

Scale shape: both operators aggregate FIRST (to date- or week-cardinality
relations — thousands of rows at any corpus size), then window/pivot over
the tiny aggregate.  The expensive shuffle is the initial groupBy on
(day) or (user, week); the window over ~10³ rows is free.  All outputs
are ratios of integer counts — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robot_rate_daily(routed: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, n_events, n_robot, robot_rate, robot_rate_ma): daily robot
    fraction with a trailing ``window_days`` moving average — the
    monitoring series an operator watches for crawler surges.

    The moving average windows over the DAILY aggregate (≤ a few thousand
    rows for years of data), not the event stream; the unpartitioned
    window is deliberate and safe at that cardinality."""
    daily = (
        routed.filter(F.col("sink") != "dlq")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (
                    F.col("in_full_robot_list")
                    | F.col("in_partial_robot_list")
                ).cast("long")
            ).alias("n_robot"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    return daily.select(
        "day",
        "n_events",
        "n_robot",
        (F.col("n_robot") / F.col("n_events")).alias("robot_rate"),
        (F.sum("n_robot").over(w) / F.sum("n_events").over(w)).alias(
            "robot_rate_ma"
        ),
    )


def robot_rate_daily_sql(window_days: int = 7) -> str:
    """Twin over the routed CTE ``r``."""
    back = window_days - 1
    return f"""
daily AS (
  SELECT date_trunc('day', ts) AS day,
         cast(count(*) AS bigint) AS n_events,
         cast(sum(CASE WHEN in_full_robot_list OR in_partial_robot_list
                       THEN 1 ELSE 0 END) AS bigint) AS n_robot
  FROM r WHERE sink <> 'dlq'
  GROUP BY 1
)
SELECT day, n_events, n_robot,
       n_robot * 1.0 / n_events AS robot_rate,
       sum(n_robot) OVER w * 1.0 / sum(n_events) OVER w AS robot_rate_ma
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN {back} PRECEDING AND CURRENT ROW)
"""


def user_retention(routed: DataFrame) -> DataFrame:
    """(cohort_week, weeks_since, n_users): classic cohort retention —
    users grouped by their first-active week, counted in each subsequent
    week they appear.  The user identity is the parsed ``subj``
    principal.

    Two aggregations: (user, week) activity (the only corpus-sized
    shuffle), then first-week per user (broadcast-joined back), then the
    cohort rollup over the tiny (user, week) relation."""
    active = (
        routed.filter((F.col("sink") != "dlq") & (F.col("subj") != ""))
        .select(
            "subj", F.date_trunc("week", F.col("ts")).alias("week")
        )
        .distinct()
    )
    first = active.groupBy("subj").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(first, "subj")
        .withColumn(
            "weeks_since",
            F.floor(
                (
                    F.unix_micros(F.col("week").cast("timestamp"))
                    - F.unix_micros(F.col("cohort_week").cast("timestamp"))
                )
                / F.lit(7 * 24 * 3600 * 1_000_000)
            ).cast("long"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("subj").alias("n_users"))
    )


def user_retention_sql() -> str:
    """Twin over the routed CTE ``r``."""
    wk_us = 7 * 24 * 3600 * 1_000_000
    return f"""
active AS (
  SELECT DISTINCT subj, date_trunc('week', ts) AS week
  FROM r WHERE sink <> 'dlq' AND subj <> ''
),
firstw AS (
  SELECT subj, min(week) AS cohort_week FROM active GROUP BY subj
)
SELECT f.cohort_week,
       cast(floor((epoch_us(a.week) - epoch_us(f.cohort_week))
                  / {wk_us}) AS bigint) AS weeks_since,
       cast(count(DISTINCT a.subj) AS bigint) AS n_users
FROM active a JOIN firstw f ON a.subj = f.subj
GROUP BY 1, 2
"""
