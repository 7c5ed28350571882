"""COUNTER web-robot classification (UA regex lists + robot-IP CIDR list).

Exact semantics transcribed from LogEntrySolrItem.setCOUNTERfields
(LogEntrySolrItem.java:331-477):

1. Gate: only events in ``events_to_check`` (trim+lowercase compare,
   default {"read"}) are classified at all; everything else keeps the
   default false flags.
2. UA partial list: NULL/blank UA → false; else true iff ANY pattern
   ``find()``s anywhere in the trimmed UA.  Same for the full list.
3. Robot-IP check: runs only when ``do_robot_ip_check`` AND NOT (partial
   AND full both already true).  When it runs:
   - blank ip        → BOTH flags forced false (overriding UA results!)
   - malformed ip    → BOTH flags forced false (the reference hits
     SubnetUtils' IllegalArgumentException on the first CIDR row and
     clears both, LogEntrySolrItem.java:436-441)
   - ip in any CIDR / equal to any single robot IP → BOTH flags true
   - else flags keep their UA-derived values.

The reference iterates both regex lists and the 171-row CIDR list per
record — two nested-loop theta joins.  Vectorized here as: one combined
alternation regex per list evaluated with ``rlike`` (JVM, codegen), and the
CIDR list precompiled to uint32 [lo, hi] ranges and broadcast; membership is
an O(|dims|) boolean OR folded into a single expression (7 ranges) — at a
larger CIDR dim this becomes a broadcast range join on
``ip_long BETWEEN net_lo AND net_hi`` (see robot_ip_match_join below).

CIDR bounds reproduce SubnetUtils' default *exclusive* host-count semantics:
network and broadcast addresses are NOT in range for prefixes ≤ 30
(commons-net SubnetUtils#isInclusiveHostCount=false).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import dims


def robot_ip_match_expr(ip_long: Column) -> Column:
    """ip_long ∈ any robot range (broadcast-literal fold — dim has 7 rows)."""
    cond = F.lit(False)
    for lo, hi, _label in dims.robot_ip_ranges():
        hlo, hhi = dims.host_range(lo, hi)
        cond = cond | ((ip_long >= hlo) & (ip_long <= hhi))
    return cond


def robot_ip_match_join(df: DataFrame, ranges: DataFrame) -> DataFrame:
    """Scale path for a large CIDR dim: broadcast range join + semi-dedup.
    Adds boolean ``ip_in_robot_ranges``.  Used when the dim is too large to
    fold into an expression (the 171-row reference list folds fine; a
    100k-row blocklist must not become a 100k-term codegen expression).

    ``ranges`` rows are (net_lo, net_hi, ...) with SubnetUtils host-range
    semantics already applied (dims.robot_ip_host_ranges_df).  The probe
    side is the DISTINCT ip_long set (far smaller than the event stream),
    so the O(|ips| × |ranges|) range join never touches full rows; hits
    broadcast back onto the stream as an equi join."""
    ips = df.select("ip_long").where(F.col("ip_long").isNotNull()).distinct()
    hits = (
        ips.join(
            F.broadcast(ranges),
            (F.col("ip_long") >= F.col("net_lo"))
            & (F.col("ip_long") <= F.col("net_hi")),
            "left_semi",
        )
        .withColumn("ip_in_robot_ranges", F.lit(True))
    )
    out = df.join(F.broadcast(hits), "ip_long", "left")
    return out.fillna({"ip_in_robot_ranges": False})


def classify_robots(
    df: DataFrame,
    events_to_check: tuple[str, ...] = ("read",),
    do_robot_ip_check: bool = True,
    robot_ranges: DataFrame | None = None,
    full_patterns: list[str] | None = None,
    partial_patterns: list[str] | None = None,
) -> DataFrame:
    """Adds in_partial_robot_list / in_full_robot_list booleans.

    ``robot_ranges``: optional large CIDR dim (net_lo, net_hi with host
    semantics pre-applied) — switches the ip membership test from the
    folded expression to the broadcast range join (the scale path).

    ``full_patterns``/``partial_patterns``: override the UA regex lists
    (e.g. dims.*_robot_patterns_fullscale() — the reference-width
    222/214-entry lists).  Any width stays ONE rlike per list: the
    alternation is compiled once per task, not per row."""
    drop_cols: list[str] = []
    if do_robot_ip_check and robot_ranges is not None:
        df = robot_ip_match_join(df, robot_ranges)
        drop_cols.append("ip_in_robot_ranges")
    checked = F.lower(F.trim(F.col("event"))).isin(list(events_to_check))
    ua = F.trim(F.col("ua"))
    ua_blank = F.col("ua").isNull() | (F.col("ua") == "")

    ua_partial = (~ua_blank) & ua.rlike(
        dims.combined_regex(partial_patterns or dims.PARTIAL_ROBOT_PATTERNS)
    )
    ua_full = (~ua_blank) & ua.rlike(
        dims.combined_regex(full_patterns or dims.FULL_ROBOT_PATTERNS)
    )

    if do_robot_ip_check:
        both_from_ua = ua_partial & ua_full
        ip_blank = F.col("ip").isNull() | (F.trim(F.col("ip")) == "")
        ip_bad = F.col("ip_long").isNull()  # blank, bogus, or IPv6
        ip_robot = (
            F.col("ip_in_robot_ranges")
            if robot_ranges is not None
            else robot_ip_match_expr(F.col("ip_long"))
        )
        # check runs ⇔ not both already true
        partial = F.when(both_from_ua, ua_partial).otherwise(
            F.when(ip_blank | ip_bad, F.lit(False)).otherwise(
                F.when(ip_robot, F.lit(True)).otherwise(ua_partial)
            )
        )
        full = F.when(both_from_ua, ua_full).otherwise(
            F.when(ip_blank | ip_bad, F.lit(False)).otherwise(
                F.when(ip_robot, F.lit(True)).otherwise(ua_full)
            )
        )
    else:
        partial, full = ua_partial, ua_full

    return df.withColumns(
        {
            "in_partial_robot_list": F.when(checked, partial).otherwise(
                F.lit(False)
            ),
            "in_full_robot_list": F.when(checked, full).otherwise(F.lit(False)),
        }
    ).drop(*drop_cols)


# ---- Oracle-side (DuckDB) equivalent --------------------------------------

def classify_sql_columns(
    events_to_check: tuple[str, ...] = ("read",),
    do_robot_ip_check: bool = True,
    full_patterns: list[str] | None = None,
    partial_patterns: list[str] | None = None,
) -> dict[str, str]:
    """DuckDB boolean expressions over columns (event, ua, ip, ip_long)."""
    evs = ", ".join(f"'{e}'" for e in events_to_check)
    checked = f"lower(trim(event)) IN ({evs})"
    ua_blank = "(ua IS NULL OR ua = '')"
    pr = dims.combined_regex(
        partial_patterns or dims.PARTIAL_ROBOT_PATTERNS
    ).replace("'", "''")
    fr = dims.combined_regex(
        full_patterns or dims.FULL_ROBOT_PATTERNS
    ).replace("'", "''")
    ua_partial = f"(NOT {ua_blank} AND regexp_matches(trim(ua), '{pr}'))"
    ua_full = f"(NOT {ua_blank} AND regexp_matches(trim(ua), '{fr}'))"
    if not do_robot_ip_check:
        return {
            "in_partial_robot_list": f"({checked} AND {ua_partial})",
            "in_full_robot_list": f"({checked} AND {ua_full})",
        }
    ranges = []
    for lo, hi, _ in dims.robot_ip_ranges():
        hlo, hhi = dims.host_range(lo, hi)
        ranges.append(f"(ip_long >= {hlo} AND ip_long <= {hhi})")
    ip_robot = "(" + " OR ".join(ranges) + ")"
    ip_bad = "(ip IS NULL OR trim(ip) = '' OR ip_long IS NULL)"
    both = f"({ua_partial} AND {ua_full})"

    def flag(ua_flag: str) -> str:
        return (
            f"CASE WHEN NOT {checked} THEN false "
            f"WHEN {both} THEN {ua_flag} "
            f"WHEN {ip_bad} THEN false "
            f"WHEN {ip_robot} THEN true "
            f"ELSE {ua_flag} END"
        )

    return {
        "in_partial_robot_list": flag(ua_partial),
        "in_full_robot_list": flag(ua_full),
    }
