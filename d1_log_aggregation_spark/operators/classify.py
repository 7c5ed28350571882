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

import numpy as np
import pandas as pd
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


# Combined UA-list width at or past which classify_robots evaluates the
# alternation regexes once per DISTINCT UA per Arrow batch instead of
# per event row.  The seed lists (8+8 patterns) stay on the inline
# rlike plan (no Python stage in the headline pipeline); the
# reference-width 222/214 lists cross it.
UA_MEMO_REGEX_THRESHOLD = 64


def _ua_flags_memo_col(pat_partial: list[str], pat_full: list[str]):
    """struct<p boolean, f boolean> column of the two UA-list matches,
    evaluated ONCE PER DISTINCT UA PER ARROW BATCH (pd.factorize + a
    scatter back), with both alternations compiled once per task — the
    guide-§4 memoized-batch shape.  UAs are a dimension-sized universe
    repeated across millions of events, so this turns O(rows) regex
    work into O(batch-distinct) without the broadcast-join/lineage
    recompute a distinct-relation plan would cost.  Patterns must be
    dialect-neutral regexes — the list contract already requires Java
    (Spark rlike) ≡ RE2 (DuckDB oracle) behavior, and the synthesized
    lists use only literals, char classes, \\s and inline alternations,
    which Python ``re.search`` matches identically (pytest + value
    oracle pin the equality on every list)."""
    import re as _re

    # compiled once driver-side; re.Pattern pickles by pattern string,
    # so workers rebuild it once per deserialized closure, not per row
    cp = _re.compile(dims.combined_regex(pat_partial))
    cf = _re.compile(dims.combined_regex(pat_full))

    @F.pandas_udf("p boolean, f boolean")
    def _flags(ua: pd.Series) -> pd.DataFrame:
        codes, uniques = pd.factorize(ua.fillna(""))
        up = np.fromiter(
            (cp.search(u) is not None for u in uniques),
            dtype=bool,
            count=len(uniques),
        )
        uf = np.fromiter(
            (cf.search(u) is not None for u in uniques),
            dtype=bool,
            count=len(uniques),
        )
        return pd.DataFrame({"p": up[codes], "f": uf[codes]})

    # nondeterministic ONLY as an optimizer fence (the function is a
    # pure function of ua): both flag columns read fields of the one
    # struct, and without the fence CollapseProject inlines the UDF
    # expression into each consumer — two ArrowEvalPython stages doing
    # identical work (the guide-§4.4 duplication; pytest pins the
    # single-stage plan)
    return _flags.asNondeterministic()


def classify_robots(
    df: DataFrame,
    events_to_check: tuple[str, ...] = ("read",),
    do_robot_ip_check: bool = True,
    robot_ranges: DataFrame | None = None,
    full_patterns: list[str] | None = None,
    partial_patterns: list[str] | None = None,
    ua_flags_memoized: bool | None = None,
) -> DataFrame:
    """Adds in_partial_robot_list / in_full_robot_list booleans.

    ``robot_ranges``: optional large CIDR dim (net_lo, net_hi with host
    semantics pre-applied) — switches the ip membership test from the
    folded expression to the broadcast range join (the scale path).

    ``full_patterns``/``partial_patterns``: override the UA regex lists
    (e.g. dims.*_robot_patterns_fullscale() — the reference-width
    222/214-entry lists).  Any width stays ONE compiled alternation per
    list, compiled once per task, not per row.

    ``ua_flags_memoized`` (r8): evaluate the two alternations once per
    DISTINCT UA per Arrow batch (``_ua_flags_memo_col``) instead of a
    222-branch regex find per event row — the UA universe is
    dimension-sized (10 distinct at the gate SF against 100k events),
    so per-row evaluation redoes identical work thousands of times
    over.  Default (None) auto-enables at ``UA_MEMO_REGEX_THRESHOLD``
    combined patterns: the cheap seed lists keep the Python-free inline
    rlike plan (the headline pipeline's only Python stage stays the
    fused repeat-visit pass), the reference-width lists get the
    memoized batch pass.  Flags are identical (pure function of the
    trimmed UA; blank UAs keep their hard false)."""
    drop_cols: list[str] = []
    if do_robot_ip_check and robot_ranges is not None:
        df = robot_ip_match_join(df, robot_ranges)
        drop_cols.append("ip_in_robot_ranges")
    checked = F.lower(F.trim(F.col("event"))).isin(list(events_to_check))
    ua = F.trim(F.col("ua"))
    ua_blank = F.col("ua").isNull() | (F.col("ua") == "")

    pat_partial = partial_patterns or dims.PARTIAL_ROBOT_PATTERNS
    pat_full = full_patterns or dims.FULL_ROBOT_PATTERNS
    memoized = ua_flags_memoized
    if memoized is None:
        memoized = (
            len(pat_partial) + len(pat_full) >= UA_MEMO_REGEX_THRESHOLD
        )
    if memoized:
        df = df.withColumn(
            "_uaflags", _ua_flags_memo_col(pat_partial, pat_full)(ua)
        )
        ua_partial = (~ua_blank) & F.col("_uaflags.p")
        ua_full = (~ua_blank) & F.col("_uaflags.f")
        drop_cols.append("_uaflags")
    else:
        ua_partial = (~ua_blank) & ua.rlike(dims.combined_regex(pat_partial))
        ua_full = (~ua_blank) & ua.rlike(dims.combined_regex(pat_full))

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
