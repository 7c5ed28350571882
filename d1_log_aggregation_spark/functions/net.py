"""IP helper column expressions (all JVM-side, no Python in the hot path).

Analogues of the reference's per-row IP handling: dotted-quad detection
(``\\d+\\.\\d+\\.\\d+\\.\\d+`` pattern, LogEntrySolrItem.java:393-394) and
SubnetUtils range membership (LogEntrySolrItem.java:417-433).  We convert
dotted-quads to uint32 once so CIDR membership becomes a broadcast range
join instead of a per-row nested loop over the CIDR list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def _oct(ip: Column, i: int) -> Column:
    return F.split_part(ip, F.lit("."), F.lit(i)).cast("long")


def ip_to_long(ip: Column) -> Column:
    """Dotted-quad → uint32 as long; NULL when not a valid IPv4 (bogus
    strings and IPv6 literals both fall out as NULL, like the reference's
    regex gate + SubnetUtils IllegalArgumentException path)."""
    o1, o2, o3, o4 = (_oct(ip, i) for i in range(1, 5))
    val = o1 * 16777216 + o2 * 65536 + o3 * 256 + o4
    ok = (
        ip.rlike(IPV4_RE)
        & (o1 <= 255)
        & (o2 <= 255)
        & (o3 <= 255)
        & (o4 <= 255)
    )
    return F.when(ok, val)


def ip_to_long_sql(col: str) -> str:
    """Same computation as SQL for the DuckDB oracle.  try_cast: DuckDB
    does not short-circuit AND, so a plain cast can be evaluated on rows
    the regex guard would exclude (plan-order dependent)."""
    o = [f"try_cast(split_part({col}, '.', {i}) AS bigint)" for i in range(1, 5)]
    val = f"({o[0]} * 16777216 + {o[1]} * 65536 + {o[2]} * 256 + {o[3]})"
    ok = (
        f"regexp_matches({col}, '^[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}$')"
        f" AND {o[0]} <= 255 AND {o[1]} <= 255 AND {o[2]} <= 255 AND {o[3]} <= 255"
    )
    return f"CASE WHEN {ok} THEN {val} END"
