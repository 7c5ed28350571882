"""DuckDB oracle SQL for every pipeline stage.

The driver runs each ``queries()[name]`` Spark DataFrame against the
matching ``oracle_sql()[name]`` on views (region nation customer supplier
part orders lineitem events documents embeddings).  The transcripts input is
derived from ``events``/``documents`` by the SAME SQL template on both sides
(transcripts.py), so stage outputs are comparable bit-for-bit.

This module builds one WITH-chain reproducing pipeline.py stage by stage:

  t    transcripts                 (shared template)
  d    dedup rank-1                (dedup.py)
  p    parse + event_id + ip_long  (parse.py / functions.net)
  c    robot classification        (classify.py)
  rvs  repeat-visit anchor scan    (repeat_visit.py — RECURSIVE CTE)
  reg  registry dim                (dims.registry_sql)
  sm   sysmeta dim                 (dims.sysmeta_sql)
  e    enriched + stamped          (enrich.py + P5 stamps)
  r    routed (sink, tool_sink)    (route.py)
"""

from __future__ import annotations

from .dims import geo_ranges_sql, registry_sql, sysmeta_sql
from .functions.net import ip_to_long_sql
from .operators.classify import classify_sql_columns
from .operators.parse import parse_sql_columns
from .operators.route import ROUTE_SINK_SQL, ROUTE_TOOL_SQL
from .transcripts import transcripts_ctes, transcripts_sql

V1_EVENTS_SQL = "('read', 'create', 'update', 'delete', 'replicate')"

DATE_AGGREGATED = "2026-01-01 00:00:00"

# sf-level repeat-visit interval: events are day-scale sparse, so the
# 30 s production default (logAggregation.properties:24) would never fire
# on the synthetic corpus; unit tests cover 30 s on dense hand-built data.
SF_REPEAT_INTERVAL_SECONDS = 259_200  # 3 days


def routed_cte(
    interval_seconds: int = SF_REPEAT_INTERVAL_SECONDS,
) -> str:
    """WITH-chain text ending at CTE ``r`` = full routed relation."""
    p_cols = parse_sql_columns("text")
    c_cols = classify_sql_columns()
    usec = (interval_seconds + 1) * 1_000_000
    return f"""
WITH RECURSIVE {transcripts_ctes()},
d AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM (
    SELECT t.*, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY text ASC NULLS FIRST, ts ASC NULLS FIRST,
               role ASC NULLS FIRST, tool ASC NULLS FIRST
    ) AS _rk FROM t
  ) WHERE _rk = 1
),
p0 AS (
  SELECT d.*,
    conv_id || '.' || cast(turn_idx AS string) AS event_id,
    {p_cols['event']} AS event,
    {p_cols['pid']} AS pid,
    {p_cols['ip']} AS ip,
    {p_cols['ua']} AS ua,
    {p_cols['subj']} AS subj
  FROM d
),
p AS (
  SELECT p0.*,
    {ip_to_long_sql('ip')} AS ip_long,
    CASE WHEN event IN {V1_EVENTS_SQL} THEN 'v1' ELSE 'v2' END
      AS schema_version,
    (event <> '') AS is_parsable,
    (pid <> '') AS has_pid
  FROM p0
),
c AS (
  SELECT p.*,
    {c_cols['in_partial_robot_list']} AS in_partial_robot_list,
    {c_cols['in_full_robot_list']} AS in_full_robot_list
  FROM p
),
_rv_rows AS (
  SELECT event_id, ip, pid, ts,
         row_number() OVER (
           PARTITION BY ip, pid ORDER BY ts, conv_id, turn_idx
         ) AS rn
  FROM c WHERE lower(trim(event)) IN ('read')
),
_rv_scan AS (
  SELECT event_id, ip, pid, ts, rn, ts AS anchor, false AS is_repeat
  FROM _rv_rows WHERE rn = 1
  UNION ALL
  SELECT x.event_id, x.ip, x.pid, x.ts, x.rn,
         CASE WHEN x.ts > s.anchor
                   AND epoch_us(x.ts) < epoch_us(s.anchor) + {usec}
              THEN s.anchor ELSE x.ts END,
         (x.ts > s.anchor
          AND epoch_us(x.ts) < epoch_us(s.anchor) + {usec})
  FROM _rv_scan s
  JOIN _rv_rows x ON x.ip = s.ip AND x.pid = s.pid AND x.rn = s.rn + 1
),
rv AS (
  SELECT c.*, coalesce(s.is_repeat, false) AS is_repeat_visit
  FROM c LEFT JOIN _rv_scan s ON c.event_id = s.event_id
),
reg AS (
{registry_sql()}
),
sm AS (
{sysmeta_sql()}
),
e AS (
  SELECT rv.*,
    reg.node_id, reg.country, reg.region, reg.city, reg.lat, reg.lon,
    CASE WHEN reg.lat IS NOT NULL
         THEN printf('%.4f, %.4f', reg.lat, reg.lon) END AS location,
    sm.format_id, sm.format_type,
    coalesce(sm.size, 0) AS size, sm.rights_holder,
    CASE WHEN regexp_replace(lower(trim(rv.subj)), '\\s+', ' ', 'g') <> ''
         THEN regexp_replace(lower(trim(rv.subj)), '\\s+', ' ', 'g')
    END AS subj_norm,
    coalesce(array_to_string(list_sort(list_distinct(list_filter(
      [sm.rights_holder] || list_transform(
        flatten(list_transform(
          list_filter(coalesce(sm.access_rules, []),
                      r -> list_contains(r.perms, 'changePermission')),
          r -> r.subjects)),
        s -> regexp_replace(regexp_replace(
               lower(trim(s)), '\\s*,\\s*', ',', 'g'), '\\s+', ' ', 'g')),
      x -> x IS NOT NULL))), '|'), '') AS read_subjects_str,
    timestamp '{DATE_AGGREGATED}' AS date_aggregated,
    timestamp '1900-01-01 00:00:00' AS date_updated
  FROM rv
  LEFT JOIN reg
    ON rv.ip_long IS NOT NULL
   AND reg.registry_key = {ip_to_long_reg_key()}
  LEFT JOIN sm ON rv.pid = sm.pid
),
r AS (
  SELECT e.*,
    {ROUTE_SINK_SQL} AS sink,
    {ROUTE_TOOL_SQL} AS tool_sink
  FROM e
)
"""


def ip_to_long_reg_key() -> str:
    # TRY_CAST: DuckDB's cast('' AS int) errors (Spark yields NULL); the
    # condition only fires for valid IPv4 anyway (ip_long IS NOT NULL).
    return "try_cast(split_part(rv.ip, '.', 2) AS int) % 25"


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_ctes() -> str:
    """Recursive-CTE geohash-9 encode over the distinct (lat, lon) points of
    ``r`` — the literal interleaved bisection (functions/geohash.py and
    LogEntrySolrItem.java:304-314 via ch.hsr.geohash).  Both engines run the
    identical IEEE-double recurrence mid = (lo+hi)/2 with >= splits, so the
    45 bits agree bit-for-bit.  Only DISTINCT points recurse (the registry
    dim has ~25), then a join fans the result back out."""
    chars = " || ".join(
        f"substr('{_BASE32}', cast((bits >> {5 * (8 - i)}) & 31 AS int) + 1, 1)"
        for i in range(9)
    )
    return f"""
gh_pts AS (
  SELECT DISTINCT lat, lon FROM r WHERE lat IS NOT NULL AND lon IS NOT NULL
),
gh_scan AS (
  SELECT lat, lon, 0 AS step,
         CAST(-90.0 AS DOUBLE) AS lat_lo, CAST(90.0 AS DOUBLE) AS lat_hi,
         CAST(-180.0 AS DOUBLE) AS lon_lo, CAST(180.0 AS DOUBLE) AS lon_hi,
         0::BIGINT AS bits
  FROM gh_pts
  UNION ALL
  SELECT lat, lon, step + 1,
    CASE WHEN step % 2 = 0 THEN lat_lo
         WHEN lat >= (lat_lo + lat_hi) / 2 THEN (lat_lo + lat_hi) / 2
         ELSE lat_lo END,
    CASE WHEN step % 2 = 0 THEN lat_hi
         WHEN lat >= (lat_lo + lat_hi) / 2 THEN lat_hi
         ELSE (lat_lo + lat_hi) / 2 END,
    CASE WHEN step % 2 = 1 THEN lon_lo
         WHEN lon >= (lon_lo + lon_hi) / 2 THEN (lon_lo + lon_hi) / 2
         ELSE lon_lo END,
    CASE WHEN step % 2 = 1 THEN lon_hi
         WHEN lon >= (lon_lo + lon_hi) / 2 THEN lon_hi
         ELSE (lon_lo + lon_hi) / 2 END,
    bits * 2 + CASE
      WHEN step % 2 = 0 THEN
        CASE WHEN lon >= (lon_lo + lon_hi) / 2 THEN 1 ELSE 0 END
      ELSE
        CASE WHEN lat >= (lat_lo + lat_hi) / 2 THEN 1 ELSE 0 END END
  FROM gh_scan WHERE step < 45
),
gh AS (
  SELECT lat, lon, {chars} AS gh9 FROM gh_scan WHERE step = 45
)"""


def geohash_rows_sql() -> str:
    prefixes = ",\n  ".join(
        f"substr(gh.gh9, 1, {p}) AS geohash_{p}" for p in range(1, 10)
    )
    return (
        routed_cte()
        + ",\n"
        + geohash_ctes()
        + f"""
SELECT r.event_id,
  {prefixes}
FROM r LEFT JOIN gh ON r.lat = gh.lat AND r.lon = gh.lon
"""
    )


# --------------------------------------------------------------------------
# Per-query oracle SQL (keys match __spark_entry__.queries()).
# --------------------------------------------------------------------------

ROUTED_PROJECTION = """
  event_id, conv_id, turn_idx, role, tool, ts, text, event, pid, ip, ua, subj,
  schema_version, node_id, country, region, city, lat, lon, location,
  format_id, format_type, size, rights_holder,
  subj_norm, read_subjects_str,
  in_partial_robot_list, in_full_robot_list, is_repeat_visit,
  date_aggregated, date_updated, sink, tool_sink
"""


def _bucket_sql() -> str:
    from .checkpoint import DEFAULT_BUCKETS, bucket_sql

    return bucket_sql("conv_id", DEFAULT_BUCKETS)


def _robot_rate_daily_sql() -> str:
    from .operators.analytics import robot_rate_daily_sql

    return robot_rate_daily_sql()


def _user_retention_sql() -> str:
    from .operators.analytics import user_retention_sql

    return user_retention_sql()


def _sessionize_sql(parsed_cte: str) -> str:
    from .operators.sessionize import session_stats_sql

    return session_stats_sql(parsed_cte)


def _sink_role_rollup_sql() -> str:
    from .operators.analytics import sink_role_rollup_sql

    return sink_role_rollup_sql()


def _role_event_pivot_sql() -> str:
    from .operators.analytics import role_event_pivot_sql

    return role_event_pivot_sql()


def _conv_funnel_sql() -> str:
    from .operators.analytics import conv_funnel_sql

    return conv_funnel_sql()


def _robot_flags_fullscale_select() -> str:
    from .dims import (
        full_robot_patterns_fullscale,
        partial_robot_patterns_fullscale,
    )

    cc = classify_sql_columns(
        full_patterns=full_robot_patterns_fullscale(),
        partial_patterns=partial_robot_patterns_fullscale(),
    )
    return (
        "SELECT event_id,\n"
        f"  {cc['in_partial_robot_list']} AS in_partial_robot_list,\n"
        f"  {cc['in_full_robot_list']} AS in_full_robot_list\n"
        "FROM p"
    )


def _cms_pid_estimates_sql() -> str:
    from .operators.analytics import cms_pid_estimates_sql

    return cms_pid_estimates_sql()


def _approx_distinct_subjects_sql() -> str:
    from .operators.analytics import approx_distinct_subjects_sql

    return approx_distinct_subjects_sql()


def _rolling_distinct_users_sql() -> str:
    from .operators.analytics import rolling_distinct_users_sql

    return rolling_distinct_users_sql()


def _rolling_node_reads_sql() -> str:
    from .operators.analytics import rolling_node_reads_sql

    return rolling_node_reads_sql()


def _event_transitions_sql() -> str:
    from .operators.analytics import event_transitions_sql

    return event_transitions_sql()


def _turn_gap_quantiles_sql() -> str:
    from .operators.analytics import turn_gap_quantiles_sql

    return turn_gap_quantiles_sql()


def _node_staleness_sql() -> str:
    from .operators.analytics import node_staleness_sql

    return node_staleness_sql()


def enrich_asof_sql() -> str:
    """As-of enrich twin: DuckDB's native ASOF LEFT JOIN against the
    versioned registry (operators/asof.py implements the Spark side with
    a broadcast packed-array strategy; both use inclusive ts >= valid_from
    semantics)."""
    from .dims import versioned_registry_sql

    return (
        routed_cte()
        + f""",
vreg AS ({versioned_registry_sql()}),
pe AS (
  SELECT p.*, CASE WHEN ip_long IS NOT NULL
       THEN cast(split_part(ip, '.', 2) AS int) % 25 END AS registry_key
  FROM p
)
SELECT pe.event_id,
       v.version AS reg_version,
       v.valid_from AS reg_valid_from,
       v.city AS reg_city
FROM pe ASOF LEFT JOIN vreg v
  ON pe.registry_key = v.registry_key AND pe.ts >= v.valid_from
"""
    )


def oracle_queries() -> dict[str, str]:
    base = routed_cte()
    return {
        "transcripts": f"""WITH t AS ({transcripts_sql()})
SELECT conv_id, turn_idx, role, text, tool, ts FROM t""",
        "dedup_turns": base
        + "SELECT conv_id, turn_idx, role, text, tool, ts FROM d",
        "parse_events": base
        + """SELECT event_id, conv_id, turn_idx, event, pid, ip, ua, subj,
  ip_long, schema_version, is_parsable, has_pid FROM p""",
        "robot_flags": base
        + """SELECT event_id, in_partial_robot_list, in_full_robot_list
FROM c""",
        # classification at the REFERENCE list width (222/214-pattern
        # alternations, fullWebRobotList.txt scale) — flags must equal
        # the seed-list flags because the filler matches no synthetic UA
        "robot_flags_fullscale": base
        + _robot_flags_fullscale_select(),
        "repeat_visits": base
        + "SELECT event_id, is_repeat_visit FROM rv",
        "enrich_registry": base
        + """SELECT event_id, node_id, country, region, city, lat, lon,
  location FROM e""",
        # J3's true range-keyed shape: DuckDB range join over the same
        # 200-row /16 geo dim (dims.geo_ranges_sql)
        "enrich_geo_range": base
        + f""", georanges AS (
{geo_ranges_sql()}
)
SELECT p.event_id, g.node_id, g.country, g.region, g.city, g.lat, g.lon,
       CASE WHEN g.lat IS NOT NULL
            THEN printf('%.4f, %.4f', g.lat, g.lon) END AS location
FROM p LEFT JOIN georanges g
  ON p.ip_long BETWEEN g.geo_lo AND g.geo_hi""",
        "enrich_sysmeta": base
        + """SELECT event_id, format_id, format_type, size, rights_holder
FROM e""",
        "routed_rows": base + f"SELECT {ROUTED_PROJECTION} FROM r",
        "geohash_rows": geohash_rows_sql(),
        "sink_counts": base
        + """SELECT sink,
  count(*) AS n_rows,
  cast(sum(CASE WHEN in_full_robot_list THEN 1 ELSE 0 END) AS bigint)
    AS n_robot_full,
  cast(sum(CASE WHEN in_partial_robot_list THEN 1 ELSE 0 END) AS bigint)
    AS n_robot_partial,
  cast(sum(CASE WHEN is_repeat_visit THEN 1 ELSE 0 END) AS bigint)
    AS n_repeat_visit,
  max(ts) AS max_ts,
  max(turn_idx) AS max_turn_idx
FROM r GROUP BY sink ORDER BY sink""",
        "tool_sink_counts": base
        + """SELECT tool_sink, count(*) AS n_rows, max(ts) AS max_ts
FROM r WHERE tool_sink IS NOT NULL GROUP BY tool_sink ORDER BY tool_sink""",
        "harvest_metrics": base
        + """SELECT count(*) AS retrieved,
  cast(sum(CASE WHEN sink <> 'dlq' THEN 1 ELSE 0 END) AS bigint) AS submitted,
  cast(sum(CASE WHEN sink = 'dlq' THEN 1 ELSE 0 END) AS bigint) AS dlq_rows
FROM r""",
        # the REAL bucket path (checkpoint.checkpoint_rows): md5-derived
        # hash32(conv_id) % n buckets, watermark in epoch-micros
        "checkpoint_buckets": base
        + f"""SELECT {_bucket_sql()} AS bucket,
  max(epoch_us(ts)) AS max_ts_us,
  max(ts) AS max_ts,
  max(turn_idx) AS max_turn_idx,
  count(*) AS n_rows
FROM r WHERE sink <> 'dlq'
GROUP BY 1 ORDER BY bucket""",
        "checkpoint_rows": base
        + """SELECT conv_id AS partition_key,
  max(turn_idx) AS max_turn_idx,
  max(ts) AS max_ts,
  count(*) AS n_rows
FROM r WHERE sink <> 'dlq'
GROUP BY conv_id ORDER BY partition_key""",
        "convs_without_dlq": base
        + """SELECT conv_id FROM r WHERE sink <> 'dlq'
EXCEPT
SELECT conv_id FROM r WHERE sink = 'dlq'
ORDER BY conv_id""",
        # daily robot-rate series with trailing moving average + cohort
        # retention (operators/analytics.py twins)
        "robot_rate_daily": base + ",\n" + _robot_rate_daily_sql(),
        "user_retention": base + ",\n" + _user_retention_sql(),
        # multi-level ROLLUP totals, event-type pivot, and ordered-funnel
        # sequence analytics (operators/analytics.py twins)
        "sink_role_rollup": base + _sink_role_rollup_sql(),
        "role_event_pivot": base + _role_event_pivot_sql(),
        "conv_funnel": base + ",\n" + _conv_funnel_sql(),
        # per-node trailing 7-day RANGE-frame read counts
        "rolling_node_reads": base + ",\n" + _rolling_node_reads_sql(),
        # first-order Markov transition counts between consecutive events
        "event_transitions": base + ",\n" + _event_transitions_sql(),
        # per-role inter-turn gap quantiles (two-pass exact rank)
        "turn_gap_quantiles": base + ",\n" + _turn_gap_quantiles_sql(),
        # per-node harvest recency vs the corpus frontier
        "node_staleness": base + ",\n" + _node_staleness_sql(),
        # exact daily + trailing 7-day distinct active users
        "rolling_distinct_users": base + ",\n"
        + _rolling_distinct_users_sql(),
        # Count-Min-Sketch top-k estimates (deterministic md5 cells:
        # FULL value oracle)
        "cms_pid_estimates": base + ",\n" + _cms_pid_estimates_sql(),
        # HLL distinct principals per sink, same deterministic-md5
        # recipe: identical registers + estimate in both engines
        "approx_distinct_subjects": base + ",\n"
        + _approx_distinct_subjects_sql(),
        # temporal as-of enrich: latest versioned-registry row with
        # valid_from ≤ event ts (operators/asof.py; DuckDB native ASOF)
        "enrich_asof": enrich_asof_sql(),
        # top-k per group: most-read pids per role (window rank with
        # deterministic tiebreak), clean non-robot reads only
        "top_pids_per_role": base
        + """, tc AS (
  SELECT role, pid, cast(count(*) AS bigint) AS n_reads
  FROM r
  WHERE sink <> 'dlq' AND event = 'read' AND NOT in_full_robot_list
  GROUP BY role, pid
)
SELECT role, pid, n_reads,
       cast(row_number() OVER (
         PARTITION BY role ORDER BY n_reads DESC, pid ASC) AS bigint)
         AS rank
FROM tc QUALIFY rank <= 3""",
        # gap-based sessionization over the parsed (deduped) events —
        # lag-gap flag + cumulative sum per client ip, rolled up per
        # session (operators/sessionize.py twin)
        "session_stats": base
        + ",\n"
        + _sessionize_sql("p"),
        # §2.8 streaming twin: append-mode tumbling day windows emit every
        # window whose end has passed the final watermark (max ts − 1 h,
        # ms precision — Spark tracks event-time watermarks in millis)
        "streaming_windowed_counts": base
        + """SELECT date_trunc('day', r2.ts) AS window_start, r2.sink,
  count(*) AS n_rows, max(r2.ts) AS max_ts,
  cast(sum(CASE WHEN r2.in_full_robot_list THEN 1 ELSE 0 END) AS bigint)
    AS n_robot_full
FROM r r2, (SELECT max(ts) AS mx FROM r) wm
GROUP BY 1, 2, wm.mx
HAVING epoch_ms(date_trunc('day', min(r2.ts)) + INTERVAL 1 DAY)
       <= epoch_ms(wm.mx) - 3600000""",
        # §2.8 second streaming aggregate: per-(node, day-window) read
        # counts under the same watermark emission rule (the watermark is
        # max ts over ALL routed rows; the filter applies inside)
        "streaming_node_read_counts": base
        + """SELECT date_trunc('day', r2.ts) AS window_start, r2.node_id,
  count(*) AS n_reads
FROM r r2, (SELECT max(ts) AS mx FROM r) wm
WHERE r2.sink <> 'dlq' AND r2.node_id IS NOT NULL AND r2.event = 'read'
GROUP BY 1, 2, wm.mx
HAVING epoch_ms(date_trunc('day', min(r2.ts)) + INTERVAL 1 DAY)
       <= epoch_ms(wm.mx) - 3600000""",
        # third streaming aggregate: session_window per-client counts;
        # Spark merges INCLUSIVELY at the boundary (an event at exactly
        # prev_ts + gap continues the session — verified in
        # tests/test_streaming.py), so a session breaks only when the
        # gap STRICTLY exceeds 30 min; session end = last event + gap,
        # emitted once end <= final watermark (max ts - 1h)
        "streaming_session_counts": base
        + """, ev AS (
  SELECT ip, conv_id, turn_idx, ts, event,
         lag(ts) OVER (PARTITION BY ip ORDER BY ts, conv_id, turn_idx)
           AS prev_ts
  FROM r WHERE sink <> 'dlq' AND ip IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT *, sum(new_session) OVER (
    PARTITION BY ip ORDER BY ts, conv_id, turn_idx
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
agg AS (
  SELECT ip, sid, min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end,
         cast(count(*) AS bigint) AS n_events,
         cast(sum(CASE WHEN event = 'read' THEN 1 ELSE 0 END) AS bigint)
           AS n_reads
  FROM sess GROUP BY ip, sid
)
SELECT session_start, session_end, ip, n_events, n_reads
FROM agg, (SELECT max(ts) AS mx FROM r) wm
WHERE epoch_ms(session_end) <= epoch_ms(wm.mx) - 3600000""",
        # E3 re-enrichment (MERGE analog): changed sysmeta for every 5th
        # doc pid overwrites the sysmeta-derived columns and stamps
        # date_updated; unmatched rows keep originals
        "reenriched_rows": base
        + """, ch AS (
  SELECT pid,
         'fmt-re' AS n_format_id, 'DATA' AS n_format_type,
         cast(42 AS bigint) AS n_size,
         'org-reenriched' AS n_rights_holder
  FROM sm
  WHERE try_cast(regexp_extract(pid, 'doc-(\\d+)', 1) AS int) % 5 = 0
)
SELECT r.event_id, r.pid,
  coalesce(ch.n_format_id, r.format_id) AS format_id,
  coalesce(ch.n_format_type, r.format_type) AS format_type,
  coalesce(ch.n_size, r.size) AS size,
  coalesce(ch.n_rights_holder, r.rights_holder) AS rights_holder,
  CASE WHEN ch.pid IS NOT NULL THEN timestamp '2026-01-02 00:00:00'
       ELSE r.date_updated END AS date_updated
FROM r LEFT JOIN ch ON r.pid = ch.pid""",
        # flagship: the reference's headline question — non-robot,
        # non-repeat read events per role (SURVEY §7.2)
        "flagship_clean_reads_per_role": base
        + """SELECT role,
  count(*) AS n_clean_reads,
  count(DISTINCT pid) AS n_distinct_pids
FROM r
WHERE sink <> 'dlq' AND event = 'read'
  AND NOT in_full_robot_list AND NOT in_partial_robot_list
  AND NOT is_repeat_visit
GROUP BY role ORDER BY role""",
    }
