"""Deterministic synthesis of the input transcripts table.

BASELINE.json ``input_hint`` fixes the input shape:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` — an Iceberg/parquet table of multi-turn agent transcripts.
The sandbox has no such table, so we derive one deterministically from the
driver-provided ``events`` (+ ``documents`` for the pid space) parquet via a
SINGLE shared SQL template executed by BOTH Spark and the DuckDB oracle.
Identical input rows on both sides make every downstream pipeline stage
oracle-checkable (the driver's CORRECTNESS gate).

The planted structure mirrors the reference's 256-row ``LogEntries.csv``
fixture (LogEntryProcessorTest.java:223-229 and its dirty tail, lines
~250-256 of the csv):

- each turn's ``text`` embeds one grok-parsable event line
  ``EVT type=<read|create|update|delete> pid=<id> ip=<ipv4> ua="<ua>"
  subj="<principal>"``
- dirty rows via prime moduli on event_id: %79 → no EVT line (unparsable),
  %97 → blank pid (blank-docid analog, LogHarvesterTask.java:338-341),
  %89 → bogus ip, %83 → IPv6 ip (GeoIP lookup fails → no geo fields)
- duplicate (conv_id, turn_idx) rows: %101 → exact duplicate (re-harvest
  idempotency analog of id = nodeId "." entryId, LogHarvesterTask.java:
  431-435), %103 → duplicate with different text (dedup must pick rank-1
  deterministically)
- client ip is a function of user_id (a client identity), so robot-IP CIDR
  classification and repeat-visit keys behave like real access logs
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# UA list indexed by event_id % 10. Robot expectations given dims.py lists:
#  1 Googlebot   → full + partial ("bot")
#  2 curl        → partial
#  4 msnbot      → full + partial
#  5 python-requests → partial
#  6 China Local Browse → full (escaped-space pattern)
#  7 blank UA    → both false (LogEntrySolrItem.java:355-358)
#  8 Scrapy      → full + partial (pattern present in both lists)
_UAS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "curl/7.81.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Safari/605.1.15",
    "msnbot/2.0b (+http://search.msn.com/msnbot.htm)",
    "python-requests/2.31.0",
    "Mozilla/4.0 (compatible; MSIE 7.0; China Local Browse 2.6)",
    "",
    "Scrapy/2.11 (+https://scrapy.org)",
    "Opera/9.80 (Windows NT 6.0) Presto/2.12.388",
]


def _ua_case() -> str:
    whens = "\n      ".join(
        f"WHEN {i} THEN '{ua}'" for i, ua in enumerate(_UAS[:-1])
    )
    return (
        f"CASE cast(e.event_id % 10 AS int)\n      {whens}\n"
        f"      ELSE '{_UAS[-1]}' END"
    )


# One template, two engines.  Dialect-neutral subset: ||, CASE, row_number,
# split via arithmetic only, cast(... AS string/int/bigint), floor.
# Split into named CTE bodies so the oracle can flatten them into one
# top-level WITH chain (DuckDB does not scope nested WITH into set-op
# branches).
_F_SQL = """
  SELECT
    e.user_id,
    e.event_id,
    e.ts,
    CASE e.event_type
      WHEN 'click' THEN 'read' WHEN 'view' THEN 'read'
      WHEN 'purchase' THEN 'create' WHEN 'signup' THEN 'update'
      ELSE 'delete' END AS evt_type,
    CASE
      WHEN e.event_id % 97 = 0 THEN ''
      ELSE 'doc-' || cast(
        (e.user_id * 37 + e.event_id % 8)
          % (SELECT cast(floor(count(*) * 1.1) AS int) FROM {documents})
        AS string)
    END AS pid_str,
    CASE
      WHEN e.event_id % 89 = 0 THEN 'sampleBogusIP'
      WHEN e.event_id % 83 = 0 THEN '2001:4898:80e0:ee43::3'
      ELSE '10.' || cast(e.user_id % 200 AS string)
        || '.' || cast((e.user_id * 7) % 256 AS string)
        || '.' || cast((e.user_id * 13) % 254 + 1 AS string)
    END AS ip_str,
    {ua_case} AS ua_str
  FROM {events} e
"""

_BASE_SQL = """
  SELECT
    'conv-' || cast(user_id AS string) AS conv_id,
    cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS int) AS turn_idx,
    CASE cast(event_id % 4 AS int)
      WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
      WHEN 2 THEN 'tool' ELSE 'system' END AS role,
    CASE
      WHEN event_id % 79 = 0
        THEN 'free-form turn without an event line #'
             || cast(event_id AS string)
      ELSE 'EVT type=' || evt_type || ' pid=' || pid_str
           || ' ip=' || ip_str || ' ua="' || ua_str
           || '" subj="user-' || cast(user_id AS string)
           || '" turn#' || cast(event_id AS string)
    END AS text,
    CASE cast(event_id % 5 AS int)
      WHEN 0 THEN 'search' WHEN 1 THEN 'read_file' WHEN 2 THEN 'bash'
      WHEN 3 THEN '' ELSE cast(NULL AS string) END AS tool,
    ts,
    event_id AS _eid
  FROM _f
"""

_T_SQL = """
SELECT conv_id, turn_idx, role, text, tool, ts FROM _base
UNION ALL
SELECT conv_id, turn_idx, role, text, tool, ts FROM _base WHERE _eid % 101 = 0
UNION ALL
SELECT conv_id, turn_idx, role, text || ' RETRY' AS text, tool, ts
FROM _base WHERE _eid % 103 = 0
"""


def transcripts_ctes(
    events: str = "events", documents: str = "documents"
) -> str:
    """CTE fragments ``_f, _base, t`` for embedding in a larger WITH chain."""
    f = _F_SQL.format(events=events, documents=documents, ua_case=_ua_case())
    base = _BASE_SQL.format(documents=documents)
    return f"_f AS ({f}),\n_base AS ({base}),\nt AS ({_T_SQL})"


def transcripts_sql(events: str = "events", documents: str = "documents") -> str:
    """Standalone query form (both engines)."""
    return (
        f"WITH {transcripts_ctes(events, documents)}\n"
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM t"
    )


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side: same template over the sf_dir parquet files."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "_tr_events"
    )
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "_tr_documents"
    )
    return spark.sql(transcripts_sql("_tr_events", "_tr_documents"))
