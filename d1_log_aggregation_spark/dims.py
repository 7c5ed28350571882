"""Dimension tables (classification + enrichment lookups).

Analogues of the reference's side inputs, all deterministic and tiny so they
broadcast (the reference loads them once per harvest into driver memory,
LogHarvesterTask.java:237-294):

- robot UA regex lists  ← fullWebRobotList.txt / partialWebRobotList.txt
  (222 / 214 regexes, matched with Java ``Matcher.find()`` substring
  semantics, LogEntrySolrItem.java:352-382)
- robot IP/CIDR list    ← webRobotIPs.csv (171 rows, SubnetUtils.isInRange,
  LogEntrySolrItem.java:388-442)
- node registry / geo   ← DataONE_IPs.csv + GeoLiteCity.dat point lookups
  (GeoIPService.java:78-167); here derived from the ``nation``/``region``
  tables so the oracle can reproduce it
- sysmeta               ← Hazelcast IMap<Identifier,SystemMetadata>
  (LogHarvesterTask.java:181,346-349); here derived from ``documents``

Every builder has two forms: a Spark DataFrame and a SQL fragment (VALUES
CTE or SELECT over the pre-registered views) so the DuckDB oracle sees the
exact same dimension rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --------------------------------------------------------------------------
# Robot UA patterns (analog of full/partialWebRobotList.txt).  Substring
# find() semantics: a record is a robot if ANY pattern finds a match
# anywhere in the UA string (LogEntrySolrItem.java:360-362).
# --------------------------------------------------------------------------

FULL_ROBOT_PATTERNS: list[str] = [
    "[Gg]ooglebot",
    "msnbot",
    "China\\sLocal\\sBrowse",  # escaped-space form present in the real list
    "Scrapy",
    "[Cc]rawler",
    "Yandex(Bot|Images)",
    "bingbot/[0-9]",
    "facebookexternalhit",
]

PARTIAL_ROBOT_PATTERNS: list[str] = [
    "bot",
    "curl",
    "python(-|\\s)requests",
    "Scrapy",  # present in both lists, like the real files
    "spider",
    "wget",
    "libwww",
    "HeadlessChrome",
]


# Reference-scale lists: fullWebRobotList.txt has 222 patterns and
# partialWebRobotList.txt 214 (LogHarvesterTask.java:265-281).  The 8+8
# seed patterns above drive every TRUE outcome on the synthetic UA space;
# the filler reproduces the real lists' SHAPE (literal tokens, [Xx] char
# classes, \s escapes, version-digit classes, inline alternations) while
# matching NO synthetic UA, so flags are provably identical to the seed
# lists (tests/test_classify.py) and what the fullscale path exercises is
# the 222-term alternation itself: regex compile size, rlike codegen, and
# per-row match cost at the real list width.
FULL_ROBOT_LIST_SIZE = 222
PARTIAL_ROBOT_LIST_SIZE = 214

_FILLER_WORDS = [
    "bot", "crawl", "spider", "fetch", "scan", "harvest", "slurp", "probe",
    "index", "archive", "monitor", "sweep",
]


def synth_robot_patterns(
    n: int, seed: list[str], tag: str
) -> list[str]:
    """seed patterns + deterministic filler up to ``n`` entries, cycling
    four shapes drawn from the real files' styles.  Valid under both
    Java regex (Spark rlike) and RE2 (DuckDB regexp_matches)."""
    out = list(seed)
    i = 0
    while len(out) < n:
        w = _FILLER_WORDS[i % len(_FILLER_WORDS)]
        shape = i % 4
        if shape == 0:
            p = f"[{w[0].upper()}{w[0]}]{w[1:]}er-{tag}{i:03d}"
        elif shape == 1:
            p = f"{w}agent{i:03d}/[0-9]"
        elif shape == 2:
            p = f"{w}\\s{tag}agent{i:03d}"
        else:
            p = f"({w}ley|{w}don)-{tag}x{i:03d}"
        out.append(p)
        i += 1
    return out


def full_robot_patterns_fullscale() -> list[str]:
    return synth_robot_patterns(
        FULL_ROBOT_LIST_SIZE, FULL_ROBOT_PATTERNS, "f"
    )


def partial_robot_patterns_fullscale() -> list[str]:
    return synth_robot_patterns(
        PARTIAL_ROBOT_LIST_SIZE, PARTIAL_ROBOT_PATTERNS, "p"
    )


def combined_regex(patterns: list[str]) -> str:
    """One alternation regex reproducing 'any pattern finds a match'.

    The reference iterates the list per record (a theta join,
    LogEntrySolrItem.java:352-382); ``rlike`` against the alternation is the
    vectorized equivalent and short-circuits JVM-side.
    """
    return "(" + "|".join(patterns) + ")"


# --------------------------------------------------------------------------
# Robot IPs (analog of webRobotIPs.csv): single IPs and CIDR blocks.
# Matched against the transcript's parsed ip.  We synthesize client IPs as
# 10.(user_id%200).(user_id*7%256).(user_id*13%254+1)  — see transcripts.py —
# so these blocks deterministically tag a subset of users as robots.
# --------------------------------------------------------------------------

ROBOT_IPS: list[tuple[str, str]] = [
    ("10.3.0.0/16", "crawler-net-a"),      # users with user_id%200 == 3
    ("10.17.0.0/16", "crawler-net-b"),     # users with user_id%200 == 17
    ("10.40.0.0/16", "crawler-net-c"),
    ("10.101.0.0/16", "crawler-net-d"),
    ("10.7.49.92", "single-bot-1"),        # exact ip of user_id 7
    ("203.0.113.0/24", "test-net-3"),      # never matches (negative row)
    ("198.51.100.77", "single-bot-2"),     # never matches (negative row)
]


def ip_to_long_py(ip: str) -> int | None:
    parts = ip.split(".")
    if len(parts) != 4:
        return None
    try:
        octs = [int(p) for p in parts]
    except ValueError:
        return None
    if any(o < 0 or o > 255 for o in octs):
        return None
    return (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]


def cidr_range_py(ip_or_cidr: str) -> tuple[int, int] | None:
    """CIDR/IP → inclusive uint32 range (SubnetUtils.isInRange analog,
    LogEntrySolrItem.java:417-433).  Malformed entries → None (the reference
    catches IllegalArgumentException and skips the row)."""
    if "/" in ip_or_cidr:
        base, _, pfx = ip_or_cidr.partition("/")
        lo = ip_to_long_py(base)
        if lo is None or not pfx.isdigit():
            return None
        bits = int(pfx)
        if bits < 0 or bits > 32:
            return None
        mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
        lo &= mask
        return lo, lo | (0xFFFFFFFF >> bits if bits else 0xFFFFFFFF)
    v = ip_to_long_py(ip_or_cidr)
    return None if v is None else (v, v)


def robot_ip_ranges() -> list[tuple[int, int, str]]:
    out = []
    for cidr, label in ROBOT_IPS:
        rng = cidr_range_py(cidr)
        if rng is not None:
            out.append((rng[0], rng[1], label))
    return out


def robot_ip_ranges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        robot_ip_ranges(), "net_lo long, net_hi long, bot_label string"
    )


def host_range(lo: int, hi: int) -> tuple[int, int]:
    """SubnetUtils default *exclusive* semantics: network and broadcast
    addresses are not in range when the block has >2 addresses
    (commons-net SubnetUtils#isInclusiveHostCount=false)."""
    if hi - lo >= 3:
        return lo + 1, hi - 1
    return lo, hi


def robot_ip_host_ranges_df(spark: SparkSession) -> DataFrame:
    """The CIDR dim with host-range semantics PRE-applied — the input shape
    classify.robot_ip_match_join expects (the join must stay a plain
    BETWEEN; folding host semantics into the join condition would block
    range-join optimizations)."""
    rows = [
        (*host_range(lo, hi), label) for lo, hi, label in robot_ip_ranges()
    ]
    return spark.createDataFrame(
        rows, "net_lo long, net_hi long, bot_label string"
    )


def robot_ip_ranges_values_sql() -> str:
    """VALUES CTE body for the DuckDB oracle — same (lo, hi, label) rows."""
    rows = ", ".join(
        f"({lo}, {hi}, '{label}')" for lo, hi, label in robot_ip_ranges()
    )
    return f"(VALUES {rows}) AS robot_ip_ranges(net_lo, net_hi, bot_label)"


# --------------------------------------------------------------------------
# Node registry / geo dimension (DataONE_IPs.csv + GeoIP analog).
# Derived from nation ⨝ region so the oracle can rebuild it verbatim.
# Join key: registry_key = first ip octet group, i.e. user's nation.
# --------------------------------------------------------------------------

REGISTRY_SQL_TEMPLATE = """
SELECT
  cast(n.n_nationkey AS int)                         AS registry_key,
  'urn:node:' || upper(substr(n.n_name, 1, 8))       AS node_id,
  n.n_name                                           AS country,
  r.r_name                                           AS region,
  n.n_name || '-city'                                AS city,
  round(cast(n.n_nationkey AS double) * 3.17 - 38.0, 4)  AS lat,
  round(cast(n.n_nationkey AS double) * 13.03 - 160.0, 4) AS lon
FROM {nation} n
JOIN {region} r ON n.n_regionkey = r.r_regionkey
"""


def registry_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "_dims_nation"
    )
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView(
        "_dims_region"
    )
    return spark.sql(
        REGISTRY_SQL_TEMPLATE.format(nation="_dims_nation", region="_dims_region")
    )


def registry_sql() -> str:
    """Oracle-side registry (views ``nation``/``region`` are pre-registered)."""
    return REGISTRY_SQL_TEMPLATE.format(nation="nation", region="region")


# --------------------------------------------------------------------------
# Range-keyed geo dimension (the TRUE shape of the reference's GeoIP db:
# GeoLiteCity is a binary file keyed by ip RANGES, GeoIPService.java:78-106
# — "an interval join in disguise", SURVEY §2.3 J3).  The synthetic client
# ips are 10.<octet>.x.y with octet = user_id % 200, so the range dim is
# 200 disjoint /16 blocks [10.o.0.0 .. 10.o.255.255], each carrying the
# geo payload of nation o % 25 — EXACTLY the payload the equi-keyed
# registry path produces, so the two strategies are interchangeable and
# cross-checked row-for-row in tests/test_classify.py.
# --------------------------------------------------------------------------

GEO_RANGE_OCTETS = 200


def geo_ranges_from_registry(registry: DataFrame) -> DataFrame:
    """(geo_lo, geo_hi, node_id, country, region, city, lat, lon):
    one row per second-octet /16 block, payload from the registry row of
    nation ``octet % 25``.  Tiny (200 rows) → broadcast."""
    from pyspark.sql import functions as F

    spark = registry.sparkSession
    octets = spark.range(GEO_RANGE_OCTETS).select(
        F.col("id").cast("int").alias("octet")
    )
    base = F.lit(10 << 24).cast("long") + F.col("octet").cast("long") * F.lit(
        1 << 16
    )
    return (
        octets.join(
            F.broadcast(registry),
            F.pmod(F.col("octet"), F.lit(25)) == F.col("registry_key"),
        )
        .select(
            base.alias("geo_lo"),
            (base + F.lit((1 << 16) - 1)).alias("geo_hi"),
            "node_id", "country", "region", "city", "lat", "lon",
        )
    )


def geo_ranges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return geo_ranges_from_registry(registry_df(spark, sf_dir))


def geo_ranges_sql() -> str:
    """Oracle-side range dim (same rows; DuckDB octet generator)."""
    return f"""
SELECT
  cast({10 << 24} + o.octet * {1 << 16} AS bigint)                AS geo_lo,
  cast({10 << 24} + o.octet * {1 << 16} + {(1 << 16) - 1} AS bigint)
                                                                  AS geo_hi,
  reg.node_id, reg.country, reg.region, reg.city, reg.lat, reg.lon
FROM (SELECT range AS octet FROM range(0, {GEO_RANGE_OCTETS})) o
JOIN ({registry_sql()}) reg ON o.octet % 25 = reg.registry_key
"""


# --------------------------------------------------------------------------
# Versioned registry (slowly-changing dimension for the as-of join).
# Three deterministic snapshots of the registry: v1 before the event window
# (2023-12-01), v2 and v3 mid-window (2024-01-11 / 2024-01-21 — the
# testdata events span 2024-01-01..30).  Keys with registry_key % 3 == 0
# have NO v1 row, so early events on those keys as-of-miss (NULL payload) —
# the reference reloads its registry per harvest run
# (LogHarvesterTask.java:237-294); the versioned form makes that refresh
# an explicit, replayable dimension.
#
# NOTE the snapshot boundaries are pinned to the synthetic 2024-01 event
# window: if the testdata span ever moves, the as-of gate would silently
# degenerate (every event sees v3, or none sees any version).
# tests/test_asof.py::test_versioned_registry_boundaries_straddle_events
# guards this — it asserts events exist strictly before AND after every
# mid-window boundary, and the strategy-equivalence test's
# versions_seen == {None, 1, 2, 3} assertion covers the payload side.
# --------------------------------------------------------------------------

VERSIONED_REGISTRY_TEMPLATE = """
SELECT
  reg.registry_key,
  reg.node_id,
  reg.city || '/v' || cast(v.version AS string) AS city,
  cast(v.version AS int)                        AS version,
  CASE v.version
    WHEN 1 THEN timestamp '2023-12-01 00:00:00'
    WHEN 2 THEN timestamp '2024-01-11 00:00:00'
    ELSE timestamp '2024-01-21 00:00:00'
  END AS valid_from
FROM ({registry}) reg
CROSS JOIN (SELECT 1 AS version UNION ALL SELECT 2 UNION ALL SELECT 3) v
WHERE NOT (v.version = 1 AND reg.registry_key % 3 = 0)
"""


def versioned_registry_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    registry_df(spark, sf_dir)  # registers the _dims_* views
    return spark.sql(
        VERSIONED_REGISTRY_TEMPLATE.format(
            registry=REGISTRY_SQL_TEMPLATE.format(
                nation="_dims_nation", region="_dims_region"
            )
        )
    )


def versioned_registry_sql() -> str:
    return VERSIONED_REGISTRY_TEMPLATE.format(registry=registry_sql())


# --------------------------------------------------------------------------
# Sysmeta dimension (Hazelcast sysmeta map analog), derived from documents.
# pid space is ~10% larger than the documents table so the left join has
# genuine misses, defaulted like LogEntrySolrItem.java:222-256 (size → 0).
# --------------------------------------------------------------------------

SYSMETA_SQL_TEMPLATE = """
SELECT
  'doc-' || cast(d.doc_id AS string)                 AS pid,
  'fmt-' || d.lang                                   AS format_id,
  CASE WHEN d.doc_id % 3 = 0 THEN 'METADATA'
       WHEN d.doc_id % 3 = 1 THEN 'DATA'
       ELSE 'RESOURCE' END                           AS format_type,
  cast(d.n_chars AS bigint)                          AS size,
  'org-' || cast(d.doc_id % 7 AS string)             AS rights_holder,
  {access_rules}                                     AS access_rules
FROM {documents} d
"""

# accessPolicy analog (LogAccessRestriction.java:41-89 consumes an
# array-of-struct accessPolicy: each rule = (permissions[], subjects[])).
# Three deterministic rule shapes so the F11 flatten has real work:
# - every doc: a public read rule (read-only → NEVER in read_subjects)
# - doc_id % 2 = 0: a changePermission rule with two messy-DN subjects
#   (mixed case + stray whitespace, exercising DN standardization)
# - doc_id % 3 = 0: a changePermission-only steward rule
# - docs matching neither: no changePermission rule at all →
#   read_subjects = [rights_holder] only.
# Spark and DuckDB build the SAME rows with dialect-specific constructors.

_ADMIN_SUBJ = "'CN=Admin ' || cast(d.doc_id % 5 AS string) || ', DC=Org'"
_SVC_SUBJ = "'  uid=svc-' || cast(d.doc_id % 3 AS string) || '  '"
_STEWARD_SUBJ = "'CN = Steward , DC = Org'"

ACCESS_RULES_SPARK = f"""
  CASE WHEN d.doc_id % 6 = 0 THEN array(
         named_struct('perms', array('read'),
                      'subjects', array('Public')),
         named_struct('perms', array('read', 'write', 'changePermission'),
                      'subjects', array({_ADMIN_SUBJ}, {_SVC_SUBJ})),
         named_struct('perms', array('changePermission'),
                      'subjects', array({_STEWARD_SUBJ})))
       WHEN d.doc_id % 2 = 0 THEN array(
         named_struct('perms', array('read'),
                      'subjects', array('Public')),
         named_struct('perms', array('read', 'write', 'changePermission'),
                      'subjects', array({_ADMIN_SUBJ}, {_SVC_SUBJ})))
       WHEN d.doc_id % 3 = 0 THEN array(
         named_struct('perms', array('read'),
                      'subjects', array('Public')),
         named_struct('perms', array('changePermission'),
                      'subjects', array({_STEWARD_SUBJ})))
       ELSE array(
         named_struct('perms', array('read'),
                      'subjects', array('Public')))
  END
"""

ACCESS_RULES_DUCK = f"""
  CASE WHEN d.doc_id % 6 = 0 THEN [
         {{'perms': ['read'], 'subjects': ['Public']}},
         {{'perms': ['read', 'write', 'changePermission'],
           'subjects': [{_ADMIN_SUBJ}, {_SVC_SUBJ}]}},
         {{'perms': ['changePermission'], 'subjects': [{_STEWARD_SUBJ}]}}]
       WHEN d.doc_id % 2 = 0 THEN [
         {{'perms': ['read'], 'subjects': ['Public']}},
         {{'perms': ['read', 'write', 'changePermission'],
           'subjects': [{_ADMIN_SUBJ}, {_SVC_SUBJ}]}}]
       WHEN d.doc_id % 3 = 0 THEN [
         {{'perms': ['read'], 'subjects': ['Public']}},
         {{'perms': ['changePermission'], 'subjects': [{_STEWARD_SUBJ}]}}]
       ELSE [
         {{'perms': ['read'], 'subjects': ['Public']}}]
  END
"""


def sysmeta_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "_dims_documents"
    )
    return spark.sql(
        SYSMETA_SQL_TEMPLATE.format(
            documents="_dims_documents", access_rules=ACCESS_RULES_SPARK
        )
    )


def sysmeta_sql() -> str:
    return SYSMETA_SQL_TEMPLATE.format(
        documents="documents", access_rules=ACCESS_RULES_DUCK
    )
