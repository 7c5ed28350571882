"""Parse + dedup unit tests, including order-invariance (SURVEY §5 item 5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from d1_log_aggregation_spark.operators.dedup import dedup_turns
from d1_log_aggregation_spark.operators.parse import parse_events

T0 = dt.datetime(2024, 1, 1)

LINE = (
    'EVT type=read pid=doc-7 ip=10.5.6.7 ua="curl/7.81.0" '
    'subj="user-5" turn#42'
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_parse_fields(spark):
    df = _df(spark, [("c1", 0, "user", LINE, "bash", T0)])
    r = parse_events(df).collect()[0]
    assert r["event_id"] == "c1.0"
    assert r["event"] == "read"
    assert r["pid"] == "doc-7"
    assert r["ip"] == "10.5.6.7"
    assert r["ua"] == "curl/7.81.0"
    assert r["subj"] == "user-5"
    assert r["ip_long"] == (10 << 24) + (5 << 16) + (6 << 8) + 7
    assert r["schema_version"] == "v1"
    assert r["is_parsable"] and r["has_pid"]


def test_parse_dirty_rows(spark):
    rows = [
        ("c1", 0, "user", "free-form turn without an event line #9", "", T0),
        ("c1", 1, "user", 'EVT type=read pid= ip=1.2.3.4 ua="x" subj="s" t', "", T0),
        ("c1", 2, "user", 'EVT type=read pid=d ip=sampleBogusIP ua="x" subj="s" t', "", T0),
        ("c1", 3, "user", 'EVT type=read pid=d ip=2001:4898:80e0:ee43::3 ua="x" subj="s" t', "", T0),
        ("c1", 4, "user", 'EVT type=read pid=d ip=1.2.3.999 ua="x" subj="s" t', "", T0),
    ]
    out = {r["turn_idx"]: r for r in parse_events(_df(spark, rows)).collect()}
    assert not out[0]["is_parsable"]
    assert out[1]["is_parsable"] and not out[1]["has_pid"]
    assert out[2]["ip_long"] is None  # bogus
    assert out[3]["ip_long"] is None  # ipv6
    assert out[4]["ip_long"] is None  # octet > 255


def test_dedup_exact_and_retry(spark):
    rows = [
        ("c1", 0, "user", LINE, "", T0),
        ("c1", 0, "user", LINE, "", T0),              # exact dup
        ("c1", 1, "user", LINE + " RETRY", "", T0),   # retry dup, sorts later
        ("c1", 1, "user", LINE, "", T0),
        ("c2", 0, "tool", LINE, "", T0),
    ]
    out = dedup_turns(_df(spark, rows)).collect()
    assert len(out) == 3
    survivors = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out}
    assert survivors[("c1", 1)] == LINE  # rank-1 = text asc → original wins


def test_dedup_order_invariance(spark):
    """Shuffled input must yield identical survivors (north_rule: per-turn
    text equality under stable (conv_id, turn_idx) ordering)."""
    rows = [
        ("c%d" % (i % 5), i // 5, "user", LINE + (" RETRY" if i % 3 == 0 else ""), "", T0)
        for i in range(60)
    ]
    a = dedup_turns(_df(spark, rows)).orderBy("conv_id", "turn_idx").collect()
    b = (
        dedup_turns(_df(spark, list(reversed(rows))).repartition(7))
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert a == b


def test_single_pass_parse_equals_fieldwise(spark):
    """The one-regex grok (default) and the five per-field extracts must
    agree on every synthesized row — including the dirty ones (%79 no EVT
    line, %97 blank pid, %89 bogus ip, %83 IPv6)."""
    from d1_log_aggregation_spark.transcripts import load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.001")
    cols = [
        "event_id", "event", "pid", "ip", "ua", "subj",
        "is_parsable", "has_pid",
    ]
    a = parse_events(t, single_pass=True).select(cols)
    b = parse_events(t, single_pass=False).select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_sessionize_matches_python_reference(spark):
    """Randomized (fixed-seed) cross-check: gap-based session assignment
    in Spark equals a straightforward per-key Python scan."""
    import datetime as _dt
    import random

    from d1_log_aggregation_spark.operators.sessionize import sessionize

    rng = random.Random(42)
    t0 = _dt.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        ip = f"10.0.0.{rng.randint(1, 4)}"
        ts = t0 + _dt.timedelta(seconds=rng.randint(0, 100_000))
        rows.append((f"e{i}", ip, ts))
    df = spark.createDataFrame(
        rows, "event_id string, ip string, ts timestamp"
    )
    got = {
        r["event_id"]: (r["session_idx"], r["is_new_session"])
        for r in sessionize(df, gap_seconds=600).collect()
    }

    by_ip: dict[str, list] = {}
    for eid, ip, ts in rows:
        by_ip.setdefault(ip, []).append((ts, eid))
    want = {}
    for ip, evs in by_ip.items():
        evs.sort()
        idx, prev = 0, None
        for ts, eid in evs:
            new = prev is None or (ts - prev).total_seconds() > 600
            idx += 1 if new else 0
            want[eid] = (idx, 1 if new else 0)
            prev = ts
    assert got == want


def test_conv_integrity_semantics(spark):
    """Dense conv → clean row; duplicate key and a missing index are
    both surfaced (n_dup_keys counts collapsible rows, has_gaps uses the
    base-agnostic span test)."""
    from d1_log_aggregation_spark.operators.dedup import conv_integrity

    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 2),
         ("b", 0), ("b", 0), ("b", 2),
         ("c", 5), ("c", 6)],  # 5-based but dense: no gap
        "conv_id string, turn_idx int",
    )
    out = {r["conv_id"]: r for r in conv_integrity(df).collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert a["n_dup_keys"] == 0 and not a["has_gaps"]
    assert b["n_rows"] == 3 and b["n_keys"] == 2
    assert b["n_dup_keys"] == 1 and b["has_gaps"]
    assert c["n_dup_keys"] == 0 and not c["has_gaps"]


def _conv_hash(texts):
    import hashlib

    per_turn = "".join(
        hashlib.md5((t or "").encode()).hexdigest() for t in texts
    )
    return hashlib.md5(per_turn.encode()).hexdigest()


def test_conv_checksums_idempotent_and_ordered(spark):
    """The checksum is over rank-1 survivors in turn_idx order: replayed
    duplicate rows change nothing; the hash equals the hand-computed md5
    of the concatenated per-turn md5 digests."""
    from d1_log_aggregation_spark.operators.dedup import conv_checksums

    base = [
        ("a", 1, "u", "world", None, None),
        ("a", 0, "u", "hello", None, None),
    ]
    dup_replay = base + [
        ("a", 0, "u", "hello", None, None),   # exact re-harvest
        ("a", 1, "u", "zzz later text", None, None),  # retried turn:
        # rank-1 tiebreak (text asc) keeps 'world'
    ]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    clean = conv_checksums(spark.createDataFrame(base, schema)).collect()
    replay = conv_checksums(
        spark.createDataFrame(dup_replay, schema)
    ).collect()
    expect = _conv_hash(["hello", "world"])
    assert clean[0]["conv_hash"] == expect
    assert replay[0]["conv_hash"] == expect
    assert clean[0]["n_turns"] == replay[0]["n_turns"] == 2


def test_conv_checksums_null_and_separator_edges(spark):
    """ADVICE r5 edge inputs, checked against the DuckDB twin: an
    all-NULL-text conversation must hash (not NULL-out), and texts
    containing would-be separator bytes must not alias across turn
    boundaries — per-turn fixed-width digests guarantee both."""
    from d1_log_aggregation_spark.operators.dedup import (
        conv_checksums,
        conv_checksums_sql,
    )

    rows = [
        ("nulls", 0, "u", None, None, None),
        ("nulls", 1, "u", None, None, None),
        # same concatenation under a 1-byte separator, different turns
        ("sepA", 0, "u", "x\x01y", None, None),
        ("sepA", 1, "u", "z", None, None),
        ("sepB", 0, "u", "x", None, None),
        ("sepB", 1, "u", "y\x01z", None, None),
    ]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    df = spark.createDataFrame(rows, schema)
    got = {r["conv_id"]: r["conv_hash"]
           for r in conv_checksums(df).collect()}
    assert got["nulls"] == _conv_hash([None, None])
    assert got["sepA"] == _conv_hash(["x\x01y", "z"])
    assert got["sepA"] != got["sepB"]

    import duckdb

    duck = duckdb.connect()
    duck.register("t_edges", df.toPandas())
    oracle = dict(
        duck.execute(
            "SELECT conv_id, conv_hash FROM ("
            + conv_checksums_sql("SELECT * FROM t_edges")
            + ") q"
        ).fetchall()
    )
    assert oracle == got


def test_conv_checksums_plan_single_exchange(spark):
    """The conv_id pre-partition must serve BOTH the dedup window and
    the aggregate: exactly one fact-side hash exchange."""
    import re

    from d1_log_aggregation_spark.operators.dedup import conv_checksums
    from d1_log_aggregation_spark.transcripts import load_transcripts

    df = conv_checksums(
        load_transcripts(spark, "/root/testdata/sf0.001")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    fact = [
        e for e in re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        if "conv_id" in e
    ]
    assert len(fact) == 1, fact
