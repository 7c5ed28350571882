"""COUNTER robot classification semantics (LogEntrySolrItem.java:331-442).

Covers the UA-regex / IP-CIDR interaction table:
- blank UA → UA flags false
- robot UA (one or both lists)
- IP check runs only when NOT both-true; blank/malformed ip then forces
  BOTH false; robot ip forces BOTH true
- non-read events are never classified
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d1_log_aggregation_spark.functions.net import ip_to_long
from d1_log_aggregation_spark.operators.classify import classify_robots

GOOGLEBOT = "Googlebot/2.1 (+http://www.google.com/bot.html)"  # full+partial
CHINA = "Mozilla/4.0 (compatible; MSIE 7.0; China Local Browse 2.6)"  # full only
CURL = "curl/7.81.0"  # partial only
HUMAN = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
ROBOT_IP = "10.3.22.40"   # inside 10.3.0.0/16
CLEAN_IP = "10.99.1.2"    # in no robot range


def _run(spark, rows):
    df = spark.createDataFrame(
        [(i, ev, ua, ip) for i, (ev, ua, ip) in enumerate(rows)],
        "id int, event string, ua string, ip string",
    ).withColumn("ip_long", ip_to_long(F.col("ip")))
    out = classify_robots(df)
    return {
        r["id"]: (r["in_partial_robot_list"], r["in_full_robot_list"])
        for r in out.collect()
    }


def test_classification_matrix(spark):
    got = _run(
        spark,
        [
            ("read", HUMAN, CLEAN_IP),       # 0: clean
            ("read", GOOGLEBOT, CLEAN_IP),   # 1: both via UA → ip check skipped
            ("read", CHINA, CLEAN_IP),       # 2: full only; ip clean → stays
            ("read", CURL, CLEAN_IP),        # 3: partial only
            ("read", HUMAN, ROBOT_IP),       # 4: robot ip → both true
            ("read", CHINA, ROBOT_IP),       # 5: check runs (not both) → both
            ("read", GOOGLEBOT, "sampleBogusIP"),  # 6: both-true → skip → stay
            ("read", CHINA, "sampleBogusIP"),      # 7: check runs, bad ip → BOTH false
            ("read", CURL, ""),              # 8: check runs, blank ip → BOTH false
            ("read", "", CLEAN_IP),          # 9: blank UA → false/false
            ("create", GOOGLEBOT, ROBOT_IP), # 10: not in events_to_check
        ],
    )
    assert got[0] == (False, False)
    assert got[1] == (True, True)
    assert got[2] == (False, True)
    assert got[3] == (True, False)
    assert got[4] == (True, True)
    assert got[5] == (True, True)
    assert got[6] == (True, True)
    assert got[7] == (False, False)
    assert got[8] == (False, False)
    assert got[9] == (False, False)
    assert got[10] == (False, False)


def test_subnetutils_exclusive_bounds(spark):
    # 10.3.0.0/16: network .0.0 and broadcast .255.255 are NOT in range
    got = _run(
        spark,
        [
            ("read", HUMAN, "10.3.0.0"),
            ("read", HUMAN, "10.3.255.255"),
            ("read", HUMAN, "10.3.0.1"),
            ("read", HUMAN, "10.3.255.254"),
        ],
    )
    assert got[0] == (False, False)
    assert got[1] == (False, False)
    assert got[2] == (True, True)
    assert got[3] == (True, True)

def test_fullscale_lists_compile_and_match_seed_flags(spark):
    """Reference-width lists (222 full / 214 partial): the alternation
    must compile (Java regex), produce flags identical to the seed
    lists — the filler patterns match no synthetic UA — and take the
    MEMOIZED batch path (r8): one ArrowEvalPython stage evaluating the
    alternations once per distinct UA per batch, never a 222-branch
    regex per event row.  The memoized flags must also equal the
    per-row inline-rlike evaluation of the SAME fullscale lists (the
    pre-r8 plan, forced via ua_flags_memoized=False)."""
    from d1_log_aggregation_spark import dims
    from d1_log_aggregation_spark.operators.dedup import dedup_turns
    from d1_log_aggregation_spark.operators.parse import parse_events
    from d1_log_aggregation_spark.transcripts import load_transcripts

    full = dims.full_robot_patterns_fullscale()
    partial = dims.partial_robot_patterns_fullscale()
    assert len(full) == 222 and len(partial) == 214
    assert len(set(full)) == len(full) - sum(
        full[:8].count(p) - 1 for p in set(full[:8])
    )
    import re

    re.compile(dims.combined_regex(full))
    re.compile(dims.combined_regex(partial))

    parsed = parse_events(
        dedup_turns(load_transcripts(spark, "/root/testdata/sf0.001"))
    )
    seed = classify_robots(parsed)
    big = classify_robots(
        parsed, full_patterns=full, partial_patterns=partial
    )
    inline = classify_robots(
        parsed, full_patterns=full, partial_patterns=partial,
        ua_flags_memoized=False,
    )
    cols = ["event_id", "in_partial_robot_list", "in_full_robot_list"]
    bdf = big.select(*cols)
    a = sorted(tuple(r) for r in seed.select(*cols).collect())
    b = sorted(tuple(r) for r in bdf.collect())
    c = sorted(tuple(r) for r in inline.select(*cols).collect())
    assert a == b == c
    assert any(r[1] or r[2] for r in a), "no robot rows in corpus"
    # AQE reports the final (codegen'd) plan only on the EXECUTED df;
    # its toString() appends the pre-AQE "Initial Plan" section too, so
    # count nodes in the final section only
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert re.search(r"\*\(\d+\) Project", final), final[:400]
    # fullscale path: exactly one memoized Arrow stage (the
    # asNondeterministic fence pins single evaluation — guide §4.4
    # duplication), no rlike per row
    assert final.count("ArrowEvalPython") == 1
    # no per-row UA alternation left in the plan (the only RLIKE nodes
    # are parse's ip-validation regex, which never mentions the lists)
    assert "bingbot" not in final and "facebookexternalhit" not in final
    # seed path keeps the Python-free inline rlike plan (the headline
    # pipeline's only Python stage must stay the fused repeat-visit pass)
    seed_plan = seed.select(*cols)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "RLIKE" in seed_plan and "EvalPython" not in seed_plan
