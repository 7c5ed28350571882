"""Scale-path equivalence (VERDICT r1 item 6): the code paths written for
100 TB inputs must produce EXACTLY the small-path results.

- J5 scale path: broadcast range join (classify.robot_ip_match_join) vs
  the folded 7-term expression, both on the builtin dim AND against a
  numpy oracle on a generated ~10k-row CIDR dim (which could never fold
  into a codegen expression).
- S4 skew salting: salt_buckets > 0 repartitions hot conversations but
  must be semantics-neutral (deterministic hash salt, not rand()).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from d1_log_aggregation_spark import dims
from d1_log_aggregation_spark.functions.net import ip_to_long
from d1_log_aggregation_spark.operators.classify import (
    classify_robots,
    robot_ip_match_join,
)
from d1_log_aggregation_spark.oracle import SF_REPEAT_INTERVAL_SECONDS
from d1_log_aggregation_spark.pipeline import PipelineConfig, run_pipeline
from d1_log_aggregation_spark.transcripts import load_transcripts

SF = "/root/testdata/sf0.001"


def _cfg(**kw) -> PipelineConfig:
    return PipelineConfig(
        repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
        with_geohash=False,
        **kw,
    )


def _flags(df):
    return sorted(
        (r["event_id"], r["in_partial_robot_list"], r["in_full_robot_list"])
        for r in df.select(
            "event_id", "in_partial_robot_list", "in_full_robot_list"
        ).collect()
    )


def test_range_join_path_equals_expression_fold(spark):
    """Full pipeline, builtin dim: robot_ip_via_join=True ≡ default."""
    t = load_transcripts(spark, SF)
    reg, sm = dims.registry_df(spark, SF), dims.sysmeta_df(spark, SF)
    base = run_pipeline(t, reg, sm, _cfg())
    joined = run_pipeline(t, reg, sm, _cfg(robot_ip_via_join=True))
    assert _flags(base) == _flags(joined)


def test_range_join_on_10k_cidr_dim_matches_numpy(spark):
    """A ~10k-range dim (unfoldable) against a brute-force numpy oracle."""
    rng = np.random.default_rng(42)
    n_ranges = 10_000
    los = rng.integers(0, 2**32 - 4096, size=n_ranges, dtype=np.int64)
    widths = rng.integers(1, 4096, size=n_ranges, dtype=np.int64)
    his = los + widths
    ranges_df = spark.createDataFrame(
        [(int(lo), int(hi), f"net-{i}") for i, (lo, hi) in enumerate(zip(los, his))],
        "net_lo long, net_hi long, bot_label string",
    )

    n_ips = 2_000
    ips = rng.integers(0, 2**32, size=n_ips, dtype=np.int64)
    probe = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(ips)], "event_id int, ip_long long"
    )
    out = robot_ip_match_join(probe, ranges_df)
    got = {
        r["event_id"]: r["ip_in_robot_ranges"]
        for r in out.select("event_id", "ip_in_robot_ranges").collect()
    }
    expected = ((ips[:, None] >= los[None, :]) & (ips[:, None] <= his[None, :])).any(
        axis=1
    )
    assert got == {i: bool(expected[i]) for i in range(n_ips)}


def test_range_join_handles_null_and_dup_ips(spark):
    probe = spark.createDataFrame(
        [
            (0, "10.3.0.1"),      # in 10.3.0.0/16 host range
            (1, "10.3.0.1"),      # duplicate ip — both rows must flag
            (2, None),            # NULL ip_long → false
            (3, "10.99.1.2"),     # clean
        ],
        "event_id int, ip string",
    ).withColumn("ip_long", ip_to_long(F.col("ip")))
    out = robot_ip_match_join(probe, dims.robot_ip_host_ranges_df(spark))
    got = {
        r["event_id"]: r["ip_in_robot_ranges"] for r in out.collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: False}


def test_classify_via_join_matrix(spark):
    """The classify matrix semantics survive the join path (incl. the
    both-true short-circuit and blank/bad-ip overrides)."""
    rows = [
        (0, "read", "Googlebot/2.1", "10.99.1.2"),
        (1, "read", "human agent", "10.3.22.40"),
        (2, "read", "curl/7.81.0", ""),
        (3, "read", "human agent", "bogus"),
        (4, "create", "Googlebot/2.1", "10.3.22.40"),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, event string, ua string, ip string"
    ).withColumn("ip_long", ip_to_long(F.col("ip")))
    expr_path = classify_robots(df)
    join_path = classify_robots(
        df, robot_ranges=dims.robot_ip_host_ranges_df(spark)
    )
    key = lambda d: {  # noqa: E731
        r["event_id"]: (r["in_partial_robot_list"], r["in_full_robot_list"])
        for r in d.collect()
    }
    assert key(expr_path) == key(join_path)
    assert key(join_path)[1] == (True, True)  # robot ip forces both
    assert key(join_path)[4] == (False, False)  # unchecked event


def test_salting_is_semantics_neutral(spark):
    t = load_transcripts(spark, SF)
    reg, sm = dims.registry_df(spark, SF), dims.sysmeta_df(spark, SF)
    base = run_pipeline(t, reg, sm, _cfg())
    salted = run_pipeline(t, reg, sm, _cfg(salt_buckets=8))
    cols = ["event_id", "sink", "is_repeat_visit", "in_full_robot_list"]
    rows = lambda df: sorted(tuple(r) for r in df.select(*cols).collect())  # noqa: E731
    assert rows(base) == rows(salted)


def test_pipeline_correct_without_broadcast_joins(spark):
    """Big-dim fallback: with autoBroadcastJoinThreshold=-1 every enrich
    join falls back to shuffled joins (the path a 100 TB sysmeta dim
    takes) — the routed output must be identical to the broadcast plan's.
    The explicit F.broadcast() hints still apply to the tiny dims; this
    disables Catalyst's automatic broadcasts everywhere else, so the test
    proves no stage silently DEPENDS on auto-broadcast for correctness."""
    from d1_log_aggregation_spark.pipeline import run_from_dir

    cols = ["event_id", "sink", "node_id", "format_id", "is_repeat_visit"]

    def run():
        out = run_from_dir(spark, SF, _cfg())
        return sorted(
            out.select(*cols).collect(), key=lambda r: r["event_id"]
        )

    base = run()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        no_bcast = run()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert base == no_bcast

def test_geo_range_join_path_equals_equi_key(spark):
    """J3's true range-keyed shape (geo_via_range_join=True) must enrich
    every routed row with the exact payload the equi-keyed registry path
    produces — the two strategies are interchangeable by construction
    (the /16 range of second-octet o carries nation o % 25's payload)."""
    t = load_transcripts(spark, SF)
    reg, sm = dims.registry_df(spark, SF), dims.sysmeta_df(spark, SF)
    cols = [
        "event_id", "node_id", "country", "region", "city", "lat", "lon",
        "location", "sink",
    ]
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select(*cols).collect()
    )
    base = run_pipeline(t, reg, sm, _cfg())
    ranged = run_pipeline(t, reg, sm, _cfg(geo_via_range_join=True))
    assert key(base) == key(ranged)
