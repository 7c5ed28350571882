"""As-of join (operators/asof.py): hand-built edge vectors + strategy
equivalence (broadcast packed-array vs union-sort) on the sf data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from d1_log_aggregation_spark import dims
from d1_log_aggregation_spark.operators.asof import asof_join
from d1_log_aggregation_spark.operators.dedup import dedup_turns
from d1_log_aggregation_spark.operators.enrich import registry_key_col
from d1_log_aggregation_spark.operators.parse import parse_events
from d1_log_aggregation_spark.transcripts import load_transcripts

from .conftest import SF_TINY

TS = dt.datetime


def _versions(spark):
    return spark.createDataFrame(
        [
            ("k1", TS(2024, 1, 10), 1, "a"),
            ("k1", TS(2024, 1, 20), 2, "b"),
            ("k2", TS(2024, 1, 15), 1, "c"),
        ],
        "key string, valid_from timestamp, version int, payload string",
    )


def _events(spark):
    return spark.createDataFrame(
        [
            ("e1", "k1", TS(2024, 1, 5)),   # before all versions → NULL
            ("e2", "k1", TS(2024, 1, 10)),  # AT boundary → inclusive, v1
            ("e3", "k1", TS(2024, 1, 12)),  # between → v1
            ("e4", "k1", TS(2024, 1, 25)),  # after last → v2
            ("e5", "k3", TS(2024, 1, 25)),  # key missing from dim → NULL
            ("e6", None, TS(2024, 1, 25)),  # NULL key → NULL
            ("e7", "k2", TS(2024, 1, 15)),  # boundary on second key → v1
        ],
        "event_id string, key string, ts timestamp",
    )


EXPECTED = {
    "e1": None,
    "e2": 1,
    "e3": 1,
    "e4": 2,
    "e5": None,
    "e6": None,
    "e7": 1,
}


def _run(spark, strategy):
    out = asof_join(
        _events(spark),
        _versions(spark),
        keys=["key"],
        ts_col="ts",
        payload_cols=["version", "payload"],
        strategy=strategy,
    )
    return {
        r["event_id"]: r["version"]
        for r in out.select("event_id", "version").collect()
    }


def test_asof_vectors_broadcast(spark):
    assert _run(spark, "broadcast") == EXPECTED


def test_asof_vectors_sorted(spark):
    assert _run(spark, "sorted") == EXPECTED


def test_asof_strategies_agree_on_sf(spark):
    """Both physical strategies produce identical rows on the real parsed
    events × versioned registry (the gate query's input)."""
    ev = parse_events(dedup_turns(load_transcripts(spark, SF_TINY)))
    ev = ev.withColumn(
        "registry_key",
        F.when(F.col("ip_long").isNotNull(), registry_key_col()),
    )
    vers = dims.versioned_registry_df(spark, SF_TINY)
    cols = ["event_id", "version", "valid_from", "city"]

    def rows(strategy):
        out = asof_join(
            ev,
            vers,
            keys=["registry_key"],
            ts_col="ts",
            payload_cols=["version", "city", "node_id"],
            strategy=strategy,
        )
        return sorted(
            out.select(*cols).collect(), key=lambda r: r["event_id"]
        )

    b, s = rows("broadcast"), rows("sorted")
    assert b == s
    # the versioned dim really exercises all paths: some hits per version
    # and some misses (keys % 3 == 0 have no v1 → early events miss)
    versions_seen = {r["version"] for r in b}
    assert versions_seen == {None, 1, 2, 3}


def test_versioned_registry_boundaries_straddle_events(spark):
    """ADVICE r2: the versioned-registry snapshot boundaries are pinned
    timestamps tied to the synthetic 2024-01 event window.  If testdata's
    event span ever drifts past them the as-of gate silently degenerates
    (every event sees v3, or misses every version) — so assert events
    exist strictly BEFORE and AFTER each mid-window boundary."""
    ev = parse_events(dedup_turns(load_transcripts(spark, SF_TINY)))
    bounds = [
        r["valid_from"]
        for r in dims.versioned_registry_df(spark, SF_TINY)
        .select("valid_from")
        .distinct()
        .collect()
    ]
    assert len(bounds) == 3
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    # v1 predates the window entirely; v2/v3 must split it
    mid = sorted(bounds)[1:]
    for b in mid:
        assert lo < b < hi, (
            f"boundary {b} outside event span [{lo}, {hi}] — "
            "VERSIONED_REGISTRY_TEMPLATE needs re-pinning to the testdata"
        )


def test_asof_broadcast_plan_has_no_extra_shuffle(spark):
    """The broadcast strategy adds ZERO exchanges beyond the input's own:
    dim packing aggregates the tiny version table; the probe side is one
    BroadcastHashJoin + projections."""
    ev = _events(spark)
    out = asof_join(
        ev,
        _versions(spark),
        keys=["key"],
        payload_cols=["version", "payload"],
        strategy="broadcast",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # probe side must not shuffle: the only Exchange allowed is the tiny
    # dim aggregation feeding the broadcast
    probe_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side
