"""Rollup / pivot / funnel / sketch analytics (operators/analytics.py
round-3 additions).  The oracle gate covers value equality vs DuckDB;
these tests pin the semantics on hand-built vectors and bound the HLL
sketch error (which has no cross-engine oracle)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from d1_log_aggregation_spark.operators.analytics import (
    approx_distinct_subjects,
    conv_funnel,
    role_event_pivot,
    sink_role_rollup,
)
from d1_log_aggregation_spark.pipeline import PipelineConfig, run_from_dir

from .conftest import SF_TINY

TS = dt.datetime

_COLS = (
    "conv_id string, turn_idx int, sink string, role string, event string,"
    " subj string, is_repeat_visit boolean, ts timestamp"
)


def _routed_fixture(spark):
    rows = [
        ("c1", 0, "role_user", "user", "read", "u1", False, TS(2024, 1, 1)),
        ("c1", 1, "role_user", "user", "create", "u1", False, TS(2024, 1, 2)),
        ("c1", 2, "role_user", "user", "update", "u1", True, TS(2024, 1, 3)),
        ("c2", 0, "role_user", "user", "create", "u2", False, TS(2024, 1, 1)),
        ("c2", 1, "role_user", "user", "read", "u2", False, TS(2024, 1, 2)),
        ("c3", 0, "role_tool", "tool", "delete", "u3", False, TS(2024, 1, 1)),
        ("c4", 0, "dlq", "user", "", "u4", False, TS(2024, 1, 1)),
    ]
    return spark.createDataFrame(rows, _COLS)


def test_rollup_levels(spark):
    out = {
        (r["gid"], r["sink"], r["role"]): r["n_rows"]
        for r in sink_role_rollup(_routed_fixture(spark)).collect()
    }
    # leaf level (gid 0), sink subtotal (gid 1), grand total (gid 3)
    assert out[(0, "role_user", "user")] == 5
    assert out[(1, "role_user", None)] == 5
    assert out[(1, "dlq", None)] == 1
    assert out[(3, None, None)] == 7


def test_pivot_counts_and_zero_fill(spark):
    out = {
        r["role"]: (r["n_read"], r["n_create"], r["n_update"], r["n_delete"])
        for r in role_event_pivot(_routed_fixture(spark)).collect()
    }
    assert out["user"] == (2, 2, 1, 0)
    assert out["tool"] == (0, 0, 0, 1)  # absent combos are 0, not NULL


def test_funnel_depths(spark):
    # c1: read→create→update in order = depth 3
    # c2: create BEFORE read → read matched, but no create after → depth 1
    # c3: delete only → depth 0; c4 is DLQ → excluded
    out = {
        r["funnel_step"]: r["n_convs"]
        for r in conv_funnel(_routed_fixture(spark)).collect()
    }
    assert out == {3: 1, 1: 1, 0: 1}


def test_funnel_order_sensitivity(spark):
    """The funnel is ORDER-sensitive, not set-membership: all three steps
    present but out of order must not count as depth 3."""
    rows = [
        ("cx", 0, "s", "user", "update", "u", False, TS(2024, 1, 1)),
        ("cx", 1, "s", "user", "create", "u", False, TS(2024, 1, 2)),
        ("cx", 2, "s", "user", "read", "u", False, TS(2024, 1, 3)),
    ]
    df = spark.createDataFrame(rows, _COLS)
    out = {r["funnel_step"]: r["n_convs"] for r in conv_funnel(df).collect()}
    assert out == {1: 1}  # read present, nothing ordered after it


def test_approx_distinct_within_tolerance(spark):
    """Estimate-quality bound for the deterministic HLL (value equality
    vs DuckDB is the oracle gate's job; this bounds the sketch error).
    floor() quantization plus a bucket collision can cost 1-2 counts at
    tiny cardinalities, hence the absolute floor on the tolerance."""
    routed = run_from_dir(spark, SF_TINY, PipelineConfig(with_geohash=False))
    rows = approx_distinct_subjects(routed).collect()
    assert rows, "no sinks"
    for r in rows:
        exact = r["exact_subjects"]
        assert exact > 0
        err = abs(r["approx_subjects"] - exact)
        assert err <= max(2.0, 0.05 * exact), (
            r["sink"], r["approx_subjects"], exact,
        )


def test_rolling_range_frame_respects_calendar_gaps(spark):
    """RANGE frame windows over the CALENDAR: a read 10 days earlier must
    NOT enter the 7-day trailing sum even when it is the immediately
    preceding ROW for that node."""
    rows = [
        ("c1", 0, "s", "user", "read", "u", False, TS(2024, 1, 1)),
        ("c1", 1, "s", "user", "read", "u", False, TS(2024, 1, 1, 5)),
        ("c1", 2, "s", "user", "read", "u", False, TS(2024, 1, 11)),
        ("c1", 3, "s", "user", "read", "u", False, TS(2024, 1, 14)),
    ]
    df = spark.createDataFrame(rows, _COLS).withColumn(
        "node_id", F.lit("n1")
    )
    from d1_log_aggregation_spark.operators.analytics import (
        rolling_node_reads,
    )

    out = {
        r["day"].day: r["n_reads_7d"]
        for r in rolling_node_reads(df).collect()
    }
    # Jan 1 has two reads; Jan 11 is >7d later → only itself;
    # Jan 14 sees Jan 11 (3 days back) but not Jan 1
    assert out == {1: 2, 11: 1, 14: 2}


def test_merge_pair_counts_per_occurrence(spark):
    """BPE merge counting weights by OCCURRENCE (not per-doc distinct),
    and single-token docs contribute no pairs."""
    from d1_log_aggregation_spark.datapipe.textstats import (
        merge_pair_counts,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],
        "doc_id int, text string",
    )
    out = {
        r["pair"]: (r["n_occurrences"], r["rank"])
        for r in merge_pair_counts(docs, k=10).collect()
    }
    # "a b a b" → pairs: a b, b a, a b → "a b"×2; plus doc 2 → ×3
    assert out["a b"] == (3, 1)
    assert out["b a"] == (1, 2)
    assert "solo" not in " ".join(out)


def test_mixture_weights_sqrt_proportional(spark):
    """T=0.5 mixing: a language with 4x the tokens gets ~2x the weight
    (sqrt law), weights sum to <= 1e6 ppm (floor division), and the
    allocation respects the budget."""
    from d1_log_aggregation_spark.datapipe.textstats import (
        mixture_weights,
    )

    # 'the and of is' fires en markers; 'der und nicht ist' fires de.
    en_doc = " ".join(["the and of is that with"] * 4)  # 24 tokens
    de_doc = "der und nicht ist aa bb"  # 6 tokens (4x fewer)
    docs = spark.createDataFrame(
        [(1, en_doc), (2, de_doc)], "doc_id int, text string"
    )
    rows = {
        r["lang_id"]: r
        for r in mixture_weights(docs, budget_tokens=1_000_000).collect()
    }
    assert set(rows) == {"en", "de"}
    assert rows["en"]["n_tokens"] == 4 * rows["de"]["n_tokens"]
    # sqrt law: exactly 2x the scaled sqrt, ~2x the ppm weight
    assert rows["en"]["sqrt_scaled"] == 2 * rows["de"]["sqrt_scaled"]
    total_ppm = sum(r["weight_ppm"] for r in rows.values())
    assert 1_000_000 - 2 <= total_ppm <= 1_000_000
    assert sum(r["alloc_tokens"] for r in rows.values()) <= 1_000_000
    assert rows["en"]["weight_ppm"] == 666666


def test_gap_quantize_bounds_value_domain(spark):
    """turn_gap_quantiles' 2-significant-digit quantization (r3 VERDICT
    weak fix): near-continuous µs gaps collapse to a value domain bounded
    by the DECADE STRUCTURE (≤ ~90 values/decade), never the corpus; the
    floor is exact integer math and ≤1% below the raw value."""
    from d1_log_aggregation_spark.operators.analytics import _quantize_sig

    df = spark.range(200_000).select(
        # spread across 10 decades: 0..10^11, near-unique raw values
        (
            F.pow(F.lit(10.0), (F.col("id") % 10).cast("double")).cast(
                "long"
            )
            * (F.col("id") % 977 + 1)
        ).alias("gap_us")
    )
    q = df.select(
        "gap_us", _quantize_sig(F.col("gap_us")).alias("gap_q")
    )
    n_raw = q.select("gap_us").distinct().count()
    n_quant = q.select("gap_q").distinct().count()
    assert n_raw > 5_000  # the raw domain really is near-continuous
    assert n_quant < 1_500  # bounded by the quantized domain
    bad = q.filter(
        (F.col("gap_q") > F.col("gap_us"))
        | (F.col("gap_q") < F.col("gap_us") - F.col("gap_us") / 10)
        # 2 sig digits => floor removes < 1 unit of the 2nd digit = <10%
        # of the leading digit; and for >= 3-digit values, < 1% + 1 unit
    ).count()
    assert bad == 0
    # exact spot values
    rows = {
        r["v"]: r["q"]
        for r in spark.createDataFrame(
            [(0,), (7,), (99,), (100,), (101,), (12345,), (999999999999,)],
            "v long",
        )
        .select("v", _quantize_sig(F.col("v")).alias("q"))
        .collect()
    }
    assert rows == {
        0: 0, 7: 7, 99: 99, 100: 100, 101: 100, 12345: 12000,
        999999999999: 990000000000,
    }


def test_rolling_distinct_users_contribution_explode(spark):
    """Exact trailing 7-day distinct users via contribution explode:
    hand-built vector where the rolling count is NOT the sum of dailies
    (overlapping users) and the window spans a calendar gap."""
    from d1_log_aggregation_spark.operators.analytics import (
        rolling_distinct_users,
    )

    rows = [
        # day 1: u1, u2    day 2: u2    day 9: u1 (outside 7d of day 1/2)
        ("c1", 0, "role_user", "user", "read", "u1", False, TS(2024, 1, 1)),
        ("c1", 1, "role_user", "user", "read", "u2", False, TS(2024, 1, 1)),
        ("c2", 0, "role_user", "user", "read", "u2", False, TS(2024, 1, 2)),
        ("c3", 0, "role_user", "user", "read", "u1", False, TS(2024, 1, 9)),
        ("c4", 0, "dlq", "user", "", "u9", False, TS(2024, 1, 1)),
    ]
    out = {
        r["day"].day: (r["n_users_1d"], r["n_users_7d"])
        for r in rolling_distinct_users(
            spark.createDataFrame(rows, _COLS)
        ).collect()
    }
    # day 1: {u1,u2}; day 2: daily {u2}, rolling {u1,u2} (u1 from day 1);
    # day 9: day 2's u2 is 7 days back (outside a 7-day trailing window
    # ending day 9: days 3..9), so rolling = {u1}; no row for gap days
    assert out == {1: (2, 2), 2: (1, 2), 9: (1, 1)}


def test_scd2_intervals(spark):
    """SCD2 build: valid_to chains to the next change, newest row is
    open + current, closed intervals measure whole days."""
    from d1_log_aggregation_spark.operators.scd import scd2_intervals

    rows = [
        (1, "n1", 1, TS(2024, 1, 1)),
        (1, "n1", 2, TS(2024, 1, 11)),
        (1, "n1", 3, TS(2024, 2, 1)),
        (2, "n2", 1, TS(2024, 1, 5)),
    ]
    df = spark.createDataFrame(
        rows, "registry_key int, node_id string, version int,"
        " valid_from timestamp"
    )
    out = {
        (r["registry_key"], r["version"]): r
        for r in scd2_intervals(df).collect()
    }
    assert out[(1, 1)]["valid_to"] == TS(2024, 1, 11)
    assert out[(1, 1)]["valid_days"] == 10
    assert not out[(1, 1)]["is_current"]
    assert out[(1, 2)]["valid_to"] == TS(2024, 2, 1)
    assert out[(1, 3)]["valid_to"] is None
    assert out[(1, 3)]["is_current"]
    assert out[(1, 3)]["valid_days"] is None
    assert out[(2, 1)]["is_current"]


def test_similar_docs_search_paths_agree(spark, tmp_path):
    """Inverted-index doc search: the scratch / prebuilt-index /
    lineage-persist paths return identical rankings, every hit really
    shares shingles with its query, and ranks are 1..k per query."""
    from d1_log_aggregation_spark.datapipe import dedup
    from d1_log_aggregation_spark.datapipe.search import similar_docs_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    key = lambda r: (r["query_id"], r["doc_id"], r["rank"])  # noqa: E731
    base = sorted(map(key, similar_docs_topk(docs).collect()))
    assert base, "search returned nothing"
    via_scratch = sorted(
        map(
            key,
            similar_docs_topk(
                docs, scratch_dir=str(tmp_path / "s")
            ).collect(),
        )
    )
    idx = str(tmp_path / "idx")
    dedup.write_shingle_index(docs, idx)
    via_index = sorted(
        map(key, similar_docs_topk(docs, index=idx).collect())
    )
    assert base == via_scratch == via_index
    # rank sanity: per query, ranks are exactly 1..n (n ≤ k)
    from collections import defaultdict

    per_q = defaultdict(list)
    for q, _, rank in base:
        per_q[q].append(rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # no self-hits
    assert all(q != d for q, d, _ in base)
    spark.catalog.clearCache()


def test_cms_overestimate_property_and_bound(spark):
    """Count-Min-Sketch invariants on the sf0.001 pipeline: the estimate
    NEVER undercounts (min over d rows of a cell the pid hashed into),
    and the overestimate stays within the ε·N w.h.p. bound
    (ε = e/width) with a generous ×4 slack — at width 256 vs ~1k events
    the bound is loose, but a hashing bug blows it by orders."""
    import math

    from d1_log_aggregation_spark.operators.analytics import (
        CMS_WIDTH,
        cms_pid_estimates,
    )
    from d1_log_aggregation_spark.oracle import (
        SF_REPEAT_INTERVAL_SECONDS,
    )
    from d1_log_aggregation_spark.pipeline import run_from_dir

    routed = run_from_dir(
        spark,
        SF_TINY,
        PipelineConfig(
            repeat_visit_interval_seconds=SF_REPEAT_INTERVAL_SECONDS,
            with_geohash=False,
        ),
    )
    rows = cms_pid_estimates(routed).collect()
    assert len(rows) == 20
    n_total = routed.filter(
        (F.col("sink") != "dlq") & (F.col("pid") != "")
    ).count()
    eps = math.e / CMS_WIDTH
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], r
        assert r["cms_estimate"] - r["exact_n"] <= 4 * eps * n_total, r
    # ranks are exactly 1..20, ordered by exact count
    assert sorted(r["rank"] for r in rows) == list(range(1, 21))


def test_tool_pmi_semantics(spark):
    """PMI = ln(n_pair·n_convs / (n_a·n_b)) over the conversation
    universe; tools that never share a conversation emit no row; empty/
    null tools are excluded; convs without tools still count in the
    universe."""
    import math

    from d1_log_aggregation_spark.operators.analytics import tool_pmi

    rows = [
        ("c1", 0, "u", "t", "A", None), ("c1", 1, "u", "t", "B", None),
        ("c2", 0, "u", "t", "A", None), ("c2", 1, "u", "t", "B", None),
        ("c2", 2, "u", "t", "A", None),   # duplicate tool: distinct-only
        ("c3", 0, "u", "t", "A", None),
        ("c4", 0, "u", "t", "C", None), ("c4", 1, "u", "t", "", None),
        ("c5", 0, "u", "t", None, None),  # toolless conv: in universe
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {(r["tool_a"], r["tool_b"]): r for r in tool_pmi(df).collect()}
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert (r["n_a"], r["n_b"], r["n_pair"], r["n_convs"]) == (3, 2, 2, 5)
    assert abs(r["pmi"] - math.log(2 * 5 / (3 * 2))) < 1e-12
