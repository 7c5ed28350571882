#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan shape summary for the headline
queries (the machine-checkable version lives in tests/test_plan_shape.py;
this is the human-readable audit trail).

Usage: python tools/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

TARGETS = [
    "routed_rows",
    "sink_counts",
    "repeat_visits",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup_pairs",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "corpus_deduped",
    "pack_manifest",
    "corpus_sample",
    "shard_stats",
    "contamination_flags",
    "vocab_topk",
    "scrub_text",
    "session_stats",
    "dedup_against",
    "enrich_asof",
    "sink_role_rollup",
    "role_event_pivot",
    "conv_funnel",
    "token_quantiles",
    "corpus_deduped_lsh",
    "merge_pair_counts",
    "mixture_weights",
    "rolling_node_reads",
    "approx_distinct_subjects",
]

PATTERNS = {
    "exchanges": r"\bExchange \(",
    "broadcast_joins": r"BroadcastHashJoin",
    "sortmerge_joins": r"SortMergeJoin",
    "python_stages": (
        r"ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|"
        r"MapInPandas|BatchEvalPython"
    ),
    "cartesian": r"CartesianProduct",
    "scans": r"Scan parquet|BatchScan",
    "pushed_filters": r"PushedFilters: \[[^\]]",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as m
    from d1_log_aggregation_spark.session import get_spark

    spark = get_spark(
        app_name="plan-report", master="local[4]", shuffle_partitions=8
    )
    qs = m.queries()
    print("# PLANS — physical plan shapes (generated)")
    print()
    print(f"`python tools/plan_report.py {sf_dir}`; counts from")
    print('`df.explain("formatted")` (pre-AQE initial plan).  Guarded')
    print("invariants: no CartesianProduct anywhere; the pipeline's only")
    print("Python stage is the fused repeat-visit/geohash Arrow pass;")
    print("enrichment joins broadcast (see tests/test_plan_shape.py).")
    print()
    cols = list(PATTERNS)
    print("| query | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for name in TARGETS:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        counts = [str(len(re.findall(p, plan))) for p in PATTERNS.values()]
        print(f"| {name} | " + " | ".join(counts) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
