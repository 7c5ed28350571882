#!/usr/bin/env python
"""Dump `explain("formatted")` for named registry queries to files.

Usage: python tools/explain_dump.py <out_dir> <suffix> <query> [<query>...]

Writes <out_dir>/<query>_<suffix>.txt per query — the before/after plan
evidence the optimization rounds commit under plans/rNN/.  Queries whose
gate wrapper collect-detaches (scratch/materializer paths) are overridden
with the direct operator call so the REAL plan is dumped, mirroring
tools/plan_report.py's override table.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _overrides() -> dict:
    from pyspark.sql import functions as F

    from d1_log_aggregation_spark.datapipe import dedup, search, textstats
    from d1_log_aggregation_spark.datapipe.corpus import load_corpus

    import tempfile

    def _scratch(prefix: str) -> str:
        return tempfile.mkdtemp(prefix=prefix)

    return {
        # lineage-persist legs (the bench's dedup_corpus_deduped row)
        "corpus_deduped": lambda s, d: dedup.corpus_deduped(
            load_corpus(s, d), lineage_persist=True
        ),
        "corpus_deduped_lsh": lambda s, d: dedup.corpus_deduped_lsh(
            load_corpus(s, d), scratch_dir=_scratch("exp_lsh_")
        ),
        "similar_docs_topk": lambda s, d: search.similar_docs_topk(
            load_corpus(s, d), query_mod=10, scratch_dir=_scratch("exp_sd_")
        ),
        "simhash_pairs": lambda s, d: dedup.simhash_pairs(
            load_corpus(s, d), scratch_dir=_scratch("exp_shp_")
        ),
        # driver-loop trainer: dump the one distributed relation the loop
        # consumes (the (word, cnt) vocabulary aggregation)
        "bpe_merges_vocab": lambda s, d: textstats.merge_pair_counts(
            s.read.parquet(f"{d}/documents.parquet"), k=1
        ),
    }


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as m
    from d1_log_aggregation_spark.session import get_spark

    spark = get_spark(
        app_name="explain-dump", master="local[4]", shuffle_partitions=8
    )
    qs = m.queries()
    qs.update(_overrides())
    for name in names:
        spark.catalog.clearCache()
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
