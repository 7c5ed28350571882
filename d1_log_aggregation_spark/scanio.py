"""Scan-parallelism repair for pathologically under-split inputs.

A parquet row group is Spark's minimum split unit: however small
``spark.sql.files.maxPartitionBytes`` or ``openCostInBytes`` are set, a
table written as one (or a few) row groups caps every downstream
narrow/map stage — tokenize→shingle→md5 pipelines, Arrow matmul UDFs,
the 38-symbol entropy expressions — at that parallelism, no matter how
many cores the cluster has.  The optimization guide's input-skew remedy
(§2.5: "one huge unsplittable file … Fix at the source if you can;
otherwise repartition immediately after the read") is exactly this
module: a deterministic round-robin repartition applied ONLY when the
planned scan parallelism is pathologically below the session's core
count.

Healthy inputs — any real table, which at 100 TB has 10⁵+ row groups —
pass through untouched, so production plans gain no exchange and the
scan-local/zero-shuffle invariants of the per-row operators hold
exactly as documented (tests/test_plan_shape.py pins them on
pre-distributed inputs).  The repair branch is decided driver-side from
plan metadata (no job), and round-robin repartition is
deterministic-on-retry because ``spark.sql.execution.sortBeforeRepartition``
stays at its default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Repair only when the input's planned parallelism is below this
# fraction of the session cores — i.e. the input is unsplittable-small
# (single-digit row groups), not merely slightly under-parallel.
_REPAIR_FACTOR = 0.5


def ensure_scan_parallelism(df: DataFrame, factor: float = _REPAIR_FACTOR) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism iff its planned partition count is below
    ``factor × defaultParallelism``; otherwise return it untouched.

    Values are invariant (only physical placement changes); every
    consumer in this package is partitioning-agnostic (keyed aggs,
    hash-keyed windows, per-row expressions, exact-integer Arrow
    partials)."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    floor = max(1, int(cores * factor))
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; never repair
        return df
    if parts >= floor:
        return df
    return df.repartition(cores)
