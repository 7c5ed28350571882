"""Local reproduction of the driver's Spark-vs-DuckDB correctness gate at
sf0.001 (the driver runs sf0.01; sf0.001 keeps pytest fast — both were
validated interactively)."""

from __future__ import annotations

import pytest

from .oracle_harness import run_gate

SF = "/root/testdata/sf0.001"


def test_oracle_gate_all_queries(spark):
    results = run_gate(SF, spark)
    failures = {
        k: v
        for k, v in results.items()
        if v != ["OK"] and not (
            len(v) == 1 and v[0].startswith("(rows-only")
        )
    }
    assert not failures, failures
