"""Sampling / sharding / sequence-packing semantics (datapipe.sampling).

The cross-engine value equality is covered by the oracle gate
(tests/test_oracle_gate.py); these tests pin the SEMANTIC contracts:
determinism across runs, rate accuracy, stratified drop behavior, shard
uniformity, and the concat-and-chunk packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from d1_log_aggregation_spark.datapipe import sampling

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bernoulli_rate_and_determinism(spark):
    docs = _docs(spark)
    n = docs.count()
    s1 = sampling.sample_bernoulli(docs, rate_ppm=200_000)
    k1 = s1.count()
    # hash-Bernoulli at 20%: binomial bounds, ±6 sigma at n=500
    assert abs(k1 / n - 0.2) < 0.11, (k1, n)
    # identical row set across executions (hash test, not rand())
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in sampling.sample_bernoulli(docs, rate_ppm=200_000)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2
    # different salt → different (but same-rate) subset
    ids3 = sorted(
        r.doc_id
        for r in sampling.sample_bernoulli(docs, rate_ppm=200_000, salt="s1")
        .select("doc_id")
        .collect()
    )
    assert ids1 != ids3


def test_bernoulli_monotone_in_rate(spark):
    """A row kept at rate r is kept at every rate > r (hash test is a
    threshold comparison) — the property that makes subsample ladders
    nested, which rand()-based sampling does not give you."""
    docs = _docs(spark)
    lo = {
        r.doc_id
        for r in sampling.sample_bernoulli(docs, 100_000).select("doc_id").collect()
    }
    hi = {
        r.doc_id
        for r in sampling.sample_bernoulli(docs, 400_000).select("doc_id").collect()
    }
    assert lo <= hi


def test_stratified_drops_unlisted_strata(spark):
    docs = _docs(spark)
    out = sampling.sample_stratified(docs, {"en": 1_000_000, "de": 0})
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}  # de rate 0, fr/es/zh unlisted → dropped
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # rate 1e6 keeps every en row


def test_shard_stats_covers_corpus_uniformly(spark):
    docs = _docs(spark)
    n = docs.count()
    stats = sampling.shard_stats(docs, n_shards=16).collect()
    assert sum(r.n_docs for r in stats) == n
    assert len(stats) == 16
    # uniform hash: no shard more than 3x the mean at n=500
    assert max(r.n_docs for r in stats) < 3 * (n / 16)


def test_pack_sequences_invariants(spark):
    docs = _docs(spark)
    budget = 512
    packed = sampling.pack_sequences(docs, budget=budget, n_shards=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc assigned exactly once
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in shard_rows:
            # offsets are the exact running token count in doc_id order
            assert r.chunk_id == offset // budget
            assert r.tok_in_chunk == offset % budget
            offset += r.n_tokens
    # manifest aggregates reconcile with the per-doc assignment
    man = sampling.pack_manifest(docs, budget=budget, n_shards=8)
    total = man.agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0]
    assert total[0] == len(rows)
    assert total[1] == sum(r.n_tokens for r in rows)


def test_corpus_split_disjoint_exhaustive_stable(spark):
    """Train/val/test split: every doc gets exactly one split, weights
    sum to 1e6 is enforced, the assignment is identical across runs, and
    an existing doc's split never moves when the corpus grows (the
    eval-set stability property of hash-based splits)."""
    import pytest as _pytest

    docs = _docs(spark)
    n = docs.count()
    a1 = {r.doc_id: r.split for r in sampling.corpus_split(docs).collect()}
    assert len(a1) == n and None not in a1.values()
    a2 = {r.doc_id: r.split for r in sampling.corpus_split(docs).collect()}
    assert a1 == a2
    # growth stability: assignments over a PREFIX subset are unchanged
    sub = docs.filter(F.col("doc_id") < 100)
    a_sub = {r.doc_id: r.split for r in sampling.corpus_split(sub).collect()}
    assert a_sub == {k: v for k, v in a1.items() if k < 100}
    # the dominant split dominates (98% train at n=500: ±6 sigma)
    frac = sum(1 for v in a1.values() if v == "train") / n
    assert frac > 0.93, frac
    with _pytest.raises(ValueError):
        sampling.split_assign(docs, {"train": 1, "val": 2})
