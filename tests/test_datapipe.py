"""Training-data ops: planted-dup detection, ANN recall, multimodal
plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d1_log_aggregation_spark.datapipe import ann, dedup, multimodal
from d1_log_aggregation_spark.datapipe.corpus import load_corpus

SF = "/root/testdata/sf0.001"


def test_exact_dups_find_planted_copies(spark):
    corpus = load_corpus(spark, SF)
    n_docs = 500  # sf0.001 documents
    planted = len([i for i in range(n_docs) if i % 10 == 0])
    out = dedup.exact_duplicates(corpus).collect()
    # each planted copy forms a group of 2 → 2 rows per group
    assert len(out) == 2 * planted
    # canonical is always the original (lower doc_id)
    for r in out:
        assert r["canonical_id"] < n_docs


def test_near_dups_found_by_all_three_methods(spark):
    corpus = load_corpus(spark, SF)
    n_docs = 500
    near_ids = {(i, i + 2 * n_docs) for i in range(n_docs) if i % 17 == 0}

    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(corpus, threshold=0.5).collect()
    }
    assert near_ids <= jac or all(
        (a, b) in jac for a, b in near_ids
    ), f"jaccard missed {near_ids - jac}"

    mh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(corpus, threshold=0.5).collect()
    }
    # MinHash is probabilistic per banding, but near-identical docs
    # (jaccard ≳ 0.9) collide in at least one of 8 bands w.h.p.
    found = len([p for p in near_ids if p in mh])
    assert found >= 0.9 * len(near_ids), f"minhash found {found}/{len(near_ids)}"

    # SimHash: the 16-bit-band candidate generation must be COMPLETE for
    # hamming ≤ 3 (pigeonhole) — verify against exact hamming distances
    # (mask to 64 bits: simhash is a signed int64)
    mask64 = (1 << 64) - 1

    def hamming(x: int, y: int) -> int:
        return bin((x ^ y) & mask64).count("1")

    sh_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_pairs(corpus, max_hamming=3).collect()
    }
    sim = {r["doc_id"]: r["simhash"] for r in dedup.simhash(corpus).collect()}
    expected = {(a, b) for a, b in near_ids if hamming(sim[a], sim[b]) <= 3}
    assert expected <= sh_pairs, f"simhash banding missed {expected - sh_pairs}"
    # and no planted pair in the result exceeds the hamming bound
    for a, b in near_ids & sh_pairs:
        assert hamming(sim[a], sim[b]) <= 3
    # exact dup copies have hamming 0 → banding MUST catch all of them
    exact_ids = {(i, i + n_docs) for i in range(n_docs) if i % 10 == 0}
    assert exact_ids <= sh_pairs


def test_corpus_deduped_survivorship(spark):
    corpus = load_corpus(spark, SF)
    n_docs = 500
    survivors = {
        r["doc_id"]
        for r in dedup.corpus_deduped(corpus, threshold=0.5).collect()
    }
    jac_losers = {
        r["doc_b"]
        for r in dedup.jaccard_pairs(corpus, threshold=0.5).collect()
    }
    # planted exact copies (doc_id + N) always lose to the original
    exact_copies = {i + n_docs for i in range(n_docs) if i % 10 == 0}
    assert not exact_copies & survivors
    # near-dup copies with jaccard >= 0.5 lose too
    assert not jac_losers & survivors
    # every doc that is neither an exact copy nor a jaccard loser survives
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert survivors == all_ids - exact_copies - jac_losers


def test_ivf_recall_vs_brute_force(spark):
    """Trained (2-iteration integer k-means) centroids: recall floor 0.6
    at nprobe=4/16 — the r1 first-C-vectors stand-in gave uncontrolled
    recall; training makes the floor assertable."""
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = ann.brute_force_topk(embs, n_queries=8, k=5).collect()
    ivf = ann.ivf_topk(embs, n_queries=8, k=5, nprobe=4).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall {recall}"
    # exact scores agree where both found the neighbor
    bscore = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in bscore:
            assert bscore[key] == r["cosine"]


def test_training_corpus_materializer(spark):
    """Composed quality→dedup→metadata materializer: survivors passed the
    quality gate, planted exact copies of surviving originals are gone,
    and the originals themselves survive."""
    from d1_log_aggregation_spark.datapipe.textstats import with_textstats

    corpus = load_corpus(spark, SF)
    tc = dedup.training_corpus(corpus, threshold=0.5)
    rows = tc.collect()
    ids = {r["doc_id"] for r in rows}
    assert rows and set(rows[0].asDict()) == {
        "doc_id", "lang_id", "n_ws_tokens", "n_bpe_tokens",
        "fingerprint64", "text",
    }
    qids = {
        r["doc_id"]
        for r in with_textstats(corpus).filter("quality_ok").collect()
    }
    assert ids <= qids
    n = corpus.agg({"doc_id": "max"}).collect()[0][0] // 3 + 1  # base docs
    # every planted exact copy (doc_id+n of a %10 original) whose original
    # passed quality must be dropped, with the original surviving
    planted = {i + n for i in range(0, n, 10) if i in qids}
    assert planted and not (planted & ids)
    # composition glue: survivors == quality-kept minus survivorship
    # losers over the quality-kept subset (an original can itself be an
    # exact loser when base texts collide in the random corpus; the
    # independent cross-engine equivalence lives in the DuckDB gate)
    kept = corpus.join(
        spark.createDataFrame([(i,) for i in sorted(qids)], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    loser_ids = {r["doc_id"] for r in dedup.dedup_losers(kept).collect()}
    assert ids == qids - loser_ids


def test_sketch_udf_matches_expression(spark):
    """The Arrow-batched matmul sketch must be bit-identical to the
    pure-expression reference sketch (and hence to the DuckDB twin)."""
    from pyspark.sql import functions as F

    from d1_log_aggregation_spark.datapipe import vectors
    from d1_log_aggregation_spark.datapipe.ann import with_qvec

    base = with_qvec(vectors.load_vector_corpus(spark, SF)).select(
        "vec_id", "qvec"
    )
    diff = (
        base.withColumn("s_udf", vectors.sketch_udf_col(F.col("qvec")))
        .withColumn("s_expr", vectors._sketch_col(F.col("qvec")))
        .filter(F.col("s_udf") != F.col("s_expr"))
        .count()
    )
    assert diff == 0


def test_embedding_neardup_planted_pairs(spark):
    """The dup-planted vector corpus (perturbed copies at vec_id + N) must
    surface in the brute-force pairs, and the sign-sketch LSH path must
    (a) agree exactly with brute force on every pair it emits and
    (b) recall most planted pairs (banding is probabilistic)."""
    from d1_log_aggregation_spark.datapipe import vectors

    vc = vectors.load_vector_corpus(spark, SF)
    n = 500  # sf0.001 embeddings
    planted = {(i, i + n) for i in range(n) if i % 10 == 0}

    brute = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in vectors.embedding_neardup_bruteforce(vc, 0.9).collect()
    }
    assert planted <= set(brute), f"brute missed {planted - set(brute)}"

    lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in vectors.embedding_neardup_pairs(vc, 0.9).collect()
    }
    # verified candidates are a subset of brute with identical scores
    for k, v in lsh.items():
        assert brute[k] == v
    recall = len(set(lsh) & planted) / len(planted)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = multimodal.with_payload(docs)
    for row in media.orderBy("doc_id").take(5):
        assert isinstance(row["payload"], bytes)
        # container format: 4-byte header + (1 + doc_id%3) md5 blocks
        assert len(row["payload"]) == 4 + 16 * (1 + row["doc_id"] % 3)
        assert row["payload"][0] == multimodal.MAGIC
    feats = multimodal.multimodal_features(docs)
    out = feats.filter(F.col("doc_id") == 1).collect()[0]
    assert 0.0 <= out["feat_0"] <= 1.0
    assert out["channels"] == 3
    assert out["n_pix_bytes"] == 16 * (1 + 1 % 3)
    assert out["pix_min"] <= out["pix_mean"] <= out["pix_max"]
    # histogram is a partition of the pixel bytes
    hist_total = sum(
        out[f"hist_c{c}_b{b}"] for c in range(3) for b in range(4)
    )
    assert hist_total == out["n_pix_bytes"]
    assert feats.count() == docs.count()
    # real decoder path is stubbed
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, fake=False)


def test_wide_band_sketch_oracle_and_recall(spark):
    """Scale config for the sign-sketch LSH (n_planes=128, band_bits=32 —
    the band_bits ≳ log2(N)+8 tuning rule): must stay bit-identical to
    the DuckDB twin AND keep full recall of the planted near-dups."""
    from d1_log_aggregation_spark.datapipe import oracle as dpo
    from d1_log_aggregation_spark.datapipe import vectors

    from .oracle_harness import compare, duck_connection

    sf = "/root/testdata/sf0.001"
    vc = vectors.load_vector_corpus(spark, sf)
    wide = vectors.embedding_neardup_pairs(vc, 0.9, n_planes=128, band_bits=32)
    con = duck_connection(sf)
    duck = con.execute(
        dpo.embedding_neardup_pairs_sql(0.9, n_planes=128, band_bits=32)
    ).df()
    assert not compare("wide_sketch", wide, duck)
    brute = {
        (r.vec_a, r.vec_b)
        for r in vectors.embedding_neardup_bruteforce(vc, 0.9).collect()
    }
    lsh = {(r.vec_a, r.vec_b) for r in wide.collect()}
    assert brute, "planted near-dups missing from corpus"
    assert len(brute & lsh) / len(brute) >= 0.95


def test_corpus_deduped_lsh_survivorship(spark):
    """The LSH-path materializer drops the same exact copies as the
    inverted-index path and every LSH-verified near-dup loser; survivors
    are exactly corpus minus losers (min-canonical policy)."""
    corpus = load_corpus(spark, SF)
    n_docs = 500
    survivors = {
        r["doc_id"]
        for r in dedup.corpus_deduped_lsh(corpus, threshold=0.5).collect()
    }
    lsh_losers = {
        r["doc_b"]
        for r in dedup.minhash_lsh_pairs(corpus, threshold=0.5).collect()
    }
    exact_copies = {i + n_docs for i in range(n_docs) if i % 10 == 0}
    assert not exact_copies & survivors
    assert not lsh_losers & survivors
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert survivors == all_ids - exact_copies - lsh_losers


def test_corpus_deduped_scratch_matches_persist(spark, tmp_path):
    """r2 VERDICT item 4: the scratch_dir (materialized-index) path of
    both materializers returns the same survivors as the lineage-persist
    path, and its FINAL plan is cache-free — one docs scan anti-joined
    with one loser scan instead of 88/100 re-derived subtrees."""
    import re

    corpus = load_corpus(spark, SF)
    for fn, tag in (
        (dedup.corpus_deduped, "cd"),
        (dedup.corpus_deduped_lsh, "lsh"),
    ):
        # scratch first: the default path's persist() registers the
        # shared corpus plan in the cache manager, which would make the
        # scratch plan read InMemoryTableScan and defeat the assertion
        spark.catalog.clearCache()
        scratch = fn(
            corpus, threshold=0.5, scratch_dir=str(tmp_path / tag)
        )
        scratch_ids = {r["doc_id"] for r in scratch.collect()}
        default = {r["doc_id"] for r in fn(corpus, threshold=0.5).collect()}
        assert scratch_ids == default, tag
        phys = scratch._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in phys, tag
        # one corpus read (the synthetic test corpus is itself a
        # multi-scan union template with scalar subqueries) + one losers
        # scan — nothing re-derived: the r2 audit counted 88 (cd) / 100
        # (lsh) scans on the persist path, so pin an order-of-magnitude
        # collapse rather than a brittle absolute count
        n_scans = len(re.findall(r"Scan parquet", phys))
        assert n_scans < 25, f"{tag}: {n_scans} scans (r2 baseline 88+)"


def test_dedup_against_precomputed_index_round_trip(
    spark, tmp_path, monkeypatch
):
    """r2 VERDICT item 3: dedup_against fed the shingle index a previous
    run wrote (write_shingle_index parquet round-trip) agrees with the
    recompute-from-base path, both as a path and as a (postings, sizes)
    pair."""
    corpus = load_corpus(spark, SF)
    new_b = corpus.filter(F.col("doc_id") % 3 == 0)
    base_b = corpus.filter(F.col("doc_id") % 3 != 0)
    recomputed = {
        r["doc_id"]
        for r in dedup.dedup_against(new_b, base_b, threshold=0.5).collect()
    }
    idx_path = str(tmp_path / "base_index")
    dedup.write_shingle_index(base_b, idx_path)
    via_path = {
        r["doc_id"]
        for r in dedup.dedup_against(
            new_b, base_b, threshold=0.5, base_index=idx_path
        ).collect()
    }
    assert via_path == recomputed
    via_pair = {
        r["doc_id"]
        for r in dedup.dedup_against(
            new_b,
            base_b,
            threshold=0.5,
            base_index=dedup.read_shingle_index(spark, idx_path),
        ).collect()
    }
    assert via_pair == recomputed
    # full production path: base_index + scratch_dir (survivors and
    # near-losers materialized) — same answer, and the FINAL plan is
    # just the survivors scan anti-joined with the loser scan
    prod = dedup.dedup_against(
        new_b,
        base_b,
        threshold=0.5,
        base_index=idx_path,
        scratch_dir=str(tmp_path / "da_scratch"),
    )
    assert {r["doc_id"] for r in prod.collect()} == recomputed
    import re as _re

    # survivors + near_losers scans (the AQE plan string prints initial
    # and final sections, duplicating each scan)
    phys = prod._jdf.queryExecution().executedPlan().toString()
    assert len(_re.findall(r"Scan parquet", phys)) <= 4
    # ... and ZERO tokenization in the production final plan: all
    # shingling happened during the (index-fed) loser materialization
    assert "Generate explode" not in phys
    # the index-fed plan must read the WRITTEN index (parquet relation on
    # doc_id/sh) and shingle strictly less than the recompute plan (only
    # the new batch is ever exploded)
    fed = dedup.dedup_against(
        new_b, base_b, threshold=0.5, base_index=idx_path
    )
    fed_opt = fed._jdf.queryExecution().optimizedPlan().toString()
    rec_opt = (
        dedup.dedup_against(new_b, base_b, threshold=0.5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "sh#" in fed_opt and "parquet" in fed_opt
    assert fed_opt.count("Generate explode") < rec_opt.count(
        "Generate explode"
    )
    # r3 VERDICT item 9 — the decisive no-base-tokenization proof, at
    # the code level (plan text can't distinguish the base FINGERPRINT
    # scan, which is allowed, from base SHINGLING, which is not): with
    # base_index fed, _shingle_index runs exactly once, over the new
    # batch's survivors — never over base_docs
    shingled = []
    orig = dedup._shingle_index
    monkeypatch.setattr(
        dedup,
        "_shingle_index",
        lambda df, *a, **k: (shingled.append(df), orig(df, *a, **k))[1],
    )
    dedup.dedup_against(new_b, base_b, threshold=0.5, base_index=idx_path)
    assert len(shingled) == 1, "base corpus was re-shingled"


def test_ivf_recall_floor_and_nprobe_monotone(spark):
    """r2 VERDICT item 8: IVF recall ≥ 0.8 at sf0.01 (nprobe=4 of 16
    lists; 0.85 measured in r2), monotone non-decreasing in nprobe, and
    exactly 1.0 at nprobe == n_centroids (probing every list IS the
    brute-force scan)."""
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    brute = ann.brute_force_topk(embs, n_queries=8, k=5).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute}
    recalls = []
    for nprobe in (1, 4, 16):
        ivf = ann.ivf_topk(embs, n_queries=8, k=5, nprobe=nprobe).collect()
        got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
        recalls.append(len(truth & got) / len(truth))
    assert recalls[1] >= 0.8, recalls
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[2] == 1.0, recalls


def test_lsh_topk_finds_planted_copies(spark):
    """LSH-bucketed ANN over the dup-planted vector corpus: each planted
    copy (vec_id q+N for q % 10 == 0, cosine ≈ 0.999 to its original)
    must surface as its original's rank-1 neighbor — near-identical
    vectors agree on a band with overwhelming probability (miss-all-8
    ≈ 2e-8), and everything is deterministic md5-derived literals."""
    from d1_log_aggregation_spark.datapipe import vectors

    sf = "/root/testdata/sf0.01"
    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    vc = vectors.load_vector_corpus(spark, sf)
    out = ann.lsh_topk(vc, n_queries=11, k=3).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    for q in (0, 10):
        assert top1[q] == q + n, (q, top1.get(q))


def test_scratch_mode_leaves_no_session_persists(spark, tmp_path):
    """r3 VERDICT item 5: simhash_pairs and rare_token_stats with a
    scratch_dir must leave ZERO session-lifetime cached blocks (the
    persist path is only for exploratory sessions).  Equivalence with the
    persist path is asserted on the same corpus."""
    from d1_log_aggregation_spark.datapipe import dedup as dp_dedup
    from d1_log_aggregation_spark.datapipe import textstats as dp_text

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon shared common words"),
            (2, "alpha beta gamma delta epsilon shared common words"),
            (3, "totally different rare singleton tokens here now ok"),
            (4, "alpha beta gamma delta epsilon shared common words x"),
        ],
        "doc_id long, text string",
    )
    spark.catalog.clearCache()

    sp = dp_dedup.simhash_pairs(
        docs, max_hamming=3, scratch_dir=str(tmp_path / "sh")
    ).collect()
    rt = dp_text.rare_token_stats(
        docs, scratch_dir=str(tmp_path / "rt")
    ).collect()
    n_cached = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached == 0, f"{n_cached} persisted RDDs after scratch calls"

    # same answers as the persist path
    sp2 = dp_dedup.simhash_pairs(docs, max_hamming=3).collect()
    rt2 = dp_text.rare_token_stats(docs).collect()
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, sp)) == sorted(map(key, sp2))
    assert sorted(map(key, rt)) == sorted(map(key, rt2))
    spark.catalog.clearCache()


def test_audio_modality_decode_and_guards(spark):
    """Second container modality (r3 VERDICT item 7): int16 waveform
    decode semantics on a hand-built payload, plus the decode guards
    (short payload, zero channels, bad magic) on BOTH decoders
    (ADVICE r3)."""
    import struct

    samples = [100, -200, 300, -400, 0, -1, 7, -7]  # 5 sign changes
    payload = bytes([0xA1, 1, 2, 0]) + b"".join(
        struct.pack("<h", s) for s in samples
    )
    media = spark.createDataFrame(
        [(1, payload, 2)], "doc_id long, payload binary, rate_code int"
    )
    row = multimodal.extract_audio_features(media).collect()[0]
    assert row["sample_rate"] == 22050  # rate_code 2
    assert row["n_samples"] == len(samples)
    assert row["peak"] == 400
    assert row["n_zero_cross"] == sum(
        (a < 0) != (b < 0) for a, b in zip(samples, samples[1:])
    )
    assert abs(row["mean_s"] - sum(samples) / len(samples)) < 1e-9
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
    assert abs(row["rms"] - rms) < 1e-9
    assert row["duration_us"] == len(samples) * 1_000_000 // 22050

    import pytest as _pytest

    def run_audio(pl):
        bad = spark.createDataFrame(
            [(1, pl, 0)], "doc_id long, payload binary, rate_code int"
        )
        multimodal.extract_audio_features(bad).collect()

    with _pytest.raises(Exception, match="shorter"):
        run_audio(bytes([0xA1, 1]))
    with _pytest.raises(Exception, match="0 channels"):
        run_audio(bytes([0xA1, 0, 0, 0]) + b"\x00\x00")
    with _pytest.raises(Exception, match="magic"):
        run_audio(bytes([0xFF, 1, 0, 0]) + b"\x00\x00")
    with _pytest.raises(Exception, match="odd"):
        run_audio(bytes([0xA1, 1, 0, 0]) + b"\x00")
    # structurally valid 4-byte header with NO samples: mean/rms would be
    # NaN (0/0) while the DuckDB twin's inner join drops the doc — a
    # silent cross-engine divergence; the decoder must refuse (ADVICE r4)
    with _pytest.raises(Exception, match="empty waveform"):
        run_audio(bytes([0xA1, 1, 0, 0]))
    # the image decoder guards too (ADVICE r3: short payload / channels=0)
    def run_image(pl):
        bad = spark.createDataFrame(
            [(1, pl, 1, 1)],
            "doc_id long, payload binary, width int, height int",
        )
        multimodal.extract_features(bad).collect()

    with _pytest.raises(Exception, match="shorter"):
        run_image(bytes([0xD1, 3]))
    with _pytest.raises(Exception, match="0 channels"):
        run_image(bytes([0xD1, 0, 1, 1]) + bytes(range(16)))
    # real codec paths stay honestly stubbed
    with _pytest.raises(NotImplementedError):
        multimodal.extract_audio_features(media, fake=False)


def test_bigram_novelty_semantics(spark, tmp_path):
    """Bigram novelty on hand-built docs: shared sequences are not
    novel, reordered words are (the fluent-spam shape rare_token_stats
    can't see); scratch and persist paths agree; <2-token docs drop."""
    from d1_log_aggregation_spark.datapipe.textstats import bigram_novelty

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),      # all bigrams shared with 1
            (3, "fox brown quick the"),      # same WORDS, novel ORDER
            (4, "single"),                   # no bigrams → no row
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_novelty(docs).collect()}
    assert set(out) == {1, 2, 3}
    # docs 1/2 share every bigram (df=2 ≥ min_df) → nothing novel
    assert out[1]["n_bigrams"] == 3 and out[1]["n_novel"] == 0
    assert out[2]["n_novel"] == 0
    # doc 3's reversed bigrams are corpus-unique → all novel
    assert out[3]["n_bigrams"] == 3 and out[3]["n_novel"] == 3
    assert out[3]["novelty_ratio"] == 1.0
    spark.catalog.clearCache()
    via_scratch = {
        r["doc_id"]: tuple(r)
        for r in bigram_novelty(
            docs, scratch_dir=str(tmp_path / "bg")
        ).collect()
    }
    assert via_scratch == {k: tuple(v) for k, v in out.items()}
    n_cached = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached == 0

def test_split_leakage_semantics(spark):
    """Leakage audit on a corpus where doc A is copied into whichever
    split the hash puts it in: eval twins of train docs are flagged,
    disjoint-vocabulary eval docs are not, and train docs never appear
    in the output."""
    from d1_log_aggregation_spark.datapipe.dedup import split_leakage
    from d1_log_aggregation_spark.datapipe.sampling import split_assign

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base) for i in range(40)] + [
        (100 + i, f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d") for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # an even split keeps both sides populated at this tiny doc count
    # (the production default is train-heavy enough that 40 ids can all
    # hash into train)
    ppm = {"train": 500_000, "val": 250_000, "test": 250_000}
    splits = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, ppm).select("doc_id", "split").collect()
    }
    shared_train = [d for d in range(40) if splits[d] == "train"]
    shared_eval = [d for d in range(40) if splits[d] != "train"]
    assert shared_train and shared_eval, splits
    out = {
        r["doc_id"]: r
        for r in split_leakage(docs, splits_ppm=ppm, min_common=5).collect()
    }
    assert set(out) == {d for d, s in splits.items() if s != "train"}
    # 8 tokens → 6 distinct 3-shingles, all present in the train twins
    for d in shared_eval:
        assert out[d]["n_common_shingles"] == 6
        assert out[d]["is_leaked"]
    for d in out:
        if d >= 100:
            assert out[d]["n_common_shingles"] == 0
            assert not out[d]["is_leaked"]


def test_repetition_stats_semantics(spark):
    """Gopher repetition filters on hand-built docs: a doc with a
    repeated 5-gram gets the exact hand-computed coverage; the
    everything-repeats doc clamps at 1.0; single-token and
    whitespace-only docs hit the empty-gram / filtered edges; the
    DuckDB twin agrees bitwise (the synthetic corpus never repeats a
    5-gram, so the dup5 branch is only exercised here)."""
    import duckdb

    from d1_log_aggregation_spark.datapipe.textstats import (
        repetition_stats,
        repetition_stats_sql,
    )

    rows = [
        (1, "x y z w v x y z w v"),   # "x y z w v" twice → dup5 18/19
        (2, "a b c d e a b c d e a b c d e"),  # coverage sum > chars → 1.0
        (3, "single"),                # no 2/5-grams → top2 0, dup5 0
        (4, "   "),                   # tokenizes to nothing → dropped
        (5, "all distinct words here today friend"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 3, 5}
    # doc 1: 10 tokens / 5 distinct; 2-grams all cnt 2 len 3 → 6/19;
    # one duplicated 5-gram, cnt 2 × len 9 = 18 of 19 chars
    assert out[1]["n_tokens"] == 10
    assert out[1]["dup_word_frac"] == 0.5
    assert out[1]["top_2gram_frac"] == 6 / 19
    assert out[1]["dup_5gram_frac"] == 18 / 19
    # doc 2: overlapping duplicated 5-grams sum past the doc → clamp
    assert out[2]["dup_5gram_frac"] == 1.0
    # doc 3: no 2-grams (coalesce path), nothing duplicated
    assert out[3]["n_tokens"] == 1
    assert out[3]["dup_word_frac"] == 0.0
    assert out[3]["top_2gram_frac"] == 0.0
    assert out[3]["dup_5gram_frac"] == 0.0
    assert out[5]["dup_word_frac"] == 0.0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id bigint, text varchar)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {
        int(r[0]): r
        for r in con.execute(repetition_stats_sql()).fetchall()
    }
    assert set(oracle) == set(out)
    for did, r in out.items():
        o = oracle[did]
        assert (
            r["n_tokens"], r["dup_word_frac"], r["top_2gram_frac"],
            r["dup_5gram_frac"],
        ) == (o[1], o[2], o[3], o[4]), did


def test_repetition_stats_fold_matches_exploded_twin(spark):
    """The shuffle-free run-length-fold plan and the explode+groupBy
    twin are the same operator: identical output on docs hitting every
    branch (repeat runs, ties resolved to the longest gram, clamp,
    single-token, empty), and the fold plan contains NO Exchange —
    that absence is the point of the rewrite (the exploded plan
    shuffles every {1,2,5}-gram of the corpus)."""
    from d1_log_aggregation_spark.datapipe.textstats import (
        repetition_stats,
        repetition_stats_exploded,
    )

    rows = [
        (1, "x y z w v x y z w v"),
        (2, "a b c d e a b c d e a b c d e"),
        (3, "single"),
        (4, "   "),
        (5, "all distinct words here today friend"),
        # count tie between "aa bb" (2×, len 5) and "c c" (2×, len 3):
        # encoding must pick the LONGEST gram in both plans
        (6, "aa bb aa bb c c c"),
        (7, "p " * 600),  # long degenerate run, one distinct token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        repetition_stats(docs).collect(), key=lambda r: r["doc_id"]
    )
    b = sorted(
        repetition_stats_exploded(docs).collect(),
        key=lambda r: r["doc_id"],
    )
    assert len(a) == len(b) == 6
    for ra, rb in zip(a, b):
        assert ra["doc_id"] == rb["doc_id"]
        for c in (
            "n_tokens", "dup_word_frac", "top_2gram_frac",
            "dup_5gram_frac",
        ):
            assert abs((ra[c] or 0) - (rb[c] or 0)) < 1e-12, (
                ra["doc_id"], c,
            )
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_repetition_stats_fold_matches_python_model(spark):
    """200 seeded random docs from a tiny vocabulary (forcing heavy
    {1,2,5}-gram collisions) against an INDEPENDENT pure-Python model of
    the Gopher signals — unlike the exploded-twin test, this oracle
    shares no Spark plan, so a bug common to both Spark formulations
    (tokenization, tie-break encoding, clamp) cannot hide.  Float
    comparisons are exact: both sides divide the same int64 pairs."""
    import random
    from collections import Counter

    from d1_log_aggregation_spark.datapipe.textstats import (
        ENC_GLEN_MOD,
        repetition_stats,
    )

    rng = random.Random(60309)
    vocab = ["a", "bb", "ccc", "dd", "e", "fff", "g", "hh"]
    rows = []
    for did in range(200):
        m = rng.randint(0, 40)
        rows.append((did, " ".join(rng.choice(vocab) for _ in range(m))))

    def model(text):
        toks = [t for t in text.strip().lower().split() if t]
        if not toks:
            return None
        n = len(toks)
        chars = len(" ".join(toks))
        dup_word = (n - len(set(toks))) / n
        g2 = Counter(
            " ".join(toks[i : i + 2]) for i in range(n - 1)
        )
        top2_enc = max(
            (c * ENC_GLEN_MOD + len(g) for g, c in g2.items()), default=0
        )
        top2 = (top2_enc // ENC_GLEN_MOD) * (top2_enc % ENC_GLEN_MOD)
        g5 = Counter(
            " ".join(toks[i : i + 5]) for i in range(n - 4)
        )
        cover = sum(c * len(g) for g, c in g5.items() if c >= 2)
        return (
            n, dup_word, top2 / chars, min(1.0, cover / chars),
        )

    expected = {
        did: model(text) for did, text in rows if model(text) is not None
    }
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(got) == set(expected)
    for did, (n, dw, t2, d5) in expected.items():
        r = got[did]
        assert (
            r["n_tokens"], r["dup_word_frac"], r["top_2gram_frac"],
            r["dup_5gram_frac"],
        ) == (n, dw, t2, d5), did


def test_winnow_fingerprints_guarantees(spark):
    """Winnowing invariants (Schleimer et al. 2003): (1) coverage — the
    gap between consecutive selected positions is < w, so every window
    of w consecutive k-grams contributes a fingerprint; (2) any shared
    token run of length >= w+k-1 yields a shared fingerprint hash;
    (3) disjoint-vocabulary docs share nothing."""
    from d1_log_aggregation_spark.datapipe import textstats as ts

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"uno dos tres {shared} cuatro cinco seis"),
            (3, "completely different words nothing in common here at all"
                " more filler tokens so windows exist"),
        ],
        "doc_id long, text string",
    )
    fps = ts.winnow_fingerprints(docs).collect()
    by_doc: dict[int, list] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp_hash"]))
    # (1) coverage gap < w on every doc
    for doc_id, rows in by_doc.items():
        pos = sorted(p for p, _ in rows)
        assert pos[0] <= ts.WINNOW_W - 1 + ts.WINNOW_W - 1
        assert all(
            b - a < ts.WINNOW_W + ts.WINNOW_W for a, b in zip(pos, pos[1:])
        ), (doc_id, pos)
    # (2) docs 1 and 2 share the 8-token run (>= w+k-1 = 7) → shared hash
    h1 = {h for _, h in by_doc[1]}
    h2 = {h for _, h in by_doc[2]}
    h3 = {h for _, h in by_doc[3]}
    assert h1 & h2, "shared run produced no shared fingerprint"
    # (3) disjoint docs share nothing
    assert not (h1 & h3) and not (h2 & h3)


def test_paragraph_dedup_semantics(spark):
    """Segment-level exact dedup with block_tokens=3 so blocks are
    hand-computable: first corpus-wide occurrence (in (doc_id,
    block_idx) order) survives, later identical blocks anywhere —
    including within the SAME doc — are cut, docs are rewritten from
    kept blocks in order, and whitespace-only docs drop.  DuckDB twin
    agrees exactly."""
    import duckdb

    from d1_log_aggregation_spark.datapipe.dedup import paragraph_dedup
    from d1_log_aggregation_spark.datapipe.oracle import paragraph_dedup_sql

    rows = [
        (1, "a b c d e f"),        # blocks: "a b c", "d e f" — both first
        (2, "a b c x y z"),        # "a b c" dup of doc1, "x y z" kept
        (3, "d e f d e f d"),      # both "d e f" dup; tail "d" kept
        (4, "   "),                # tokenizes to nothing → dropped
        (5, "p q"),                # one short block, kept
        (6, "m n o m n o"),        # within-doc dup: 2nd block cut
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, block_tokens=3).collect()
    }
    assert set(out) == {1, 2, 3, 5, 6}
    assert (out[1]["n_blocks"], out[1]["n_dup_blocks"]) == (2, 0)
    assert out[1]["text_deduped"] == "a b c d e f"
    assert (out[2]["n_blocks"], out[2]["n_dup_blocks"]) == (2, 1)
    assert out[2]["text_deduped"] == "x y z"
    assert (out[3]["n_blocks"], out[3]["n_dup_blocks"]) == (3, 2)
    assert out[3]["text_deduped"] == "d"
    assert out[5]["text_deduped"] == "p q"
    assert (out[6]["n_blocks"], out[6]["n_dup_blocks"]) == (2, 1)
    assert out[6]["text_deduped"] == "m n o"

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id bigint, text varchar)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {
        int(r[0]): r
        for r in con.execute(
            paragraph_dedup_sql(block_tokens=3)
        ).fetchall()
    }
    assert set(oracle) == set(out)
    for did, r in out.items():
        o = oracle[did]
        assert (
            r["n_blocks"], r["n_dup_blocks"], r["text_deduped"]
        ) == (o[1], o[2], o[3]), did


def test_entropy_stats_semantics(spark):
    """Char-entropy quality proxy on hand-built docs: single-symbol doc
    is exactly +0.0 (the 0.0-minus-sum form), two equiprobable symbols
    give ln 2, out-of-alphabet chars land in the residual bucket, the
    whitespace-only doc drops, and the DuckDB twin agrees to 1e-12."""
    import math

    import duckdb

    from d1_log_aggregation_spark.datapipe.textstats import (
        entropy_stats,
        entropy_stats_sql,
    )

    rows = [
        (1, "aaaa"),   # one symbol → H = 0.0
        (2, "ab"),     # two equiprobable → ln 2
        (3, "a!"),     # '!' → other bucket
        (4, "   "),    # norm → "" → dropped
        (5, "a b"),    # space is its own symbol → ln 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in entropy_stats(docs).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["char_entropy"] == 0.0
    assert math.copysign(1.0, out[1]["char_entropy"]) == 1.0  # not -0.0
    assert (out[1]["n_chars"], out[1]["distinct_symbols"]) == (4, 1)
    assert abs(out[2]["char_entropy"] - math.log(2)) < 1e-12
    assert out[3]["distinct_symbols"] == 2
    assert out[3]["other_frac"] == 0.5
    assert abs(out[3]["char_entropy"] - math.log(2)) < 1e-12
    assert abs(out[5]["char_entropy"] - math.log(3)) < 1e-12
    assert out[5]["space_frac"] == 1 / 3

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id bigint, text varchar)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {
        int(r[0]): r for r in con.execute(entropy_stats_sql()).fetchall()
    }
    assert set(oracle) == set(out)
    for did, r in out.items():
        o = oracle[did]
        assert (r["n_chars"], r["distinct_symbols"]) == (o[1], o[2]), did
        for i, c in [(3, "char_entropy"), (4, "space_frac"),
                     (5, "other_frac")]:
            assert abs(r[c] - o[i]) < 1e-12, (did, c)


def test_lm_perplexity_semantics(spark):
    """Corpus-trained add-k bigram LM: the all-repeated-bigram doc has
    hand-computable cross-entropy -ln((c12+k)/(c1·+k·V)); docs with < 2
    tokens drop; the uniform doc1 scores lower (more fluent under its
    own LM) than the one-shot doc2; DuckDB twin agrees to 1e-9."""
    import math

    import duckdb

    from d1_log_aggregation_spark.datapipe.textstats import (
        LM_ADD_K,
        lm_perplexity,
        lm_perplexity_sql,
    )

    rows = [
        (1, "a b a b a b"),  # (a,b)x3 (b,a)x2
        (2, "a b c d"),      # one-shot bigrams
        (3, "x"),            # no bigram → dropped
        (4, "   "),          # dropped
        (5, "a a a a"),      # (a,a)x3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_perplexity(docs).collect()}
    assert set(out) == {1, 2, 5}
    # corpus: cb(a,a)=3, cb(a,b)=4, cb(b,a)=2, cb(b,c)=1, cb(c,d)=1
    # hist: c(a·)=7, c(b·)=3, c(c·)=1; V={a,b,c,d}=4
    k = LM_ADD_K
    exp5 = -math.log((3 + k) / (7 + k * 4))
    assert abs(out[5]["cross_entropy"] - exp5) < 1e-12
    assert abs(out[5]["ppl"] - math.exp(exp5)) < 1e-12
    assert out[1]["n_bigrams"] == 5 and out[2]["n_bigrams"] == 3
    assert out[1]["cross_entropy"] < out[2]["cross_entropy"]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id bigint, text varchar)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {
        int(r[0]): r for r in con.execute(lm_perplexity_sql()).fetchall()
    }
    assert set(oracle) == set(out)
    for did, r in out.items():
        o = oracle[did]
        assert r["n_bigrams"] == o[1], did
        assert abs(r["cross_entropy"] - o[2]) < 1e-9, did
        assert abs(r["ppl"] - o[3]) < 1e-9, did


def test_dedup_components_chain_converges_logarithmically(spark):
    """A 40-doc near-dup CHAIN (doc_i overlaps only doc_i±1 — the
    templated-boilerplate shape) has diameter 39: plain min-label
    propagation needs ~39 rounds, so max_iter=12 only converges because
    of the pointer-doubling shortcut (O(log diameter) rounds).  All 40
    docs must land in ONE component labeled by the min doc_id."""
    from d1_log_aggregation_spark.datapipe.dedup import dedup_components

    # doc_i = block_i ++ block_{i+1}, each block 6 unique tokens: with
    # k=3 shingles, adjacent docs share 4 of 16 distinct shingles
    # (J=0.25), docs 2+ apart share none.
    blocks = [
        " ".join(f"tk{i}x{j}" for j in range(6)) for i in range(41)
    ]
    rows = [(i, blocks[i] + " " + blocks[i + 1]) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_components(docs, threshold=0.2, max_iter=12).collect()
    assert len(out) == 40
    assert {r["component_id"] for r in out} == {0}


def test_corpus_mix_semantics(spark):
    """Composition audit on a hand-built corpus: cell counts, quality
    rates and token shares are exact; shares sum to 1; DuckDB twin
    agrees."""
    import duckdb

    from d1_log_aggregation_spark.datapipe.textstats import corpus_mix
    from d1_log_aggregation_spark.datapipe.oracle import corpus_mix_sql

    good = ("the quick brown fox jumps over the lazy dog and "
            "that is fine with everyone here today")  # 16 tokens, en
    junk = "!!! ??? !!! ??? !!!"
    rows = [
        (1, good, "en", "web", len(good)),
        (2, good + " again", "en", "web", len(good) + 6),
        (3, junk, "und", "web", len(junk)),
        (4, good, "en", "books", len(good)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = {(r["source"], r["lang_id"]): r
           for r in corpus_mix(docs).collect()}
    web_en = out[("web", "en")]
    assert (web_en["n_docs"], web_en["n_quality_ok"]) == (2, 2)
    books_en = out[("books", "en")]
    assert (books_en["n_docs"], books_en["n_quality_ok"]) == (1, 1)
    junk_cell = out[("web", "und")]
    assert junk_cell["n_quality_ok"] == 0
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-12

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id bigint, text varchar, "
        "lang varchar, source varchar, n_chars bigint)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows
    )
    oracle = {
        (r[0], r[1]): r for r in con.execute(corpus_mix_sql()).fetchall()
    }
    assert set(oracle) == set(out)
    for cell, r in out.items():
        o = oracle[cell]
        assert (r["n_docs"], r["n_quality_ok"], r["total_tokens"]) == (
            o[2], o[3], o[5]
        ), cell
        assert abs(r["quality_rate"] - o[4]) < 1e-12, cell
        assert abs(r["token_share"] - o[6]) < 1e-12, cell


def test_dup_ngram_stats_semantics(spark):
    """Planted duplicate 5-gram spans: a window is dup iff its gram
    occurs in >= 2 distinct docs; within-doc repetition alone is not dup;
    docs with < k tokens drop out; ppm is integer-exact."""
    from d1_log_aggregation_spark.datapipe.selection import dup_ngram_stats

    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    rows = [
        (1, shared + " zeta eta theta iota kappa"),   # 6 windows, 1 dup
        (2, "x1 x2 " + shared),                        # 3 windows, 1 dup
        (3, "solo only four tokens"),                  # < 5 tokens: drops
        (4, "r r r r r r"),                            # self-repeat only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_ngram_stats(docs).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (6, 1)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (3, 1)
    # doc 4: "r r r r r" twice over 2 window positions, but no OTHER doc
    # carries the gram -> zero dup
    assert (out[4]["n_windows"], out[4]["n_dup_windows"]) == (2, 0)
    assert out[1]["dup_ppm"] == 1_000_000 // 6
    assert out[2]["dup_ppm"] == 333_333


def test_dsir_weights_semantics(spark):
    """Target-domain lookalikes RANK above alien-vocab docs (the weight
    is a log-likelihood ratio: only ordering is meaningful — with add-1
    smoothing over B buckets the absolute sign is smoothing-dominated at
    toy scale); n_feats = token count - 1; sub-2-token docs drop out."""
    from d1_log_aggregation_spark.datapipe.selection import dsir_weights

    tgt = "good clean prose about science and careful measurement"
    alien = "zz9 qq8 vv7 kk6 jj5 hh4 gg3 ff2"
    rows = [
        (1, tgt, "en", "src0", len(tgt)),
        (2, tgt, "en", "src0", len(tgt)),
        (3, tgt, "en", "src9", len(tgt)),      # target lookalike
        (4, alien, "en", "src9", len(alien)),  # alien vocab
        (5, "one", "en", "src9", 3),           # 1 token: drops out
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = {r["doc_id"]: r for r in dsir_weights(docs, "src0").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_feats"] == len(tgt.split()) - 1
    assert out[3]["log_weight"] == out[1]["log_weight"]
    assert out[4]["log_weight"] < out[3]["log_weight"]
    # per-bucket ratio of a never-in-target bucket is strictly below a
    # target bucket's, so the alien doc's PER-FEATURE average is too
    assert (out[4]["log_weight"] / out[4]["n_feats"]
            < out[3]["log_weight"] / out[3]["n_feats"])


def test_kmeans_centroid_ceiling_guard(spark):
    """VERDICT r5 item 5: driver-resident centroid state is bounded by
    an explicit, byte-math-documented ceiling — asking for more raises
    before any job runs instead of silently growing the Arrow closure."""
    import pytest as _pytest

    from d1_log_aggregation_spark.datapipe import ann, vectors

    vc = vectors.load_vector_corpus(spark, SF)
    with _pytest.raises(ValueError, match="MAX_CENTROIDS"):
        ann.kmeans_centroids(vc, n_centroids=ann.MAX_CENTROIDS + 1)


def test_semdedup_prunes_planted_copies(spark):
    """Semantic dedup over the dup-planted vector corpus: (a) one output
    row per corpus vector, (b) for every planted (i, i+N) pair whose
    members land in the SAME cluster exactly the MORE-central member is
    dropped, (c) nothing outside the planted families is dropped (random
    64-dim vectors never reach cosine 0.95), (d) overall planted recall
    is high (clustering can split a pair across a boundary, so not 100%
    by construction)."""
    from d1_log_aggregation_spark.datapipe import vectors

    vc = vectors.load_vector_corpus(spark, SF)
    n = 500  # sf0.001 embeddings
    out = {
        r["vec_id"]: r
        for r in vectors.semdedup(vc, n_centroids=8, n_iters=2,
                                  eps=0.95).collect()
    }
    assert len(out) == n + n // 10

    planted = [(i, i + n) for i in range(n) if i % 10 == 0]
    co_clustered = [
        (a, b) for a, b in planted
        if out[a]["centroid_id"] == out[b]["centroid_id"]
    ]
    dropped = {v for v, r in out.items() if not r["kept"]}
    for a, b in co_clustered:
        assert (a in dropped) or (b in dropped)
        # the keep rule: the member MORE typical of the cluster goes
        ca, cb = out[a]["cos_centroid"], out[b]["cos_centroid"]
        loser = a if ca > cb else b
        assert loser in dropped
    # drops only ever come from planted families
    family = {v for pair in planted for v in pair}
    assert dropped <= family, dropped - family
    assert len(co_clustered) / len(planted) >= 0.8


def test_filter_funnel_semantics(spark):
    """Cumulative billing: a doc failing several rules is dropped at the
    FIRST failing stage; docs_in of stage k = docs_out of stage k-1; the
    final docs_out equals the corpus quality_ok count."""
    from d1_log_aggregation_spark.datapipe.textstats import (
        filter_funnel,
        with_textstats,
    )

    good = ("solid clean prose with enough plain words to pass every "
            "single quality gate easily")
    rows = [
        (1, good, "en", "s", len(good)),
        (2, good + " again and again", "en", "s", 1),
        (3, "too short", "en", "s", 9),                      # fails minlen
        (4, "!!! ??? ... ;;; ### $$$ %%% ^^^ &&& ***", "en", "s", 40),
        # ^ 10 tokens (passes minlen) but zero alpha: billed to alpha
        (5, "a b c d e f g h i j k l m n o p q r s t", "en", "s", 40),
        # ^ passes minlen+alpha+punct, mean_token_len 1.0: billed toklen
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = {r["stage"]: r for r in filter_funnel(docs).collect()}
    assert [out[s]["rule"] for s in (1, 2, 3, 4)] == [
        "minlen", "alpha", "punct", "toklen"
    ]
    assert out[1]["docs_in"] == 5 and out[1]["docs_out"] == 4
    assert out[2]["docs_in"] == 4 and out[2]["docs_out"] == 3
    assert out[3]["docs_in"] == 3 and out[3]["docs_out"] == 3
    assert out[4]["docs_in"] == 3 and out[4]["docs_out"] == 2
    assert out[1]["dropped"] == 1 and out[4]["survival_rate"] == 2 / 3
    n_ok = with_textstats(docs).filter("quality_ok").count()
    assert out[4]["docs_out"] == n_ok

    # chaining invariant on the real corpus too
    corpus = load_corpus(spark, SF)
    f = sorted(filter_funnel(corpus).collect(), key=lambda r: r["stage"])
    for prev, cur in zip(f, f[1:]):
        assert cur["docs_in"] == prev["docs_out"]


def test_token_fertility_semantics(spark):
    """Exact group sums: whitespace tokens, raw chars vs UTF-8 bytes
    (multibyte text must show bytes > chars), and ratio consistency."""
    from d1_log_aggregation_spark.datapipe.textstats import token_fertility

    t_en = "plain ascii words here"
    t_de = "schöne wörter über müden böden"
    rows = [
        (1, t_en, "en", "s0", len(t_en)),
        (2, t_en, "en", "s0", len(t_en)),
        (3, t_de, "de", "s1", len(t_de)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = {(r["lang"], r["source"]): r for r in token_fertility(docs).collect()}
    en, de = out[("en", "s0")], out[("de", "s1")]
    assert en["n_docs"] == 2 and de["n_docs"] == 1
    assert en["n_ws_tokens"] == 2 * len(t_en.split())
    assert de["n_ws_tokens"] == len(t_de.split())
    assert en["n_chars"] == 2 * len(t_en)
    assert en["n_bytes"] == 2 * len(t_en.encode())
    assert de["n_chars"] == len(t_de)
    assert de["n_bytes"] == len(t_de.encode()) > de["n_chars"]
    assert en["chars_per_ws_token"] == en["n_chars"] / en["n_ws_tokens"]
    assert de["bpe_per_ws_token"] == de["n_bpe_tokens"] / de["n_ws_tokens"]


def test_ann_recall_audit_matches_recomputation(spark):
    """The audit relation must equal the overlap recomputed from the two
    search paths it composes (same params), with n_brute = k here."""
    from d1_log_aggregation_spark.datapipe import ann

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    audit = {r["query_id"]: r for r in ann.recall_audit(embs).collect()}
    brute = ann.brute_force_topk(embs).collect()
    ivf = ann.ivf_topk(embs).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    vset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    for q, r in audit.items():
        n_b = sum(1 for x in bset if x[0] == q)
        n_o = sum(1 for x in bset & vset if x[0] == q)
        assert r["n_brute"] == n_b == 5
        assert r["n_overlap"] == n_o
        assert r["recall_at_k"] == n_o / n_b
        assert 0.0 <= r["recall_at_k"] <= 1.0


def test_dup_rate_by_segment_semantics(spark):
    """Dup attribution lands on the ORIGINAL's (source, lang) segment
    via the id mod-N lineage; near-dups (distinct text) do not count;
    n_groups = distinct fingerprints in the segment."""
    from d1_log_aggregation_spark.datapipe.dedup import dup_rate_by_segment

    docs = spark.createDataFrame(
        [
            (0, "aaa", "en", "s0", 3),
            (1, "bbb", "en", "s0", 3),
            (2, "ccc", "de", "s1", 3),
            (3, "ddd", "de", "s1", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = spark.createDataFrame(
        [
            (0, "aaa"), (1, "bbb"), (2, "ccc"), (3, "ddd"),
            (4, "aaa"),        # exact copy of doc 0 (orig = 4 % 4 = 0)
            (6, "ccc tail"),   # near-dup of doc 2: distinct fingerprint
        ],
        "doc_id long, text string",
    )
    out = {(r["source"], r["lang"]): r
           for r in dup_rate_by_segment(docs, corpus).collect()}
    s0, s1 = out[("s0", "en")], out[("s1", "de")]
    assert s0["n_docs"] == 3 and s0["n_dup_docs"] == 2
    assert s0["n_groups"] == 2 and s0["dup_ratio"] == 2 / 3
    assert s1["n_docs"] == 3 and s1["n_dup_docs"] == 0
    assert s1["n_groups"] == 3 and s1["dup_ratio"] == 0.0


def test_dup_rate_by_segment_guards(spark):
    """ADVICE r5: empty documents and non-dense ids must raise a clear
    error instead of TypeError / silent lineage mis-attribution."""
    import pytest as _pytest

    from d1_log_aggregation_spark.datapipe.dedup import dup_rate_by_segment

    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    corpus = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    empty = spark.createDataFrame([], schema)
    with _pytest.raises(ValueError, match="empty documents"):
        dup_rate_by_segment(empty, corpus)
    sparse = spark.createDataFrame(
        [(0, "aaa", "en", "s0", 3), (5, "bbb", "en", "s0", 3)], schema
    )
    with _pytest.raises(ValueError, match="dense"):
        dup_rate_by_segment(sparse, corpus)


def test_paragraph_dedup_position_bounds_guard(spark):
    """ADVICE r5: the int64 (doc_id, block_idx) position encoding is now
    enforced in the plan — a doc_id past 2^43 fails loudly instead of
    silently corrupting first-occurrence order."""
    import pytest as _pytest

    from d1_log_aggregation_spark.datapipe.dedup import paragraph_dedup

    bad = spark.createDataFrame(
        [((1 << 43) + 7, "a b c")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="position encoding"):
        paragraph_dedup(bad, block_tokens=3).collect()
    ok = spark.createDataFrame(
        [((1 << 43) - 1, "a b c")], "doc_id long, text string"
    )
    assert paragraph_dedup(ok, block_tokens=3).count() == 1


def test_containment_catches_wrapped_copy_jaccard_misses(spark):
    """A short doc embedded verbatim at the head of a much longer one:
    containment of the short side is exactly 1.0 while jaccard falls
    below the 0.5 near-dup bar — the boilerplate-wrapping case the
    symmetric detector structurally misses."""
    from d1_log_aggregation_spark.datapipe.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = " ".join(f"pad{i} word{i} extra{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)],
        "doc_id long, text string",
    )
    cont = containment_pairs(docs, threshold=0.8).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["cont_a_in_b"] == 1.0
    jac = r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
    assert jac < 0.5
    assert jaccard_pairs(docs, threshold=0.5).count() == 0


def test_video_frame_sampler_semantics(spark):
    """Row expansion = Σ ceil(n_frames/stride) with frame_idx 0, stride,
    …; a sampled frame's stats equal the hand-computed md5-block bytes;
    truncated frame sections are refused, never mis-gathered."""
    import hashlib

    import pytest

    from d1_log_aggregation_spark.datapipe import multimodal as mm

    docs = spark.createDataFrame(
        [(i, f"video doc {i}", "en", "s", 11) for i in range(12)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    out = mm.multimodal_video_frames(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(12):
        n_frames = i % 6 + 1
        expect_idx = list(range(0, n_frames, mm.VIDEO_STRIDE))
        got = sorted(r["frame_idx"] for r in by_doc[i])
        assert got == expect_idx, (i, got)
        assert all(r["fps"] == mm.VIDEO_FPS[i % 3] for r in by_doc[i])
    # hand-check frame 0 of doc 0 against the md5 contract
    h = hashlib.md5(b"video doc 0_f0").hexdigest()
    b = bytes.fromhex(h)
    r0 = next(r for r in by_doc[0] if r["frame_idx"] == 0)
    assert r0["frame_mean"] == sum(b) / mm.FRAME_BYTES
    assert r0["frame_min"] == min(b) and r0["frame_max"] == max(b)
    assert r0["f0"] == b[0] / 255.0

    # truncated frame section → hard refusal (no silent cross-row gather)
    good = mm.with_video_payload(docs).collect()
    bad = spark.createDataFrame(
        [(r["doc_id"], bytes(r["payload"])[:-3]) for r in good],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="length"):
        mm.extract_video_frames(bad).collect()


def test_resize_nearest_neighbor_semantics(spark):
    """res_i = pixel byte ⌊i·n_pix/target⌋ against a hand-built payload:
    correct gather at mixed widths, identity-ish when n_pix == target."""
    from d1_log_aggregation_spark.datapipe import multimodal as mm

    pix_a = bytes(range(16))           # n_pix 16: res_i = bytes[2i]
    pix_b = bytes(range(100, 132))     # n_pix 32: res_i = bytes[4i]
    header = bytes([mm.MAGIC, 3, 7, 7])
    media = spark.createDataFrame(
        [(1, header + pix_a), (2, header + pix_b)],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in mm.resize_images(media).collect()}
    for i in range(mm.RESIZE_TARGET):
        assert out[1][f"res_{i}"] == pix_a[(i * 16) // 8]
        assert out[2][f"res_{i}"] == pix_b[(i * 32) // 8]
    assert out[1]["n_pix_bytes"] == 16 and out[2]["n_pix_bytes"] == 32


def _bpe_python_twin(word_counts: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer (independent model, the
    repetition-fold pattern): same tie-break (count desc, left asc,
    right asc), same left-to-right non-overlapping merge application."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = (
                    pc.get((syms[i], syms[i + 1]), 0) + cnt
                )
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def test_bpe_merges_known_sequence_and_twin(spark):
    """VERDICT r6 item 6: the iterated BPE trainer on a crafted corpus
    with a known merge sequence, including the aaa/aaaa overlap vectors
    (left-to-right non-overlapping application), against the independent
    pure-Python twin."""
    from d1_log_aggregation_spark.datapipe import textstats

    docs_rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
        (4, "aaaa aaa aaaa"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    word_counts = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2,
        "aaa": 1,
    }
    expected = _bpe_python_twin(word_counts, 6)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"],
         r["n_occurrences"])
        for r in textstats.bpe_merges(docs, n_merges=6)
        .orderBy("merge_rank").collect()
    ]
    assert got == expected
    # overlap pin: the (a, a) merge counts 3·2 + 2·1 = 8 ADJACENT
    # occurrences (aaaa contributes 3 per copy, aaa contributes 2), and
    # the round after it sees [aa,aa]/[aa,a] — the non-overlapping
    # left-to-right application both engines must share
    aa = [m for m in got if (m[1], m[2]) == ("a", "a")]
    assert aa and aa[0][4] == 8


def test_bpe_merges_early_stop_on_single_char_vocab(spark):
    from d1_log_aggregation_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c a")], "doc_id long, text string"
    )
    out = textstats.bpe_merges(docs, n_merges=5).collect()
    assert out == []


def test_bpe_merges_local_matches_jobs_strategy(spark):
    """r8 optimization equivalence pin (VERDICT r7 item 1): the
    driver-local trainer (one distributed (word, cnt) agg + incremental
    in-memory merge loop) must produce the IDENTICAL merge table to the
    pre-r8 per-round Spark-job loop — on the real sf0.001 documents AND
    the crafted overlap corpus."""
    from d1_log_aggregation_spark.datapipe import textstats

    crafted = spark.createDataFrame(
        [
            (0, "low low low low low"),
            (1, "lower lower"),
            (2, "newest newest newest newest newest newest"),
            (3, "widest widest widest"),
            (4, "aaaa aaa aaaa"),
        ],
        "doc_id long, text string",
    )
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for docs, n in ((crafted, 6), (real, 8)):
        key = ["merge_rank", "left", "right", "merged", "n_occurrences"]
        local = [
            tuple(r[k] for k in key)
            for r in textstats.bpe_merges(docs, n_merges=n)
            .orderBy("merge_rank").collect()
        ]
        jobs = [
            tuple(r[k] for k in key)
            for r in textstats.bpe_merges(docs, n_merges=n, strategy="jobs")
            .orderBy("merge_rank").collect()
        ]
        assert local == jobs and len(local) == n


def test_bpe_merges_local_job_count_constant_in_n_merges(spark):
    """The scale property the r8 rewrite buys: Spark job count is O(1)
    in n_merges (the old loop launched 2 jobs per round — 30k-merge
    tokenizer builds were hours of job-launch latency by construction)."""
    from d1_log_aggregation_spark.datapipe import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("bpe_local_jobcount", "bpe local trainer")
    try:
        textstats.bpe_merges(docs, n_merges=64).collect()
    finally:
        sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup("bpe_local_jobcount")
    # the (word, cnt) aggregation's AQE stages (incl. the scan-repair
    # round-robin) + the local-relation materialization — a small
    # constant, independent of the 64 requested merge rounds (the r7
    # loop launched 2 jobs PER round)
    assert 0 < len(ids) <= 5


def test_bpe_encode_stats_matches_python_twin(spark):
    """Encode under the trained merges (bpe_encode_stats) vs a
    pure-Python twin on the known-merge-sequence corpus, including the
    aaa/aaaa overlap vectors and the integer-exact fertility_ppm."""
    from d1_log_aggregation_spark.datapipe import textstats

    docs_rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
        (4, "aaaa aaa aaaa"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    word_counts = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2,
        "aaa": 1,
    }
    merges = _bpe_python_twin(word_counts, 6)

    def n_pieces(word: str) -> int:
        syms = list(word)
        for _, a, b, _, _ in merges:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return len(syms)

    expected = {}
    for doc_id, text in docs_rows:
        ws = text.split()
        words = len(ws)
        pieces = sum(n_pieces(w) for w in ws)
        expected[doc_id] = (words, pieces, pieces * 1_000_000 // words)

    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["fertility_ppm"])
        for r in textstats.bpe_encode_stats(docs, n_merges=6).collect()
    }
    assert got == expected
    # the trained merges must actually compress: every doc's pieces are
    # strictly fewer than its characters (all these words merge)
    for doc_id, text in docs_rows:
        n_chars = sum(len(w) for w in text.split())
        assert got[doc_id][1] < n_chars


def test_corpus_drift_psi_known_values_and_null_case(spark):
    """PSI drift monitor on crafted corpora: identical sides give
    psi_term == 0 exactly (p_new == p_ref bucket-by-bucket), and a
    known lang shift reproduces the hand-computed Laplace-smoothed
    terms; per-feature sums are positive under drift."""
    import math

    from d1_log_aggregation_spark.datapipe import textstats

    rows = [(i, "x" * 50, "en", "s", 50) for i in range(8)]
    schema = "doc_id long, text string, lang string, source string," \
             " n_chars long"
    same = spark.createDataFrame(rows, schema)
    null_case = textstats.corpus_drift(same, same).collect()
    assert null_case and all(r["psi_term"] == 0.0 for r in null_case)

    # ref: 8 en; new: 4 en + 4 fr (all len bucket 0)
    new_rows = [(i, "x" * 50, "en" if i < 4 else "fr", "s", 50)
                for i in range(8)]
    new = spark.createDataFrame(new_rows, schema)
    out = {
        (r["feature"], r["bucket"]): r
        for r in textstats.corpus_drift(same, new).collect()
    }
    # lang domain = {en, fr}, B=2: p_ref(en)=(8+1)/10, p_new(en)=(4+1)/10
    def term(c_ref, c_new, ref_tot, new_tot, b):
        p_r = (c_ref + 1) / (ref_tot + b)
        p_n = (c_new + 1) / (new_tot + b)
        return (p_n - p_r) * math.log(p_n / p_r)

    assert out[("lang", "en")]["n_ref"] == 8
    assert out[("lang", "fr")]["n_ref"] == 0
    assert abs(out[("lang", "en")]["psi_term"]
               - term(8, 4, 8, 8, 2)) < 1e-12
    assert abs(out[("lang", "fr")]["psi_term"]
               - term(0, 4, 8, 8, 2)) < 1e-12
    psi_lang = sum(
        r["psi_term"] for (f, _), r in out.items() if f == "lang"
    )
    assert psi_lang > 0.25  # a 50% category shift reads as "shifted"
    # len_bucket feature saw no drift: identical length distributions
    assert abs(out[("len_bucket", "0")]["psi_term"]) < 1e-12


def test_bpe_encode_stats_accepts_pretrained_merges(spark):
    """The merges= reuse path: encoding under a HANDED-IN merge table
    must match training-inline, and must not rescan for training."""
    from d1_log_aggregation_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [(0, "ab ab ab"), (1, "abc")], "doc_id long, text string"
    )
    inline = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["fertility_ppm"])
        for r in textstats.bpe_encode_stats(docs, n_merges=2).collect()
    }
    pre = textstats.bpe_merges(docs, n_merges=2)
    reused = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["fertility_ppm"])
        for r in textstats.bpe_encode_stats(
            docs, merges=pre
        ).collect()
    }
    assert inline == reused
    # merge 1 is (a,b)->ab with 4 occurrences; "ab" becomes 1 piece
    assert inline[0] == (3, 3, 1_000_000)


def test_ivf_bigk_matches_small_ivf_recall_contract(spark):
    """ivf_topk_bigk at gate params: same output shape as ivf_topk,
    exact scores where brute force agrees, recall floor vs brute."""
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = ann.brute_force_topk(embs, n_queries=8, k=5).collect()
    bigk = ann.ivf_topk_bigk(
        embs, n_queries=8, k=5, n_fine=256, n_coarse=16,
        nprobe_coarse=2, nprobe_fine=8,
    ).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute}
    got = {(r["query_id"], r["neighbor_id"]) for r in bigk}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"bigk recall {recall}"
    bscore = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    for r in bigk:
        key = (r["query_id"], r["neighbor_id"])
        if key in bscore:
            assert bscore[key] == r["cosine"]


def test_ivf_bigk_beyond_max_centroids(spark):
    """VERDICT r6 item 2, the actual ceiling proof: n_fine PAST
    MAX_CENTROIDS runs as a relation join — no ValueError, no driver
    matrix — over a 110k-vector synthetic corpus (dim 4, deterministic).
    kmeans_centroids at the same k still raises (the closure path keeps
    its byte-math bound)."""
    import pytest as _pytest

    n = 110_000
    n_fine = ann.MAX_CENTROIDS + 1_000
    embs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.col("id") * (3 + d), 97) / 10.0 - 4.0)
                for d in range(4)
            ]
        ).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="MAX_CENTROIDS"):
        ann.kmeans_centroids(embs, n_centroids=n_fine)
    out = ann.ivf_topk_bigk(
        embs, n_queries=4, k=3, n_fine=n_fine, n_coarse=1024,
        nprobe_coarse=1, nprobe_fine=4,
    )
    rows = out.collect()
    assert 0 < len(rows) <= 4 * 3
    assert {r["query_id"] for r in rows} <= {0, 1, 2, 3}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 <= r["cosine"] <= 1.0
    ann.release_ivf_caches()


def test_ivf_cache_registry_bounded(spark):
    """ADVICE r6: repeated ivf_topk calls over DIFFERENT relations must
    not accumulate unbounded MEMORY_AND_DISK entries — the registry
    evicts past its bound and release_ivf_caches() frees the rest."""
    ann.release_ivf_caches()
    for seed in range(3):
        embs = spark.range(64).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    # +1+d keeps id=0 off the zero vector (ANSI
                    # divide-by-zero in the cosine norm)
                    (F.pmod(F.col("id") * (5 + d + seed) + 1 + d, 89)
                     / 10.0)
                    for d in range(4)
                ]
            ).alias("embedding"),
        )
        ann.ivf_topk(embs, n_queries=2, k=2, n_centroids=4, n_iters=1)
    assert len(ann._IVF_BASE_CACHES) <= ann._MAX_IVF_BASE_CACHES
    released = ann.release_ivf_caches()
    assert released <= ann._MAX_IVF_BASE_CACHES
    assert not ann._IVF_BASE_CACHES


def test_fused_centroid_assignment_matches_window_argmax(spark):
    """r8 optimization equivalence pin: the fused per-row argmax
    (ann.with_best_centroid — batched-matmul dots array + JVM
    array_max/array_position) must reproduce the r7 fan-out → window
    rank-1 assignment (ann._assign) exactly, winner id AND rounded
    cosine, on the real embeddings — including any rounded-cosine ties
    (tie-break centroid asc)."""
    from pyspark.sql import Window

    from d1_log_aggregation_spark.datapipe import ann

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = ann.with_qvec(embs).select("vec_id", "qvec", "qnorm2")
    cent_rows = ann._seed_centroid_rows(base, 16)

    old = {
        (r["vec_id"], r["centroid_id"])
        for r in ann._assign(base, cent_rows).collect()
    }
    new = {
        (r["vec_id"], r["centroid_id"])
        for r in ann.with_best_centroid(base, cent_rows)
        .select("vec_id", "centroid_id").collect()
    }
    assert new == old and len(new) == base.count()

    # winner cosine equality (semdedup's cos_centroid output)
    scored = ann.score_against_rows(base, cent_rows, "centroid_id").withColumn(
        "cosine", F.round(ann.cosine_col(), 9)
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id").asc()
    )
    old_cos = {
        r["vec_id"]: r["cosine"]
        for r in scored.withColumn("r", F.row_number().over(w))
        .filter("r = 1").collect()
    }
    new_cos = {
        r["vec_id"]: r["cos_centroid"]
        for r in ann.with_best_centroid(
            base, cent_rows, cos_col="cos_centroid"
        ).collect()
    }
    assert new_cos == old_cos

