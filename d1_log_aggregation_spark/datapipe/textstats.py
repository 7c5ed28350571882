"""Text analysis over the documents table — the training-data-pipeline
operators a 100 TB corpus needs alongside the log pipeline: token counting,
quality scoring, language-ID, and document fingerprinting.

All JVM-side expressions (no Python in the hot path); every op has an exact
DuckDB oracle twin (the *_sql fragments).  Float outputs are ratios of
integer counts — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..scanio import ensure_scan_parallelism

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the standard byte-pair pre-split shape (public GPT-2 style, simplified
# to ASCII classes so Java and RE2 regex dialects agree).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

# language marker tokens (tiny n-gram/stopword heuristic; deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "is", "that", "with"],
    "es": ["el", "los", "las", "que", "y", "una"],
    "fr": ["le", "la", "les", "et", "que", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],  # pinyin-ish
}


def _norm(text: Column) -> Column:
    return F.lower(F.trim(text))


def _norm_ws(text: Column) -> Column:
    # single source of truth for whitespace-collapsing normalization:
    # vocab tokens must match the shingle/dedup tokenization exactly
    from .dedup import norm_text

    return norm_text(text)


def _count_re(text: Column, pattern: str) -> Column:
    return F.coalesce(
        F.regexp_count(text, F.lit(pattern)), F.lit(0)
    ).cast("long")


def with_textstats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds: n_ws_tokens, n_bpe_tokens, n_alpha, n_digit, n_punct,
    alpha_ratio, punct_ratio, stopword_ratio, mean_token_len, quality_ok.
    """
    docs = ensure_scan_parallelism(docs)
    t = _norm(F.col(text_col))
    n_ws = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")
    n_chars = F.length(t).cast("long")
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    out = docs.withColumns(
        {
            "n_ws_tokens": n_ws,
            "n_bpe_tokens": _count_re(F.col(text_col), BPE_TOKEN_RE),
            "n_alpha": _count_re(t, "[a-z]"),
            "n_digit": _count_re(t, "[0-9]"),
            "n_punct": _count_re(t, r"[^a-z0-9\s]"),
            "n_stopwords": _count_re(t, stop_re),
            "n_chars": n_chars,
        }
    )
    return out.withColumns(
        {
            # ratios of ints: bit-identical across engines
            "alpha_ratio": F.when(
                F.col("n_chars") > 0,
                F.col("n_alpha") / F.col("n_chars"),
            ).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(
                F.col("n_chars") > 0,
                F.col("n_punct") / F.col("n_chars"),
            ).otherwise(F.lit(0.0)),
            "stopword_ratio": F.when(
                F.col("n_ws_tokens") > 0,
                F.col("n_stopwords") / F.col("n_ws_tokens"),
            ).otherwise(F.lit(0.0)),
            "mean_token_len": F.when(
                F.col("n_ws_tokens") > 0,
                (F.col("n_chars") - F.col("n_ws_tokens") + 1)
                / F.col("n_ws_tokens"),
            ).otherwise(F.lit(0.0)),
        }
    ).withColumn(
        # Gopher/C4-style cheap quality gate
        "quality_ok",
        (F.col("n_ws_tokens") >= 10)
        & (F.col("alpha_ratio") > 0.5)
        & (F.col("punct_ratio") < 0.2)
        & (F.col("mean_token_len").between(2.0, 12.0)),
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID; argmax with deterministic (count desc,
    lang asc) tiebreak; 'und' when no marker fires."""
    t = _norm(F.col(text_col))
    out = docs
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        out = out.withColumn(f"_m_{lang}", _count_re(t, pat))
    langs = sorted(LANG_MARKERS)
    # argmax via greatest + case chain (stable asc-lang tiebreak)
    best = F.greatest(*[F.col(f"_m_{la}") for la in langs])
    expr = F.lit("und")
    for la in reversed(langs):
        expr = F.when(
            (best > 0) & (F.col(f"_m_{la}") == best), F.lit(la)
        ).otherwise(expr)
    # reversed chain means the FIRST lang alphabetically wins ties
    out = out.withColumn("lang_id", expr)
    return out.drop(*[f"_m_{la}" for la in langs])


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (the exact-dedup key), plus a 64-bit integer form."""
    norm = F.regexp_replace(_norm(F.col(text_col)), r"\s+", " ")
    fp = F.md5(norm)
    return docs.withColumns(
        {
            "fingerprint": fp,
            "fingerprint64": F.conv(F.substring(fp, 1, 15), 16, 10).cast(
                "long"
            ),
        }
    )


# Winnowing (MOSS-style local fingerprints, Schleimer et al. 2003): the
# whole-doc md5 above catches only EXACT duplicates; winnowing selects a
# guaranteed-coverage subset of k-gram hashes (at least one per window of
# w consecutive k-grams, the rightmost minimal one), so two docs sharing
# any run of ≥ w+k-1 tokens share a fingerprint — the partial-overlap /
# plagiarism detector the dedup family lacks.
WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 4  # k-grams per selection window
_WINNOW_POS_BITS = 26  # docs up to 2^26 k-grams; larger docs get chunked
_WINNOW_POS_MOD = 1 << _WINNOW_POS_BITS


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, pos, fp_hash): the winnowing fingerprint set.

    Pure window algebra — no Python: positional k-grams (posexplode,
    duplicates KEPT, unlike the dedup shingles), 32-bit md5 hash, and
    the rightmost-min rule encoded as ONE integer min over a ROWS
    window: key = hash·2^26 + (2^26-1-pos), so min(key) picks the
    smallest hash and, among ties, the LARGEST position — the winnowing
    spec's tiebreak — and decodes back to (hash, pos) losslessly.

    Scale shape: one shuffle on doc_id feeding a per-doc ordered window
    scan (parallel across docs, sequential within — inherent to any
    positional fingerprint).  Output ≈ 2/(w+1) of the k-gram stream.
    Docs beyond 2^26 k-grams must be pre-chunked (the encoding owns 26
    position bits); at that length chunking is what MOSS does anyway."""
    docs = ensure_scan_parallelism(docs)
    from .dedup import hash32, norm_text

    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(norm_text(F.col(text_col)), " "), lambda x: x != ""
        ).alias("tk"),
    )
    n = F.size(F.col("tk"))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("tk"), i + j) for j in range(k)]
    )
    kg = F.when(
        n >= k, F.transform(F.sequence(F.lit(1), n - (k - 1)), mk)
    ).otherwise(F.array().cast("array<string>"))
    hashed = toks.select(
        "doc_id", F.posexplode(kg).alias("pos", "kgram")
    ).select(
        "doc_id",
        "pos",
        (
            hash32(F.col("kgram")) * F.lit(_WINNOW_POS_MOD)
            + (F.lit(_WINNOW_POS_MOD - 1) - F.col("pos"))
        ).alias("key"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(w - 1), 0
    )
    sel = (
        hashed.withColumn("sel", F.min("key").over(win))
        .filter(F.col("pos") >= w - 1)  # full windows only
        .select("doc_id", "sel")
        .distinct()
    )
    return sel.select(
        "doc_id",
        (
            F.lit(_WINNOW_POS_MOD - 1)
            - F.pmod(F.col("sel"), F.lit(_WINNOW_POS_MOD))
        ).alias("pos"),
        F.expr(f"sel div {_WINNOW_POS_MOD}").alias("fp_hash"),
    ).orderBy("doc_id", "pos")


def winnow_fingerprints_sql(
    src: str = "documents",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    """DuckDB twin: same tokenization, md5 k-gram hash, and integer
    min-window encoding."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    parts = " || ' ' || ".join(f"tk[i+{j}]" for j in range(k))
    mod = _WINNOW_POS_MOD
    return f"""
WITH wtoks AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> x <> '') AS tk
  FROM {src}
),
wkg AS (
  SELECT doc_id, unnest(range(1, len(tk) - {k - 2})) AS i, tk
  FROM wtoks WHERE len(tk) >= {k}
),
whash AS (
  SELECT doc_id, i - 1 AS pos,
         try_cast(('0x' || substr(md5({parts}), 1, 8)) AS bigint)
           * {mod} + ({mod - 1} - (i - 1)) AS key
  FROM wkg
),
wwin AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
           AS sel
  FROM whash
)
SELECT DISTINCT doc_id,
       cast({mod - 1} - (sel % {mod}) AS bigint) AS pos,
       cast(sel // {mod} AS bigint) AS fp_hash
FROM wwin WHERE pos >= {w - 1}
ORDER BY doc_id, pos
"""


# ---- DuckDB oracle fragments ----------------------------------------------

def textstats_sql(text_col: str = "text") -> dict[str, str]:
    t = f"lower(trim({text_col}))"
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_ws = (
        f"CASE WHEN {t} = '' THEN 0 ELSE "
        f"len(regexp_split_to_array({t}, '\\s+')) END"
    )
    frag = {
        "n_ws_tokens": f"cast({n_ws} AS bigint)",
        "n_bpe_tokens": (
            f"cast(len(regexp_extract_all({text_col},"
            f" '{BPE_TOKEN_RE}')) AS bigint)"
        ),
        "n_alpha": f"cast(len(regexp_extract_all({t}, '[a-z]')) AS bigint)",
        "n_digit": f"cast(len(regexp_extract_all({t}, '[0-9]')) AS bigint)",
        "n_punct": (
            f"cast(len(regexp_extract_all({t}, '[^a-z0-9\\s]')) AS bigint)"
        ),
        "n_stopwords": (
            f"cast(len(regexp_extract_all({t}, '{stop_re}')) AS bigint)"
        ),
        "n_chars": f"cast(length({t}) AS bigint)",
    }
    return frag


def lang_id_sql(text_col: str = "text") -> str:
    t = f"lower(trim({text_col}))"
    cnt = {
        la: (
            f"len(regexp_extract_all({t},"
            f" '\\b(" + "|".join(m) + r")\b'))"
        )
        for la, m in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(cnt[la] for la in langs) + ")"
    whens = " ".join(
        f"WHEN {cnt[la]} = _best THEN '{la}'" for la in langs
    )
    # correlated form: compute best inline per row
    whens_inline = " ".join(
        f"WHEN {cnt[la]} = {best} THEN '{la}'" for la in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {whens_inline} ELSE 'und' END"


def fingerprint_sql(text_col: str = "text") -> dict[str, str]:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    fp = f"md5({norm})"
    return {
        "fingerprint": fp,
        "fingerprint64": f"try_cast(('0x' || substr({fp}, 1, 15)) AS bigint)",
    }


# ---- scrubbing + vocabulary -------------------------------------------------

# deliberately simple ASCII-class patterns so the Java and RE2/DuckDB
# dialects agree byte-for-byte
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII/URL scrubbing pass: emails → <EMAIL>, URLs → <URL>, bare IPv4s
    → <IP>; adds per-doc replacement counts.  Pure codegen'd
    regexp_replace/regexp_count — scan-local, no shuffle, the standard
    pre-training scrub stage."""
    docs = ensure_scan_parallelism(docs)
    t = F.col(text_col)
    return docs.withColumns(
        {
            "n_emails": _count_re(t, EMAIL_RE),
            "n_urls": _count_re(t, URL_RE),
            "n_ips": _count_re(
                F.regexp_replace(
                    F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                    URL_RE,
                    "<URL>",
                ),
                IPV4_RE,
            ),
            "scrubbed_text": F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                    URL_RE,
                    "<URL>",
                ),
                IPV4_RE,
                "<IP>",
            ),
        }
    )


def scrub_text_sql(src: str = "documents", text_col: str = "text") -> str:
    email, url, ip = EMAIL_RE, URL_RE, IPV4_RE
    no_email = f"regexp_replace({text_col}, '{email}', '<EMAIL>', 'g')"
    no_url = f"regexp_replace({no_email}, '{url}', '<URL>', 'g')"
    return f"""
SELECT *,
  cast(len(regexp_extract_all({text_col}, '{email}')) AS bigint)
    AS n_emails,
  cast(len(regexp_extract_all({text_col}, '{url}')) AS bigint) AS n_urls,
  cast(len(regexp_extract_all({no_url}, '{ip}')) AS bigint) AS n_ips,
  regexp_replace({no_url}, '{ip}', '<IP>', 'g') AS scrubbed_text
FROM {src}
"""


def vocab_topk(
    docs: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """(token, n_docs, n_occurrences, rank): the top-k corpus vocabulary
    by occurrence count — the frequency table tokenizer training and
    stopword selection start from.  Deterministic total order
    (count desc, token asc).  One explode + one groupBy(token); at
    corpus scale the groupBy output is vocabulary-sized (≪ corpus), and
    the top-k is a tree-aggregated TakeOrdered, not a global sort."""
    docs = ensure_scan_parallelism(docs)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(_norm_ws(F.col(text_col)), " "),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    # top-k FIRST via orderBy().limit(k) — a tree-aggregated TakeOrdered,
    # never a global sort of the whole vocabulary; the rank window then
    # runs over only k surviving rows (an unpartitioned window over the
    # full counts would Exchange SinglePartition the entire vocabulary)
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n_docs", "n_occurrences", "rank"
    )


def vocab_topk_sql(
    src: str = "documents", text_col: str = "text", k: int = 100
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS token FROM {src}
),
counts AS (
  SELECT token,
         cast(count(DISTINCT doc_id) AS bigint) AS n_docs,
         cast(count(*) AS bigint) AS n_occurrences
  FROM toks WHERE token <> '' GROUP BY token
)
SELECT token, n_docs, n_occurrences,
       cast(row_number() OVER (ORDER BY n_occurrences DESC, token ASC)
            AS bigint) AS rank
FROM counts
QUALIFY rank <= {k}
"""


def merge_pair_counts(
    docs: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """(pair, n_occurrences, rank ≤ k): adjacent-token-pair frequencies —
    the inner loop of BPE tokenizer training (each merge round promotes
    the most frequent adjacent pair).  Counts EVERY occurrence (not
    per-doc distinct — merge counts weight by frequency), deterministic
    (count desc, pair asc) order.

    Plan: tokenize scan-local into a materialized array column (an inline
    split inside the higher-order lambda would re-tokenize per element —
    see dedup.shingles_from_tokens), build adjacent pairs with
    transform/sequence (guarded: Spark's sequence(1, 0) DESCENDS), one
    explode + groupBy(pair), then tree-aggregated top-k — the same
    vocabulary-sized shapes as vocab_topk."""
    docs = ensure_scan_parallelism(docs)
    toks_col = F.filter(
        F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
    )
    with_toks = docs.select(F.col(text_col)).withColumn("_toks", toks_col)
    n = F.size(F.col("_toks"))
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("_toks"), i),
            F.element_at(F.col("_toks"), i + 1),
        ),
    )
    counts = (
        with_toks.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("pair")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("pair", "n_occurrences", "rank")


def merge_pair_counts_sql(
    src: str = "documents", text_col: str = "text", k: int = 50
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    toks = f"list_filter(string_split({norm}, ' '), x -> x <> '')"
    return f"""
WITH tok AS (SELECT {toks} AS t FROM {src}),
pairs AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS pair
  FROM tok
),
counts AS (
  SELECT pair, cast(count(*) AS bigint) AS n_occurrences
  FROM pairs GROUP BY pair
)
SELECT pair, n_occurrences,
       cast(row_number() OVER (ORDER BY n_occurrences DESC, pair ASC)
            AS bigint) AS rank
FROM counts
QUALIFY rank <= {k}
"""


# BPE merge application is a left-to-right non-overlapping fold over a
# word's symbol array.  The DuckDB twin applies the same merge on a
# sentinel-encoded string ("\x1f" || join(syms, "\x1f\x1f") || "\x1f",
# replace "\x1fa\x1f\x1fb\x1f" → "\x1fab\x1f") — non-overlapping
# left-to-right scan, bit-identical to the fold (pytest-pinned on the
# aaa/aaaa overlap vectors).  The sentinel must not appear in tokens;
# both sides DROP offending words (never silently mis-merge).
BPE_SEP = "\x1f"


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Fold: append each symbol, but when the accumulator tail == a and
    the current symbol == b, replace the tail with a+b.  The merged
    symbol can never re-match as `a` within the round (a == a+b is
    impossible for non-empty b) — the standard non-overlapping BPE
    application.  try_element_at, not element_at: the fold's FIRST step
    sees the empty accumulator, where ANSI element_at(acc, -1) throws
    INVALID_ARRAY_INDEX; try_element_at yields NULL, NULL == a is NULL,
    and the when() falls through to the append branch — exactly the
    no-tail semantics the scalar twin has."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _split_utf16_units(word: str) -> list[str]:
    """Character split matching Spark's ``F.split(word, "")`` exactly:
    Java splits per UTF-16 code unit, so a non-BMP character yields two
    lone-surrogate symbols.  For BMP/ASCII text this is the plain
    per-character list; the UTF-16 round trip keeps the driver-local
    trainer bit-identical to the old Spark-split path on any input."""
    if word.isascii():  # fast path — the overwhelmingly common case
        return list(word)
    enc = word.encode("utf-16-be", "surrogatepass")
    return [
        enc[i:i + 2].decode("utf-16-be", "surrogatepass")
        for i in range(0, len(enc), 2)
    ]


def _merge_word_local(syms: list[str], a: str, b: str) -> list[str]:
    """Driver-local twin of ``_apply_merge``: left-to-right
    non-overlapping fold (merge when accumulator tail == a and current
    symbol == b; the merged symbol never re-matches as ``a`` within the
    round)."""
    out: list[str] = []
    ab = a + b
    for x in syms:
        if out and x == b and out[-1] == a:
            out[-1] = ab
        else:
            out.append(x)
    return out


def train_bpe_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple]:
    """Driver-local BPE merge loop over a collected (word, cnt) vocab —
    the HF/sentencepiece trainer shape.  Incremental pair bookkeeping:
    each round touches only the words containing the winning pair, so
    30k–100k merges cost O(Σ affected-word length), not
    O(n_merges · |vocab|).  Returns (rank, left, right, merged, n)
    tuples under the engine tie-break (count desc, left asc, right asc —
    Python str comparison is code-point order == UTF-8 binary order,
    the same collation Spark's orderBy and DuckDB's ORDER BY use)."""
    words = [_split_utf16_units(w) for w, _ in word_counts]
    cnts = [c for _, c in word_counts]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set] = {}
    for i, syms in enumerate(words):
        c = cnts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        if not pair_counts:
            break
        (a, b), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, a, b, a + b, n))
        for i in sorted(pair_words.get((a, b), ())):
            syms = words[i]
            c = cnts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] == 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            new = _merge_word_local(syms, a, b)
            words[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)
        pair_words.pop((a, b), None)
    return merges


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    strategy: str = "local",
) -> DataFrame:
    """The iterated BPE tokenizer-training loop (VERDICT r6 item 6) —
    what ``merge_pair_counts`` (one round's pair census) stops short of.
    Returns the merge TABLE: (merge_rank, left, right, merged,
    n_occurrences), one row per round, ``merge_rank`` = 1-based round.

    Classic character-level BPE over the word-frequency vocabulary
    (Sennrich et al. 2016; the HF-tokenizers training loop):

    1. ONE corpus pass builds (word, cnt) — the only corpus-sized
       shuffle, map-side combining.
    2. ``strategy="local"`` (default, VERDICT r7 item 1): the bounded
       (word, cnt) relation — |vocab| ≪ corpus by Heaps' law, the
       operator's own design point — is COLLECTED and the merge loop
       runs driver-local with incremental pair bookkeeping
       (``train_bpe_local``), exactly what HF/sentencepiece trainers
       do.  Spark job count is O(1) in ``n_merges`` (one aggregation),
       so a real 30k–100k-merge tokenizer build no longer pays 30k+
       sequential job launches.  Tie-break (count desc, left asc, right
       asc) and the left-to-right non-overlapping merge application are
       bit-identical to the distributed rounds (pytest-pinned).
    3. ``strategy="jobs"``: the pre-r8 per-round Spark loop (explode
       pairs → partial agg → 1-row argmax collect → scan-local fold per
       round) — kept as the distributed reference twin for the
       equivalence pytest and for vocabularies too large to collect
       (past ``spark.driver.maxResultSize``).

    Driver state for "local" = the (word, cnt) list + symbol arrays —
    vocabulary-sized, the same bound the encoder side
    (``bpe_encode_stats``) already relies on for its distinct-word
    relation.  Stops early when no adjacent pair remains."""
    docs = ensure_scan_parallelism(docs)
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("word")
    )
    vocab = (
        toks.filter(~F.col("word").contains(BPE_SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = docs.sparkSession
    schema = (
        "merge_rank long, left string, right string, merged string,"
        " n_occurrences long"
    )
    if strategy == "local":
        word_counts = [(r["word"], r["cnt"]) for r in vocab.collect()]
        return spark.createDataFrame(
            train_bpe_local(word_counts, n_merges), schema
        )
    if strategy != "jobs":
        raise ValueError(f"unknown bpe_merges strategy: {strategy!r}")
    cur = vocab.select(
        F.split(F.col("word"), "").alias("syms"), "cnt"
    ).persist()
    merges: list[tuple] = []
    try:
        for r in range(1, n_merges + 1):
            n = F.size(F.col("syms"))
            idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
                F.array().cast("array<int>")
            )
            pairs = F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("left"),
                    F.element_at(F.col("syms"), i + 1).alias("right"),
                ),
            )
            top = (
                cur.select(F.explode(pairs).alias("p"), "cnt")
                .groupBy("p.left", "p.right")
                .agg(F.sum("cnt").alias("n_occurrences"))
                .orderBy(
                    F.desc("n_occurrences"), F.asc("left"), F.asc("right")
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["left"], top[0]["right"], top[0][
                "n_occurrences"
            ]
            merges.append((r, a, b, a + b, cnt))
            nxt = cur.select(
                _apply_merge(F.col("syms"), a, b).alias("syms"), "cnt"
            ).persist()
            nxt.count()  # materialize before dropping the parent cache
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(merges, schema)


def bpe_merges_sql(
    src: str = "documents", text_col: str = "text", n_merges: int = 8
) -> str:
    """Unrolled twin of ``bpe_merges`` (the kmeans-oracle pattern): N
    chained CTE rounds over the word-frequency vocabulary.  Merge
    application uses the sentinel string encoding (see BPE_SEP note);
    each round's winner is a 1-row CTE cross-joined into the rewrite."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    sep, dsep = BPE_SEP, BPE_SEP * 2
    ctes = [
        f"""toks AS (
  SELECT unnest(string_split({norm}, ' ')) AS word FROM {src}
),
vocab AS (
  SELECT word, cast(count(*) AS bigint) AS cnt FROM toks
  WHERE word <> '' AND NOT contains(word, '{sep}') GROUP BY word
),
syms0 AS (SELECT string_split(word, '') AS syms, cnt FROM vocab)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(f"""pairs{r} AS (
  SELECT t.l AS "left", t.r AS "right", cast(sum(cnt) AS bigint) AS n
  FROM syms{p}, unnest(list_transform(range(1, len(syms)),
       i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS u(t)
  GROUP BY t.l, t.r
),
top{r} AS (
  SELECT "left", "right", n FROM pairs{r}
  ORDER BY n DESC, "left" ASC, "right" ASC LIMIT 1
),
syms{r} AS (
  SELECT string_split(
           trim(replace('{sep}' || array_to_string(s.syms, '{dsep}')
                        || '{sep}',
                        '{sep}' || t.left || '{dsep}' || t.right
                        || '{sep}',
                        '{sep}' || t.left || t.right || '{sep}'),
                '{sep}'),
           '{dsep}') AS syms, s.cnt
  FROM syms{p} s CROSS JOIN top{r} t
)""")
    selects = "\nUNION ALL\n".join(
        f'SELECT cast({r} AS bigint) AS merge_rank, "left", "right",'
        f' "left" || "right" AS merged, n AS n_occurrences FROM top{r}'
        for r in range(1, n_merges + 1)
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT * FROM ({selects}) ORDER BY merge_rank
"""


def bpe_encode_stats(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    id_col: str = "doc_id",
    merges: DataFrame | None = None,
) -> DataFrame:
    """ENCODE under the trained tokenizer — the consumer side of
    ``bpe_merges`` (train → encode, the tokenizers ``encode()`` loop
    distributed).  Per doc: whitespace words, BPE pieces after applying
    the merge table in rank order, and the integer-exact fertility
    (pieces per word, ppm) — the trained-vocabulary upgrade of
    ``token_fertility``'s fixed regex tokenizer.

    Shape (the vocabulary-relation discipline):

    - the merge table is the TOKENIZER ARTIFACT: ``n_merges`` rows,
      collected to the driver (trained here by default; pass
      ``merges=`` to reuse a prior training run and skip its corpus
      pass).
    - merges apply to the DISTINCT-WORD relation, never per occurrence:
      ``n_merges`` chained scan-local array folds (``_apply_merge``)
      over |vocab| rows ⇒ (word, n_pieces).
    - the corpus side pre-aggregates to (doc, word, n_occ) BEFORE the
      vocab join — hot stopwords arrive at the join bounded by per-doc
      distinct vocabulary, the paragraph-dedup partial-agg pattern —
      then one hash join on ``word`` (broadcastable while the vocab
      fits; plain equi-join + AQE otherwise) and a per-doc rollup.
    - fertility_ppm = pieces·10⁶ div words (integer-exact, no libm).

    Words containing the ``BPE_SEP`` sentinel are excluded corpus-wide
    (the ``bpe_merges`` vocab filter — keeps the DuckDB twin's
    sentinel-string merge application exact).  Docs with no surviving
    words emit no row (both engines agree by inner-join construction).
    """
    docs = ensure_scan_parallelism(docs)
    mdf = merges if merges is not None else bpe_merges(
        docs, text_col, n_merges
    )
    merge_rows = sorted(mdf.collect(), key=lambda m: m["merge_rank"])

    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("word"),
    ).filter(~F.col("word").contains(BPE_SEP))
    dw = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("n_occ")
    )

    syms: Column = F.split(F.col("word"), "")
    for m in merge_rows:
        syms = _apply_merge(syms, m["left"], m["right"])
    enc = dw.select("word").distinct().select(
        "word", F.size(syms).cast("long").alias("pieces_per_word")
    )

    return (
        dw.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("pieces_per_word")).alias(
                "n_pieces"
            ),
        )
        .select(
            id_col,
            "n_words",
            "n_pieces",
            F.expr("n_pieces * 1000000L div n_words").alias(
                "fertility_ppm"
            ),
        )
    )


def bpe_encode_sql(
    src: str = "documents",
    text_col: str = "text",
    n_merges: int = 8,
    id_col: str = "doc_id",
) -> str:
    """Unrolled twin of ``bpe_encode_stats``: re-derives the merge table
    with ``bpe_merges_sql``'s CTE chain, then carries the WORD through
    the sentinel-string rewrite rounds so syms{N} is the encoded
    vocabulary, and rolls up per doc."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    sep, dsep = BPE_SEP, BPE_SEP * 2
    ctes = [
        f"""toks AS (
  SELECT unnest(string_split({norm}, ' ')) AS word FROM {src}
),
vocab AS (
  SELECT word, cast(count(*) AS bigint) AS cnt FROM toks
  WHERE word <> '' AND NOT contains(word, '{sep}') GROUP BY word
),
syms0 AS (SELECT word, string_split(word, '') AS syms, cnt FROM vocab)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(f"""pairs{r} AS (
  SELECT t.l AS "left", t.r AS "right", cast(sum(cnt) AS bigint) AS n
  FROM syms{p}, unnest(list_transform(range(1, len(syms)),
       i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS u(t)
  GROUP BY t.l, t.r
),
top{r} AS (
  SELECT "left", "right", n FROM pairs{r}
  ORDER BY n DESC, "left" ASC, "right" ASC LIMIT 1
),
syms{r} AS (
  SELECT s.word, string_split(
           trim(replace('{sep}' || array_to_string(s.syms, '{dsep}')
                        || '{sep}',
                        '{sep}' || t.left || '{dsep}' || t.right
                        || '{sep}',
                        '{sep}' || t.left || t.right || '{sep}'),
                '{sep}'),
           '{dsep}') AS syms, s.cnt
  FROM syms{p} s CROSS JOIN top{r} t
)""")
    ctes.append(
        f"enc AS (SELECT word, cast(len(syms) AS bigint) AS"
        f" pieces_per_word FROM syms{n_merges})"
    )
    ctes.append(f"""docw AS (
  SELECT {id_col}, word, cast(count(*) AS bigint) AS n_occ
  FROM (
    SELECT {id_col}, unnest(string_split({norm}, ' ')) AS word FROM {src}
  )
  WHERE word <> '' AND NOT contains(word, '{sep}')
  GROUP BY {id_col}, word
)""")
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT d.{id_col},
       cast(sum(d.n_occ) AS bigint) AS n_words,
       cast(sum(d.n_occ * e.pieces_per_word) AS bigint) AS n_pieces,
       cast(sum(d.n_occ * e.pieces_per_word) * 1000000
            // sum(d.n_occ) AS bigint) AS fertility_ppm
FROM docw d JOIN enc e USING (word)
GROUP BY d.{id_col}
"""


DRIFT_LEN_BUCKET_CHARS = 100
DRIFT_LEN_BUCKET_CAP = 20


def _drift_features(df: DataFrame, text_col: str, lang_col: str):
    """(feature, bucket) rows per doc — the bounded-bucket projection
    both corpus sides share.  len_bucket = min(len div 100, 20) keeps
    the domain ≤ 21 cells at any corpus size; lang is already a bounded
    code."""
    lb = F.least(
        F.length(F.col(text_col))
        / F.lit(DRIFT_LEN_BUCKET_CHARS),
        F.lit(DRIFT_LEN_BUCKET_CAP),
    ).cast("long")
    return df.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("len_bucket").alias("feature"),
                    lb.cast("string").alias("bucket"),
                ),
                F.struct(
                    F.lit("lang").alias("feature"),
                    F.col(lang_col).cast("string").alias("bucket"),
                ),
            )
        ).alias("fb")
    ).select("fb.feature", "fb.bucket")


def corpus_drift(
    ref: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Population-stability drift monitor between a REFERENCE corpus
    and a CANDIDATE batch — the data-quality gate a production training
    pipeline runs before admitting a new crawl/snapshot into the mix
    (the PSI dashboard; complements `corpus_mix`, which profiles one
    corpus, and `node_staleness`, which monitors recency).

    Per bounded feature (doc-length decile bucket, lang code), per
    bucket: both sides' counts and the PSI term
    ``(p_new − p_ref) · ln(p_new / p_ref)`` with Laplace +1 smoothing
    over the UNION bucket domain (no ln(0); an empty-on-one-side bucket
    contributes a finite, correctly-signed term).  Σ psi_term per
    feature is the classic PSI statistic (< 0.1 stable / 0.1–0.25
    drifting / > 0.25 shifted).

    Plan: each side is one scan-local bounded-bucket projection → ONE
    partial-aggregating shuffle to the (feature, bucket, side) cell
    relation (≤ |langs| + 21 rows) → per-feature totals via windows
    over that tiny relation.  Nothing downstream of the agg depends on
    corpus size; `F.log` ↔ DuckDB `ln` under the oracle's 1e-6 float
    tolerance (the dsir_weights / lm_perplexity precedent)."""
    cells = (
        _drift_features(ref, text_col, lang_col)
        .withColumn("side", F.lit("ref"))
        .unionByName(
            _drift_features(new, text_col, lang_col).withColumn(
                "side", F.lit("new")
            )
        )
        .groupBy("feature", "bucket")
        .agg(
            F.sum(F.when(F.col("side") == "ref", 1).otherwise(0)).alias(
                "n_ref"
            ),
            F.sum(F.when(F.col("side") == "new", 1).otherwise(0)).alias(
                "n_new"
            ),
        )
    )
    wf = Window.partitionBy("feature")
    tot = (
        cells.withColumn("ref_tot", F.sum("n_ref").over(wf))
        .withColumn("new_tot", F.sum("n_new").over(wf))
        .withColumn("n_buckets", F.count(F.lit(1)).over(wf))
    )
    p_ref = (F.col("n_ref") + 1) / (F.col("ref_tot") + F.col("n_buckets"))
    p_new = (F.col("n_new") + 1) / (F.col("new_tot") + F.col("n_buckets"))
    return tot.select(
        "feature",
        "bucket",
        "n_ref",
        "n_new",
        ((p_new - p_ref) * F.log(p_new / p_ref)).alias("psi_term"),
    )


def corpus_drift_sql(
    src: str = "documents",
    text_col: str = "text",
    lang_col: str = "lang",
    ref_pred: str = "doc_id % 2 = 0",
) -> str:
    """Twin of ``corpus_drift`` with ref/new = the parity split of
    ``src`` (the registry query's deterministic two-corpus stand-in)."""
    lb = (
        f"cast(least(length({text_col}) // {DRIFT_LEN_BUCKET_CHARS},"
        f" {DRIFT_LEN_BUCKET_CAP}) AS varchar)"
    )
    return f"""
WITH sides AS (
  SELECT *, CASE WHEN {ref_pred} THEN 'ref' ELSE 'new' END AS side
  FROM {src}
),
fb AS (
  SELECT side, 'len_bucket' AS feature, {lb} AS bucket FROM sides
  UNION ALL
  SELECT side, 'lang' AS feature, cast({lang_col} AS varchar) AS bucket
  FROM sides
),
cells AS (
  SELECT feature, bucket,
         cast(sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS bigint)
           AS n_ref,
         cast(sum(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS bigint)
           AS n_new
  FROM fb GROUP BY feature, bucket
),
tot AS (
  SELECT *,
         sum(n_ref) OVER (PARTITION BY feature) AS ref_tot,
         sum(n_new) OVER (PARTITION BY feature) AS new_tot,
         count(*) OVER (PARTITION BY feature) AS n_buckets
  FROM cells
)
SELECT feature, bucket, n_ref, n_new,
       ((n_new + 1) * 1.0 / (new_tot + n_buckets)
        - (n_ref + 1) * 1.0 / (ref_tot + n_buckets))
       * ln(((n_new + 1) * 1.0 / (new_tot + n_buckets))
            / ((n_ref + 1) * 1.0 / (ref_tot + n_buckets))) AS psi_term
FROM tot
"""


QUANTILE_PCTS = [50, 90, 99]


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pcts: list[int] | None = None,
    count_alias: str = "n_rows",
) -> DataFrame:
    """Generic TWO-PASS exact grouped quantiles — the scale-safe plan
    shape token_quantiles pioneered, factored out for reuse (inter-turn
    gaps, latency profiles, any integer metric): pass 1 is a map-side-
    combining groupBy (group, value) — the only input-sized shuffle;
    pass 2 windows over the DISTINCT-VALUE relation for the cumulative
    count and picks min{v : cum(v) ≥ ceil(p·n/100)} — exactly the rank-r
    order statistic, never a group-sized sort task.  Integer-only rank
    arithmetic: both engines agree bit-for-bit.

    PRECONDITION (r3 VERDICT): per-group DISTINCT-VALUE cardinality must
    be ≪ corpus size — pass 2's per-group window sorts one task per
    group.  True for bounded counts (BPE token counts top out in the
    thousands); FALSE for near-continuous values (raw µs gaps).  Callers
    with near-continuous values must quantize first to a declared
    resolution (see analytics.turn_gap_quantiles / _quantize_sig, which
    bounds the domain to ~90 values per decade) or range-partition the
    rank."""
    pcts = pcts or QUANTILE_PCTS
    vc = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    cum = vc.select(
        group_col,
        value_col,
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(group_col)).alias("cnt"),
    )
    aggs = [F.max("cnt").alias(count_alias)]
    for p in pcts:
        target = F.floor((F.lit(p) * F.col("cnt") + 99) / 100)
        aggs.append(
            F.min(
                F.when(F.col("cum") >= target, F.col(value_col))
            ).alias(f"p{p}")
        )
    return cum.groupBy(group_col).agg(*aggs)


def token_quantiles(
    docs: DataFrame, text_col: str = "text", pcts: list[int] | None = None
) -> DataFrame:
    """(lang_id, n_docs, p50, p90, p99): EXACT per-language quantiles of
    the BPE token count — the corpus length profile a training pipeline
    reports per language before packing.

    Exact discrete quantile, deterministically: the value at sorted rank
    ceil(p·n/100) per language — integer-only arithmetic, so both engines
    agree bit-for-bit (approx sketches like percentile_approx/t-digest
    are NOT cross-engine reproducible; see approx_distinct_subjects for
    the sketch-flavored rows-only op).

    TWO-PASS EXACT RANK (r2 VERDICT fix — the previous
    Window.partitionBy(lang_id) sort put an entire language's documents
    in ONE task; at 10^12 rows that task never finishes):
    pass 1 is a map-side-combining groupBy (lang_id, n_bpe_tokens) —
    the only corpus-sized shuffle, fully parallel; pass 2 windows over
    the DISTINCT-VALUE relation (≤ max token count rows per language —
    thousands, not corpus-sized) for the cumulative count, then picks
    the smallest value whose cumulative count covers the target rank.
    Identical result: the rank-r order statistic is exactly
    min{v : cum(v) ≥ r}.  The DuckDB oracle deliberately keeps the
    row_number() formulation — independent derivation, same answer."""
    docs = ensure_scan_parallelism(docs)
    pcts = pcts or QUANTILE_PCTS
    stats = with_lang_id(with_textstats(docs, text_col), text_col)
    return grouped_exact_quantiles(
        stats, "lang_id", "n_bpe_tokens", pcts, count_alias="n_docs"
    )


def token_quantiles_sql(
    src: str = "documents", pcts: list[int] | None = None
) -> str:
    pcts = pcts or QUANTILE_PCTS
    ts = textstats_sql()
    sel = ",\n       ".join(
        f"max(CASE WHEN rn = cast(floor(({p} * cnt + 99) / 100) AS bigint)"
        f" THEN n_bpe_tokens END) AS p{p}"
        for p in pcts
    )
    return f"""
WITH st AS (
  SELECT doc_id, {ts['n_bpe_tokens']} AS n_bpe_tokens,
         {lang_id_sql()} AS lang_id
  FROM {src}
),
ranked AS (
  SELECT lang_id, n_bpe_tokens,
         cast(row_number() OVER (
           PARTITION BY lang_id ORDER BY n_bpe_tokens, doc_id) AS bigint)
           AS rn,
         cast(count(*) OVER (PARTITION BY lang_id) AS bigint) AS cnt
  FROM st
)
SELECT lang_id, max(cnt) AS n_docs,
       {sel}
FROM ranked GROUP BY lang_id
"""


def doc_keywords(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, token, tf, df, rank ≤ k): each document's characteristic
    terms — highest term frequency, ties broken by LOWEST document
    frequency (rarer = more characteristic), then token.  The
    keyword-extraction shape of TF-IDF with an integer-only ranking key,
    so both engines order identically with no float log in sight.

    Plan: one explode → (doc, token) counts → broadcast-join the (small,
    vocabulary-sized) df table → per-doc window top-k.  The window
    partitions by doc_id (high-cardinality, skew-free)."""
    docs = ensure_scan_parallelism(docs)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(_norm_ws(F.col(text_col)), " "),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(dfreq, "token")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "rank")
    )


def doc_keywords_sql(
    src: str = "documents", text_col: str = "text", k: int = 3
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS token FROM {src}
),
tf AS (
  SELECT doc_id, token, cast(count(*) AS bigint) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, cast(count(*) AS bigint) AS df FROM tf GROUP BY token
)
SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
       cast(row_number() OVER (
         PARTITION BY tf.doc_id
         ORDER BY tf.tf DESC, dfreq.df ASC, tf.token ASC) AS bigint)
         AS rank
FROM tf JOIN dfreq ON tf.token = dfreq.token
QUALIFY rank <= {k}
"""


MIX_SQRT_SCALE = 1000  # sqrt fixed-point scale (3 decimal digits)
MIX_PPM = 1_000_000


def mixture_weights(
    docs: DataFrame,
    text_col: str = "text",
    budget_tokens: int = 10_000_000,
) -> DataFrame:
    """(lang_id, n_docs, n_tokens, sqrt_scaled, weight_ppm, alloc_tokens):
    temperature-based sampling weights per language — the corpus-mixing
    step of a pretraining pipeline (upsample tail languages, downsample
    the head; multilingual-LM "temperature sampling", T = 0.5).

    T is FIXED at 0.5 because sqrt is the one power IEEE 754 requires to
    be correctly rounded — both engines produce the bit-identical double
    for the same bigint token count, so ``floor(sqrt(n)·1000)`` is
    cross-engine exact.  From there everything is int64: the normalizer
    is an integer sum (order-independent, unlike a double sum) and the
    weights/allocations use integer division.  A general-T variant would
    need ``pow``, whose last-ulp differences across libms break
    value-hash reproducibility — the same reason token_quantiles is exact
    instead of t-digest.

    Plan shape: one corpus shuffle (groupBy lang_id); the normalizing
    window runs over the #languages-sized aggregate, a single tiny
    partition by construction."""
    docs = ensure_scan_parallelism(docs)
    stats = with_lang_id(with_textstats(docs, text_col), text_col)
    grp = stats.groupBy("lang_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("n_tokens"),
    )
    scaled = grp.withColumn(
        "sqrt_scaled",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double")) * MIX_SQRT_SCALE
        ).cast("long"),
    )
    tot_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = scaled.withColumn("_total", F.sum("sqrt_scaled").over(tot_w))
    weight = F.expr(f"sqrt_scaled * {MIX_PPM} div _total")
    return scaled.select(
        "lang_id",
        "n_docs",
        "n_tokens",
        "sqrt_scaled",
        weight.alias("weight_ppm"),
        F.expr(
            f"(sqrt_scaled * {MIX_PPM} div _total)"
            f" * {budget_tokens} div {MIX_PPM}"
        ).alias("alloc_tokens"),
    )


def mixture_weights_sql(
    src: str = "documents",
    text_col: str = "text",
    budget_tokens: int = 10_000_000,
) -> str:
    ts = textstats_sql(text_col)
    return f"""
WITH st AS (
  SELECT {ts['n_bpe_tokens']} AS n_bpe_tokens,
         {lang_id_sql(text_col)} AS lang_id
  FROM {src}
),
grp AS (
  SELECT lang_id, cast(count(*) AS bigint) AS n_docs,
         cast(sum(n_bpe_tokens) AS bigint) AS n_tokens
  FROM st GROUP BY lang_id
),
sc AS (
  SELECT *, cast(floor(sqrt(cast(n_tokens AS double)) * {MIX_SQRT_SCALE})
                 AS bigint) AS sqrt_scaled
  FROM grp
)
SELECT lang_id, n_docs, n_tokens, sqrt_scaled,
       cast(sqrt_scaled * {MIX_PPM} // sum(sqrt_scaled) OVER ()
            AS bigint) AS weight_ppm,
       cast((sqrt_scaled * {MIX_PPM} // sum(sqrt_scaled) OVER ())
            * {budget_tokens} // {MIX_PPM} AS bigint) AS alloc_tokens
FROM sc
"""


RARE_MIN_DF = 3


def rare_token_stats(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = RARE_MIN_DF,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_distinct_tokens, n_rare, rare_ratio): per-document
    count of DISTINCT tokens whose corpus document frequency is below
    ``min_df`` — the rare-token/OOV novelty signal quality filters use
    (a doc dominated by corpus-rare tokens is boilerplate noise, OCR
    garbage, or another language than its neighbors).  Integer counts +
    one final division, so both engines agree exactly.

    Two-pass plan (same family as token_quantiles): pass 1 explodes
    distinct tokens per doc and aggregates document frequency — the
    vocabulary-sized relation; pass 2 joins tokens back to their df on
    the token key (vocabulary is not broadcast-safe at corpus scale, so
    this is a plain hash join on a high-cardinality key) and aggregates
    per doc_id.  No corpus-sized window, no collect.  The exploded token
    relation feeds BOTH join sides: with ``scratch_dir`` (production /
    long-lived drivers, r3 VERDICT item 5) it is WRITTEN to parquet and
    both sides scan the files — zero session-lifetime persists,
    fresh-dir-per-call contract as the dedup materializers; without it,
    it is persisted (MEMORY_AND_DISK, the _shingle_index convention —
    Catalyst would otherwise re-run the corpus tokenization once per
    reference) and the cache lives until session end."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(_norm_ws(F.col(text_col)), " "),
                    lambda x: x != "",
                )
            )
        ).alias("token"),
    )
    if scratch_dir is not None:
        spark = docs.sparkSession
        toks.write.mode("overwrite").parquet(f"{scratch_dir}/rare_tokens")
        toks = spark.read.parquet(f"{scratch_dir}/rare_tokens")
    else:
        from pyspark import StorageLevel

        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    df_rel = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    return (
        toks.join(df_rel, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum((F.col("df") < min_df).cast("long")).alias("n_rare"),
        )
        .withColumn(
            "rare_ratio", F.col("n_rare") / F.col("n_distinct_tokens")
        )
    )


def rare_token_stats_sql(
    src: str = "documents", text_col: str = "text",
    min_df: int = RARE_MIN_DF,
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split({norm}, ' ')) AS token
  FROM {src}
),
tokf AS (SELECT doc_id, token FROM toks WHERE token <> ''),
dfr AS (
  SELECT token, cast(count(*) AS bigint) AS df FROM tokf GROUP BY token
)
SELECT t.doc_id,
       cast(count(*) AS bigint) AS n_distinct_tokens,
       cast(sum(CASE WHEN d.df < {min_df} THEN 1 ELSE 0 END) AS bigint)
         AS n_rare,
       sum(CASE WHEN d.df < {min_df} THEN 1 ELSE 0 END) * 1.0 / count(*)
         AS rare_ratio
FROM tokf t JOIN dfr d ON t.token = d.token
GROUP BY t.doc_id
"""


def quality_rule_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(lang_id, n_docs, n_fail_minlen, n_fail_alpha, n_fail_punct,
    n_fail_toklen, n_quality_ok): per-language breakdown of WHICH quality
    rule rejects documents — the tuning dashboard behind a quality gate
    (a language failing mostly on alpha_ratio means the threshold is
    wrong for its script, not that its documents are bad).  Rule
    predicates are exactly with_textstats' quality_ok conjuncts; one
    language-cardinality aggregate, all integer counts."""
    docs = ensure_scan_parallelism(docs)
    st = with_lang_id(with_textstats(docs, text_col), text_col)
    fails = {
        "n_fail_minlen": ~(F.col("n_ws_tokens") >= 10),
        "n_fail_alpha": ~(F.col("alpha_ratio") > 0.5),
        "n_fail_punct": ~(F.col("punct_ratio") < 0.2),
        "n_fail_toklen": ~F.col("mean_token_len").between(2.0, 12.0),
    }
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs += [
        F.sum(c.cast("long")).alias(name) for name, c in fails.items()
    ]
    aggs.append(
        F.sum(F.col("quality_ok").cast("long")).alias("n_quality_ok")
    )
    return st.groupBy("lang_id").agg(*aggs)


def quality_rule_stats_sql(
    src: str = "documents", text_col: str = "text"
) -> str:
    ts = textstats_sql(text_col)
    return f"""
WITH st AS (
  SELECT {lang_id_sql(text_col)} AS lang_id,
         {ts['n_ws_tokens']} AS n_ws_tokens,
         {ts['n_alpha']} AS n_alpha,
         {ts['n_punct']} AS n_punct,
         {ts['n_chars']} AS n_chars
  FROM {src}
),
rules AS (
  SELECT lang_id,
         n_ws_tokens >= 10 AS ok_minlen,
         (CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars
               ELSE 0.0 END) > 0.5 AS ok_alpha,
         (CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars
               ELSE 0.0 END) < 0.2 AS ok_punct,
         (CASE WHEN n_ws_tokens > 0
               THEN (n_chars - n_ws_tokens + 1) * 1.0 / n_ws_tokens
               ELSE 0.0 END) BETWEEN 2.0 AND 12.0 AS ok_toklen
  FROM st
)
SELECT lang_id, cast(count(*) AS bigint) AS n_docs,
       cast(sum(CASE WHEN NOT ok_minlen THEN 1 ELSE 0 END) AS bigint)
         AS n_fail_minlen,
       cast(sum(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS bigint)
         AS n_fail_alpha,
       cast(sum(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS bigint)
         AS n_fail_punct,
       cast(sum(CASE WHEN NOT ok_toklen THEN 1 ELSE 0 END) AS bigint)
         AS n_fail_toklen,
       cast(sum(CASE WHEN ok_minlen AND ok_alpha AND ok_punct
                      AND ok_toklen THEN 1 ELSE 0 END) AS bigint)
         AS n_quality_ok
FROM rules GROUP BY lang_id
"""


def token_fertility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, source, n_docs, n_ws_tokens, n_bpe_tokens, n_chars,
    n_bytes, chars_per_ws_token, bytes_per_bpe_token, bpe_per_ws_token):
    tokenizer FERTILITY profile per corpus segment — the standard
    tokenizer-evaluation table (how many BPE-ish pieces a whitespace word
    shatters into, and how many raw chars/bytes a token carries, per
    language × source).  A segment whose bytes-per-token spikes signals
    a script the tokenizer fragments (fertility cost ∝ training FLOPs
    per document).

    Token counts are with_textstats' exact expressions (whitespace + the
    BPE-ish regex); chars/bytes are RAW text (length / octet_length) —
    fertility measures what the tokenizer will actually ingest, not the
    normalized form.  One scan + one segment-cardinality aggregate; all
    sums exact int64, ratios single divisions of exact ints (NULL when
    the denominator is 0, both engines)."""
    docs = ensure_scan_parallelism(docs)
    st = with_textstats(docs, text_col)
    out = st.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws_tokens").alias("n_ws_tokens"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.sum(F.length(F.col(text_col)).cast("long")).alias("n_chars"),
        F.sum(F.octet_length(F.col(text_col)).cast("long")).alias("n_bytes"),
    )
    return out.select(
        "lang",
        "source",
        "n_docs",
        "n_ws_tokens",
        "n_bpe_tokens",
        "n_chars",
        "n_bytes",
        F.when(
            F.col("n_ws_tokens") > 0, F.col("n_chars") / F.col("n_ws_tokens")
        ).alias("chars_per_ws_token"),
        F.when(
            F.col("n_bpe_tokens") > 0, F.col("n_bytes") / F.col("n_bpe_tokens")
        ).alias("bytes_per_bpe_token"),
        F.when(
            F.col("n_ws_tokens") > 0,
            F.col("n_bpe_tokens") / F.col("n_ws_tokens"),
        ).alias("bpe_per_ws_token"),
    )


def token_fertility_sql(src: str = "documents", text_col: str = "text") -> str:
    ts = textstats_sql(text_col)
    return f"""
WITH st AS (
  SELECT lang, source,
         {ts['n_ws_tokens']} AS t_ws,
         {ts['n_bpe_tokens']} AS t_bpe,
         cast(length({text_col}) AS bigint) AS c,
         cast(strlen({text_col}) AS bigint) AS b
  FROM {src}
),
agg AS (
  SELECT lang, source,
         cast(count(*) AS bigint) AS n_docs,
         cast(sum(t_ws) AS bigint) AS n_ws_tokens,
         cast(sum(t_bpe) AS bigint) AS n_bpe_tokens,
         cast(sum(c) AS bigint) AS n_chars,
         cast(sum(b) AS bigint) AS n_bytes
  FROM st GROUP BY lang, source
)
SELECT lang, source, n_docs, n_ws_tokens, n_bpe_tokens, n_chars, n_bytes,
       CASE WHEN n_ws_tokens > 0
            THEN n_chars * 1.0 / n_ws_tokens END AS chars_per_ws_token,
       CASE WHEN n_bpe_tokens > 0
            THEN n_bytes * 1.0 / n_bpe_tokens END AS bytes_per_bpe_token,
       CASE WHEN n_ws_tokens > 0
            THEN n_bpe_tokens * 1.0 / n_ws_tokens END AS bpe_per_ws_token
FROM agg
"""


FUNNEL_RULES = ("minlen", "alpha", "punct", "toklen")


def filter_funnel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(stage, rule, docs_in, docs_out, dropped, survival_rate): the
    CUMULATIVE quality-gate funnel — how many documents survive after
    each rule applied IN ORDER (minlen → alpha → punct → toklen, exactly
    with_textstats' quality_ok conjuncts).  quality_rule_stats answers
    "which rule fires, marginally, per language"; the funnel answers the
    pipeline-tuning question "where does my corpus actually go" — rule
    ordering matters because a doc failing two rules is charged to the
    FIRST, the way a sequential filter pipeline bills it.

    ONE aggregate pass over the corpus (k cumulative-conjunction sums in
    a single agg row), then a driver-free stack() unpivot of that row —
    never k filtered scans.  Integer counts + one ratio per stage, so
    both engines agree exactly; an EMPTY corpus yields k stages of
    docs_in = 0 with NULL survival_rate in both."""
    docs = ensure_scan_parallelism(docs)
    st = with_textstats(docs, text_col)
    ok = {
        "minlen": F.col("n_ws_tokens") >= 10,
        "alpha": F.col("alpha_ratio") > 0.5,
        "punct": F.col("punct_ratio") < 0.2,
        "toklen": F.col("mean_token_len").between(2.0, 12.0),
    }
    aggs = [F.count(F.lit(1)).alias("n0")]
    cum = None
    for i, name in enumerate(FUNNEL_RULES, start=1):
        cum = ok[name] if cum is None else (cum & ok[name])
        aggs.append(
            F.coalesce(F.sum(cum.cast("long")), F.lit(0).cast("long"))
            .alias(f"n{i}")
        )
    row = st.agg(*aggs)
    stack = ", ".join(
        f"cast({i} AS bigint), '{name}', n{i - 1}, n{i}"
        for i, name in enumerate(FUNNEL_RULES, start=1)
    )
    return (
        row.selectExpr(
            f"stack({len(FUNNEL_RULES)}, {stack})"
            " AS (stage, rule, docs_in, docs_out)"
        )
        .select(
            "stage",
            "rule",
            "docs_in",
            "docs_out",
            (F.col("docs_in") - F.col("docs_out")).alias("dropped"),
            F.when(
                F.col("docs_in") > 0,
                F.col("docs_out") / F.col("docs_in"),
            ).alias("survival_rate"),
        )
    )


def filter_funnel_sql(src: str = "documents", text_col: str = "text") -> str:
    ts = textstats_sql(text_col)
    return f"""
WITH st AS (
  SELECT {ts['n_ws_tokens']} AS n_ws_tokens,
         {ts['n_alpha']} AS n_alpha,
         {ts['n_punct']} AS n_punct,
         {ts['n_chars']} AS n_chars
  FROM {src}
),
rules AS (
  SELECT n_ws_tokens >= 10 AS ok_minlen,
         (CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars
               ELSE 0.0 END) > 0.5 AS ok_alpha,
         (CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars
               ELSE 0.0 END) < 0.2 AS ok_punct,
         (CASE WHEN n_ws_tokens > 0
               THEN (n_chars - n_ws_tokens + 1) * 1.0 / n_ws_tokens
               ELSE 0.0 END) BETWEEN 2.0 AND 12.0 AS ok_toklen
  FROM st
),
agg AS (
  SELECT cast(count(*) AS bigint) AS n0,
         cast(coalesce(sum(CASE WHEN ok_minlen
                           THEN 1 ELSE 0 END), 0) AS bigint) AS n1,
         cast(coalesce(sum(CASE WHEN ok_minlen AND ok_alpha
                           THEN 1 ELSE 0 END), 0) AS bigint) AS n2,
         cast(coalesce(sum(CASE WHEN ok_minlen AND ok_alpha AND ok_punct
                           THEN 1 ELSE 0 END), 0) AS bigint) AS n3,
         cast(coalesce(sum(CASE WHEN ok_minlen AND ok_alpha AND ok_punct
                           AND ok_toklen
                           THEN 1 ELSE 0 END), 0) AS bigint) AS n4
  FROM rules
),
stages AS (
  SELECT cast(1 AS bigint) AS stage, 'minlen' AS rule,
         n0 AS docs_in, n1 AS docs_out FROM agg
  UNION ALL
  SELECT cast(2 AS bigint), 'alpha', n1, n2 FROM agg
  UNION ALL
  SELECT cast(3 AS bigint), 'punct', n2, n3 FROM agg
  UNION ALL
  SELECT cast(4 AS bigint), 'toklen', n3, n4 FROM agg
)
SELECT stage, rule, docs_in, docs_out,
       docs_in - docs_out AS dropped,
       CASE WHEN docs_in > 0 THEN docs_out * 1.0 / docs_in END
         AS survival_rate
FROM stages
"""


BIGRAM_MIN_DF = 2


def bigram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = BIGRAM_MIN_DF,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, n_novel, novelty_ratio): per-document count of
    DISTINCT adjacent-token bigrams whose corpus document frequency is
    below ``min_df`` — the second-order fluency/novelty signal next to
    rare_token_stats' unigram rarity (a doc whose WORDS are common but
    whose word SEQUENCES are corpus-unseen is the classic fluent-spam /
    template-stitching shape; it is also the cheap stand-in for LM
    perplexity that stays integer-exact cross-engine).  Docs with < 2
    tokens have no bigrams and drop out (both engines).

    Same two-pass plan family as rare_token_stats: explode distinct
    bigrams per doc (pairs built over a MATERIALIZED token array — an
    inline split inside the lambda would re-tokenize per element), df
    aggregate on the bigram key, hash-join back, per-doc aggregate.
    ``scratch_dir`` materializes the exploded bigram relation feeding
    both join sides (fresh-dir-per-call contract); without it the
    relation is persisted for the session."""
    toks_col = F.filter(
        F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
    )
    with_toks = docs.select("doc_id", F.col(text_col)).withColumn(
        "_toks", toks_col
    )
    n = F.size(F.col("_toks"))
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_toks"), i),
                F.element_at(F.col("_toks"), i + 1),
            ),
        )
    )
    bg = with_toks.select("doc_id", F.explode(pairs).alias("bigram"))
    if scratch_dir is not None:
        spark = docs.sparkSession
        bg.write.mode("overwrite").parquet(f"{scratch_dir}/bigrams")
        bg = spark.read.parquet(f"{scratch_dir}/bigrams")
    else:
        from pyspark import StorageLevel

        bg = bg.persist(StorageLevel.MEMORY_AND_DISK)
    df_rel = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
    return (
        bg.join(df_rel, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("df") < min_df).cast("long")).alias("n_novel"),
        )
        .withColumn(
            "novelty_ratio", F.col("n_novel") / F.col("n_bigrams")
        )
    )


def bigram_novelty_sql(
    src: str = "documents", text_col: str = "text",
    min_df: int = BIGRAM_MIN_DF,
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> x <> '') AS toks
  FROM {src}
),
bg0 AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 2
           THEN list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])
           ELSE [] END)) AS bigram
  FROM tk
),
dfr AS (
  SELECT bigram, cast(count(*) AS bigint) AS df FROM bg0 GROUP BY bigram
)
SELECT b.doc_id,
       cast(count(*) AS bigint) AS n_bigrams,
       cast(sum(CASE WHEN d.df < {min_df} THEN 1 ELSE 0 END) AS bigint)
         AS n_novel,
       sum(CASE WHEN d.df < {min_df} THEN 1 ELSE 0 END) * 1.0 / count(*)
         AS novelty_ratio
FROM bg0 b JOIN dfr d ON b.bigram = d.bigram
GROUP BY b.doc_id
"""


# --- Gopher-style repetition filters --------------------------------------
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", public) filter
# documents whose text is dominated by repeated n-grams.  Representatives
# implemented here: top-2-gram character fraction (most-frequent adjacent
# word pair × its length over the doc's normalized characters) and
# duplicated-5-gram character coverage (sum over 5-grams occurring ≥ 2
# times of count × length; overlapping occurrences are summed, not
# character-marked as in the paper, so the ratio is clamped at 1.0 — the
# deterministic variant both engines compute exactly), plus the
# duplicate-word fraction (1 − distinct/total tokens).

ENC_GLEN_MOD = 1_000_000  # (count, length) → count*MOD + length; length < MOD


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, dup_word_frac, top_2gram_frac, dup_5gram_frac).

    SHUFFLE-FREE: the Gopher repetition signals are per-document, so no
    exchange is ever required — each gram array is sorted IN PLACE
    (``array_sort``, JVM-side) and the per-gram counts fall out of one
    run-length fold (``F.aggregate``) over the sorted array.  The whole
    operator is a narrow map: at 100 TB it moves ZERO bytes across the
    network where the exploded formulation shuffles ~4× the corpus
    token count as (doc_id, k, gram) string rows.  Hot documents are
    irrelevant by construction (no shuffle key to skew).

    The most-frequent-2-gram tie-break is deterministic cross-engine
    via the integer encoding count*1e6 + length(gram): ties on count
    resolve to the LONGEST gram (max coverage), not engine-dependent
    arg-max order.  ``repetition_stats_exploded`` keeps the
    explode+groupBy twin for the property test pinning the two plans
    to identical output.

    Reference parity: quality filtering has no analog in
    d1_log_aggregation (log pipeline); this is a training-data-pipeline
    first-class op (SURVEY §2 extension family)."""
    docs = ensure_scan_parallelism(docs)
    toks_col = F.filter(
        F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
    )
    with_toks = docs.select("doc_id", F.col(text_col)).withColumn(
        "_toks", toks_col
    )
    n = F.size(F.col("_toks"))

    def grams(k: int) -> Column:
        if k == 1:
            return F.col("_toks")
        idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("_toks"), i + j) for j in range(k)],
            ),
        )

    zero = F.lit(0).cast("long")

    def _run_fold(arr: Column, mode: str) -> Column:
        """Fold a sorted gram array into one long.

        mode='top':  max over runs of enc = run_len*ENC_GLEN_MOD + len(gram)
        mode='dup':  sum over runs with run_len>=2 of run_len*len(gram)
        Accumulator = (prev gram, current run length, closed-run result);
        a run closes when the next element differs, and the finish
        lambda closes the final run.
        """

        def close(prev: Column, run: Column, acc: Column) -> Column:
            glen = F.length(prev).cast("long")
            if mode == "top":
                return F.greatest(acc, run * F.lit(ENC_GLEN_MOD) + glen)
            return acc + F.when(run >= 2, run * glen).otherwise(zero)

        def step(s: Column, x: Column) -> Column:
            fresh = F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                s["acc"].alias("acc"),
            )
            return (
                F.when(s["prev"].isNull(), fresh)
                .when(
                    x == s["prev"],
                    F.struct(
                        s["prev"].alias("prev"),
                        (s["run"] + F.lit(1).cast("long")).alias("run"),
                        s["acc"].alias("acc"),
                    ),
                )
                .otherwise(
                    F.struct(
                        x.alias("prev"),
                        F.lit(1).cast("long").alias("run"),
                        close(s["prev"], s["run"], s["acc"]).alias("acc"),
                    )
                )
            )

        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("acc"),
        )
        return F.aggregate(
            F.array_sort(arr),
            init,
            step,
            lambda s: F.when(s["prev"].isNull(), zero).otherwise(
                close(s["prev"], s["run"], s["acc"])
            ),
        )

    per_doc = with_toks.where(n >= 1).select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length(F.array_join(F.col("_toks"), " ")).cast("long").alias(
            "chars"
        ),
        F.size(F.array_distinct(F.col("_toks"))).cast("long").alias(
            "n1_distinct"
        ),
        _run_fold(grams(2), "top").alias("top2_enc"),
        _run_fold(grams(5), "dup").alias("dup5_cover"),
    )
    top2_cover = F.expr(
        f"(top2_enc div {ENC_GLEN_MOD}) * (top2_enc % {ENC_GLEN_MOD})"
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (
            (F.col("n_tokens") - F.col("n1_distinct"))
            / F.col("n_tokens")
        ).alias("dup_word_frac"),
        F.coalesce(
            top2_cover.cast("long") / F.col("chars"), F.lit(0.0)
        ).alias("top_2gram_frac"),
        F.least(
            F.lit(1.0), F.col("dup5_cover") / F.col("chars")
        ).alias("dup_5gram_frac"),
    )


def repetition_stats_exploded(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Explode+groupBy twin of :func:`repetition_stats` (test oracle).

    One explode of the tagged {1,2,5}-gram arrays, one
    partial-aggregating groupBy on (doc_id, k, gram), one per-doc
    aggregate — the formulation the narrow fold replaced.  Kept so the
    property test can pin the two plans to identical output; the fold
    version is the production/registry path (zero shuffles vs two)."""
    toks_col = F.filter(
        F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
    )
    with_toks = docs.select("doc_id", F.col(text_col)).withColumn(
        "_toks", toks_col
    )
    n = F.size(F.col("_toks"))

    def grams(k: int) -> Column:
        if k == 1:
            return F.col("_toks")
        idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("_toks"), i + j) for j in range(k)],
            ),
        )

    def _tag(k: int):
        # one-arg lambda on purpose: a two-arg lambda would make
        # F.transform pass the ARRAY INDEX as the second argument,
        # silently shadowing the k literal
        return lambda g: F.struct(F.lit(k).alias("k"), g.alias("gram"))

    tagged = F.concat(*[F.transform(grams(k), _tag(k)) for k in (1, 2, 5)])
    ex = (
        with_toks.where(n >= 1)
        .select(
            "doc_id",
            n.alias("n_tokens"),
            F.length(F.array_join(F.col("_toks"), " ")).alias("chars"),
            F.explode(tagged).alias("t"),
        )
        .select(
            "doc_id", "n_tokens", "chars",
            F.col("t.k").alias("k"), F.col("t.gram").alias("gram"),
        )
    )
    cnts = ex.groupBy("doc_id", "n_tokens", "chars", "k", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    glen = F.length(F.col("gram")).cast("long")
    enc = F.col("cnt") * F.lit(ENC_GLEN_MOD) + glen
    agg = cnts.groupBy("doc_id", "n_tokens", "chars").agg(
        F.count(F.when(F.col("k") == 1, 1)).alias("n1_distinct"),
        F.max(F.when(F.col("k") == 2, enc)).alias("top2_enc"),
        F.sum(
            F.when(
                (F.col("k") == 5) & (F.col("cnt") >= 2),
                F.col("cnt") * glen,
            ).otherwise(F.lit(0))
        ).alias("dup5_cover"),
    )
    top2_cover = F.expr(
        f"(top2_enc div {ENC_GLEN_MOD}) * (top2_enc % {ENC_GLEN_MOD})"
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            (F.col("n_tokens") - F.col("n1_distinct")).cast("long")
            / F.col("n_tokens").cast("long")
        ).alias("dup_word_frac"),
        F.coalesce(
            top2_cover.cast("long") / F.col("chars").cast("long"),
            F.lit(0.0),
        ).alias("top_2gram_frac"),
        F.least(
            F.lit(1.0),
            F.col("dup5_cover").cast("long") / F.col("chars").cast("long"),
        ).alias("dup_5gram_frac"),
    )


def repetition_stats_sql(
    src: str = "documents", text_col: str = "text"
) -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    mod = ENC_GLEN_MOD

    def gram_list(k: int) -> str:
        if k == 1:
            return "toks"
        parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
        return (
            f"list_transform(range(1, len(toks) - {k} + 2), i -> {parts})"
        )

    branches = "\nUNION ALL\n".join(
        f"SELECT doc_id, n_tokens, chars, {k} AS k,"
        f" unnest({gram_list(k)}) AS gram FROM tk"
        for k in (1, 2, 5)
    )
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> x <> '') AS toks,
         cast(len(list_filter(string_split({norm}, ' '), x -> x <> ''))
              AS bigint) AS n_tokens,
         cast(length(array_to_string(
           list_filter(string_split({norm}, ' '), x -> x <> ''), ' '))
              AS bigint) AS chars
  FROM {src}
  WHERE len(list_filter(string_split({norm}, ' '), x -> x <> '')) >= 1
),
ex AS (
{branches}
),
cnts AS (
  SELECT doc_id, n_tokens, chars, k, gram,
         cast(count(*) AS bigint) AS cnt
  FROM ex GROUP BY doc_id, n_tokens, chars, k, gram
),
agg AS (
  SELECT doc_id, n_tokens, chars,
         cast(count(CASE WHEN k = 1 THEN 1 END) AS bigint) AS n1_distinct,
         max(CASE WHEN k = 2
             THEN cnt * {mod} + cast(length(gram) AS bigint) END)
           AS top2_enc,
         cast(coalesce(sum(CASE WHEN k = 5 AND cnt >= 2
             THEN cnt * cast(length(gram) AS bigint) ELSE 0 END), 0)
           AS bigint) AS dup5_cover
  FROM cnts GROUP BY doc_id, n_tokens, chars
)
SELECT doc_id,
       n_tokens,
       (n_tokens - n1_distinct) * 1.0 / n_tokens AS dup_word_frac,
       coalesce(((top2_enc // {mod}) * (top2_enc % {mod})) * 1.0 / chars,
                cast(0.0 AS double)) AS top_2gram_frac,
       least(cast(1.0 AS double), dup5_cover * 1.0 / chars)
         AS dup_5gram_frac
FROM agg
"""


# --- Char-distribution entropy (compression-ratio quality proxy) ----------
# Shannon entropy of the per-document character distribution over a fixed
# 37-symbol alphabet (a-z, 0-9, space) plus ONE residual "other" bucket.
# Low entropy flags degenerate text (one repeated char, binary junk);
# it's the cheap deterministic stand-in for the gzip-ratio quality signal
# (which no SQL engine can reproduce bit-for-bit).

ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def entropy_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, distinct_symbols, char_entropy, space_frac,
    other_frac) per document.

    Scale shape: per-row ONLY — zero shuffles, zero explodes, zero
    Python.  Symbol counts come from the fixed-alphabet
    ``length(s) - length(replace(s, ch, ''))`` trick (37 symbols + one
    residual bucket = 38 codegen'd expressions per row), entropy is the
    plain ``-Σ p·ln p`` over those counts.  An explode-to-chars
    formulation would shuffle a ×|doc| character relation for the same
    answer.  Entropy is written ``0.0 - Σ`` in BOTH engines so the
    all-one-symbol doc yields +0.0 (not IEEE -0.0) on each side."""
    docs = ensure_scan_parallelism(docs)
    s = _norm_ws(F.col(text_col))
    base = docs.select("doc_id", s.alias("_s")).where(F.length("_s") >= 1)
    n = F.length(F.col("_s")).cast("long")
    nd = n.cast("double")
    cnts = [
        (
            F.length(F.col("_s"))
            - F.length(F.replace(F.col("_s"), F.lit(ch), F.lit("")))
        ).cast("long")
        for ch in ENTROPY_ALPHABET
    ]
    other = n
    for c in cnts:
        other = other - c
    all_cnts = cnts + [other]

    def term(c: Column) -> Column:
        p = c.cast("double") / nd
        return F.when(c > 0, p * F.log(p)).otherwise(F.lit(0.0))

    total = term(all_cnts[0])
    for c in all_cnts[1:]:
        total = total + term(c)
    distinct = (all_cnts[0] > 0).cast("long")
    for c in all_cnts[1:]:
        distinct = distinct + (c > 0).cast("long")
    space_cnt = cnts[ENTROPY_ALPHABET.index(" ")]
    return base.select(
        "doc_id",
        n.alias("n_chars"),
        distinct.alias("distinct_symbols"),
        (F.lit(0.0) - total).alias("char_entropy"),
        (space_cnt.cast("double") / nd).alias("space_frac"),
        (other.cast("double") / nd).alias("other_frac"),
    )


def entropy_stats_sql(src: str = "documents", text_col: str = "text") -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    cnt_cols = ", ".join(
        f"cast(length(t) - length(replace(t, '{ch}', '')) AS bigint)"
        f" AS c{i}"
        for i, ch in enumerate(ENTROPY_ALPHABET)
    )
    idxs = list(range(len(ENTROPY_ALPHABET)))
    sum_cnts = " + ".join(f"c{i}" for i in idxs)
    names = [f"c{i}" for i in idxs] + ["oth"]
    terms = " + ".join(
        f"CASE WHEN {c} > 0 THEN ({c}*1.0/n)*ln({c}*1.0/n) ELSE 0.0 END"
        for c in names
    )
    distinct = " + ".join(
        f"(CASE WHEN {c} > 0 THEN 1 ELSE 0 END)" for c in names
    )
    sp = f"c{ENTROPY_ALPHABET.index(' ')}"
    return f"""
WITH s AS (
  SELECT doc_id, {norm} AS t FROM {src} WHERE length({norm}) >= 1
),
c AS (
  SELECT doc_id, cast(length(t) AS bigint) AS n, {cnt_cols} FROM s
),
e AS (
  SELECT *, n - ({sum_cnts}) AS oth FROM c
)
SELECT doc_id,
       n AS n_chars,
       cast({distinct} AS bigint) AS distinct_symbols,
       0.0 - ({terms}) AS char_entropy,
       {sp}*1.0/n AS space_frac,
       oth*1.0/n AS other_frac
FROM e
"""


# --- Corpus-trained bigram-LM perplexity (CCNet-style quality filter) -----
# CCNet/RefinedWeb filter web text by LM perplexity under a reference
# model.  A pretrained KenLM cannot be reproduced cross-engine, so the
# reference model here is the corpus's OWN add-k-smoothed bigram LM —
# fully deterministic, trainable in two aggregates, and still separating
# fluent text (low cross-entropy) from template-stitched / shuffled junk
# (high), which is exactly the signal the filter thresholds on.

LM_ADD_K = 0.5


def lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    add_k: float = LM_ADD_K,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, cross_entropy, ppl) per document under the
    corpus's own add-k bigram LM: p(w2|w1) = (c(w1,w2)+k)/(c(w1·)+k·V)
    with c(w1·) the history count (Σ_w2 c(w1,w2)) and V the bigram-type
    vocabulary; cross_entropy = -(Σ m·ln p)/Σ m over the doc's bigrams,
    ppl = exp(cross_entropy).  Docs with < 2 tokens have no bigrams and
    drop out (both engines).  Because the LM is trained on the same
    corpus it scores, every doc bigram exists in the count relation —
    inner joins, no OOV branch.

    Scale shape: ONE (doc_id,w1,w2) partial-aggregating shuffle builds
    the per-doc bigram multiplicity relation; it is materialized
    (``scratch_dir``, fresh-dir-per-call) or persisted (the
    rare_token_stats contract) because model counts (c(w1,w2)), history
    counts (c(w1·)), and V are each ONE independent aggregate derived
    from it — the corpus text is tokenized exactly once.  Scoring is
    two hash joins on the bigram/history keys (vocabulary-sized build
    sides — NOT broadcast) plus a 1-row broadcast of V, then a per-doc
    rollup.  No window, no Python, no driver-side model state."""
    docs = ensure_scan_parallelism(docs)
    toks_col = F.filter(
        F.split(_norm_ws(F.col(text_col)), " "), lambda x: x != ""
    )
    with_toks = docs.select("doc_id", toks_col.alias("_toks"))
    n = F.size(F.col("_toks"))
    idx = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    bg = with_toks.select(
        "doc_id", F.col("_toks"), F.explode(idx).alias("i")
    ).select(
        "doc_id",
        F.element_at("_toks", F.col("i") - 1).alias("w1"),
        F.element_at("_toks", F.col("i")).alias("w2"),
    )
    doc_bg = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    if scratch_dir is not None:
        spark = docs.sparkSession
        doc_bg.write.mode("overwrite").parquet(f"{scratch_dir}/lm_doc_bg")
        doc_bg = spark.read.parquet(f"{scratch_dir}/lm_doc_bg")
    else:
        from pyspark import StorageLevel

        doc_bg = doc_bg.persist(StorageLevel.MEMORY_AND_DISK)
    bg_counts = doc_bg.groupBy("w1", "w2").agg(F.sum("m").alias("cb"))
    hist = doc_bg.groupBy("w1").agg(F.sum("m").alias("cu"))
    vocab = doc_bg.select(
        F.explode(F.array("w1", "w2")).alias("w")
    ).agg(F.count_distinct("w").alias("v"))
    lnp = F.log(
        (F.col("cb") + F.lit(add_k))
        / (F.col("cu") + F.lit(add_k) * F.col("v"))
    )
    scored = (
        doc_bg.join(bg_counts, ["w1", "w2"])
        .join(hist, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "m", lnp.alias("_lnp"))
    )
    ce = F.lit(0.0) - F.sum(F.col("m") * F.col("_lnp")) / F.sum("m")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            ce.alias("cross_entropy"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "cross_entropy",
            F.exp("cross_entropy").alias("ppl"),
        )
    )


def lm_perplexity_sql(
    src: str = "documents",
    text_col: str = "text",
    add_k: float = LM_ADD_K,
) -> str:
    """Twin of lm_perplexity: same tokenization, same count relations,
    same add-k formula; ``0.0 -`` form pins +0.0 like entropy_stats."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    k = repr(float(add_k))
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> x <> '') AS toks
  FROM {src}
),
bg0 AS (
  SELECT doc_id,
         unnest(list_transform(
           range(2, len(toks) + 1),
           i -> struct_pack(a := toks[i-1], b := toks[i]))) AS u
  FROM tk WHERE len(toks) >= 2
),
doc_bg AS (
  SELECT doc_id, u.a AS w1, u.b AS w2, cast(count(*) AS bigint) AS m
  FROM bg0 GROUP BY 1, 2, 3
),
bgc AS (SELECT w1, w2, sum(m) AS cb FROM doc_bg GROUP BY 1, 2),
hist AS (SELECT w1, sum(m) AS cu FROM doc_bg GROUP BY 1),
voc AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT w1 AS w FROM doc_bg UNION ALL SELECT w2 FROM doc_bg)
),
sc AS (
  SELECT d.doc_id, d.m,
         ln((b.cb + {k}) / (h.cu + {k} * voc.v)) AS lnp
  FROM doc_bg d
  JOIN bgc b ON d.w1 = b.w1 AND d.w2 = b.w2
  JOIN hist h ON d.w1 = h.w1, voc
)
SELECT doc_id,
       cast(sum(m) AS bigint) AS n_bigrams,
       0.0 - sum(m * lnp) / sum(m) AS cross_entropy,
       exp(0.0 - sum(m * lnp) / sum(m)) AS ppl
FROM sc GROUP BY doc_id
"""


# --- Corpus composition / training-mixture audit --------------------------


def corpus_mix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, lang_id, n_docs, n_quality_ok, quality_rate,
    total_tokens, token_share): the training-mixture composition
    dashboard — how much each (source, language) cell contributes to
    the corpus, and how much of it survives the quality gate.  This is
    the table mixture reweighting (`mixture_weights`) and stratified
    sampling start from.

    Scale shape: the per-row signals (with_textstats + with_lang_id)
    are pure codegen'd expressions, then ONE partial-aggregating
    shuffle to the (source, lang_id) cell cardinality — a bounded
    dimension-like relation — and the corpus token total is an
    unpartitioned window over THAT bounded relation (the node_staleness
    single-derivation pattern: the corpus is scanned exactly once; an
    agg-joined-back form would execute the scan twice)."""
    docs = ensure_scan_parallelism(docs)
    st = with_lang_id(with_textstats(docs, text_col), text_col)
    agg = st.groupBy("source", "lang_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("quality_ok").cast("long")).alias("n_quality_ok"),
        F.sum("n_ws_tokens").alias("total_tokens"),
    )
    w = Window.partitionBy()
    return agg.withColumn(
        "_corpus_tokens", F.sum("total_tokens").over(w)
    ).select(
        "source",
        "lang_id",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_quality_ok").cast("long").alias("n_quality_ok"),
        (F.col("n_quality_ok") / F.col("n_docs")).alias("quality_rate"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        (F.col("total_tokens") / F.col("_corpus_tokens")).alias(
            "token_share"
        ),
    )
