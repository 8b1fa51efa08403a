"""Text-analysis operators for training-data pipelines over a ``documents``
table ``(doc_id, text, lang, source, n_chars)``.

All pure Column expressions (JVM-side, whole-stage-codegen'd) — these run
per-row over 100 TB of text, so no Python may touch the hot path. Word
tokenization is normalized to single-space splitting after whitespace
collapse so the semantics are reproducible in any ANSI engine (the DuckDB
oracle uses the identical pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny high-frequency English stopword markers for the lang-id heuristic
_EN_MARKERS = (" the ", " and ", " of ", " to ", " is ")


def words_col(text: Column | str) -> Column:
    """Whitespace-collapsed word array (regex-free split for portability).

    Empty / whitespace-only text yields an EMPTY array: a bare split
    returns [""] (size 1), which silently let blank boilerplate pass
    token-count and quality filters with n_tokens=1."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.regexp_replace(F.trim(c), r"\s+", " "), " "))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token counting: whitespace tokens + char/density stats."""
    w = words_col(text_col)
    n_tok = F.size(w).cast("long")
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("long")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        # nullif: empty text must yield NULL like SQL engines, not 0/0=NaN
        F.round(n_nonspace / F.nullif(n_tok, F.lit(0)), 4).alias("avg_tok_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: alpha ratio, space ratio, token count.

    The composite ``quality`` is a plain weighted expression so it stays
    in codegen; thresholds are the caller's policy.
    """
    n_chars = F.nullif(F.length(text_col).cast("long"), F.lit(0))
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("long")
    spaces = n_chars - F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("long")
    w = words_col(text_col)
    return docs.select(
        "doc_id",
        F.round(alpha / n_chars, 4).alias("alpha_ratio"),
        F.round(spaces / n_chars, 4).alias("space_ratio"),
        F.size(w).cast("long").alias("n_tokens"),
        F.round(
            (alpha / n_chars) * 0.5
            + (spaces / n_chars) * 0.3
            + F.least(F.size(w) / F.lit(100.0), F.lit(1.0)) * 0.2,
            4,
        ).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-based language ID (n-gram-heuristic family, deliberately
    simple so it is oracle-checkable in ANSI SQL): counts English
    stopword-marker hits; >=1 hit -> 'en'."""
    lowered = F.lower(F.col(text_col))
    score = None
    for m in _EN_MARKERS:
        hit = F.when(lowered.like(f"%{m}%"), 1).otherwise(0)
        score = hit if score is None else score + hit
    return docs.select(
        "doc_id",
        score.cast("int").alias("en_score"),
        F.when(score >= 1, "en").otherwise("other").alias("lang_pred"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text plus a
    64-bit xxhash (the fast-dedup key)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


def repetition_score(
    docs: DataFrame, text_col: str = "text", k: int = 2
) -> DataFrame:
    """Intra-document repetition (Gopher-style quality filter): the
    fraction of word k-grams that are repeats of an earlier k-gram in
    the SAME document — high values flag boilerplate/spam that
    cross-document dedup never sees.

    Pure column expressions (``regexp_extract_all`` k-gram array +
    ``array_distinct``), whole-stage codegen, zero shuffle, zero UDF —
    per-row work at any corpus size. Output: ``(doc_id, n_grams,
    n_distinct, rep_ratio)``; docs too short for a k-gram get
    ``n_grams = 0`` and a null ratio.
    """
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=(\S+" + r" \S+" * (k - 1) + r"))"
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    n = F.size(grams).cast("long")
    nd = F.size(F.array_distinct(grams)).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_grams"),
        nd.alias("n_distinct"),
        F.round((n - nd) / F.nullif(n.cast("double"), F.lit(0.0)), 4).alias(
            "rep_ratio"
        ),
    )


def pattern_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Surface-pattern signals for corpus filtering: digit density, URL
    and email mention counts — the cheap structural features quality
    classifiers cut on (and the first pass of PII triage). Plain
    ``regexp_count`` projections in codegen; patterns are deliberately
    conservative so ANSI engines agree byte-for-byte.
    """
    t = F.col(text_col)
    n_chars = F.nullif(F.length(t).cast("long"), F.lit(0))
    digits = F.regexp_count(t, F.lit(r"[0-9]")).cast("long")
    return docs.select(
        "doc_id",
        digits.alias("n_digits"),
        F.regexp_count(t, F.lit(r"https?://[^ ]+")).cast("long").alias("n_urls"),
        F.regexp_count(
            t, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        )
        .cast("long")
        .alias("n_emails"),
        F.round(digits / n_chars, 4).alias("digit_ratio"),
    )


def vocab_growth(
    docs: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    bucket_size: int = 1000,
) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve over corpus position: how
    many NEW distinct tokens each ``order_col``-range bucket of documents
    contributes, with running vocabulary size and running token count —
    the standard "is this crawl still adding language or just volume"
    diagnostic for training-data collection.

    A token is credited to the FIRST bucket (by ``order_col`` order) any
    document containing it appears in. Output, one row per non-empty
    bucket: ``(bucket, n_new_tokens, vocab_size, n_tokens, cum_tokens)``
    — all BIGINT, so the (cum_tokens, vocab_size) pairs plot the Heaps
    curve exactly.

    Plan, scale-first: first-sighting needs one explode + one groupBy on
    the token string (min(bucket) partial-aggregates map-side, so the
    shuffle carries one record per distinct (partition, token), not one
    per occurrence); per-bucket token counts deliberately AVOID the
    explode — ``sum(size(words))`` never shuffles token strings at all.
    The final cumulative window runs over one row per bucket (corpus
    span / bucket_size rows — thousands, not billions), which is the
    only single-task stage and is bounded by construction. At 100 TB the
    token-string shuffle is the cost center; if the vocabulary is
    genuinely web-scale (1e9+ types), swap the groupBy key to the X1
    two-lane-xxhash 128-bit content key — the curve is then exact up to
    ~7e-22 collision odds, but loses the DuckDB-oracle twin, which is
    why the default stays exact strings.

    Negative ``order_col`` values bucket by floor division (Spark
    semantics); the DuckDB oracle twin pins non-negative ids only.
    """
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    from pyspark.sql import Window

    w = words_col(text_col)
    b = F.floor(F.col(order_col) / F.lit(bucket_size)).cast("long")
    toks = docs.select(b.alias("bucket"), F.explode(w).alias("tok"))
    news = (
        toks.groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_tokens"))
    )
    occ = (
        docs.select(b.alias("bucket"), F.size(w).cast("long").alias("__n"))
        .groupBy("bucket")
        .agg(F.sum("__n").cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        occ.join(news, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_new_tokens", F.lit(0)).cast("long").alias(
                "n_new_tokens"
            ),
            "n_tokens",
        )
        .select(
            "bucket",
            "n_new_tokens",
            F.sum("n_new_tokens").over(cum).cast("long").alias("vocab_size"),
            "n_tokens",
            F.sum("n_tokens").over(cum).cast("long").alias("cum_tokens"),
        )
    )
