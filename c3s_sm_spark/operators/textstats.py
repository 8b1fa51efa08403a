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
