"""Corpus-statistics ranking operators: TF-IDF term extraction and BM25
scoring over a ``documents`` table ``(doc_id, text, lang, source, ...)``.

The reference engine has no retrieval layer; these are the §2.10
training-data-pipeline extensions (keyword extraction for corpus audits,
relevance scoring for decontamination probes and eval-set mining). The
design constraint carried over from the rest of the engine: every
cross-engine witness must live in exact integer arithmetic (see
oracle-witness-discipline) — transcendentals (``ln``) never sit on a
hash boundary, so each operator exposes the textbook log-weighted form
for API users AND an exact fixed-point rational variant that the driver
gate pins.

Scale shape (100 TB corpus): tokenize → per-(doc,token) count is ONE
hash exchange carrying (doc_id, token, tf) — the irreducible shuffle of
any exact tf computation; document frequency is a second, much smaller
exchange over the distinct (doc,token) frame keyed by token; the df
dimension joins back token-keyed (sort-merge; broadcastable once pruned
by min_df); top-k per doc is a doc_id-keyed window — embarrassingly
parallel, no global order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from c3s_sm_spark.operators.textstats import words_col

#: fixed-point scale for the exact rational idf variant
_MICRO = 1_000_000


def term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, token, tf)`` exact term frequencies — the shared first
    stage of tf-idf and BM25. One explode + one map-side-combined
    groupBy; the exchange carries one row per DISTINCT (doc, token),
    not one per occurrence."""
    toks = docs.select(
        "doc_id", F.explode(words_col(text_col)).alias("token")
    )
    return toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def doc_freq(tf: DataFrame, min_df: int = 1) -> DataFrame:
    """``(token, df)`` document frequencies from a :func:`term_counts`
    frame. tf already has one row per (doc, token), so a plain count
    per token IS the document frequency — no count-distinct needed."""
    out = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return out.where(F.col("df") >= min_df) if min_df > 1 else out


def tfidf_terms(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    idf_mode: str = "log",
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf.

    ``idf_mode='log'`` (API default) scores ``tf * ln(N / df)`` — the
    textbook form, float-valued, fine for pipeline use but never for a
    cross-engine hash. ``idf_mode='linear_micro'`` scores the exact
    fixed-point rational ``(tf * N * 1e6) div df`` (BIGINT; linear idf
    preserves the rare-term-up weighting with zero float ops) — the
    driver-gate witness. Overflow bound: tf * N * 1e6 < 2^63 holds to
    ~10^9 docs x tf 9e3; past that drop the micro factor or use 'log'.

    Ranking ties break (df ASC, token ASC) — fully deterministic in
    both modes. Output: ``(doc_id, token, tf, df, score_q|score, rn)``.

    Plan: two hash exchanges (doc,token) then (token), one token-keyed
    join against the vocabulary-sized df dimension, one doc_id window.
    N arrives via crossJoin(broadcast(1-row agg)) — no driver action.
    """
    tf = term_counts(docs, text_col)
    dfreq = doc_freq(tf)
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = tf.join(dfreq, "token").crossJoin(F.broadcast(n))
    if idf_mode == "linear_micro":
        # exact integer division (non-negative operands: Spark div ==
        # ANSI // — see waterfill_alloc's cross-engine note)
        scored = scored.withColumn(
            "score_q",
            F.expr(f"tf * n_docs * {_MICRO}L div df").cast("long"),
        )
        order = [
            F.col("score_q").desc(),
            F.col("df").asc(),
            F.col("token").asc(),
        ]
    elif idf_mode == "log":
        scored = scored.withColumn(
            "score", F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
        )
        order = [
            F.col("score").desc(),
            F.col("df").asc(),
            F.col("token").asc(),
        ]
    else:  # pragma: no cover - guard
        raise ValueError(f"unknown idf_mode {idf_mode!r}")
    w = Window.partitionBy("doc_id").orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            *(["score_q"] if idf_mode == "linear_micro" else ["score"]),
            "rn",
        )
    )


def bm25_pieces(
    docs: DataFrame,
    probe_tokens: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Exact integer BM25 *pieces* for a fixed probe query: one row per
    (matching doc, probe token) with ``(doc_id, token, tf, dl, df,
    n_docs, total_len)`` — every scalar BM25 needs, all BIGINT, zero
    floats. The float score ``idf(df,N) * tf*(k1+1) / (tf + k1*(1 -
    b + b*dl*N/total_len))`` derives outside the witness (the
    lag_corr_pieces split): ``dl/avgdl`` is the exact rational
    ``dl * N / total_len``.

    The probe list is a query, not data — it broadcasts as an isin
    filter pushed into the scan-side explode, so the exchange carries
    only probe-token postings (|probe| * df rows), never the corpus.
    """
    if not probe_tokens:
        raise ValueError("probe_tokens must be non-empty")
    staged = docs.select(
        "doc_id",
        words_col(text_col).alias("__ws"),
    ).select(
        "doc_id",
        F.size("__ws").cast("long").alias("dl"),
        F.explode("__ws").alias("token"),
    )
    hits = staged.where(F.col("token").isin(list(probe_tokens)))
    tf = hits.groupBy("doc_id", "dl", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    totals = docs.select(
        F.size(words_col(text_col)).cast("long").alias("__n")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__n").cast("long").alias("total_len"),
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "token", "tf", "dl", "df", "n_docs", "total_len")
    )


def bm25_score(
    pieces: DataFrame, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """Float BM25 from :func:`bm25_pieces` output: per-doc sum over
    probe terms (Robertson idf, 0.5-smoothed). Lives OUTSIDE any hash
    boundary by design."""
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") * F.col("n_docs") / F.col("total_len")
    )
    term = idf * F.col("tf") * (k1 + 1.0) / norm
    return (
        pieces.withColumn("__s", term)
        .groupBy("doc_id")
        .agg(F.sum("__s").alias("bm25"))
    )
