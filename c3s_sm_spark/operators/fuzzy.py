"""Fuzzy string matching: edit-distance-1 pair mining over a vocabulary
(typo/variant detection — the spelling-noise audit a web-crawl corpus
runs before token-frequency work, and the candidate stage for
query-expansion / OCR-cleanup passes).

Algorithm (FastSS / SymSpell deletion-neighborhood, public): every
token emits itself plus each single-character-deletion variant; two
DISTINCT tokens are within edit distance 1 **iff** they share a
variant — substitution pairs share the deletion at the differing
position, insertion/deletion pairs share the shorter token itself —
so an equi-join on the variant recovers ALL ED<=1 pairs (complete),
and a cheap verify removes the false candidates the neighborhood
over-generates (e.g. "ab"/"ba" share variants "a" and "b" but sit at
distance 2).

Scale shape (10^9-token vocabulary): variant fanout is Σ(len+1) rows;
the join key travels as xxhash64(variant) — 8 bytes through the
shuffle, collisions harmless because the levenshtein verify kills
them; the verify runs on candidates only (JVM built-in, no Python).
The quadratic alternative — length-banded self-join over the whole
vocabulary — is exactly what the DuckDB oracle runs at test scale;
the engine never does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(token_col: str = "token") -> Column:
    """``array<string>``: the token itself + every single-deletion
    variant, deduplicated (repeated characters collapse to one
    variant, shrinking join fanout). 1-based substr arithmetic:
    deleting position i leaves prefix [1, i-1] + suffix [i+1, ...]."""
    c = token_col
    dels = F.expr(
        f"transform(sequence(1, length({c})), "
        f"i -> concat(substr({c}, 1, i - 1), "
        f"substr({c}, i + 1, length({c}) - i)))"
    )
    return F.array_union(F.array(F.col(c)), dels)


def typo_pairs(
    vocab: DataFrame,
    token_col: str = "token",
    df_col: str = "df",
    max_len: int = 64,
) -> DataFrame:
    """All unordered token pairs at edit distance exactly 1 within a
    ``(token, df)`` vocabulary frame. Output ``(tok_a, tok_b, df_a,
    df_b)`` with ``tok_a < tok_b``; dfs pass through as BIGINT.

    ``max_len`` bounds variant fanout (and levenshtein cost) — tokens
    longer than it are excluded from mining on BOTH sides, which any
    oracle must mirror. Empty tokens are dropped (a zero-length token
    would make ``sequence(1, 0)`` run descending in Spark).
    """
    base = vocab.select(
        F.col(token_col).alias("token"),
        F.col(df_col).cast("long").alias("df"),
    ).where((F.length("token") > 0) & (F.length("token") <= max_len))
    var = base.select(
        "token",
        "df",
        F.explode(deletion_variants("token")).alias("__v"),
    ).select("token", "df", F.xxhash64("__v").alias("__vh"))
    a, b = var.alias("a"), var.alias("b")
    cand = (
        a.join(b, "__vh")
        .where(F.col("a.token") < F.col("b.token"))
        .select(
            F.col("a.token").alias("tok_a"),
            F.col("b.token").alias("tok_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .distinct()
    )
    return cand.where(F.levenshtein("tok_a", "tok_b") <= 1)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_len: int = 64,
) -> DataFrame:
    """X124 two-table edit-distance<=1 join (record linkage across
    noisy catalogs — product names, author strings, OCR'd labels):
    every (left key, right key) pair with levenshtein distance 0 or 1,
    via the same deletion-neighborhood equi-join as :func:`typo_pairs`
    (complete for ED<=1; exact matches ride the token-itself variant).

    Output: ``(lk, rk, ed)`` with ``ed`` the exact distance (0 or 1).
    Inputs are key frames — pre-distinct them to one row per key
    (duplicate keys multiply candidate pairs, not correctness). The
    join travels as xxhash64(variant); false hash neighbors die in the
    verify. The quadratic length-banded alternative is the oracle's
    form, never the engine's."""
    lv = (
        left.select(F.col(left_col).cast("string").alias("lk"))
        .where((F.length("lk") > 0) & (F.length("lk") <= max_len))
        .distinct()
        .select("lk", F.explode(deletion_variants("lk")).alias("__v"))
        .select("lk", F.xxhash64("__v").alias("__vh"))
    )
    rv = (
        right.select(F.col(right_col).cast("string").alias("rk"))
        .where((F.length("rk") > 0) & (F.length("rk") <= max_len))
        .distinct()
        .select("rk", F.explode(deletion_variants("rk")).alias("__v"))
        .select("rk", F.xxhash64("__v").alias("__vh"))
    )
    cand = lv.join(rv, "__vh").select("lk", "rk").distinct()
    return cand.select(
        "lk", "rk", F.levenshtein("lk", "rk").cast("long").alias("ed")
    ).where(F.col("ed") <= 1)
