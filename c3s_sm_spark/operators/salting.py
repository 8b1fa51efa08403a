"""Explicit salted repartitioning for skewed keys (north_rule requirement).

The reference's grid is uniform so it never needs this (SURVEY.md §4
"Skew handling: none"); the engine's source table has a Zipf-skewed
``source`` column (~70% one value, FIXTURES.md F1), and at 10^12-sequence
scale a groupBy/repartition keyed on a hot value would send most of the
data to a handful of reducers.

Two tools:

- :func:`with_salt` / :func:`salted_repartition` — deterministic salt
  column ``pmod(xxhash64(id_col), n_salts)`` and a repartition on
  ``(keys..., salt)`` so hot key groups spread over ``n_salts`` tasks.
- :func:`salted_agg` — two-phase aggregation: partial agg on
  ``(keys, salt)`` then final agg on ``keys``. Results are EXACTLY equal
  for associative aggregates (sum/count/bit_or/min/max); the bench and a
  correctness query pin the invariance.

AQE's skew-join splitting covers joins; this covers aggregations and
writer fan-out, which AQE does not re-salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, n_salts: int, salt_col: str = "salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from ``id_col``.

    Deterministic (hash of the row's own id, not ``rand()``) so re-runs
    and resume-from-checkpoint produce identical partition contents.
    """
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int")
    )


def salted_repartition(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    n_salts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on ``(keys, salt(id_col))``; drops the salt afterwards
    is the caller's choice — the column is named ``__salt``."""
    salted = with_salt(df, id_col, n_salts, "__salt")
    parts: list[Column] = [F.col(c) for c in keys] + [F.col("__salt")]
    if num_partitions:
        return salted.repartition(num_partitions, *parts)
    return salted.repartition(*parts)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column -> (fn, input column) where fn is one of
    ``sum | count | min | max | bit_or`` (associative, so partial+final
    composition is exact). Phase 1 groups on ``(keys, salt)`` — hot keys
    split across ``n_salts`` reducers; phase 2 merges the (tiny) partials.
    """
    merge_fn = {"count": "sum"}  # count partials merge by summing
    partial_aggs = [getattr(F, fn)(col).alias(out) for out, (fn, col) in aggs.items()]
    final_aggs = [
        getattr(F, merge_fn.get(fn, fn))(out).alias(out) for out, (fn, _) in aggs.items()
    ]
    partial = with_salt(df, id_col, n_salts, "__salt").groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    id_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """X158 salted equi-join for skewed keys — the join-side companion
    to :func:`salted_agg` (which covers aggregation skew): when the
    big side's join keys are Zipf-hot (70% one source) and the small
    side is too large or too row-multiplying to broadcast, a plain
    shuffle join sends every hot-key row to ONE reducer. Salting
    spreads them: the big side gets a deterministic salt from its own
    row id, the small side is REPLICATED once per salt value
    (explode over ``sequence(0, n_salts-1)``), and the join keys
    become ``(keys..., salt)`` — hot groups fan out over ``n_salts``
    tasks at the cost of an ``n_salts``-fold copy of the small side,
    exactly the classic skew-join trade.

    Results are EXACTLY the plain join's rows (salt is a join-key
    refinement on the big side and a full cross on the small side —
    every original pair meets exactly once); the driver witness
    oracles this against the unsalted SQL join. ``how`` supports
    ``inner`` and ``left`` (a left row's salt exists on the replicated
    side, so match-or-null semantics are preserved per salt).

    AQE's runtime skew-join split handles sort-merge joins it can
    see; explicit salting is for the plans AQE can't re-split
    (broadcast-ineligible dimension under a hot fact, pre-shuffle
    bucketing, deterministic layout for resume) — the same rationale
    as salted_agg's note.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    keys = list(keys)
    b = with_salt(big, id_col, n_salts, "__salt")
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = b.join(s, [*keys, "__salt"], how)
    return out.drop("__salt")
