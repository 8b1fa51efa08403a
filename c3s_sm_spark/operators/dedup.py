"""Keep-latest dedup for reprocessed/ambiguous rows (reference J5/W2).

Reference semantics (``/root/reference/src/c3s_sm/interface.py:281-288,
345-361``): when more than one file matches a timestamp (e.g. a
reprocessed product version), sort matches and keep the last
(``sort_last`` default) or first; error mode also exists. Here the same
contract over rows: one survivor per key group, chosen by ordering
columns.

Implemented as a ranking window — a single shuffle on the dedup keys,
which AQE will split if a key is hot. ``dropDuplicates`` is NOT used
because its survivor is arbitrary; the reference's tie-break order is
load-bearing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    mode: str = "sort_last",
) -> DataFrame:
    """One row per ``keys`` group: last (or first) in ``order_by`` order.

    ``mode='sort_last'`` keeps the row that sorts LAST (reference default,
    ``interface.py:352-356``); ``'sort_first'`` keeps the first. The
    reference's third mode ('error') is not a mode here: run
    :func:`ambiguity_count` and fail when it returns rows.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, mode))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _order_cols(
    order_by: Sequence[Column | str], mode: str
) -> list[Column]:
    """Shared sort normalization for :func:`keep_latest` /
    :func:`keep_top_k` — one place owns the sort_last/sort_first flip."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if mode == "sort_last":
        return [c.desc() for c in cols]
    if mode != "sort_first":
        raise ValueError(f"mode must be sort_last|sort_first, got {mode!r}")
    return cols


def ambiguity_count(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Groups with >1 row — the validation query behind mode='error'."""
    return df.groupBy(*keys).count().where(F.col("count") > 1)


def keep_top_k(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    mode: str = "sort_last",
    keep_ties: bool = False,
) -> DataFrame:
    """The k best rows per ``keys`` group — :func:`keep_latest`
    generalized from k=1 (top-k most recent versions, k best-quality
    docs per source, k nearest candidates per probe).

    ``keep_ties=True`` uses ``rank()`` (all rows tied at the k-th place
    survive, group size may exceed k); default ``row_number()`` returns
    exactly k. Adds ``topk_rn`` (1-based position) to the output — the
    caller often needs it, and dropping it is free.

    Scale shape: one shuffle on ``keys``; Spark >= 3.5 rewrites the
    rank-filter into WindowGroupLimit, pruning each map partition to its
    local top-k BEFORE the exchange — the shuffle moves at most
    ``k x keys`` rows per input partition, so a 10^12-row scan with k=5
    shuffles like a small aggregate (same property PLANS.md documents
    for keep_latest).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, mode))
    fn = F.rank() if keep_ties else F.row_number()
    return (
        df.withColumn("topk_rn", fn.over(w))
        .where(F.col("topk_rn") <= k)
    )
