"""Interval joins without range-join blowup: point-in-interval and
interval-overlap joins via time-bucket equi-joins.

Spark has no native interval/range join; the naive formulation
(``l JOIN r ON l.key = r.key AND l.ts BETWEEN r.start AND r.end``) plans
as an equi-join on the key with the BETWEEN as a post-join filter, which
is quadratic in any hot key's row count — unusable at corpus scale. The
standard fix (DuckDB's IEJoin and Databricks' range-join hints solve the
same problem engine-side) is to quantize time into fixed buckets, expand
each interval onto every bucket it covers, and equi-join on
``(key, bucket)`` so only temporally-near pairs ever meet; the exact
predicate then filters the survivors. Reference parity: the reference's
validation consumers window station observations against satellite
overpass intervals — the same contain/overlap shapes
(``/root/reference/src/c3s_sm/interface.py`` read-back plus pytesmo-style
temporal windows downstream).

Bucket-width tuning (100 TB): cost is (interval replicas = span /
``bucket_s``) x (points per bucket). Pick ``bucket_s`` near the median
interval length so most intervals expand to 1-2 replicas; a hot time
range still concentrates pairs in one bucket, which is genuine data
density, not plan skew. ``max_span_buckets`` fails LOUDLY when an
open-ended sentinel interval (end = 9999-12-31) would otherwise explode
into millions of replicas — the classic silent-blowup of bucketized
range joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(ts: Column, bucket_s: int) -> Column:
    """Epoch-second bucket ordinal. ``unix_timestamp`` truncates
    sub-second parts toward zero, which preserves temporal order, so a
    contained point's bucket always lands inside its interval's expanded
    bucket range even for fractional-second timestamps."""
    return F.floor(F.unix_timestamp(ts) / F.lit(bucket_s)).cast("long")


def _expand(
    intervals: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    bucket_s: int,
    max_span_buckets: int,
    carry: list[str],
) -> DataFrame:
    """One row per (interval, covered bucket) as ``__ib``; empty
    intervals (end < start) drop out here, matching the exact predicate.

    The span guard lives INSIDE the sequence bound expression
    (``coalesce(assert_true(...), 0)`` is 0 when the span is legal and
    raises otherwise) — as a standalone projected column the optimizer
    would prune it as dead code and the job would silently explode a
    sentinel interval instead of failing.
    """
    sb = _bucket(F.col(start_col), bucket_s)
    eb = _bucket(F.col(end_col), bucket_s)
    guard = F.coalesce(
        F.assert_true(
            eb - sb < F.lit(max_span_buckets),
            F.lit(
                f"interval spans >= {max_span_buckets} buckets of {bucket_s}s"
                " — raise bucket_s or max_span_buckets, or clamp sentinel"
                " end timestamps before joining"
            ),
        ).cast("long"),
        F.lit(0),
    )
    out_cols = list(keys) + [c for c in carry if c not in keys]
    return intervals.filter(F.col(end_col) >= F.col(start_col)).select(
        *out_cols,
        F.explode(F.sequence(sb, eb + guard)).alias("__ib"),
    )


def _carry_list(want: list[str], start_col: str, end_col: str) -> list[str]:
    """Requested output columns plus the bounds the predicate needs."""
    carry = list(want)
    for c in (start_col, end_col):
        if c not in carry:
            carry.append(c)
    return carry


def _expand_side(
    intervals: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    bucket_s: int,
    max_span_buckets: int,
    carry: list[str],
):
    """Expanded interval side with keys renamed ``__ik{i}`` and carried
    columns prefixed ``iv_``, plus the (bucket, null-safe keys) join
    condition builder — the scaffolding both joins share, factored so a
    fix to either applies to both."""
    exp = _expand(
        intervals, keys, start_col, end_col, bucket_s, max_span_buckets, carry
    ).select(
        *[F.col(k).alias(f"__ik{i}") for i, k in enumerate(keys)],
        *[F.col(c).alias(f"iv_{c}") for c in carry if c not in keys],
        "__ib",
    )

    def cond(bucket_col: str) -> Column:
        c = F.col(bucket_col) == F.col("__ib")
        for i, k in enumerate(keys):
            c = c & F.col(k).eqNullSafe(F.col(f"__ik{i}"))
        return c

    return exp, cond


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
    interval_cols: Sequence[str] | None = None,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Attach, to every ``points`` row, each same-key interval containing
    its timestamp (closed on both ends: ``start <= ts <= end``) — the
    point-in-interval join behind "which maintenance window / session /
    outage was this event inside".

    A point matching k intervals emits k rows; a point matching none is
    dropped (inner semantics — left-semi/anti variants are one filter away
    on the caller side). Reversed intervals (``end < start``) denote the
    EMPTY SET under the closed-interval reading and match nothing (here
    that also follows from the predicate itself). Each (point, interval)
    pair meets EXACTLY once:
    the point lives in one bucket, and the interval covers that bucket
    once, so no post-join dedup is needed (the overlap join below does
    need one).

    Output: all point columns, plus each requested interval column as
    ``iv_<col>`` (default: ``start`` and ``end``), so nothing collides.

    Plan: both sides shuffle once on ``(keys, bucket)``; the containment
    predicate filters joined candidates. Never a theta-join.
    """
    keys = list(keys)
    want = list(interval_cols) if interval_cols is not None else [start_col, end_col]
    carry = _carry_list(want, start_col, end_col)
    exp, cond = _expand_side(
        intervals, keys, start_col, end_col, bucket_s, max_span_buckets, carry
    )
    pts = points.withColumn("__b", _bucket(F.col(ts_col), bucket_s))
    joined = pts.join(exp, cond("__b"), "inner").filter(
        (F.col(ts_col) >= F.col(f"iv_{start_col}"))
        & (F.col(ts_col) <= F.col(f"iv_{end_col}"))
    )
    return joined.select(*points.columns, *[f"iv_{c}" for c in want if c not in keys])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket_s: int = 3600,
    right_cols: Sequence[str] | None = None,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Interval x interval overlap join: pair every ``left`` interval
    with each same-key ``right`` interval it overlaps
    (``l.start <= r.end AND r.start <= l.end``, closed ends).

    Overlapping pairs co-occur in EVERY shared bucket, so the join would
    duplicate them; the pair is kept only in its canonical bucket
    ``max(l.start_bucket, r.start_bucket)`` — the first bucket both
    cover — which every genuine overlap has (standard dedup of
    bucketized interval joins; a distinct() over the pair payload would
    shuffle the full duplicated result instead).

    Output: all ``left`` columns + requested right columns as
    ``iv_<col>`` (default: right start/end). Same bucket-width and
    ``max_span_buckets`` contract as :func:`interval_join`.

    Reversed intervals (``end < start``) are the EMPTY SET under the
    closed-interval reading and are dropped from BOTH sides before
    joining. NOTE this deliberately differs from the raw predicate
    ``l.start <= r.end AND r.start <= l.end``, which a naive theta-join
    would satisfy for some reversed rows (e.g. [13:00, 11:00] against
    [10:00, 14:00]) — an empty set overlaps nothing, so those matches
    are semantic noise. Pre-normalize (swap the bounds) if reversed
    rows are meant as valid intervals.
    """
    keys = list(keys)
    want = list(right_cols) if right_cols is not None else [right_start, right_end]
    carry = _carry_list(want, right_start, right_end)
    exp_r, cond = _expand_side(
        right, keys, right_start, right_end, bucket_s, max_span_buckets, carry
    )
    exp_l = _expand(
        left, keys, left_start, left_end, bucket_s, max_span_buckets, list(left.columns)
    ).withColumnRenamed("__ib", "__b")
    lb = _bucket(F.col(left_start), bucket_s)
    rb = _bucket(F.col(f"iv_{right_start}"), bucket_s)
    joined = (
        exp_l.join(exp_r, cond("__b"), "inner")
        .filter(
            (F.col(left_start) <= F.col(f"iv_{right_end}"))
            & (F.col(f"iv_{right_start}") <= F.col(left_end))
        )
        .filter(F.col("__b") == F.greatest(lb, rb))
    )
    return joined.select(*left.columns, *[f"iv_{c}" for c in want if c not in keys])


def merge_intervals(
    intervals: DataFrame,
    keys: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping or touching same-key intervals into maximal
    islands (the classic gaps-and-islands aggregation): the union of
    [09:00,10:00], [09:30,11:00], [11:00,11:15] is one island
    [09:00,11:15]. Closed-interval reading — touching endpoints merge;
    reversed intervals (end < start) are empty sets and are dropped, the
    same contract as the joins above. The island set is what coverage /
    total-outage-time / SLA math needs (summing raw durations
    double-counts overlap).

    Output: keys + ``island_id`` (0-based per key, in time order),
    ``start_col`` (island min start), ``end_col`` (island max end),
    ``n_intervals`` (BIGINT members merged).

    Plan: ONE hash shuffle on ``keys``; island detection is a running
    ``max(end)`` window over the per-key start-sorted stream (an
    interval starts a new island iff its start exceeds every earlier
    end), then a cumulative-sum island ordinal and a groupBy that
    reuses the window's partitioning — no join, no second shuffle. A
    single hot key serializes into one task (the standard window
    caveat); the two-phase range-chunk pattern
    (``timeseries.sessionize_scalable``) applies if one key owns
    billions of intervals.
    """
    keys = list(keys)
    base = intervals.filter(F.col(end_col) >= F.col(start_col))
    w = Window.partitionBy(*keys).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    tagged = base.withColumn(
        "__island",
        (
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long"),
    )
    return tagged.groupBy(*keys, "__island").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    ).withColumnRenamed("__island", "island_id")
