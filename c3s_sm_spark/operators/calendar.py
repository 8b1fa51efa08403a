"""Temporal-grid generation and window bucketing (daily / dekadal / monthly).

Reference semantics:

- Regular product grids are enumerated by
  ``C3S_Nc_Img_Stack.tstamps_for_daterange``
  (``/root/reference/src/c3s_sm/interface.py:391-423``): daily =
  ``pd.date_range(freq='D')``, monthly = month starts (``freq='MS'``),
  dekadal = the 10-daily calendar with period start days {1, 11, 21}.
- Dekad arithmetic (bucketing + the 3rd-dekad month rollover) is pinned by
  ``first_missing_date`` (``/root/reference/src/c3s_sm/download.py:326-333``):
  day must be in {1, 11, 21}; the dekad after day 21 is the 1st of the next
  month. The 3rd dekad is therefore 8-11 days long — non-uniform, so Spark's
  fixed-width ``window()`` cannot express it; we bucket with date
  expressions instead (grouping column), which Catalyst folds into the scan.

Everything here is pure Column expressions (JVM-side, codegen'd) or a
generated ``sequence()`` DataFrame — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FREQS = ("daily", "dekadal", "monthly")


def day_start(ts: Column | str) -> Column:
    """Midnight of the day containing ``ts`` (timestamp-typed)."""
    return F.date_trunc("day", ts)


def dekad_start(ts: Column | str) -> Column:
    """Start timestamp of the dekad containing ``ts``.

    Day 1-10 -> day 1; 11-20 -> day 11; 21-end -> day 21
    (``/root/reference/src/c3s_sm/download.py:326-333``,
    ``/root/reference/src/c3s_sm/interface.py:417-419``).
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    d = F.dayofmonth(c)
    start_day = F.when(d <= 10, F.lit(1)).when(d <= 20, F.lit(11)).otherwise(F.lit(21))
    return F.to_timestamp(F.make_date(F.year(c), F.month(c), start_day))


def month_start(ts: Column | str) -> Column:
    """First instant of the month containing ``ts``."""
    return F.date_trunc("month", ts)


def time_bucket(ts: Column | str, width_s: int, origin_epoch: int = 0) -> Column:
    """Fixed-width bucket start (TimescaleDB ``time_bucket`` analog):
    the largest ``origin_epoch + k * width_s`` at-or-before ``ts``.

    Exact BIGINT arithmetic end to end — ``pmod`` gives floor semantics
    for timestamps before the origin too (an epoch of -7 with width 10
    buckets to -10, not 0), so the bucketing is engine-reproducible.
    Complements the calendar tiers: those follow the reference's
    non-uniform product calendar (dekads are 8-11 days), this covers the
    regular resampling the tokenized corpus needs (5-minute counters,
    6-hourly rollups) where Spark's ``window()`` would emit a struct and
    a fresh origin convention per call site.
    """
    if width_s <= 0:
        raise ValueError(f"width_s must be positive, got {width_s}")
    e = F.unix_timestamp(F.col(ts) if isinstance(ts, str) else ts)
    b = e - F.pmod(e - F.lit(origin_epoch), F.lit(width_s))
    return F.timestamp_seconds(b)


def window_start(ts: Column | str, freq: str) -> Column:
    """Window-start bucketing column for a tier frequency.

    ``freq`` is a calendar tier (``daily`` / ``dekadal`` / ``monthly``)
    or a fixed width ``"<N>s"`` (e.g. ``"300s"``) routed through
    :func:`time_bucket` — so :func:`~c3s_sm_spark.operators.rollup.rollup`
    and ``cascade`` accept arbitrary regular widths (cascading requires
    the coarser width to be a multiple of the finer one, as with the
    calendar tiers)."""
    if freq == "daily":
        return day_start(ts)
    if freq == "dekadal":
        return dekad_start(ts)
    if freq == "monthly":
        return month_start(ts)
    if freq.endswith("s") and freq[:-1].isdigit():
        return time_bucket(ts, int(freq[:-1]))
    raise ValueError(f"freq must be one of {FREQS} or '<N>s', got {freq!r}")


def next_period_start(ts: Column | str, freq: str) -> Column:
    """Start of the period *after* the one containing ``ts``.

    This is the engine's incremental-extend frontier step, mirroring
    ``first_missing_date`` (``/root/reference/src/c3s_sm/download.py:312-335``):
    daily -> +1 day; monthly -> next month start; dekadal -> next dekad
    start, where the dekad after day 21 rolls to the 1st of next month.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    if freq == "daily":
        return F.to_timestamp(F.date_add(day_start(c), 1))
    if freq == "monthly":
        return F.to_timestamp(F.add_months(month_start(c), 1))
    if freq == "dekadal":
        cur = dekad_start(c)
        d = F.dayofmonth(cur)
        return F.when(
            d == 21, F.to_timestamp(F.add_months(F.date_trunc("month", cur), 1))
        ).otherwise(F.to_timestamp(F.date_add(cur, 10)))
    raise ValueError(f"freq must be one of {FREQS}, got {freq!r}")


def temporal_grid(
    spark: SparkSession, freq: str, start: str, end: str, col_name: str = "ts"
) -> DataFrame:
    """Expected-timestamp grid in ``[start, end]`` at the product frequency.

    Spark-native analog of ``tstamps_for_daterange``
    (``/root/reference/src/c3s_sm/interface.py:391-423``): one generated
    ``sequence()`` + ``explode`` — a single-row seed that Catalyst expands
    executor-side; the daily grid for a century is ~36k rows, so this never
    needs distribution, but composes (broadcast) with arbitrarily large
    fact tables in :func:`c3s_sm_spark.operators.gapfill.gap_fill`.

    ``start``/``end`` are inclusive date strings. For ``dekadal`` the grid
    is the dekad start days {1, 11, 21}; for ``monthly`` the month starts.
    """
    if freq not in FREQS:
        raise ValueError(f"freq must be one of {FREQS}, got {freq!r}")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end)),
                F.expr("interval 1 day"),
            )
        ).alias(col_name)
    )
    if freq == "daily":
        return days
    if freq == "dekadal":
        return days.where(F.dayofmonth(col_name).isin(1, 11, 21))
    return days.where(F.dayofmonth(col_name) == 1)
