"""Climatology + anomaly (drought-index style) operators.

The reference's dekadal/monthly C3S products exist to feed exactly this
kind of consumer: drought indicators computed as departures of the
current aggregate from the location's long-term climatology (the product
line the reference ships via its 10-day/monthly averages,
``/root/reference/src/c3s_sm/const.py:42-46``; product semantics in
``/root/reference/src/c3s_sm/metadata.py:163-231``). The engine makes the
departure computation itself a first-class operator:

- :func:`climatology` — per key x calendar-cycle slot (month-of-year /
  day-of-week / hour-of-day) mean, sample std and count over the full
  history. One hash aggregation; at 10^12 points the map-side partial
  agg collapses each task to ``keys x cycle`` partial tuples before the
  shuffle, so the shuffle is tiny regardless of input size.
- :func:`anomaly` — z-score of each row against its key's climatology
  slot. The climatology relation is ``|keys| x cycle`` rows —
  broadcast-joined back; the raw side never shuffles. Slots with a
  degenerate std (n <= 1 or all-equal values) yield NULL z, never a
  division blow-up.

Both are pure DataFrame transforms (no UDF anywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: cycle name -> column expression extracting the climatology slot
_CYCLES = {
    "month": lambda c: F.month(c),
    "dayofweek": lambda c: F.dayofweek(c),
    "hour": lambda c: F.hour(c),
}


def cycle_col(ts: Column, cycle: str) -> Column:
    if cycle not in _CYCLES:
        raise ValueError(f"cycle must be one of {sorted(_CYCLES)}, got {cycle!r}")
    return _CYCLES[cycle](ts).cast("int")


def climatology(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    cycle: str = "month",
) -> DataFrame:
    """Per-key climatology over calendar-cycle slots.

    Output: ``keys..., cyc, clim_mean, clim_std, clim_n`` (std is the
    sample standard deviation; NULL when n <= 1).
    """
    return (
        df.groupBy(*keys, cycle_col(F.col(ts_col), cycle).alias("cyc"))
        .agg(
            F.avg(value_col).alias("clim_mean"),
            F.stddev_samp(value_col).alias("clim_std"),
            F.count(value_col).alias("clim_n"),
        )
    )


def anomaly(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    cycle: str = "month",
    clim: DataFrame | None = None,
    broadcast_clim: bool = True,
) -> DataFrame:
    """Z-score anomaly of every row vs its key's climatology slot.

    ``clim`` may be a precomputed (possibly longer-history) climatology
    frame from :func:`climatology` — the operational pattern, where the
    baseline spans decades but anomalies are computed for the current
    window only. Adds ``cyc, clim_mean, clim_std, z`` columns; ``z`` is
    NULL where the slot's std is NULL or zero.

    ``broadcast_clim=False`` drops the broadcast hint for
    HIGH-CARDINALITY keys: the climatology is ``|keys| x cycle`` rows,
    and force-broadcasting 10^8+ keys would OOM the driver — a shuffle
    join (AQE still broadcasts when it measures small) is the scale
    path there.
    """
    if clim is None:
        clim = climatology(df, keys, ts_col, value_col, cycle)
    if broadcast_clim:
        clim = F.broadcast(clim)
    out = df.withColumn("cyc", cycle_col(F.col(ts_col), cycle)).join(
        clim, [*keys, "cyc"], "left"
    )
    z = (F.col(value_col) - F.col("clim_mean")) / F.nullif(
        F.col("clim_std"), F.lit(0.0)
    )
    return out.withColumn("z", z)


def percentile_index(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    cycle: str = "month",
) -> DataFrame:
    """Empirical percentile (SPI/SMI-style drought index) of every
    observation within its key x cycle-slot climatology distribution —
    the non-parametric sibling of :func:`anomaly`'s z-score (operational
    drought products rank the current aggregate against the same
    calendar slot's history instead of assuming normality).

    One window per ``(keys, cyc)`` group ordered by value:
    ``pr_num = rank - 1`` and ``pr_den = n - 1`` are exact integers on
    any engine (ties share a rank, SQL-standard), and
    ``pct_rank = pr_num / pr_den`` is the familiar ``percent_rank``
    float (0 when the slot has a single observation). NULL values are
    dropped (a NULL can't hold a rank, and leaving it in would skew
    rank() against count(value) inconsistently).

    Scale shape: one hash shuffle on ``(keys, cyc)`` and a per-slot
    sort; slots are calendar-bounded (<= 12 months / 7 days / 24 hours
    per key), so slot size ~ history length per key — the same per-key
    series bound as the plain window operators.
    """
    out = df.filter(F.col(value_col).isNotNull()).withColumn(
        "cyc", cycle_col(F.col(ts_col), cycle)
    )
    w = Window.partitionBy(*keys, "cyc").orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*keys, "cyc")
    return (
        out.withColumn("pr_num", (F.rank().over(w) - F.lit(1)).cast("long"))
        .withColumn("pr_den", (F.count(value_col).over(wn) - F.lit(1)).cast("long"))
        .withColumn("pct_rank", F.percent_rank().over(w))
    )
