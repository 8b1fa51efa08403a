"""Temporal rollups: the C3S daily / dekadal / monthly tier aggregates.

Reference semantics: the C3S products are temporal means per tier window
(``freq_lut = {'daily': 'day_average', 'dekadal': '10_day_average',
'monthly': 'month_average'}``, ``/root/reference/src/c3s_sm/const.py:42-46``)
carrying ``nobs`` = number of valid observations
(``/root/reference/src/c3s_sm/metadata.py:212``) and the bit-union of
sensor/freqband bitmasks over the window
(``/root/reference/src/c3s_sm/metadata.py:205-211``; golden 768 = Bit8|Bit9,
``/root/reference/tests/test_reshuffle.py:164``).

Design for exact cascading: every tier carries ``v_sum`` (float64) and
``nobs`` alongside ``v_mean``; a higher tier aggregates the tier below with
``sum(v_sum) / sum(nobs)`` — sums and counts are associative, so the
cascade is EXACTLY equal to aggregating raw (same float64 additions modulo
order; parity harness in tests pins it). ``bit_or`` is associative too.
Spark plans these as partial (map-side) + final hash aggregates — one
shuffle per tier, and the dekadal/monthly tiers aggregate the already-tiny
daily tier, not raw.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c3s_sm_spark.operators.calendar import window_start

#: aggregate column names shared by all tiers (FIXTURES.md F3)
TIER_COLS = ("v_mean", "v_sum", "nobs", "flags")


def tier_aggs(value_col: str, flag_col: str | None) -> list:
    """The tier aggregate list — ONE definition shared by the batch
    :func:`rollup` and the streaming twin
    (``streaming.refresh.stream_daily_rollup``), so the two paths cannot
    drift apart column by column."""
    aggs = [
        F.sum(F.col(value_col).cast("double")).alias("v_sum"),
        F.count(value_col).alias("nobs"),
    ]
    if flag_col is not None:
        aggs.append(F.bit_or(F.col(flag_col).cast("int")).alias("flags"))
    return aggs


def finish_tier(out: DataFrame, flag_col: str | None) -> DataFrame:
    """Shared tier finisher: derive ``v_mean`` and normalize the flags
    column when no flag source exists."""
    out = out.withColumn("v_mean", F.col("v_sum") / F.col("nobs"))
    if flag_col is None:
        out = out.withColumn("flags", F.lit(None).cast("int"))
    return out


def rollup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    freq: str,
    value_col: str = "v",
    flag_col: str | None = "flag",
) -> DataFrame:
    """Roll raw points up to one row per ``(keys, window_start)``.

    Output: keys + ``ts`` (window start) + ``v_mean`` (mean of valid
    values, float64), ``v_sum``, ``nobs`` (count of valid), ``flags``
    (bit_or over the window; NULL when ``flag_col=None`` — "no flag
    source" is not the same fact as "all flag bits clear", so 0 would
    lie to a downstream ``flags == 0`` filter). ``flag_col`` must name
    an existing column or be None.
    """
    out = df.groupBy(*keys, window_start(ts_col, freq).alias("ts")).agg(
        *tier_aggs(value_col, flag_col)
    )
    out = finish_tier(out, flag_col)
    return out.select(*keys, "ts", *TIER_COLS)


def moving_mean(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    n_back: int = 2,
    out_col: str = "v_smooth",
) -> DataFrame:
    """Trailing moving mean over the ``n_back`` previous rows + current.

    The engine's only frame-spec window (SURVEY.md §2.5): drought-index
    style smoothing over an already-regular tier. One shuffle on ``keys``;
    rows within a key are sorted once and the frame slides — no
    per-window rescan.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-n_back, Window.currentRow)
    )
    return df.withColumn(out_col, F.avg(F.col(value_col)).over(w))


def cascade(tier_df: DataFrame, keys: Sequence[str], freq: str) -> DataFrame:
    """Aggregate a finer tier into a coarser one (continuous-aggregate).

    ``tier_df`` must be a :func:`rollup` output (has ``ts v_sum nobs
    flags``). E.g. daily -> dekadal -> monthly: each step groups ~10-30
    child rows per output row, so the shuffle volume shrinks ~10x per
    tier — the scale story of cascading retention.
    """
    return (
        tier_df.groupBy(*keys, window_start("ts", freq).alias("ts"))
        .agg(
            F.sum("v_sum").alias("v_sum"),
            F.sum("nobs").alias("nobs"),
            F.bit_or("flags").alias("flags"),
        )
        .withColumn(
            "v_mean",
            F.when(F.col("nobs") > 0, F.col("v_sum") / F.col("nobs")),
        )
        .select(*keys, "ts", *TIER_COLS)
    )
