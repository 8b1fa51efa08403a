"""Gap-fill onto a regular temporal grid (the reference's core join, J3).

Reference semantics: the reshuffle iterates the *expected* timestamp grid
(``/root/reference/src/c3s_sm/interface.py:391-423``); a missing image for
an expected date raises IOError
(``/root/reference/src/c3s_sm/interface.py:345-346,439-444``) and the
consumer writes an all-fill row for that date, so every series carries the
full regular time axis (golden: ``[66.0677, nan, 80.7060, 70.5648, nan]``,
``/root/reference/tests/test_reshuffle.py:77-84``).

Spark-first expression: a null-producing LEFT OUTER JOIN of the
``(key x calendar)`` frame against the data. The calendar side is tiny
(thousands of rows) and the key dimension is derived from the data itself
or supplied; the join key includes the series key, so Catalyst plans a
plain equi-join. At 100 TB the fact side stays put: the grid side is
broadcast when small, and AQE handles the rest; no shuffle of the fact
table is needed beyond the one its own aggregation already requires.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c3s_sm_spark.operators.calendar import temporal_grid


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    freq: str,
    start: str,
    end: str,
    fill: dict | None = None,
    keys_df: DataFrame | None = None,
) -> DataFrame:
    """Left-join ``df`` onto the full ``(key, grid-ts)`` frame.

    ``df[ts_col]`` must already be bucketed to window starts for ``freq``
    (use :func:`c3s_sm_spark.operators.calendar.window_start`).
    Missing ``(key, ts)`` combinations appear with nulls in every data
    column, or with ``fill[col]`` where a fill policy is given — the
    relational analog of the reference's per-parameter ``fillval`` dict
    (``/root/reference/src/c3s_sm/reshuffle.py:205-212``); internally nulls
    are preferred over sentinels (SURVEY.md P2).

    ``keys_df`` optionally supplies the key universe (e.g. the grid's
    active points, reference P3/P6); default is ``df``'s distinct keys.
    """
    spark = df.sparkSession
    grid = temporal_grid(spark, freq, start, end, col_name=ts_col)
    if keys_df is None:
        keys_df = df.select(*keys).distinct()
    # key-universe x calendar: both sides are dimension-sized; broadcast the
    # calendar so the cross join never shuffles the key dimension.
    frame = keys_df.crossJoin(F.broadcast(grid))
    out = frame.join(df, on=[*keys, ts_col], how="left")
    # ONE projection for both the fill and no-fill paths: keys + ts, any
    # extra key-universe columns (e.g. lat/lon riding on keys_df), then
    # df's data columns — a fill dict used to reorder the schema and
    # silently drop the keys_df extras
    extra = [
        c for c in keys_df.columns if c not in keys and c not in df.columns
    ]
    data_cols = [c for c in df.columns if c not in (*keys, ts_col)]
    fill = fill or {}
    return out.select(
        *[*keys, ts_col, *extra],
        *[
            F.coalesce(F.col(c), F.lit(fill[c])).alias(c)
            if c in fill
            else F.col(c)
            for c in data_cols
        ],
    )
