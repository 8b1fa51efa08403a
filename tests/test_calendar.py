"""Dekad/daily/monthly grid + bucketing semantics.

Goldens mirror the reference's dekad arithmetic
(/root/reference/src/c3s_sm/download.py:326-333: start days {1,11,21},
3rd dekad rolls to next month) and grid enumeration
(/root/reference/src/c3s_sm/interface.py:391-423).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from c3s_sm_spark.operators.calendar import (
    dekad_start,
    next_period_start,
    temporal_grid,
    window_start,
)


def _col_vals(spark, expr, ts_strings):
    df = spark.createDataFrame([(s,) for s in ts_strings], ["raw"]).select(
        expr(F.to_timestamp("raw")).alias("out")
    )
    return [r["out"] for r in df.collect()]


@pytest.mark.parametrize(
    "ts,expected",
    [
        ("2020-01-01 05:00:00", dt.datetime(2020, 1, 1)),
        ("2020-01-10 23:59:59", dt.datetime(2020, 1, 1)),
        ("2020-01-11 00:00:00", dt.datetime(2020, 1, 11)),
        ("2020-01-20 12:00:00", dt.datetime(2020, 1, 11)),
        ("2020-01-21 00:00:00", dt.datetime(2020, 1, 21)),
        ("2020-01-31 23:00:00", dt.datetime(2020, 1, 21)),
        ("2020-02-29 10:00:00", dt.datetime(2020, 2, 21)),  # leap month end
        ("2019-02-28 10:00:00", dt.datetime(2019, 2, 21)),
    ],
)
def test_dekad_start(spark, ts, expected):
    assert _col_vals(spark, dekad_start, [ts]) == [expected]


@pytest.mark.parametrize(
    "ts,freq,expected",
    [
        ("2020-01-21 05:00:00", "dekadal", dt.datetime(2020, 2, 1)),  # rollover
        ("2020-01-15 05:00:00", "dekadal", dt.datetime(2020, 1, 21)),
        ("2020-01-05 05:00:00", "dekadal", dt.datetime(2020, 1, 11)),
        ("2020-12-25 00:00:00", "dekadal", dt.datetime(2021, 1, 1)),  # year roll
        ("2020-01-31 00:00:00", "daily", dt.datetime(2020, 2, 1)),
        ("2020-12-15 00:00:00", "monthly", dt.datetime(2021, 1, 1)),
    ],
)
def test_next_period_start(spark, ts, freq, expected):
    assert _col_vals(spark, lambda c: next_period_start(c, freq), [ts]) == [expected]


def test_temporal_grid_daily(spark):
    rows = temporal_grid(spark, "daily", "2020-02-27", "2020-03-02").orderBy("ts").collect()
    assert [r["ts"].day for r in rows] == [27, 28, 29, 1, 2]  # leap year


def test_temporal_grid_dekadal(spark):
    rows = temporal_grid(spark, "dekadal", "2019-12-20", "2020-02-01").orderBy("ts").collect()
    got = [(r["ts"].month, r["ts"].day) for r in rows]
    assert got == [(12, 21), (1, 1), (1, 11), (1, 21), (2, 1)]


def test_temporal_grid_monthly(spark):
    rows = temporal_grid(spark, "monthly", "2019-11-15", "2020-02-01").orderBy("ts").collect()
    got = [(r["ts"].year, r["ts"].month, r["ts"].day) for r in rows]
    assert got == [(2019, 12, 1), (2020, 1, 1), (2020, 2, 1)]


def test_window_start_monthly_vs_daily(spark):
    vals = _col_vals(spark, lambda c: window_start(c, "monthly"), ["2020-03-17 13:00:00"])
    assert vals == [dt.datetime(2020, 3, 1)]
    vals = _col_vals(spark, lambda c: window_start(c, "daily"), ["2020-03-17 13:00:00"])
    assert vals == [dt.datetime(2020, 3, 17)]
