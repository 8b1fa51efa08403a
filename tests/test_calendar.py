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


# ---------------------------------------------- reference-code parity


def _import_reference_download():
    """Import /root/reference's download module with lightweight stubs for
    its unavailable third-party deps (cdsapi etc. — none touched by the
    pure date logic under test). cadati.day2dekad is stubbed to its
    documented public behavior (day 1-10 -> 1, 11-20 -> 2, else 3)."""
    import sys
    import types

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    stub("cdsapi", Client=object)
    cadati = stub("cadati")
    dekad = stub(
        "cadati.dekad", day2dekad=lambda day: 1 if day <= 10 else (2 if day <= 20 else 3)
    )
    cadati.dekad = dekad
    rp = stub("repurpose")
    rpp = stub("repurpose.process", parallel_process_async=lambda *a, **k: None)
    rp.process = rpp
    stub("parse", parse=lambda *a, **k: None)
    stub("xarray")
    stub("netCDF4", Dataset=object, num2date=lambda *a, **k: None)
    sys.path.insert(0, "/root/reference/src")
    import importlib

    return importlib.import_module("c3s_sm.download")


def test_dekad_grid_matches_reference_first_missing_date(spark):
    """The engine's dekadal temporal grid must enumerate EXACTLY the dates
    the reference's own frontier logic steps through
    (/root/reference/src/c3s_sm/download.py:312-335): successive
    first_missing_date(d, 'dekadal') calls from a dekad start walk every
    product dekad, including the 3rd-dekad month rollover and leap
    February."""
    from datetime import datetime

    dl = _import_reference_download()
    start, end = datetime(2019, 1, 1), datetime(2021, 12, 21)
    ref_dates = [start]
    while True:
        nxt = dl.first_missing_date(ref_dates[-1].strftime("%Y-%m-%d"), "dekadal")
        if nxt > end:
            break
        ref_dates.append(nxt)
    got = [
        r["ts"]
        for r in temporal_grid(spark, "dekadal", "2019-01-01", "2021-12-31")
        .orderBy("ts")
        .collect()
    ]
    assert [d.strftime("%Y-%m-%d") for d in ref_dates] == [
        t.strftime("%Y-%m-%d") for t in got
    ]
    # leap February 2020: 3rd dekad starts on the 21st, next lands Mar 1
    feb = [d for d in ref_dates if d.year == 2020 and d.month == 2]
    assert [d.day for d in feb] == [1, 11, 21]
    assert dl.first_missing_date("2020-02-21", "dekadal") == datetime(2020, 3, 1)


def test_monthly_daily_grids_match_reference_stepping(spark):
    from datetime import datetime

    dl = _import_reference_download()
    for freq, start, end in (
        ("monthly", "2019-01-01", "2020-12-01"),
        ("daily", "2020-02-20", "2020-03-05"),  # leap-day window
    ):
        cur = datetime.strptime(start, "%Y-%m-%d")
        ref = [cur]
        while True:
            nxt = dl.first_missing_date(ref[-1].strftime("%Y-%m-%d"), freq)
            if nxt > datetime.strptime(end, "%Y-%m-%d"):
                break
            ref.append(nxt)
        got = [
            r["ts"]
            for r in temporal_grid(spark, freq, start, end).orderBy("ts").collect()
        ]
        assert [d.date() for d in ref] == [t.date() for t in got], freq


def test_time_bucket_exact_floor_and_origin(spark):
    """X47 fixed-width bucketing: exact floor semantics including
    pre-origin (negative-epoch) timestamps, origin shifting, and the
    window_start '<N>s' routing that lets rollup() take regular widths."""
    from c3s_sm_spark.operators.calendar import time_bucket, window_start

    rows = [(-7,), (0,), (1,), (299,), (300,), (601,), (-300,), (-301,)]
    df = spark.createDataFrame(rows, ["e"]).select(
        F.timestamp_seconds(F.col("e")).alias("ts"), "e"
    )
    got = {
        r["e"]: r["b"]
        for r in df.select(
            "e", F.unix_timestamp(time_bucket("ts", 300)).alias("b")
        ).collect()
    }
    assert got == {-7: -300, 0: 0, 1: 0, 299: 0, 300: 300, 601: 600,
                   -300: -300, -301: -600}

    # origin shifts the lattice
    got_o = {
        r["e"]: r["b"]
        for r in df.select(
            "e", F.unix_timestamp(time_bucket("ts", 300, origin_epoch=100)).alias("b")
        ).collect()
    }
    assert got_o[0] == -200 and got_o[299] == 100 and got_o[601] == 400

    # window_start routes "<N>s" to time_bucket; bad widths rejected
    assert (
        df.select(F.unix_timestamp(window_start("ts", "300s")).alias("b")).collect()
        == df.select(F.unix_timestamp(time_bucket("ts", 300)).alias("b")).collect()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        window_start("ts", "weekly")
    with _pytest.raises(ValueError):
        time_bucket("ts", 0)


def test_rollup_accepts_fixed_width_freq(spark):
    """rollup() with a '<N>s' freq equals a manual groupBy on the same
    bucket — and cascade() re-aggregates 300s into 900s exactly."""
    from c3s_sm_spark.operators.calendar import time_bucket
    from c3s_sm_spark.operators.rollup import cascade, rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    r = rollup(ev, ["user_id"], "ts", "300s", value_col="value", flag_col=None)
    manual = (
        ev.groupBy("user_id", time_bucket("ts", 300).alias("ts"))
        .agg(
            F.sum(F.col("value").cast("double")).alias("v_sum"),
            F.count("value").alias("nobs"),
        )
    )
    j = r.join(manual.withColumnRenamed("v_sum", "m_sum").withColumnRenamed("nobs", "m_n"),
               ["user_id", "ts"], "full")
    bad = j.filter(
        F.col("m_n").isNull() | F.col("nobs").isNull()
        | (F.col("nobs") != F.col("m_n"))
        | (F.abs(F.col("v_sum") - F.col("m_sum")) > 1e-9)
    )
    assert bad.count() == 0

    c = cascade(r, ["user_id"], "900s")
    direct = rollup(ev, ["user_id"], "ts", "900s", value_col="value", flag_col=None)
    jj = c.select("user_id", "ts", "nobs").join(
        direct.select("user_id", "ts", F.col("nobs").alias("d_n")), ["user_id", "ts"], "full"
    )
    assert jj.filter(F.col("nobs") != F.col("d_n")).count() == 0
