"""Interval-join pins: the bucketized equi-join plans must produce
exactly the naive theta-join's rows (pair-for-pair, no duplicates from
multi-bucket co-occurrence), the span guard must fail loudly on
sentinel intervals, and NULL keys must group like the window-family
operators do (eqNullSafe convention shared with timeseries carries).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from c3s_sm_spark.operators.intervals import interval_join, interval_overlap_join


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        Row(k="a", pid=1, ts=_ts("2024-01-01 00:00:05")),
        Row(k="a", pid=2, ts=_ts("2024-01-01 01:30:00")),
        Row(k="a", pid=3, ts=_ts("2024-01-01 23:59:59.750000")),
        Row(k="b", pid=4, ts=_ts("2024-01-01 00:00:05")),
        Row(k="b", pid=5, ts=_ts("2024-01-03 12:00:00")),
        Row(k=None, pid=6, ts=_ts("2024-01-01 00:10:00")),
        Row(k="c", pid=7, ts=_ts("2024-01-01 05:00:00")),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        # two overlapping intervals on "a": pid 1 hits both, pid 2 one
        Row(k="a", iid=10, start=_ts("2024-01-01 00:00:00"),
            end=_ts("2024-01-01 02:00:00")),
        Row(k="a", iid=11, start=_ts("2024-01-01 00:00:05"),
            end=_ts("2024-01-01 00:00:05")),  # degenerate point interval
        # closed-end containment exactly at a fractional-second boundary
        Row(k="a", iid=12, start=_ts("2024-01-01 23:00:00"),
            end=_ts("2024-01-01 23:59:59.750000")),
        Row(k="b", iid=13, start=_ts("2024-01-01 00:00:00"),
            end=_ts("2024-01-02 00:00:00")),
        # empty interval (end < start) must match nothing
        Row(k="b", iid=14, start=_ts("2024-01-03 13:00:00"),
            end=_ts("2024-01-03 11:00:00")),
        # NULL key interval: groups with NULL-key points
        Row(k=None, iid=15, start=_ts("2024-01-01 00:00:00"),
            end=_ts("2024-01-01 01:00:00")),
    ]
    return spark.createDataFrame(rows)


def _naive_contain(points, intervals):
    """Reference semantics: eqNullSafe key + closed BETWEEN, via a
    renamed cross-join filter (the quadratic plan the operator avoids)."""
    iv = intervals.select(
        F.col("k").alias("ik"),
        F.col("iid").alias("iv_iid"),
        F.col("start").alias("iv_start"),
        F.col("end").alias("iv_end"),
    )
    return (
        points.join(
            iv,
            F.col("k").eqNullSafe(F.col("ik"))
            & (F.col("ts") >= F.col("iv_start"))
            & (F.col("ts") <= F.col("iv_end")),
            "inner",
        )
        .select("pid", "iv_iid")
    )


@pytest.mark.parametrize("bucket_s", [7, 3600, 86400])
def test_interval_join_matches_naive(spark, points, intervals, bucket_s):
    got = interval_join(
        points, intervals, ["k"], ts_col="ts",
        bucket_s=bucket_s, interval_cols=["iid", "start", "end"],
    )
    got_pairs = {(r["pid"], r["iv_iid"]) for r in got.collect()}
    want_pairs = {
        (r["pid"], r["iv_iid"]) for r in _naive_contain(points, intervals).collect()
    }
    assert got_pairs == want_pairs
    # exactly-once: no bucket-induced duplicates
    assert got.count() == len(got_pairs)
    # spot semantics: pid 1 inside both "a" intervals, empty iid 14 gone,
    # NULL key grouped, point 7 (key with no intervals) dropped
    assert {(1, 10), (1, 11), (6, 15)} <= got_pairs
    assert all(i != 14 for _, i in got_pairs)
    assert all(p != 7 for p, _ in got_pairs)


def test_interval_join_output_shape(points, intervals):
    out = interval_join(points, intervals, ["k"], ts_col="ts")
    assert out.columns == points.columns + ["iv_start", "iv_end"]


def test_interval_join_span_guard(spark, points):
    sentinel = spark.createDataFrame(
        [Row(k="a", start=_ts("2024-01-01 00:00:00"),
             end=_ts("9999-12-31 00:00:00"))]
    )
    out = interval_join(
        points, sentinel, ["k"], ts_col="ts", bucket_s=3600,
        max_span_buckets=1000,
    )
    with pytest.raises(Exception, match="buckets"):
        out.collect()


def _naive_overlap(left, right):
    r = right.select(
        F.col("k").alias("rk"),
        F.col("iid").alias("iv_iid"),
        F.col("start").alias("iv_start"),
        F.col("end").alias("iv_end"),
    )
    return (
        left.join(
            r,
            F.col("k").eqNullSafe(F.col("rk"))
            & (F.col("start") <= F.col("iv_end"))
            & (F.col("iv_start") <= F.col("end")),
            "inner",
        )
        .filter(F.col("iid") != F.col("iv_iid"))
        .select(F.col("iid").alias("a"), F.col("iv_iid").alias("b"))
    )


@pytest.mark.parametrize("bucket_s", [60, 3600, 86400])
def test_overlap_join_matches_naive(spark, intervals, bucket_s):
    iv = intervals.filter(F.col("end") >= F.col("start"))
    got = interval_overlap_join(
        iv, iv, ["k"], bucket_s=bucket_s, right_cols=["iid", "start", "end"]
    ).filter(F.col("iid") != F.col("iv_iid"))
    got_pairs = [(r["iid"], r["iv_iid"]) for r in got.collect()]
    want_pairs = {(r["a"], r["b"]) for r in _naive_overlap(iv, iv).collect()}
    assert set(got_pairs) == want_pairs
    # canonical-bucket dedup: each pair exactly once even when the
    # overlap spans many shared buckets
    assert len(got_pairs) == len(set(got_pairs))


def test_overlap_join_drops_reversed_intervals_both_sides(spark):
    """end < start = the empty set: dropped from BOTH sides, even where
    the raw two-sided predicate would match a naive theta-join."""
    rows = [
        Row(k="a", iid=1, start=_ts("2024-01-01 13:00:00"),
            end=_ts("2024-01-01 11:00:00")),  # reversed
        Row(k="a", iid=2, start=_ts("2024-01-01 10:00:00"),
            end=_ts("2024-01-01 14:00:00")),
        Row(k="a", iid=3, start=_ts("2024-01-01 12:00:00"),
            end=_ts("2024-01-01 15:00:00")),
    ]
    iv = spark.createDataFrame(rows)
    got = {
        (r["iid"], r["iv_iid"])
        for r in interval_overlap_join(
            iv, iv, ["k"], right_cols=["iid"]
        ).collect()
    }
    # the raw predicate holds for (1,2)/(2,1), but 1 is empty -> only
    # the 2<->3 genuine overlap (and self-pairs of valid rows) survive
    assert got == {(2, 2), (3, 3), (2, 3), (3, 2)}


def test_merge_intervals_islands(spark):
    """Gaps-and-islands: overlap and touch merge, gaps split, reversed
    rows drop, NULL keys group, island ids are time-ordered per key."""
    from c3s_sm_spark.operators.intervals import merge_intervals

    rows = [
        Row(k="a", start=_ts("2024-01-01 09:00:00"), end=_ts("2024-01-01 10:00:00")),
        Row(k="a", start=_ts("2024-01-01 09:30:00"), end=_ts("2024-01-01 11:00:00")),
        Row(k="a", start=_ts("2024-01-01 11:00:00"), end=_ts("2024-01-01 11:15:00")),  # touches
        Row(k="a", start=_ts("2024-01-01 12:00:00"), end=_ts("2024-01-01 12:30:00")),  # gap -> new island
        # containment: a short interval inside a long earlier one must
        # NOT split the island even though its end < running max end
        Row(k="b", start=_ts("2024-01-01 00:00:00"), end=_ts("2024-01-01 08:00:00")),
        Row(k="b", start=_ts("2024-01-01 01:00:00"), end=_ts("2024-01-01 02:00:00")),
        Row(k="b", start=_ts("2024-01-01 03:00:00"), end=_ts("2024-01-01 09:00:00")),
        Row(k="b", start=_ts("2024-01-01 10:00:00"), end=_ts("2024-01-01 09:00:00")),  # reversed: dropped
        Row(k=None, start=_ts("2024-01-01 00:00:00"), end=_ts("2024-01-01 01:00:00")),
    ]
    got = {
        (r["k"], r["island_id"]): (r["start"], r["end"], r["n_intervals"])
        for r in merge_intervals(spark.createDataFrame(rows), ["k"]).collect()
    }
    assert got[("a", 0)] == (
        _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:15:00"), 3)
    assert got[("a", 1)] == (
        _ts("2024-01-01 12:00:00"), _ts("2024-01-01 12:30:00"), 1)
    assert got[("b", 0)] == (
        _ts("2024-01-01 00:00:00"), _ts("2024-01-01 09:00:00"), 3)
    assert got[(None, 0)][2] == 1
    assert len(got) == 4


def test_interval_joins_plan_as_equi_joins(spark, points, intervals):
    """The whole point of bucketization: the physical plan must be an
    equi-join (hash/sort-merge/broadcast-HASH), never the
    BroadcastNestedLoopJoin / CartesianProduct a BETWEEN-only predicate
    degrades to."""
    for df in (
        interval_join(points, intervals, ["k"], ts_col="ts"),
        interval_overlap_join(intervals, intervals, ["k"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_interval_join_property_vs_naive(spark):
    """Hypothesis sweep: random points and intervals (NULL keys,
    degenerate, reversed, boundary-touching) x random bucket widths —
    the bucketized join must equal the naive eqNullSafe theta-join on
    every draw, with exactly-once pair multiplicity."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    pt_st = st.lists(
        st.tuples(st.sampled_from(["a", "b", None]),
                  st.integers(min_value=0, max_value=5000)),
        min_size=1, max_size=25,
    )
    iv_st = st.lists(
        st.tuples(st.sampled_from(["a", "b", None]),
                  st.integers(min_value=0, max_value=5000),
                  st.integers(min_value=-200, max_value=2000)),
        min_size=1, max_size=15,
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(pts=pt_st, ivs=iv_st, bucket_s=st.sampled_from([7, 60, 1000]))
    def check(pts, ivs, bucket_s):
        p = spark.createDataFrame(
            [(k, i, e) for i, (k, e) in enumerate(pts)],
            "k string, pid long, e long",
        ).select("k", "pid", F.timestamp_seconds("e").alias("ts"))
        iv = spark.createDataFrame(
            [(k, i, s, s + d) for i, (k, s, d) in enumerate(ivs)],
            "k string, iid long, s long, e long",
        ).select(
            "k", "iid",
            F.timestamp_seconds("s").alias("start"),
            F.timestamp_seconds("e").alias("end"),
        )
        got = [
            (r["pid"], r["iv_iid"])
            for r in interval_join(
                p, iv, ["k"], ts_col="ts", bucket_s=bucket_s,
                interval_cols=["iid"],
            ).collect()
        ]
        want = {
            (r["pid"], r["iv_iid"])
            for r in _naive_contain(
                p, iv.select("k", "iid", "start", "end")
            ).collect()
        }
        assert set(got) == want
        assert len(got) == len(set(got))  # exactly-once

    check()
