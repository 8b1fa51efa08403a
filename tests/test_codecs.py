"""Round-trip property tests for the packed-series codecs (SURVEY.md §7
hard-part 4): exact identity on random + adversarial series, including NaN
runs, constants, irregular gaps, and chunk boundaries."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from c3s_sm_spark.functions.codecs import (
    decode_ts,
    decode_vals,
    encode_ts,
    encode_vals,
)


def _rt_ts(arr):
    got = decode_ts(encode_ts(np.asarray(arr, dtype=np.int64)))
    np.testing.assert_array_equal(got, np.asarray(arr, dtype=np.int64))


def _rt_vals(arr):
    a = np.asarray(arr, dtype=np.float64)
    got = decode_vals(encode_vals(a))
    # bit-exact, including NaN payloads
    np.testing.assert_array_equal(got.view(np.uint64), a.view(np.uint64))


DAY_US = 86_400_000_000


@pytest.mark.parametrize(
    "ts",
    [
        [],
        [0],
        [0, DAY_US],
        np.arange(0, 500 * DAY_US, DAY_US),  # perfectly regular: all dod==0
        [0, 1, 3, 6, 10, 100, 101, 10**15],  # wildly irregular
        np.cumsum(np.random.default_rng(42).integers(1, 10**9, 1000)),
        [-(10**15), 0, 10**15],  # negative epochs
    ],
)
def test_ts_roundtrip(ts):
    _rt_ts(ts)


def test_ts_compression_regular_grid():
    """Regular grid: all dod==0 -> ~3 bits/point (vs 64 raw)."""
    ts = np.arange(0, 10000 * DAY_US, DAY_US)
    blob = encode_ts(ts)
    assert len(blob) < 10000 * 8 / 12  # >12x smaller than raw int64
    _rt_ts(ts)


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [3.14],
        [1.0, 1.0, 1.0, 1.0],  # constant: all xor==0
        [np.nan, np.nan, np.nan],  # NaN run
        [1.0, np.nan, 2.0, np.nan, np.inf, -np.inf, -0.0, 0.0],
        np.random.default_rng(7).normal(50, 10, 5000),
        np.float64([1e-308, 1e308, 5e-324]),  # denormal + extremes
    ],
)
def test_vals_roundtrip(vals):
    _rt_vals(vals)


def test_vals_compression_smooth_series():
    """Similar consecutive values share exponent+mantissa prefix -> xor has
    many leading zeros -> beats raw float64."""
    v = 50.0 + np.cumsum(np.random.default_rng(1).normal(0, 0.01, 10000))
    blob = encode_vals(v)
    assert len(blob) < 10000 * 8  # smaller than raw
    _rt_vals(v)


def test_constant_vals_near_zero_cost():
    v = np.full(10000, 42.5)
    assert len(encode_vals(v)) < 10000 / 4
    _rt_vals(v)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**52), max_value=2**52),
        min_size=0,
        max_size=300,
    )
)
def test_ts_roundtrip_property(deltas):
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) if deltas else np.empty(0, np.int64)
    _rt_ts(ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_vals_roundtrip_property(vals):
    _rt_vals(vals)


def test_spark_pack_unpack_roundtrip(spark):
    """End-to-end through the Spark operators: pack -> unpack == input,
    chunk boundary (CHUNK=8192) crossed by a long synthetic series."""
    from pyspark.sql import functions as F

    from c3s_sm_spark.functions.codecs import pack_series, unpack_series
    from c3s_sm_spark.operators import keep_latest, rollup
    from c3s_sm_spark.synth import gen_points_raw

    raw = gen_points_raw(spark, 6, start="2019-01-01", end="2020-12-31")
    daily = rollup(
        keep_latest(raw, ["doc_id", "ts"], ["version"]), ["doc_id"], "ts", "daily"
    )
    packed = pack_series(daily)
    packed.cache()
    # sidecar columns consistent
    bad = packed.where(
        (F.col("ts_min") > F.col("ts_max")) | (F.col("n") <= 0)
    ).count()
    assert bad == 0
    unpacked = unpack_series(packed)
    orig = daily.select("doc_id", "ts", "v_mean")
    assert unpacked.count() == orig.count()
    # exact join-compare: every point survives with identical value
    diff = orig.withColumnRenamed("v_mean", "a").join(
        unpacked.withColumnRenamed("v_mean", "b"), ["doc_id", "ts"], "inner"
    )
    assert diff.count() == orig.count()
    assert diff.where(F.col("a") != F.col("b")).count() == 0


def test_spark_pack_chunking(spark):
    from c3s_sm_spark.functions import codecs
    from c3s_sm_spark.functions.codecs import pack_series
    import pandas as pd

    n = 20000
    pdf = pd.DataFrame(
        {
            "doc_id": "k0",
            "ts": pd.date_range("2000-01-01", periods=n, freq="h"),
            "v_mean": np.arange(n, dtype=np.float64),
        }
    )
    df = spark.createDataFrame(pdf)
    rows = pack_series(df).orderBy("chunk").collect()
    assert [r["chunk"] for r in rows] == [0, 1, 2]
    assert sum(r["n"] for r in rows) == n
    assert rows[0]["n"] == codecs.CHUNK
