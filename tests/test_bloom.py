"""Bloom-pruned semi-join pins: the verified path must be row-identical
to the plain leftsemi join on every input (including empty dim, NULL
keys, and dim keys absent from fact); the unverified path must be a
superset containing every true match; the bitmap relation must stay
bounded by m/64 rows; and results must not depend on partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from c3s_sm_spark.operators.bloom import bloom_bitmap, bloom_semi_join


@pytest.fixture(scope="module")
def fact(spark):
    # 2000 rows over 500 distinct keys, some payload to prove columns ride along
    return (
        spark.range(2000)
        .select(
            (F.col("id") % 500).cast("long").alias("k"),
            (F.col("id") * 7).alias("payload"),
        )
        .repartition(8)
    )


@pytest.fixture(scope="module")
def dim(spark):
    # 120 keys: 100 overlapping fact's [0,500), 20 outside it entirely
    return spark.range(120).select(
        F.when(F.col("id") < 100, F.col("id") * 5)
        .otherwise(F.col("id") + 10_000)
        .cast("long")
        .alias("k")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_verified_equals_exact_semi_join(fact, dim):
    exact = fact.join(dim, "k", "leftsemi")
    got = bloom_semi_join(fact, dim, "k", m_bits=1 << 12, k=3)
    assert _rows(got) == _rows(exact)


def test_tiny_bitmap_forces_false_positives_still_exact(fact, dim):
    # m = 64 bits for 120 keys: bitmap saturates, bloom passes almost
    # everything — the verify stage must still produce the exact answer
    exact = fact.join(dim, "k", "leftsemi")
    got = bloom_semi_join(fact, dim, "k", m_bits=64, k=2)
    assert _rows(got) == _rows(exact)


def test_unverified_is_superset_with_all_true_matches(fact, dim):
    exact = set(_rows(fact.join(dim, "k", "leftsemi")))
    loose = set(_rows(bloom_semi_join(fact, dim, "k", m_bits=1 << 12, k=3, verify=False)))
    assert exact <= loose
    # at m=4096 bits for 120 keys fpp is ~tiny; allow slack but the
    # probe must actually prune (not pass everything through)
    assert len(loose) < fact.count()


def test_empty_dim_yields_empty(spark, fact):
    empty = spark.createDataFrame([], "k long")
    assert bloom_semi_join(fact, empty, "k", m_bits=1 << 10, k=3).count() == 0
    assert (
        bloom_semi_join(fact, empty, "k", m_bits=1 << 10, k=3, verify=False).count()
        == 0
    )


def test_null_keys_never_match(spark, dim):
    f = spark.createDataFrame(
        [Row(k=None, payload=1), Row(k=0, payload=2)],
        "k long, payload long",
    )
    got = bloom_semi_join(f, dim, "k", m_bits=1 << 10, k=3)
    exact = f.join(dim, "k", "leftsemi")
    assert _rows(got) == _rows(exact)
    assert all(r.k is not None for r in got.collect())


def test_bitmap_bounded_and_m_guard(spark, dim):
    bm = bloom_bitmap(dim, "k", m_bits=1 << 10, k=3)
    assert bm.count() <= (1 << 10) // 64
    words = [r.word for r in bm.collect()]
    assert all(0 <= w < (1 << 10) // 64 for w in words)
    with pytest.raises(ValueError):
        bloom_bitmap(dim, "k", m_bits=100, k=3)


def test_partitioning_invariance(fact, dim):
    a = bloom_semi_join(fact.repartition(1), dim.repartition(5), "k", m_bits=1 << 12, k=3)
    b = bloom_semi_join(fact.repartition(13), dim.coalesce(1), "k", m_bits=1 << 12, k=3)
    assert _rows(a) == _rows(b)


def test_string_keys(spark):
    f = spark.range(300).select(F.concat(F.lit("doc_"), F.col("id")).alias("k"))
    d = spark.range(50).select(F.concat(F.lit("doc_"), (F.col("id") * 6)).alias("k"))
    exact = f.join(d, "k", "leftsemi")
    got = bloom_semi_join(f, d, "k", m_bits=1 << 12, k=3)
    assert _rows(got) == _rows(exact)
