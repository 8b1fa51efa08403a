"""Synthetic-source determinism + the per-row token-array-equality
invariant (BASELINE.json input_hint) between the raw tier and the source."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3s_sm_spark.synth import (
    gen_points_raw,
    gen_sequences,
    reassemble_tokens,
    sequences_to_points,
)


def test_sequences_schema_and_invariant(spark):
    seq = gen_sequences(spark, 200)
    assert dict(seq.dtypes) == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }
    # n_tok invariant: exactly size(tokens), range [64, 2048]
    bad = seq.where(
        (F.size("tokens") != F.col("n_tok"))
        | (F.col("n_tok") < 64)
        | (F.col("n_tok") > 2048)
    ).count()
    assert bad == 0


def test_sequences_deterministic_and_parallelism_invariant(spark):
    a = gen_sequences(spark, 100, n_partitions=2)
    b = gen_sequences(spark, 100, n_partitions=16)
    # xxhash64 fast path for token-array equality
    ha = a.select("doc_id", F.xxhash64("tokens").alias("h"))
    hb = b.select("doc_id", F.xxhash64("tokens").alias("h"))
    assert ha.join(hb, "doc_id").where(ha["h"] != hb["h"]).count() == 0


def test_source_skew(spark):
    dist = {
        r["source"]: r["count"]
        for r in gen_sequences(spark, 2000).groupBy("source").count().collect()
    }
    assert set(dist) == {"cc", "wiki", "books", "code", "forums"}
    assert dist["cc"] / 2000 > 0.6  # the hot source that salting must handle


def test_token_array_equality_raw_tier_vs_source(spark):
    """The BASELINE.json per-row invariant: explode -> reassemble == source.

    Fast path: xxhash64 comparison; here the full array compare.
    """
    seq = gen_sequences(spark, 60)
    pts = sequences_to_points(seq)
    re = reassemble_tokens(pts)
    joined = seq.join(re, "doc_id")
    assert joined.count() == 60
    assert joined.where(F.col("tokens") != F.col("tokens_rebuilt")).count() == 0
    assert (
        joined.where(F.xxhash64("tokens") != F.xxhash64("tokens_rebuilt")).count() == 0
    )


def test_points_raw_gaps_and_dups(spark):
    raw = gen_points_raw(spark, 10, start="2019-10-01", end="2019-12-31")
    n_days = 92
    base = raw.where(F.col("version") == "v1")
    assert base.count() < 10 * n_days  # gaps exist
    assert base.count() > 10 * n_days * 0.7
    dups = raw.where(F.col("version") == "v2")
    assert 0 < dups.count() < base.count() * 0.1
    # duplicates collide on (doc_id, ts) with different values
    j = base.join(dups, ["doc_id", "ts"], "inner")
    assert j.count() == dups.count()


def test_doc_key_unique_beyond_ten_digits(spark):
    """%010d pads to a MINIMUM of 10 digits; the surrogate key must not
    truncate ids >= 1e10 (a 10-char slice collided doc1000000000 with
    doc10000000000 — fatal at the advertised 1e12 scale)."""
    from pyspark.sql import functions as F

    from c3s_sm_spark.synth import sequences_to_points

    seq = spark.createDataFrame(
        [
            ("doc%010d" % i, [1, 2], 2, "cc")
            for i in (7, 999_999_999, 1_000_000_000, 10_000_000_000, 123_456_789_012)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    keys = {
        r["doc_id"]: r["doc_key"]
        for r in sequences_to_points(seq).select("doc_id", "doc_key").distinct().collect()
    }
    assert len(set(keys.values())) == len(keys)
    for doc_id, key in keys.items():
        assert key == int(doc_id[3:])
