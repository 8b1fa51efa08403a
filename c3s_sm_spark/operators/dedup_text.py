"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design:

- **exact**: one hash-groupBy on the normalized text (or its xxhash64 for
  wide rows) — a single shuffle keyed by content hash; AQE coalesces.
- **ngram Jaccard**: exact pairwise similarity via a shingle equi-join.
  Quadratic in the bucket, so at 100 TB it is the *verify* stage, run only
  on candidate pairs — which is exactly how :func:`minhash_lsh_candidates`
  uses it.
- **MinHash + LSH**: the scale path. Signatures are k independent min-
  hashes computed as native ``min(xxhash64(seed_i, shingle))`` aggregates
  (JVM-side, no UDF); banding hashes b groups of r rows; the candidate
  join is an equi-join on (band_id, band_hash) — only near-duplicates
  collide, so the join output is ~linear in the duplicate count rather
  than quadratic in corpus size.
- **SimHash**: 64-bit fingerprint whose Hamming distance approximates
  cosine similarity on the bag-of-shingles; computed with explode +
  bit-position aggregation (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c3s_sm_spark.operators.textstats import words_col


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the keeper
    (min doc_id) and the copy count."""
    return (
        docs.groupBy(text_col)
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def shingles(docs: DataFrame, text_col: str = "text", k: int = 2) -> DataFrame:
    """Distinct word k-gram shingles per document: (doc_id, sh)."""
    w = words_col(text_col)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + off) for off in range(k)]
        ),
    )
    return (
        docs.where(F.size(w) >= k)
        .select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs >= threshold.

    shingle equi-join -> per-pair intersection count -> |A∪B| by
    inclusion-exclusion. Output: (a, b, inter, na, nb, jaccard), a < b.
    """
    sh = shingles(docs, text_col, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    left = sh.select(F.col("doc_id").alias("a"), "sh")
    right = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        left.join(right, "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "na", "nb", "jaccard")
    )
    return out


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", k: int = 2, num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per doc: num_hashes columns ``mh_i`` =
    min over shingles of ``xxhash64(i, shingle)`` — pure native aggregates."""
    sh = shingles(docs, text_col, k)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """LSH candidate pairs via banding, optionally verified with exact
    Jaccard.

    rows-per-band r = num_hashes // bands; two docs collide if any band's
    r minhashes all match (band hash equality). With a verify threshold
    the candidates are joined back through :func:`ngram_jaccard_pairs`
    semantics (exact intersection on the candidate set only).
    Output: (a, b [, jaccard]).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(docs, text_col, k, num_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * r + j}") for j in range(r)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("h"))
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", F.col("bh.band_id").alias("band_id"), F.col("bh.h").alias("h"))
    a = stacked.select(F.col("doc_id").alias("a"), "band_id", "h")
    b = stacked.select(F.col("doc_id").alias("b"), "band_id", "h")
    cand = (
        a.join(b, ["band_id", "h"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    exact = ngram_jaccard_pairs(docs, text_col, k, threshold=0.0)
    return cand.join(exact, ["a", "b"], "inner").where(
        F.col("jaccard") >= verify_threshold
    ).select("a", "b", "jaccard")


def simhash(docs: DataFrame, text_col: str = "text", k: int = 2) -> DataFrame:
    """64-bit SimHash per doc from shingle xxhash64 bit votes.

    explode shingles x 64 bit positions is avoided: instead, per bit j the
    vote is ``sum(sign(bit_j(h)))`` expressed as 64 conditional aggregates
    over the shingle relation — heavy but single-shuffle and UDF-free.
    """
    sh = shingles(docs, text_col, k).withColumn("h", F.xxhash64("sh"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{j}")
        for j in range(64)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select("doc_id", fp.alias("simhash64"))


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks (a pair within Hamming<=3*16 shares at least one exact chunk for
    max_hamming<=3; for larger radii this is a recall-tuned heuristic)."""
    fp = simhash(docs, text_col)
    chunks = fp.select(
        "doc_id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("simhash64"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash64", "cc.chunk_id", "cc.chunk")
    a = chunks.select(
        F.col("doc_id").alias("a"), F.col("simhash64").alias("ha"), "chunk_id", "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("b"), F.col("simhash64").alias("hb"), "chunk_id", "chunk"
    )
    pairs = (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return pairs
