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

import numpy as np
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
    """Distinct word k-gram shingles per document: (doc_id, sh).

    Extraction is ONE ``regexp_extract_all`` pass over the normalized
    text: a token-start anchor plus a lookahead capture yields every
    overlapping k-gram without leaving the JVM. (The array formulation —
    ``transform(sequence(...), i -> concat_ws(element_at...))`` — runs an
    interpreted lambda per shingle: measured 6.5 s vs 0.2 s for this on
    1M shingles; higher-order functions are not codegen'd.)
    """
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=(\S+" + r" \S+" * (k - 1) + r"))"
    sh = F.regexp_extract_all(norm, F.lit(pat), 1)
    return (
        docs.select("doc_id", F.explode(sh).alias("sh"))
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
    # join on the shingle's 64-bit hash, not the string: same equi-join,
    # ~5-10x fewer shuffle bytes (collision odds ~n^2/2^65 — negligible,
    # and a collision only perturbs one intersection count by 1)
    sh = (
        shingles(docs, text_col, k)
        .select("doc_id", F.xxhash64("sh").alias("shh"))
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    left = sh.select(F.col("doc_id").alias("a"), "shh")
    right = sh.select(F.col("doc_id").alias("b"), "shh")
    inter = (
        left.join(right, "shh")
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
    min over shingles of the i-th hash family member — native aggregates.

    The shingle STRING is hashed once; the i-th family member re-mixes
    the 64-bit value (``xxhash64(i, h)`` on a long is ~10x cheaper than
    hashing the string i times). Independence is as good: xxhash64 keyed
    by i is a distinct permutation of the base hash space.
    """
    sh = shingles(docs, text_col, k).withColumn("h", F.xxhash64("sh"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"mh_{i}")
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
    # verify ONLY the candidate pairs (this is the whole point of LSH):
    # semi-join each shingle side down to docs that appear in a candidate,
    # then count intersections per candidate pair — work is linear in
    # candidate-pair shingles, never all-pairs
    sh = shingles(docs, text_col, k).select(
        "doc_id", F.xxhash64("sh").alias("shh")
    )
    cand = cand.cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # no broadcast hints: candidate cardinality is data-dependent (tiny for
    # a clean corpus, big for a dup-heavy one) and sizes is one row per
    # doc — AQE picks broadcast vs shuffle join from runtime sizes
    a_sh = sh.join(
        cand.select("a").distinct(),
        sh["doc_id"] == F.col("a"),
        "leftsemi",
    ).select(F.col("doc_id").alias("a"), "shh")
    b_sh = sh.join(
        cand.select("b").distinct(),
        sh["doc_id"] == F.col("b"),
        "leftsemi",
    ).select(F.col("doc_id").alias("b"), "shh")
    inter = (
        cand.join(a_sh, "a")
        .join(b_sh, ["b", "shh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")),
            "b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .where(F.col("jaccard") >= verify_threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text", k: int = 2) -> DataFrame:
    """64-bit SimHash per doc from shingle xxhash64 bit votes.

    Hashing stays JVM-side (``xxhash64``); the 64 bit-position votes are
    tallied in numpy via one ``mapInPandas`` stream per key-repartitioned
    partition (the 64-conditional-aggregate formulation measured ~10 s at
    5k docs — evaluating 64 branch expressions per shingle row defeats
    codegen; the numpy tally is a single (n_shingles x 64) bit matrix
    reduction).
    """
    import pandas as pd

    sh = (
        shingles(docs, text_col, k)
        .select("doc_id", F.xxhash64("sh").alias("h"))
        .repartition(F.col("doc_id"))
        .sortWithinPartitions("doc_id")
    )

    def _fp_partition(batches):
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        out_ids, out_fps = [], []
        shifts = np.arange(64, dtype=np.uint64)
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            h = g["h"].to_numpy(dtype=np.int64).view(np.uint64)
            bits = (h[:, None] >> shifts) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            fp = np.uint64(0)
            fp = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out_ids.append(doc_id)
            out_fps.append(np.int64(fp))
        yield pd.DataFrame({"doc_id": out_ids, "simhash64": out_fps})

    id_type = docs.schema["doc_id"].dataType.simpleString()
    return sh.mapInPandas(
        _fp_partition, schema=f"doc_id {id_type}, simhash64 long"
    )


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
