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

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the keeper
    (min doc_id) and the copy count.

    Groups by a 128-bit content key — a struct of two independently
    salted ``xxhash64`` values — NOT the text column itself: the group
    key is what moves through the shuffle, and at 100 TB keying on the
    raw text would shuffle the entire corpus's bytes; the key carries 16
    bytes per row instead. 128 bits matter here (ADVICE r2): a single
    64-bit key has collision odds ~n^2/2^65 — ~0.03 at 10^9 docs and
    ~2.7e4 expected collisions at 10^12 — and a collision silently
    merges two distinct-text groups and loses one group's keeper, which
    no re-check of kept docs can recover. Two salted 64-bit lanes give
    ~n^2/2^129 (~7e-22 at 10^12 docs): birthday-safe at any realistic
    corpus. The DuckDB oracle groups by the text itself — hash-equality
    of the results is exactly the collision-freeness check at test
    scale.
    """
    return (
        docs.groupBy(
            F.xxhash64(F.lit(0), text_col).alias("th_lo"),
            F.xxhash64(F.lit(1), text_col).alias("th_hi"),
        )
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
    return (
        docs.select("doc_id", F.explode(_shingle_expr(text_col, k)).alias("sh"))
        .distinct()
    )


def _shingle_expr(text_col: str, k: int):
    """The k-gram extraction expression — ONE definition shared by
    :func:`shingles` and :func:`shingle_hashes` so the two relations can
    never disagree on what a shingle is."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=(\S+" + r" \S+" * (k - 1) + r"))"
    return F.regexp_extract_all(norm, F.lit(pat), 1)


def shingle_hashes(
    docs: DataFrame, text_col: str = "text", k: int = 2
) -> DataFrame:
    """Distinct hashed shingles per document: ``(doc_id, shh)`` with
    ``shh = xxhash64(sh)``. Same relation as
    ``shingles(...).select(doc_id, xxhash64(sh))`` — but the hash is
    applied BEFORE the distinct, so the dedup shuffle moves 8-byte longs
    instead of shingle strings (measured ~25% off the whole shingle
    pass; at 100 TB the difference is the corpus text through a shuffle
    vs fixed-width keys). Distinct-of-hashes == hashes-of-distinct as
    sets, so every consumer is unchanged."""
    return (
        docs.select("doc_id", F.explode(_shingle_expr(text_col, k)).alias("sh"))
        .select("doc_id", F.xxhash64("sh").alias("shh"))
        .distinct()
    )


def duplication_profile(
    docs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Per-document cross-corpus duplication profile: for every document,
    the fraction of its distinct k-word spans that also occur in at
    least one OTHER document. Output: ``(doc_id, n_spans, n_shared,
    dup_fraction)``.

    This is the span-level signal behind exact-substring training-data
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): documents with a high shared-span fraction are
    near-copies, boilerplate, or templated text even when no single
    whole-document pair crosses a Jaccard threshold — filtering on
    ``dup_fraction`` removes them without any pairwise comparison.

    Physical shape (fully distributed, no broadcast, no driver state):
    one shingling pass -> one groupBy(shingle-hash) count to get each
    span's document frequency -> join back on the hash -> one per-doc
    aggregate. Both shuffles key on the 8-byte span hash / doc id, never
    the text. ``shingles`` is distinct-per-doc, so the count IS document
    frequency; a df >= 2 span is by definition shared with another doc.
    Hashing note: a 64-bit collision only perturbs one doc's fraction by
    one span (unlike :func:`exact_dedup`, where a collision loses a
    whole group — hence its 128-bit key; the same argument
    :func:`ngram_jaccard_pairs` documents).
    """
    sh = shingle_hashes(docs, text_col, k)
    span_df = sh.groupBy("shh").agg(F.count("*").alias("span_df"))
    return (
        sh.join(span_df, "shh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("span_df") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_spans"), 4).alias(
                "dup_fraction"
            ),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.5,
    strategy: str = "auto",
    max_broadcast_cells: int = 2_000_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs >= threshold.

    Output: (a, b, inter, na, nb, jaccard), a < b. Two physical
    strategies, identical results:

    - ``'join'`` — shingle equi-join -> per-pair intersection count ->
      |A∪B| by inclusion-exclusion. Fully distributed, unbounded corpus
      size, but hot shingles fan out quadratically (df^2 join rows per
      shingle): 38 s at 5k docs on a 931-shingle vocabulary.
    - ``'matmul'`` — the doc x shared-shingle binary matrix (only
      shingles with df>=2 can intersect; df=1 columns are dropped, full
      set sizes are carried separately) is broadcast, and each partition
      computes exact integer intersection counts for its doc block with
      one BLAS matmul in ``mapInPandas`` — same pattern as
      :func:`c3s_sm_spark.operators.similarity.cosine_pairs`. ~20x
      faster, but bounded by the broadcast matrix size.

    ``'auto'`` picks matmul while ``n_docs * n_shared_shingles`` fits
    ``max_broadcast_cells`` (float32 => ~8 GB), else join. Exact
    all-pairs Jaccard is inherently O(n^2) at any strategy — at 100 TB
    this operator is the *verify* stage over LSH candidates
    (:func:`minhash_lsh_candidates`), never the full corpus.
    """
    # join/hash on the shingle's 64-bit hash, not the string: same
    # semantics, ~5-10x fewer bytes (collision odds ~n^2/2^65 —
    # negligible, and a collision only perturbs one count by 1)
    sh = shingle_hashes(docs, text_col, k).cache()
    # ^ one shingling pass serves the size probe AND either strategy
    if strategy != "join":
        try:
            out = _ngram_jaccard_matmul(
                docs, sh, threshold, max_broadcast_cells, strict=strategy == "matmul"
            )
        except Exception:
            # the strict over-budget raise (and any collect failure) must
            # not leak the corpus-sized cache for the session lifetime
            sh.unpersist()
            raise
        if out is not None:
            # the matmul plan carries everything in its broadcast — the
            # shingle cache has no further reader (ADVICE r2 cache leak)
            sh.unpersist()
            return out
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
    # eagerly materialize the (thresholded, pair-sized) result via
    # localCheckpoint so the corpus-sized shingle cache can be dropped
    # NOW instead of leaking for the session lifetime (ADVICE r2); unlike
    # cache()+count(), the checkpoint blocks are auto-reclaimed when the
    # returned frame is dereferenced, so the pair set doesn't leak either
    # (ADVICE r3). At 100 TB this is a materialized intermediate table.
    out = out.localCheckpoint()
    sh.unpersist()
    return out


def _ngram_jaccard_matmul(
    docs: DataFrame,
    sh: DataFrame,
    threshold: float,
    max_broadcast_cells: int,
    strict: bool,
) -> DataFrame | None:
    """Blocked-BLAS exact Jaccard (see :func:`ngram_jaccard_pairs`).

    Returns None when the shared-shingle matrix exceeds the broadcast
    budget (caller falls back to the join strategy), unless ``strict``.
    The budget is checked with cheap AGGREGATE jobs before anything is
    collected (ADVICE r1), and the collect itself is semi-joined down to
    df>=2 shingles FIRST (ADVICE r2 / VERDICT #3): what ships to the
    driver is at most the n x v occurrence set the budget just approved
    — a long-document corpus with a huge df=1 shingle tail no longer
    slips an unbounded collect past the cells check. Full per-doc set
    sizes ride along as one count column.
    """
    import pandas as pd

    # n upper bound: total docs (docs without shingles only shrink the
    # matrix) — a metadata-cheap count, no extra shuffle over sh
    n = docs.count()
    df2 = (
        sh.groupBy("shh")
        .agg(F.count("*").alias("df_"))
        .where(F.col("df_") >= 2)
        .select("shh")
        .cache()  # tiny (shared vocab); serves the count AND the semi-join
    )
    v = df2.count()
    if n * max(v, 1) > max_broadcast_cells:
        df2.unpersist()
        if strict:
            raise ValueError(
                f"matmul strategy needs {n}x{v} broadcast cells "
                f"(cap {max_broadcast_cells}); use strategy='join' or LSH"
            )
        return None
    # ONE Arrow collect, no per-row Python: per doc its full shingle
    # count plus the list of its df>=2 shingle hashes (collect_list
    # skips the nulls the when() leaves on df=1 rows, so only the
    # budget-approved occurrence set ships to the driver). Docs whose
    # every shingle is unique get an empty list — a zero matrix row
    # (they can't pair, but na_full must stay aligned).
    per_doc = (
        sh.join(df2.withColumn("_k", F.lit(1)), "shh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.collect_list(F.when(F.col("_k") == 1, F.col("shh"))).alias(
                "hs"
            ),
        )
        .toPandas()
        .sort_values("doc_id", kind="stable")
    )
    df2.unpersist()
    doc_ids = per_doc["doc_id"].to_numpy()
    na_full = per_doc["n_sh"].to_numpy(dtype=np.int64)
    # vectorized factorization: unique() sorts, searchsorted maps — all C
    lens = per_doc["hs"].map(len).to_numpy(dtype=np.int64)
    occ_docs = np.repeat(doc_ids, lens)
    occ_shh = (
        np.concatenate(per_doc["hs"].to_numpy())
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    ).astype(np.int64)
    uniq_h = np.unique(occ_shh)
    n, v = len(doc_ids), len(uniq_h)
    mat = np.zeros((n, v), dtype=np.float32)
    if len(occ_docs):
        rid = np.searchsorted(doc_ids, occ_docs)
        cid = np.searchsorted(uniq_h, occ_shh)
        mat[rid, cid] = 1.0
    pos = {d: i for i, d in enumerate(doc_ids.tolist())}
    ids_arr = doc_ids
    na_f32 = na_full.astype(np.float32)
    bc = docs.sparkSession.sparkContext.broadcast(
        (pos, ids_arr, mat, na_full, na_f32)
    )
    # candidate mask uses raw-ratio slack 1e-4: Spark's HALF_UP round to 4
    # digits can lift a raw value by at most 5e-5 across the threshold, and
    # the fused float32 compare below carries ~1e-7 relative error; the
    # authoritative round+filter happens JVM-side, so neither numpy
    # rounding nor float32 noise ever decides a boundary case
    slack = float(threshold) - 1e-4

    def _pairs(batches):
        pos_, ids_, m, na_, naf_ = bc.value
        all_cols = np.arange(len(ids_))[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            # docs with no shingles (empty text) have no row in the matrix
            # and can't pair with anything — skip them, as the join path does
            rows_idx = np.array(
                [pos_[d] for d in pdf["doc_id"] if d in pos_], dtype=np.int64
            )
            if not len(rows_idx):
                continue
            # everything stays float32 (exact for 0/1-sum counts < 2^24);
            # jaccard >= slack is applied as the division-free fused form
            # inter*(1+slack) >= slack*(na+nb) — int64/float64 (n x n)
            # temporaries measured 12x slower than the matmul itself on
            # this memory-bound box
            inter = m[rows_idx] @ m.T
            keep = inter >= np.float32(1.0)
            if slack > 0:
                sums = naf_[rows_idx][:, None] + naf_[None, :]
                keep &= inter * np.float32(1.0 + slack) >= np.float32(slack) * sums
            # a < b by id order: ids_ is sorted, so compare positions
            keep &= rows_idx[:, None] < all_cols
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "a": ids_[rows_idx[ai]],
                    "b": ids_[bj],
                    "inter": inter[ai, bj].astype(np.int64),
                    "na": na_[rows_idx[ai]],
                    "nb": na_[bj],
                }
            )

    id_type = docs.schema["doc_id"].dataType.simpleString()
    width = docs.sparkSession.sparkContext.defaultParallelism * 2
    cand = (
        docs.select("doc_id")
        .distinct()
        .repartition(width)  # explicit: AQE must not coalesce the tiny
        # id list to one task — each task's block matmul is the real work
        .mapInPandas(
            _pairs,
            schema=f"a {id_type}, b {id_type}, inter long, na long, nb long",
        )
    )
    return (
        cand.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "na", "nb", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    num_hashes: int = 16,
    _sh: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per doc: num_hashes columns ``mh_i`` =
    min over shingles of the i-th hash family member — native aggregates.

    The shingle STRING is hashed once; the i-th family member re-mixes
    the 64-bit value (``xxhash64(i, h)`` on a long is ~10x cheaper than
    hashing the string i times). Independence is as good: xxhash64 keyed
    by i is a distinct permutation of the base hash space. ``_sh`` lets
    :func:`minhash_lsh_candidates` pass a cached (doc_id, h) frame so
    shingling runs once for signatures AND verify.
    """
    sh = (
        _sh
        if _sh is not None
        else shingle_hashes(docs, text_col, k).withColumnRenamed("shh", "h")
    )
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
    # one shingling pass serves both the signature aggregation and the
    # exact-Jaccard verify below; explicitly unpersisted before returning
    # (ADVICE r2 — LRU eviction is not a discipline). At 100 TB this
    # would be a materialized intermediate table instead.
    sh_cached = (
        shingle_hashes(docs, text_col, k)
        .withColumnRenamed("shh", "h")
        .cache()
    )
    sig = minhash_signatures(docs, text_col, k, num_hashes, _sh=sh_cached)
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
        # eagerly materialize the (pair-sized) candidate set, then drop
        # the corpus-sized shingle cache rather than leaking it (ADVICE
        # r2); localCheckpoint so the candidates themselves are reclaimed
        # when the caller drops the frame (ADVICE r3)
        cand = cand.localCheckpoint()
        sh_cached.unpersist()
        return cand
    # verify ONLY the candidate pairs (this is the whole point of LSH):
    # semi-join each shingle side down to docs that appear in a candidate,
    # then count intersections per candidate pair — work is linear in
    # candidate-pair shingles, never all-pairs
    sh = sh_cached.withColumnRenamed("h", "shh")
    cand = cand.cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # two joins, no prefilter stages: joining cand directly against the
    # a-side shingles both restricts AND attaches b in one step (AQE
    # broadcasts the tiny candidate set at runtime; no hard hint — a
    # dup-heavy corpus with a huge candidate set falls back to a shuffle
    # join safely). The earlier two-leftsemi + two-join formulation spent
    # more wall time scheduling its extra stages than verifying.
    a_sh = cand.join(
        sh.select(F.col("doc_id").alias("a"), "shh"), "a"
    )  # (a, b, shh) = every shingle of a, per candidate pair
    inter = (
        a_sh.join(sh.select(F.col("doc_id").alias("b"), "shh"), ["b", "shh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
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
    # eagerly materialize the verified (pair-sized) result, then release
    # both the corpus-sized shingle cache and the candidate cache (ADVICE
    # r2 leak); localCheckpoint instead of cache()+count() so the blocks
    # are reclaimed when the caller drops the frame instead of leaking
    # for the session lifetime (ADVICE r3), and the caller's action reads
    # a flat block scan rather than re-optimizing the verify plan
    out = out.localCheckpoint()
    sh_cached.unpersist()
    cand.unpersist()
    return out


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

    # explicit width: a bare repartition(col) on a small-by-bytes shingle
    # frame gets AQE-coalesced to ONE partition, serializing the numpy
    # tally on a single task (same trap as codecs.pack_series)
    width = docs.sparkSession.sparkContext.defaultParallelism * 2
    sh = (
        shingle_hashes(docs, text_col, k)
        .withColumnRenamed("shh", "h")
        .repartition(width, F.col("doc_id"))
        # no sortWithinPartitions: _fp_partition concatenates the whole
        # partition before groupby, which needs no ordering — the sort
        # was an O(n log n) pass per task on the hot path for nothing
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
            fp = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out_ids.append(doc_id)
            # reinterpret-cast, not value conversion: np.int64(fp) relies
            # on numpy 1.x wraparound and raises OverflowError on numpy 2
            # whenever bit 63 is set (~half of all fingerprints)
            out_fps.append(fp.astype(np.int64))
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


def _components_driver(
    spark, pdf, a_col: str, b_col: str, id_type: str, max_iters: int
) -> DataFrame:
    """Driver-side vectorized min-label fixpoint for bounded pair sets
    (see :func:`neardup_components`). Ids are factorized by SORTED
    unique value, so index order preserves id order and min-over-index
    equals min-over-id — identical labels to the distributed path."""
    import pandas as pd

    uniq, inv = np.unique(
        np.concatenate([pdf[a_col].to_numpy(), pdf[b_col].to_numpy()]),
        return_inverse=True,
    )
    m = len(pdf)
    ai, bi = inv[:m], inv[m:]
    lbl = np.arange(len(uniq), dtype=np.int64)
    # the numpy rounds are microseconds; 2*max_iters jump-accelerated
    # rounds cover diameter ~2^(2*max_iters) — unreachable in practice
    for _ in range(2 * max_iters):
        new = lbl.copy()
        e = np.minimum(lbl[ai], lbl[bi])
        np.minimum.at(new, ai, e)
        np.minimum.at(new, bi, e)
        new = new[new]  # pointer jump
        if np.array_equal(new, lbl):
            break
        lbl = new
    else:
        raise RuntimeError(
            f"_components_driver did not converge in {2 * max_iters} rounds"
        )
    out_pdf = pd.DataFrame({"node": uniq, "component": uniq[lbl]})
    return spark.createDataFrame(
        out_pdf, schema=f"node {id_type}, component {id_type}"
    )


def neardup_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 20,
    driver_max_pairs: int = 5_000_000,
) -> DataFrame:
    """Connected components over an undirected near-dup pair relation:
    ``(node, component)`` with ``component`` = the smallest node id in
    the component. The step LSH/Jaccard/SimHash pair emission leaves
    open — a duplicate CLUSTER {A,B,C} surfaces as pairs (A,B), (B,C),
    and keep-one-per-pair logic would wrongly keep two of the three.

    Dual strategy (same pattern as :func:`ngram_jaccard_pairs`):

    - pair sets within ``driver_max_pairs`` (~80 MB at the 5M default —
      the pair relation is bounded by duplicate density, orders of
      magnitude below corpus size) are collected via Arrow and resolved
      with a vectorized numpy min-label fixpoint (factorize ids, per
      round ``minimum.at`` over both edge directions + a
      ``labels[labels]`` pointer jump) — microseconds per round vs a
      full scheduled shuffle round in Spark, which measured ~4 s/round
      of pure fixed cost on a 47-node graph;
    - beyond the budget: distributed iterative min-label propagation
      with pointer jumping — each round every node takes the min of its
      own label, its neighbors' labels (one equi-join + one min-
      aggregate, both map-side-combinable), AND its current label's own
      label (one more equi-join). The jump doubles label reach per
      round, so convergence is O(log diameter): max_iters=20 covers
      diameter ~2^20, where plain propagation silently mislabeled
      chains longer than 20 (ADVICE r2). Each round's labels are cached
      and the previous round unpersisted, so lineage stays O(1).

    Both paths are deterministic (min over ids, no ties) and produce
    identical labels; both raise ``RuntimeError`` instead of returning
    silently-wrong labels if the fixpoint is not reached.
    """
    # single-pass size probe + fetch: limit(cap+1).toPandas() collects
    # the whole pair set iff it fits the driver budget — the common case
    # finishes in ONE job with no cache at all (the pair relation is
    # consumed exactly once there). Only an over-budget set falls through
    # to the distributed path, which then caches because the symmetrize
    # union references the (expensive-upstream) relation twice.
    head_pdf = (
        pairs.select(a_col, b_col).limit(driver_max_pairs + 1).toPandas()
    )
    if len(head_pdf) <= driver_max_pairs:
        id_type = pairs.schema[a_col].dataType.simpleString()
        return _components_driver(
            pairs.sparkSession, head_pdf, a_col, b_col, id_type, max_iters
        )
    del head_pdf
    pairs_c = pairs.select(a_col, b_col).cache()
    sym = pairs_c.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        pairs_c.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    edges = sym.distinct().cache()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    labels.count()
    labels0 = labels  # initial cached frame: released after first rebind
    changed = 1
    for _ in range(max_iters):
        neigh = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "component")
        # localCheckpoint (eager), NOT cache: the pointer-jump self-join
        # references prop twice, so with ordinary lineage the LOGICAL
        # plan doubles every round — the optimizer grinds exponentially
        # after ~5 rounds even though the data is tiny. Checkpointing
        # truncates the plan to a flat scan each round (the standard
        # iterative-algorithm discipline; old block RDDs are dereferenced
        # on rebind and reclaimed by the context cleaner).
        prop = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        # pointer jump: labels are node ids and every node has a row, so
        # component c resolves to its own (monotonically <=) label; the
        # composed hop compounds reach -> O(log diameter) rounds
        new = (
            prop.join(
                prop.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("jumped"),
                ),
                "component",
            )
            .select("node", F.col("jumped").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "node")
            .where(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    pairs_c.unpersist()
    if labels is not labels0:  # loop rebound: the round-0 cache is dead
        labels0.unpersist()
    if changed != 0:
        labels.unpersist()
        raise RuntimeError(
            f"neardup_components did not converge in {max_iters} rounds "
            f"(pointer-jumped propagation covers diameter ~2^{max_iters}; "
            "this indicates a bug or an adversarial graph, not normal data)"
        )
    return labels


def keep_best_per_cluster(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """One keeper per duplicate cluster: the member with the highest
    ``score_col`` (ties on the smaller id — deterministic). A single
    ``min_by`` hash aggregate with map-side partial combine; the LLM-
    pipeline policy of 'keep the best-quality duplicate, drop the rest'
    (exact-dup keep-min-id is :func:`exact_dedup`'s special case).
    Output: (component, keep_id, best_score, n_members).

    Scores are LEFT-joined with a -infinity default (ADVICE r2): an
    inner join made unscored members vanish, and a cluster whose every
    member was unscored emitted NO keeper at all — downstream
    ``dedup_corpus`` then anti-joined away ALL copies of that cluster.
    Now every component always yields a keeper (unscored members lose
    ties to any scored member; an all-unscored cluster keeps its min
    id with ``best_score`` NULL, which is visible, not silent loss).
    """
    neg_inf = F.lit(float("-inf"))
    members = components.join(
        scores.select(F.col(id_col).alias("node"), score_col), "node", "left"
    )
    eff = F.coalesce(F.col(score_col), neg_inf)
    return members.groupBy("component").agg(
        F.min_by(
            "node", F.struct((-eff).alias("ns"), F.col("node"))
        ).alias("keep_id"),
        F.max(score_col).alias("best_score"),
        F.count("*").alias("n_members"),
    )


def dedup_corpus(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    num_hashes: int = 16,
    bands: int = 8,
    verify_threshold: float = 0.5,
    scores: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The whole near-dup dedup pipeline in one call: MinHash+LSH pair
    emission -> exact-Jaccard verify -> connected components ->
    keep-best-per-cluster -> the surviving corpus rows.

    ``scores`` is any (doc_id, quality) frame — default
    :func:`~c3s_sm_spark.operators.textstats.quality_score` — so "which
    duplicate survives" is a policy input, not hardcoded. ``pairs``
    overrides the pair-emission stage entirely (any (a, b) near-dup
    relation — e.g. exact :func:`ngram_jaccard_pairs`, SimHash, or
    embedding cosine pairs); the default is the LSH path, the one that
    scales to 10^12 docs. Docs in no cluster pass through untouched;
    cluster members other than the keeper are dropped. Every stage is
    the scale-shaped form documented on its own operator (banded
    equi-join candidates, candidate-only verify, diameter-bounded label
    propagation, one min_by per cluster); the only full-corpus shuffles
    are the shingle passes.
    """
    from c3s_sm_spark.operators.textstats import quality_score

    if pairs is None:
        pairs = minhash_lsh_candidates(
            docs, text_col, k, num_hashes, bands, verify_threshold
        )
    pairs = pairs.select("a", "b")
    comp = neardup_components(pairs)
    if scores is None:
        scores = quality_score(docs, text_col).select("doc_id", "quality")
    keepers = keep_best_per_cluster(comp, scores).select(
        F.col("keep_id").alias("doc_id")
    )
    # drop list = cluster members minus keepers (bounded by the duplicate
    # count, so usually broadcast-sized — but left to AQE rather than a
    # hard hint: a 90%-duplicate crawl would overflow a forced broadcast)
    drop = comp.select(F.col("node").alias("doc_id")).join(
        keepers, "doc_id", "leftanti"
    )
    return docs.join(drop, "doc_id", "leftanti")


def ngram_containment(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    k: int = 2,
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
    threshold: float | None = None,
) -> DataFrame:
    """Benchmark decontamination: per (doc, probe) n-gram containment.

    For every training document and every probe (an eval/benchmark item),
    the fraction of the PROBE's distinct k-gram shingles that appear in
    the document — the standard n-gram-overlap decontamination signal
    (docs with containment ~1 for some probe leak the benchmark and
    should be dropped). Output: ``(doc_id, probe_id, contained,
    probe_total, containment)``; with ``threshold``, only pairs at or
    above it.

    Physical strategy: the probe set is small by definition (an eval
    suite), so its shingles broadcast; the corpus-side shingle stream
    joins it with no corpus shuffle before the per-pair count. At 100 TB
    the only shuffle is the (doc, probe) aggregation, whose cardinality
    is bounded by matches — near-zero for a clean corpus.
    """
    d_sh = shingle_hashes(docs, text_col, k)
    p_base = probes.select(
        F.col(probe_id_col).alias("doc_id"), F.col(probe_text_col).alias("text")
    )
    p_sh = shingle_hashes(p_base, "text", k).select(
        F.col("doc_id").alias(probe_id_col), "shh"
    )
    totals = p_sh.groupBy(probe_id_col).agg(F.count("*").alias("probe_total"))
    inter = (
        d_sh.join(F.broadcast(p_sh), "shh")
        .groupBy("doc_id", probe_id_col)
        .agg(F.count("*").alias("contained"))
    )
    out = inter.join(F.broadcast(totals), probe_id_col).select(
        "doc_id",
        probe_id_col,
        "contained",
        "probe_total",
        F.round(F.col("contained") / F.col("probe_total"), 4).alias("containment"),
    )
    if threshold is not None:
        out = out.where(F.col("containment") >= threshold)
    return out


def strip_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    min_count: int = 2,
    hash_shingles: bool = False,
    carry_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Span-level exact-substring dedup (Lee et al. 2022, ExactSubstr:
    duplicated substrings are removed from the corpus rather than
    dropping whole documents — X29's dup_profile MEASURES this signal,
    this operator ACTS on it). A k-token shingle whose total occurrence
    count across the corpus reaches ``min_count`` marks all k of its
    token positions as duplicated, in every occurrence; surviving
    tokens are re-joined in order. Whole-doc near-dup (X28) catches
    globally similar documents — this catches the shared boilerplate
    paragraph pasted into thousands of otherwise-unique pages.

    Output, one row per doc with >= 1 token: ``(doc_id`` [+ any
    ``carry_cols``, taken as first() per doc]``, n_tokens, n_removed,
    clean_text)``. Docs shorter than k tokens are passed through
    untouched (no shingle can mark them).

    Plan: the corpus is parsed twice (a shingle-occurrence pass and a
    token pass — two independent aggregations of the same relation, so
    declarative reuse is impossible without materializing the words
    array corpus-wide); both passes are whole-stage-codegen'd — the
    shingle pass is :func:`shingles`' one-regexp ``_shingle_expr``
    (~30x the interpreted transform/slice lambda form, measured at the
    top of this module) and the token pass is a posexplode of the
    split. Everything after is relational — a count-filtered shingle
    frequency agg, a join-back of duplicated occurrences, a position
    explode of the covered spans, and ONE left join marking covered
    token positions, so no per-doc work is ever quadratic in document
    length. ``hash_shingles=True`` moves 8-byte xxhash64 keys through
    the frequency shuffle instead of shingle strings (the 100 TB form,
    X1's trade: loses the DuckDB twin; collision odds are the
    single-lane ~n^2/2^65 per BUCKET which only ever merges two
    counts, never loses a doc).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    from c3s_sm_spark.operators.textstats import words_col

    carry = list(carry_cols) if carry_cols is not None else []
    # shingle pass: _shingle_expr's array order IS token order, so the
    # 0-based posexplode index is the shingle's 0-based start token —
    # identical positions to a slice-of-words formulation, one codegen
    # regexp pass instead of an interpreted per-shingle lambda
    occ = (
        docs.select(
            "doc_id",
            F.posexplode_outer(_shingle_expr(text_col, k)).alias("pos0", "sh"),
        )
        .filter(F.col("sh").isNotNull())
    )
    if hash_shingles:
        occ = occ.select("doc_id", "pos0", F.xxhash64("sh").alias("sh"))
    freq = (
        occ.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("sh")
    )
    covered = (
        occ.join(freq, "sh")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos0"), F.col("pos0") + F.lit(k - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    toks = (
        docs.select(
            "doc_id", *carry,
            F.posexplode_outer(words_col(text_col)).alias("i", "tok"),
        )
        .filter(F.col("tok").isNotNull())
    )
    marked = toks.join(
        covered,
        (toks["doc_id"] == covered["doc_id"]) & (toks["i"] == covered["cpos"]),
        "left",
    ).select(
        toks["doc_id"], *carry, "i", "tok",
        covered["cpos"].isNotNull().alias("__dup"),
    )
    return marked.groupBy("doc_id").agg(
        *[F.first(c).alias(c) for c in carry],
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_if(F.col("__dup")).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("__dup"), F.struct("i", "tok"))
                    )
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )


def group_ngram_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """X106 pairwise k-gram-set overlap between groups (sources): for
    every unordered group pair, the exact intersection / union sizes
    of their distinct word-k-gram sets — the corpus-audit answer to
    "how much does crawl A repeat crawl B?" before any dedup runs.
    Jaccard/containment floats derive caller-side from the pieces.

    Shape: one distinct over (group, xxhash64(shingle)) — 8-byte keys
    through the dedup shuffle (shingle_hashes' argument: hashes of a
    set ARE the set for counting); the pair join is keyed on the
    shingle hash, so its exchange carries one row per distinct
    (group, shingle), never per occurrence; per-group sizes are a
    dimension. Zero-overlap pairs are kept (size cross-join is
    |groups|² — dimension-sized by contract).

    Output: ``(src_a, src_b, n_a, n_b, inter, uni)`` all BIGINT with
    ``src_a < src_b``.
    """
    shh = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(_shingle_expr(text_col, k)).alias("sh"),
        )
        .select("g", F.xxhash64("sh").alias("shh"))
        .distinct()
    )
    sizes = shh.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = shh.alias("a"), shh.alias("b")
    inter = (
        a.join(b, "shh")
        .where(F.col("a.g") < F.col("b.g"))
        .groupBy(
            F.col("a.g").alias("src_a"), F.col("b.g").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    grid = (
        sa.crossJoin(sb)
        .where(F.col("sa.g") < F.col("sb.g"))
        .select(
            F.col("sa.g").alias("src_a"),
            F.col("sb.g").alias("src_b"),
            F.col("sa.n").alias("n_a"),
            F.col("sb.n").alias("n_b"),
        )
    )
    return grid.join(inter, ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        F.coalesce(F.col("inter"), F.lit(0)).cast("long").alias("inter"),
        (
            F.col("n_a")
            + F.col("n_b")
            - F.coalesce(F.col("inter"), F.lit(0))
        )
        .cast("long")
        .alias("uni"),
    )


def cross_group_dups(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """X107 exact-duplicate leakage ACROSS groups: per unordered group
    pair, how many distinct normalized-content fingerprints appear in
    BOTH — the train/eval split-hygiene and cross-crawl contamination
    check (within-group dups are X1's job; this isolates the boundary-
    crossing ones). Emits only pairs with leakage; a clean corpus
    returns zero rows.

    Normalization matches :func:`~c3s_sm_spark.operators.textstats.
    fingerprint` (lower + whitespace collapse). The 128-bit two-lane
    content key from :func:`exact_dedup` travels instead of text (16
    bytes/row through every exchange; birthday-safe at 10^12 docs —
    the oracle groups the normalized text itself, so hash-equality of
    results IS the collision check at test scale).

    Output: ``(src_a, src_b, n_shared)`` BIGINT, ``src_a < src_b``.
    """
    norm = F.lower(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    )
    fps = docs.select(
        F.col(group_col).alias("g"),
        F.xxhash64(F.lit(0), norm).alias("th_lo"),
        F.xxhash64(F.lit(1), norm).alias("th_hi"),
    ).distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, ["th_lo", "th_hi"])
        .where(F.col("a.g") < F.col("b.g"))
        .groupBy(
            F.col("a.g").alias("src_a"), F.col("b.g").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


#: the normalization ladder (X114): each level's expression builder,
#: applied in order of increasing aggressiveness. ONE definition so the
#: report, any dedup caller and the oracle doc can't disagree.
NORM_LEVELS = ("raw", "ws", "lower_ws", "alnum")


def _norm_expr(level: str, text_col: str):
    c = F.col(text_col)
    if level == "raw":
        return c
    ws = F.regexp_replace(F.trim(c), r"\s+", " ")
    if level == "ws":
        return ws
    if level == "lower_ws":
        return F.lower(ws)
    if level == "alnum":
        return F.regexp_replace(F.lower(ws), "[^a-z0-9 ]", "")
    raise ValueError(f"unknown normalization level {level!r}")


def normalization_report(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """X114 normalization-sensitivity dedup report: how many duplicate
    groups / redundant docs appear at each rung of the normalization
    ladder (raw → whitespace-collapse → +lowercase → +alnum-only) —
    the audit that decides WHICH normalization exact-dedup should key
    on before anyone deletes a byte. A big raw→ws jump means trailing-
    whitespace boilerplate; ws→lower_ws jumps mean case-variant spam.

    One corpus scan: every level's 128-bit content key (exact_dedup's
    two salted xxhash64 lanes — 16 bytes/row/level through the
    shuffle, never text) is emitted via a posexplode'd struct array,
    then ONE groupBy(level, key) + ONE groupBy(level). Output per
    level: ``(form, n_docs, n_distinct, dup_groups, redundant)`` all
    BIGINT; the oracle computes the same cardinalities over the
    normalized strings themselves (collision check at test scale).
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(lv).alias("form"),
                F.xxhash64(F.lit(0), _norm_expr(lv, text_col)).alias("lo"),
                F.xxhash64(F.lit(1), _norm_expr(lv, text_col)).alias("hi"),
            )
            for lv in NORM_LEVELS
        ]
    )
    keyed = docs.select(F.explode(structs).alias("s")).select(
        F.col("s.form").alias("form"),
        F.col("s.lo").alias("lo"),
        F.col("s.hi").alias("hi"),
    )
    groups = keyed.groupBy("form", "lo", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return groups.groupBy("form").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("dup_groups"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("redundant"),
    )


def incremental_exact_dedup(
    ledger,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X115 exact dedup ACROSS ingestion batches: keep a persisted
    fingerprint ledger (a :class:`~c3s_sm_spark.sources.tableio.
    SnapshotTable` of 128-bit content keys) and admit only first-seen
    content — the stateful companion to :func:`exact_dedup`, which is
    one-shot. First ARRIVAL wins (streaming-correct: an earlier batch's
    doc keeps its slot even if a later batch ships a smaller id).

    Semantics per call: (1) within the batch, keep the min-``id_col``
    row per content key; (2) anti-join the ledger AT ITS CURRENT
    SNAPSHOT (the explicit-file-list read pins the scan — concurrent
    appends can't shift it mid-job); (3) atomically append the newly
    admitted keys. Re-running the same batch is idempotent: every key
    is already in the ledger, zero survivors, no ledger growth.

    Scale: the ledger stores 16 bytes/distinct-content (two salted
    xxhash64 lanes — exact_dedup's birthday-safe key); the anti-join
    is key-to-key, never text; ledger compaction/expiry ride the
    SnapshotTable maintenance ops. Returns the surviving batch rows
    with all original columns.
    """
    spark = batch.sparkSession
    keyed = batch.withColumn(
        "__lo", F.xxhash64(F.lit(0), F.col(text_col))
    ).withColumn("__hi", F.xxhash64(F.lit(1), F.col(text_col)))
    first = keyed.groupBy("__lo", "__hi").agg(
        F.min(id_col).alias("__keep")
    )
    try:
        seen = ledger.read(spark)
    except FileNotFoundError:
        seen = None
    fresh = (
        first
        if seen is None
        else first.join(
            seen.select(
                F.col("lo").alias("__lo"), F.col("hi").alias("__hi")
            ),
            ["__lo", "__hi"],
            "left_anti",
        )
    )
    survivors = keyed.join(
        fresh.withColumnRenamed("__keep", id_col),
        ["__lo", "__hi", id_col],
    ).drop("__lo", "__hi")
    new_keys = fresh.select(
        F.col("__lo").alias("lo"), F.col("__hi").alias("hi")
    )
    if not new_keys.isEmpty():
        ledger.append(new_keys, summary={"op": "incremental_exact_dedup"})
    return survivors


def local_align_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
    n_partitions: int | None = None,
) -> DataFrame:
    """X179 Smith-Waterman LOCAL alignment over token sequences (Smith
    & Waterman 1981) — the exact text-reuse verifier the span family
    lacks: :func:`strip_duplicate_spans`/winnowing find EXACT shared
    spans; local alignment scores reuse that survived paraphrase-level
    edits (insertions, deletions, substitutions), the plagiarism-
    detection / near-translation read. Like every pairwise verifier
    here, it is the stage AFTER blocking: ``pairs`` names the
    candidate (id_a, id_b) set (winnow overlaps, LSH candidates, a
    probe set) — never the corpus-wide plan.

    ``H[i][j] = max(0, H[i−1][j−1] + s(aᵢ,bⱼ), H[i−1][j] + gap,
    H[i][j−1] + gap)`` with integer ``match/mismatch/gap`` scores —
    pure int64 max-plus, so the best score is exact at any
    parallelism. Tokens are pre-hashed JVM-side (xxhash64 per token)
    so the kernel compares 8-byte ints, not strings; a hash collision
    scoring a false match has probability ~n·m/2^64 per pair —
    negligible at any candidate budget. Emits ``(id_a, id_b, n_a,
    n_b, score, end_a, end_b)`` — the best local score and its
    1-based end positions (ties: smallest (i+j), then smallest i —
    deterministic).

    Scale shape: identical to :func:`~c3s_sm_spark.operators.
    timeseries.dtw_distances` — one token-hash projection + grouped
    series assembly is replaced by a per-doc array build (zero
    shuffle beyond the two pair joins), and the DP runs anti-
    diagonal-vectorized in one mapInPandas kernel.
    """
    if gap > 0 or mismatch > match:
        raise ValueError("need gap <= 0 and mismatch <= match")
    from c3s_sm_spark.operators.textstats import words_col

    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.transform(
            words_col(text_col), lambda x: F.xxhash64(x)
        ).alias("__h"),
    ).localCheckpoint(eager=False)
    ka, kb = pairs.columns[0], pairs.columns[1]
    joined = (
        pairs.select(F.col(ka).alias("id_a"), F.col(kb).alias("id_b"))
        .join(
            toks.select(F.col("__id").alias("id_a"), F.col("__h").alias("__ha")),
            "id_a",
        )
        .join(
            toks.select(F.col("__id").alias("id_b"), F.col("__h").alias("__hb")),
            "id_b",
        )
        .select("id_a", "id_b", "__ha", "__hb")
    )
    if n_partitions:
        joined = joined.repartition(n_partitions)
    M, X, G = int(match), int(mismatch), int(gap)

    def _sw_one(a, b):
        import numpy as np

        n, m = len(a), len(b)
        best = 0
        bi = bj = 0
        dp_prev = None
        dp_prev2 = None
        lo_prev = lo_prev2 = 0
        for d in range(0, n + m - 1):
            lo = max(0, d - (m - 1))
            hi = min(n - 1, d)
            L = hi - lo + 1
            av = a[lo:hi + 1]
            bv = b[d - hi:d - lo + 1][::-1]
            s = np.where(av == bv, M, X).astype(np.int64)

            def _pick(dpd, lod, i0):
                r = np.full(L, np.int64(-1) << 40, dtype=np.int64)
                if dpd is not None:
                    src_lo = i0 - lod
                    s0 = max(0, src_lo)
                    e0 = min(len(dpd), src_lo + L)
                    if e0 > s0:
                        r[s0 - src_lo:e0 - src_lo] = dpd[s0:e0]
                return r

            up = _pick(dp_prev, lo_prev, lo - 1)      # (i-1, j)
            left = _pick(dp_prev, lo_prev, lo)        # (i, j-1)
            diag = _pick(dp_prev2, lo_prev2, lo - 1)  # (i-1, j-1)
            # Smith-Waterman's ZERO boundary: cells in the first row
            # (i=0) or first column (j=0) take H[i-1][j-1] = 0 from
            # the implicit boundary, not -inf — without this the
            # match credit of boundary-started alignments is lost.
            # (up/left boundary zeros never matter: 0 + gap <= 0.)
            if lo == 0:
                diag[0] = 0          # i = 0
            if hi == d:
                diag[-1] = 0         # j = d - i = 0
            cur = np.maximum(
                0,
                np.maximum(
                    np.maximum(up + G, left + G), diag + s
                ),
            )
            mx = int(cur.max())
            if mx > best:
                # ties within the diagonal: smallest i = first argmax?
                # i increases along the slice, so argmax gives smallest i
                pos = int(np.argmax(cur))
                best = mx
                bi = lo + pos + 1
                bj = d - (lo + pos) + 1
            dp_prev2, lo_prev2 = dp_prev, lo_prev
            dp_prev, lo_prev = cur, lo
        return best, bi, bj

    def _sw_partition(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            res = []
            for ia, ib, ha, hb in zip(
                pdf["id_a"], pdf["id_b"], pdf["__ha"], pdf["__hb"]
            ):
                a = np.asarray(ha, dtype=np.int64)
                b = np.asarray(hb, dtype=np.int64)
                if len(a) == 0 or len(b) == 0:
                    res.append((ia, ib, len(a), len(b), 0, 0, 0))
                    continue
                sc, ea, eb = _sw_one(a, b)
                res.append((ia, ib, len(a), len(b), sc, ea, eb))
            if res:
                yield pd.DataFrame(
                    res,
                    columns=[
                        "id_a", "id_b", "n_a", "n_b",
                        "score", "end_a", "end_b",
                    ],
                )

    out_schema = (
        f"id_a {joined.schema['id_a'].dataType.simpleString()}, "
        f"id_b {joined.schema['id_b'].dataType.simpleString()}, "
        "n_a bigint, n_b bigint, score bigint, end_a bigint, end_b bigint"
    )
    return joined.mapInPandas(_sw_partition, schema=out_schema)


def lcs_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """X181 longest-common-subsequence length over token sequences —
    the difflib/`SequenceMatcher` family's similarity core: the
    longest ORDER-PRESERVING (not necessarily contiguous) shared
    token sequence. Complements the pair-verify ladder: exact Jaccard
    ignores order entirely, winnowing/strip_spans need contiguous
    spans, Smith-Waterman (:func:`local_align_pairs`) scores ONE best
    local region — LCS measures total ordered overlap across the
    whole pair, the classic "how much of A survives, in order, in B"
    diff metric. ``ratio = 2·lcs/(n_a+n_b)`` (difflib's ratio)
    derives caller-side; the witness stays integer.

    Same kernel family as :func:`local_align_pairs`: tokens pre-hashed
    JVM-side, anti-diagonal-vectorized integer max DP
    (``L[i][j] = max(L[i−1][j], L[i][j−1], L[i−1][j−1] + eq)`` —
    monotone, so the zero boundary is just 0), exact at any
    parallelism. Emits ``(id_a, id_b, n_a, n_b, lcs)``. Pairs name
    the candidate set — the blocked-verify contract as everywhere.
    """
    from c3s_sm_spark.operators.textstats import words_col

    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.transform(
            words_col(text_col), lambda x: F.xxhash64(x)
        ).alias("__h"),
    ).localCheckpoint(eager=False)
    ka, kb = pairs.columns[0], pairs.columns[1]
    joined = (
        pairs.select(F.col(ka).alias("id_a"), F.col(kb).alias("id_b"))
        .join(
            toks.select(
                F.col("__id").alias("id_a"), F.col("__h").alias("__ha")
            ),
            "id_a",
        )
        .join(
            toks.select(
                F.col("__id").alias("id_b"), F.col("__h").alias("__hb")
            ),
            "id_b",
        )
        .select("id_a", "id_b", "__ha", "__hb")
    )
    if n_partitions:
        joined = joined.repartition(n_partitions)

    def _lcs_one(a, b):
        import numpy as np

        n, m = len(a), len(b)
        dp_prev = None
        dp_prev2 = None
        lo_prev = lo_prev2 = 0
        last = 0
        for d in range(0, n + m - 1):
            lo = max(0, d - (m - 1))
            hi = min(n - 1, d)
            L = hi - lo + 1
            av = a[lo:hi + 1]
            bv = b[d - hi:d - lo + 1][::-1]
            eq = (av == bv).astype(np.int64)

            def _pick(dpd, lod, i0):
                r = np.zeros(L, dtype=np.int64)  # zero boundary
                if dpd is not None:
                    src_lo = i0 - lod
                    s0 = max(0, src_lo)
                    e0 = min(len(dpd), src_lo + L)
                    if e0 > s0:
                        r[s0 - src_lo:e0 - src_lo] = dpd[s0:e0]
                return r

            up = _pick(dp_prev, lo_prev, lo - 1)
            left = _pick(dp_prev, lo_prev, lo)
            diag = _pick(dp_prev2, lo_prev2, lo - 1)
            cur = np.maximum(np.maximum(up, left), diag + eq)
            dp_prev2, lo_prev2 = dp_prev, lo_prev
            dp_prev, lo_prev = cur, lo
            if d == n + m - 2:
                last = int(cur[0])
        return last

    def _lcs_partition(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            res = []
            for ia, ib, ha, hb in zip(
                pdf["id_a"], pdf["id_b"], pdf["__ha"], pdf["__hb"]
            ):
                a = np.asarray(ha, dtype=np.int64)
                b = np.asarray(hb, dtype=np.int64)
                lcs = (
                    0 if len(a) == 0 or len(b) == 0 else _lcs_one(a, b)
                )
                res.append((ia, ib, len(a), len(b), lcs))
            if res:
                yield pd.DataFrame(
                    res,
                    columns=["id_a", "id_b", "n_a", "n_b", "lcs"],
                )

    out_schema = (
        f"id_a {joined.schema['id_a'].dataType.simpleString()}, "
        f"id_b {joined.schema['id_b'].dataType.simpleString()}, "
        "n_a bigint, n_b bigint, lcs bigint"
    )
    return joined.mapInPandas(_lcs_partition, schema=out_schema)
