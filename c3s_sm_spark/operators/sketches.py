"""Mergeable frequency sketches: Count-Min over a token/key stream.

The exact heavy-hitter operator (Misra-Gries + recount, X82) answers
"who is frequent"; Count-Min answers point-frequency queries over keys
you DIDN'T keep — with a fixed-size state that merges across loads by
cell-wise addition, which is what an incremental 100 TB ingest needs.
Estimates are deterministic overcounts: ``est(x) >= true(x)`` always,
and ``est(x) <= true(x) + N/width`` with probability ``1 - 2^-depth``
(Cormode & Muthukrishnan 2005, public).

Engine-portability: the row hashes are md5 hex PREFIXES used as string
bucket keys (the :func:`~c3s_sm_spark.operators.sampling.hash_bucket`
discipline — no hex→int conversion exists portably in both engines, so
the bucket id IS the hex string; width is therefore 16^prefix_hex).
Everything is GROUP BY + min — reproducible in any ANSI engine, which
is what lets a DuckDB oracle pin the sketch cells and the estimates
exactly.

Scale shape: the build is one map-side-combined groupBy over
depth × |occurrences| rows — each partition pre-aggregates to at most
depth × width cells before the exchange, so the shuffle is bounded by
the SKETCH size (not the data) per partition; merging daily sketches
is a union + re-group on the same (j, bucket) key. Estimation joins
the probe set (a query, dimension-sized, broadcast) against the
sketch and takes the per-key min across depth rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def countmin_build(
    keys: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    prefix_hex: int = 4,
) -> DataFrame:
    """Build the sketch: one row per non-empty cell ``(j, bucket,
    cnt)`` with ``bucket = substr(md5(j || ':' || key), 1,
    prefix_hex)``. Input is one row per OCCURRENCE (pre-aggregate to
    (key, weight) and sum if you have counts — cells add either way).
    Width is ``16^prefix_hex`` (4 hex chars = 65,536 cells/row)."""
    if depth < 1 or prefix_hex < 1:
        raise ValueError("depth and prefix_hex must be >= 1")
    rows = keys.select(
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    )
    bucket = F.substring(
        F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("__k"))),
        1,
        prefix_hex,
    )
    return (
        rows.select(F.col("j").cast("int").alias("j"), bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    prefix_hex: int = 4,
) -> DataFrame:
    """Point-frequency estimates for a probe key set: ``(key,
    cm_est)`` with ``cm_est = min_j cells[j][h_j(key)]`` (0 if any
    probed cell is empty — an absent cell means count 0). ``depth``
    and ``prefix_hex`` must match the build."""
    p = probes.select(F.col(key_col).cast("string").alias("__k")).distinct()
    pj = p.select(
        "__k",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    ).select(
        "__k",
        F.col("j").cast("int").alias("j"),
        F.substring(
            F.md5(
                F.concat(F.col("j").cast("string"), F.lit(":"), F.col("__k"))
            ),
            1,
            prefix_hex,
        ).alias("bucket"),
    )
    joined = pj.join(sketch, ["j", "bucket"], "left").select(
        "__k", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c")
    )
    return joined.groupBy("__k").agg(
        F.min("c").cast("long").alias("cm_est")
    ).select(F.col("__k").alias(key_col), "cm_est")


def kmv_sketch(
    items: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """K-Minimum-Values distinct-set sketch per group: the ``k``
    lexicographically smallest ``md5(key)`` hex digests of each
    group's DISTINCT keys — the mergeable set summary behind cheap
    distinct-count estimates and cross-group Jaccard estimates
    (Bar-Yossef et al. 2002; Beyer et al. 2007 — public). md5 hex
    strings keep the sketch engine-portable (the hash_bucket
    discipline); lexicographic order on fixed-width hex IS numeric
    order.

    Mergeability: union two groups' sketch ROWS and keep the k
    smallest again — identical to sketching the union (pytest-pinned).
    Estimates derive caller-side: with v_k = the k-th minimum mapped
    to (0,1], D̂ ≈ (k-1)/v_k; Jaccard(A,B) ≈ |{k smallest of A∪B
    sketches} ∩ A-sketch ∩ B-sketch| / k.

    Plan: distinct over (group, digest) — the only corpus-sized
    exchange, carrying 32-byte digests of DISTINCT keys; the top-k cut
    is a per-group rank window over the distinct frame (bounded by
    vocabulary, not occurrences). Output: ``(group, rnk, digest)``
    with rnk 1..k — rows, not arrays, so downstream merges stay
    relational.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    dig = (
        items.select(
            F.col(group_col).alias("g"),
            F.md5(F.col(key_col).cast("string")).alias("digest"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("digest")
    return (
        dig.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(F.col("g").alias(group_col), "rnk", "digest")
    )


def kmv_merge(sketches: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Merge KMV sketch rows (possibly from different loads/groups
    mapped onto the same target group): distinct digests, keep the k
    smallest per group — the same relation :func:`kmv_sketch` would
    emit over the union of the original key sets."""
    from pyspark.sql import Window

    dig = sketches.select(
        F.col(group_col).alias("g"), "digest"
    ).distinct()
    w = Window.partitionBy("g").orderBy("digest")
    return (
        dig.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(F.col("g").alias(group_col), "rnk", "digest")
    )


def kmv_distinct_estimate(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: if the
    group has fewer than k digests the sketch IS the distinct set
    (exact count); else D̂ = (k-1)/v_k with v_k = k-th minimum digest
    mapped to (0,1] via its leading 15 hex chars (60 bits). Float by
    nature — derives OUTSIDE any hash boundary."""
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        F.max(F.when(F.col("rnk") == k, F.substring("digest", 1, 15))).alias(
            "__vk"
        ),
    )
    u = (F.conv(F.col("__vk"), 16, 10).cast("double") + 1.0) / float(16**15)
    return agg.select(
        group_col,
        "n_in_sketch",
        F.when(F.col("__vk").isNull(), F.col("n_in_sketch").cast("double"))
        .otherwise((F.lit(float(k - 1))) / u)
        .alias("d_est"),
    )


def hll_group_sketch(
    items: DataFrame,
    group_col: str,
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """X123 per-group HyperLogLog register sketch using Spark's native
    Datasketches aggregate (``hll_sketch_agg`` — JVM-side, mergeable,
    ~0.8%% error at lgK=12 in 4 KB): ``(group, hll binary)``. The
    industrial-strength sibling of :func:`kmv_sketch` — KMV stays the
    engine-portable/oracle-checkable form; HLL is the
    space-optimal production form (fixed 2^lgK registers per group vs
    KMV's k digests, union via register max). Persist the binary
    column in a SnapshotTable and daily distinct-count dashboards
    never rescan history.

    Determinism caveat (measured, not assumed): the DISTRIBUTED
    aggregate's estimate depends on the partial-merge structure —
    different partitionings of the same input drift a few parts in
    10^3 (HLL mode promotion happens at merge points), and a union of
    batch sketches serializes differently from a direct build. The
    pinned contract is therefore estimate agreement within tolerance
    across partitionings/merge orders + byte-idempotent re-merge —
    never bit or exact-estimate equality. Need exactness or an engine
    oracle? Use :func:`kmv_sketch`. Rows-only driver contract (row
    count = |groups| is stable)."""
    return items.groupBy(F.col(group_col).alias("g")).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias(
            "hll"
        )
    ).select(F.col("g").alias(group_col), "hll")


def hll_merge(sketches: DataFrame, group_col: str) -> DataFrame:
    """Merge HLL sketch rows onto the same group key (cross-batch /
    cross-partition union): register-wise max via ``hll_union_agg`` —
    associative, commutative, idempotent (re-merging the same sketch
    changes nothing)."""
    return sketches.groupBy(F.col(group_col).alias("g")).agg(
        F.hll_union_agg("hll").alias("hll")
    ).select(F.col("g").alias(group_col), "hll")


def hll_estimate(sketches: DataFrame, group_col: str) -> DataFrame:
    """Distinct-count estimates from sketch rows: ``(group, d_est)``
    BIGINT."""
    return sketches.select(
        group_col,
        F.hll_sketch_estimate("hll").cast("long").alias("d_est"),
    )


def kmv_set_pieces(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """X125 pairwise set-operation pieces from per-group KMV sketches
    (the mergeable sketch algebra HLL cannot do: HLL unions only; KMV
    unions AND intersects — Beyer et al. 2007, public). For every
    unordered group pair ``g1 < g2``, merge the two k-sketches, keep
    the k smallest union digests, and emit exact-integer witnesses:

    - ``n_union_sk``  — digests in the union k-sketch (= k unless the
      union itself has fewer distinct keys, in which case the sketch
      is the exact set);
    - ``vk_union``    — the k-th minimum union digest ('' when
      ``n_union_sk < k``);
    - ``n_common_k``  — union-sketch digests present in BOTH input
      sketches (the Jaccard numerator: J ≈ n_common_k / n_union_sk);
    - ``n_a_k`` / ``n_b_k`` — union-sketch digests present in each
      side (difference pieces: |A\\B|-hat ∝ n_a_k - n_common_k).

    Float estimates (union/intersection/difference cardinalities)
    derive caller-side via :func:`kmv_setop_estimates` — transcendental-
    free integers and hex strings are all that cross a hash boundary
    (the oracle-witness discipline).

    Scale shape: the corpus was already reduced to sketches (groups x
    k rows) by :func:`kmv_sketch`; every stage here is sketch-sized —
    a |groups|^2 pair frame joined twice against the sketch relation,
    one groupBy on (pair, digest), one rank window, one aggregate.
    At 10^12 keys none of this touches the corpus again, and the pair
    frame is dimension-sized (sources/days/shards, not documents).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    s = sketch.select(F.col(group_col).alias("g"), "digest")
    gs = s.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g1"))
        .join(gs.select(F.col("g").alias("g2")), F.col("g1") < F.col("g2"))
    )
    left = pairs.join(s.withColumnRenamed("g", "g1"), "g1").select(
        "g1", "g2", "digest",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    right = pairs.join(s.withColumnRenamed("g", "g2"), "g2").select(
        "g1", "g2", "digest",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    u = (
        left.unionByName(right)
        .groupBy("g1", "g2", "digest")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g1", "g2").orderBy("digest")
    uk = u.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
    return uk.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_sk"),
        F.coalesce(
            F.max(F.when(F.col("rnk") == k, F.col("digest"))), F.lit("")
        ).alias("vk_union"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int"))
        .cast("long")
        .alias("n_common_k"),
        F.sum("in_a").cast("long").alias("n_a_k"),
        F.sum("in_b").cast("long").alias("n_b_k"),
    )


def kmv_setop_estimates(pieces: DataFrame, k: int) -> DataFrame:
    """Cardinality estimates from :func:`kmv_set_pieces` rows —
    floats, derived OUTSIDE any hash boundary: ``d_union`` ((k-1)/v_k,
    exact count when the union sketch is the whole union),
    ``jaccard_est`` (n_common_k / n_union_sk), ``d_inter``
    (J-hat · D-hat, Beyer et al.'s ratio estimator) and the one-sided
    differences ``d_a_only`` / ``d_b_only``."""
    vk_u = (F.conv(F.substring("vk_union", 1, 15), 16, 10).cast("double") + 1.0) / float(16**15)
    d_union = F.when(
        F.col("vk_union") == "", F.col("n_union_sk").cast("double")
    ).otherwise(F.lit(float(k - 1)) / vk_u)
    jac = F.col("n_common_k").cast("double") / F.col("n_union_sk")
    return pieces.select(
        "g1",
        "g2",
        d_union.alias("d_union"),
        jac.alias("jaccard_est"),
        (jac * d_union).alias("d_inter"),
        (
            (F.col("n_a_k") - F.col("n_common_k")).cast("double")
            / F.col("n_union_sk")
            * d_union
        ).alias("d_a_only"),
        (
            (F.col("n_b_k") - F.col("n_common_k")).cast("double")
            / F.col("n_union_sk")
            * d_union
        ).alias("d_b_only"),
    )
