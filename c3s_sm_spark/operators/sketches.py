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
