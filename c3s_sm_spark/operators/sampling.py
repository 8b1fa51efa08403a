"""Deterministic sampling + data-mixing operators (training-data curation).

A 100 TB corpus pipeline samples constantly — debug subsets, eval
holdouts, per-source mixing ratios ("50% web, 20% code, ...") — and
``df.sample()`` is useless for it: its output depends on partitioning
and seed plumbing, so reruns and engines disagree. These operators key
every decision on a content hash, so the SAME rows are selected at any
parallelism, on any engine, forever:

- :func:`deterministic_sample` — keep a row iff the md5 of
  ``salt || key`` falls below the fraction cut. md5 (not xxhash64)
  because every engine speaks it — the cut compares the first 4 hex
  chars lexicographically, giving 16^4 = 65536 quantization steps
  (0.0015% granularity), and the DuckDB oracle reproduces the exact row
  set (`sample_mix` driver query).
- :func:`stratified_mix` — per-stratum fractions (dict) via one
  ``when`` chain over the same hash; unlisted strata default to 0.
  This IS the mixing-ratio primitive: declarative, engine-parity,
  rerunnable.

Scale: both are pure column predicates — whole-stage codegen, pushed
into the scan where the source supports predicate pushdown, zero
shuffle, zero UDF. Sampling 0.1% of 100 TB reads only what the format
can skip to and never materializes the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex quantization width: 4 chars = 65536 buckets
_HEX_W = 4


def _cut(fraction: float) -> str:
    """Hex cut string for a fraction (floor to the 1/65536 grid).

    fraction=1.0 returns ``'g'`` — lexicographically above every hex
    string, so ``hash < cut`` keeps all rows (a 5-char ``'10000'`` would
    compare char-wise against 4-char hashes and keep almost nothing).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(fraction * (16**_HEX_W))
    return "g" if v >= 16**_HEX_W else format(v, f"0{_HEX_W}x")


def hash_bucket(key: Column, salt: str = "") -> Column:
    """First ``_HEX_W`` hex chars of ``md5(salt || key)`` — the
    engine-portable uniform hash both operators cut on."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _HEX_W)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a ``fraction`` of rows, chosen by content hash of
    ``key_col`` — identical row set at any parallelism and in any
    engine that has md5. Different ``salt`` values give independent
    samples (e.g. train/eval splits that provably never overlap when
    cut from disjoint hash ranges)."""
    return df.where(hash_bucket(F.col(key_col), salt) < _cut(fraction))


def stratified_mix(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive:
    ``fractions`` maps stratum value -> keep fraction; strata not listed
    are dropped. One ``when`` chain over the shared hash, so a row's
    fate depends only on (salt, key, its stratum's fraction)."""
    cut = None
    for value, frac in sorted(fractions.items()):
        branch = F.when(F.col(stratum_col) == value, F.lit(_cut(frac)))
        cut = branch if cut is None else cut.when(
            F.col(stratum_col) == value, F.lit(_cut(frac))
        )
    if cut is None:
        raise ValueError("fractions must not be empty")
    cut = cut.otherwise(F.lit(_cut(0.0)))
    return df.where(hash_bucket(F.col(key_col), salt) < cut)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tok",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Sequence packing for training batches: assign each document to a
    fixed-token-budget bin by streaming them in deterministic ``id_col``
    order and cutting a new bin whenever the running total crosses
    ``budget`` (the standard contiguous-fill approximation of bin
    packing used to build fixed-length training sequences). Output:
    ``(id_col, token_col, bin_id, pos_in_bin)`` where ``pos_in_bin`` is
    the document's exclusive token offset within its bin.

    The core is a GLOBAL prefix sum — and the naive formulation,
    ``sum(...).over(Window.orderBy(id))``, collapses the whole corpus
    into ONE task (Spark warns: "No Partition Defined for Window").
    This implements the classic two-phase distributed scan instead:
    range-partition by id, per-partition cumulative sums (window WITH a
    partition key -> parallel), then add each partition's exclusive
    total as a literal offset map (one tiny driver collect, one
    broadcast-sized expression). Identical result at any parallelism —
    the offsets adapt to wherever the range partitioner draws bounds.
    """
    n = n_partitions or docs.sparkSession.sparkContext.defaultParallelism * 4
    d = (
        docs.select(id_col, token_col)
        .repartitionByRange(n, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(id_col)
    # localCheckpoint PINS the range partitioning: the offsets below are
    # computed against these exact partition bounds, and a lazy recompute
    # would re-sample different bounds (repartitionByRange samples per
    # execution), silently misaligning _pid -> offset. At 10^12 rows this
    # materialization is a written intermediate table instead — the same
    # two-phase scan, one table write deep.
    part = d.withColumn(
        "_cum_incl", F.sum(token_col).over(w)
    ).localCheckpoint()
    totals = sorted(
        (r["_pid"], r["t"])
        for r in part.groupBy("_pid")
        .agg(F.max("_cum_incl").alias("t"))
        .collect()
    )
    running = 0
    offs = {}
    for pid, t in totals:
        offs[pid] = running
        running += t
    off_map = F.create_map(
        *[F.lit(x) for kv in offs.items() for x in kv]
    )
    cum_excl = (
        F.col("_cum_incl") - F.col(token_col) + off_map[F.col("_pid")]
    )
    return part.select(
        id_col,
        F.col(token_col).cast("long").alias(token_col),
        F.floor(cum_excl / budget).cast("long").alias("bin_id"),
        (cum_excl % budget).cast("long").alias("pos_in_bin"),
    )
