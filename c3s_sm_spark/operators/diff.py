"""Keyed table diff (X93) — the change-data-capture primitive between
two snapshots of the same logical table: which keys were added, which
deleted, which rows changed. This is what an Iceberg/Delta CDC read
computes from snapshot metadata; the engine form computes it from data,
so it also works across independently-produced tables (yesterday's
export vs today's, vendor drop A vs B) where no shared snapshot lineage
exists — the re-ingest auditing companion to the snapshot layer in
``c3s_sm_spark/sources/tableio.py``.

Plan shape: both sides pre-project to ``keys + compare_cols`` (column
pruning reaches the scans — nothing else is read), then ONE full outer
join hash-co-partitioned on the keys, then a null-safe column compare.
``added`` = key absent on the old side, ``deleted`` = absent on the new
side, ``changed`` = present on both with any compare column differing
under null-safe (``<=>``) semantics; unchanged rows are dropped by
default (the interesting output is the delta, and at 10^12 rows the
unchanged mass is the overwhelming majority — emitting it would make
the diff as large as the table).

Scale: the full outer join is the contract price — both sides exchange
once on the key. When diffs run repeatedly against the same table
family, bucket both snapshots on the key at write time (the tableio
layer's bucketed layout) and the exchange disappears entirely; AQE
handles the skewed-key case the same way it does for any join. The
compare itself is whole-stage-codegen column equality — no hashing
detour, no UDF.

Reference parity: the reference's incremental update path re-reads the
previous product and appends only new dates
(``/root/reference/src/c3s_sm/reshuffle.py`` extend flow); this
operator generalizes "what actually differs between two materialized
states" to arbitrary keyed tables.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two keyed snapshots; emits ``keys... + status`` plus the
    old/new values of every compare column (``<col>_old``/``<col>_new``,
    NULL on the absent side).

    ``compare_cols`` defaults to every shared non-key column. Keys must
    be unique per side (snapshot semantics) — duplicate keys make
    "changed" ill-defined; callers with multi-version tables dedup
    first (``operators.dedup.keep_latest``).
    """
    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    compare_cols = list(compare_cols)

    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")

    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.withColumn("status", status).drop("__in_old", "__in_new")
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(diff: DataFrame, key_sum_col: str | None = None) -> DataFrame:
    """Compact witness over a :func:`table_diff` output: per status,
    the row count and (for an integer key) the key checksum — pins the
    exact membership of each class without materializing the delta.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if key_sum_col is not None:
        aggs.append(
            F.coalesce(F.sum(F.col(key_sum_col)), F.lit(0))
            .cast("long")
            .alias("key_sum")
        )
    return diff.groupBy("status").agg(*aggs)
