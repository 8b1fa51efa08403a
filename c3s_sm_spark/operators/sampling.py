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
