"""Bloom-filter-pruned semi-join: mask a huge fact table against a key
set WITHOUT shuffling the fact table.

A plain ``leftsemi`` join shuffles both sides on the key (or broadcasts
the whole dim, which stops working once the active set outgrows the
driver). At 100 TB the fact-side exchange dominates the job even when
only a few percent of rows survive the mask. The classic engine answer
(Spark's own AQE runtime bloom pushdown, ORC/Parquet bloom indexes) is
to compact the dim keys into a fixed-size bit array, ship THAT, and
filter the fact side map-side; only rows that pass the (superset) bloom
test ever reach the exact join. This module makes the pattern an
explicit, tunable operator:

1. bitmap build — each dim key sets ``k`` bits chosen by
   ``xxhash64(key, seed_i) pmod m``; the bitmap materializes as a
   relation of at most ``m/64`` ``(word, bits)`` rows via a map-side-
   combined ``bit_or`` aggregate, so the only dim-sized exchange moves
   8-byte words, not keys, and collapses to <= m/64 rows.
2. probe — the fact side takes ``k`` BROADCAST hash joins against the
   tiny bitmap relation (one per hash lane, all in one codegen stage:
   no fact-side exchange at all) and keeps rows with all ``k`` bits set.
3. verify (default on) — bloom filters admit false positives at a rate
   ~= (1 - e^{-kn/m})^k, so survivors take the EXACT ``leftsemi`` join.
   Only ``|true matches| + fpp * |fact|`` rows enter that exchange — the
   result is bit-identical to the plain semi-join (the driver oracle for
   this operator IS the plain semi-join), with the fact-wide shuffle
   replaced by a post-filter-sized one.

Sizing at 10^12 rows: ``m`` bits for ``n`` dim keys at ``k`` lanes gives
fpp ~= (1 - e^{-kn/m})^k; m = 16n, k = 3 yields ~0.4%. The bitmap is
m/8 bytes regardless of key width — 2 GB covers a billion-key active
set that could never broadcast as a hash relation.

Reference parity: the land-mask / active-GPI subsetting this prunes is
``/root/reference/src/c3s_sm/interface.py:158-195`` (activegpis) and
``reshuffle.py:156-159`` (land grid); the engine's broadcast semi-join
form is ``__spark_entry__._q_mask_semi_join`` — this operator is its
beyond-broadcast-scale sibling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shl1(nbits: Column) -> Column:
    """``1L << nbits`` with a Column shift amount — the Python
    ``F.shiftleft`` wrapper only takes an int, but the underlying SQL
    function accepts expressions."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), nbits)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The ``k`` bit positions for a key: independent hash lanes via
    xxhash64 with a distinct literal seed column mixed into each lane
    (xxhash64 folds all arguments, so each lane is a distinct 64-bit
    hash of the same key). ``pmod`` keeps positions non-negative."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_bitmap(
    dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build the bitmap relation ``(word long, bits long)`` from the dim
    key set. One explode to k rows per key, then a map-side-combined
    ``bit_or`` groupBy on the word ordinal: the exchange payload is
    <= m/64 rows of two longs per map partition, independent of key
    count or key width. Eagerly localCheckpointed — callers reuse it k
    times (one per probe lane) and the build must not re-run per lane.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    bm = (
        dim.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            _shl1((F.col("pos") % 64).cast("int")).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )
    return bm.localCheckpoint(eager=True)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    verify: bool = True,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim ON key`` with the fact-side exchange
    replaced by a broadcast bloom probe.

    With ``verify=True`` (default) the result is exactly the semi-join:
    bloom survivors (true matches + ~fpp of the rest) take the precise
    ``leftsemi`` against the dim keys, and only they pay that shuffle.
    ``verify=False`` returns the superset (useful when a downstream
    exact join re-checks the key anyway — the standard runtime-filter
    contract) with the false-positive bound documented above.

    The k probes are k broadcast hash joins against the <= m/64-row
    bitmap, planned back-to-back in one whole-stage-codegen pass over
    the fact scan; the fact side is never exchanged or exploded (an
    explode-and-regroup membership test would reshuffle fact k-fold —
    exactly the cost this operator exists to avoid).
    """
    bm = bloom_bitmap(dim.select(key), key, m_bits=m_bits, k=k)
    out = fact
    keep = F.lit(True)
    for i, pos in enumerate(_positions(F.col(key), m_bits, k)):
        bi = bm.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = out.withColumn(f"__w{i}", (pos / 64).cast("long")).join(
            F.broadcast(bi), f"__w{i}", "left"
        )
        lane_bit = _shl1((pos % 64).cast("int"))
        # NULL bits (word never set by any key) correctly fails the lane
        keep = keep & (F.col(f"__b{i}").bitwiseAND(lane_bit) == lane_bit)
    out = out.where(keep).drop(
        *[c for i in range(k) for c in (f"__w{i}", f"__b{i}")]
    )
    if verify:
        # exact pass over survivors only; no broadcast hint — the dim
        # side may be far beyond driver scale (that is this operator's
        # reason to exist), so AQE decides from runtime sizes
        out = out.join(dim.select(key).distinct(), key, "leftsemi")
    return out
