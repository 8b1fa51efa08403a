"""The cascading-tier rollup pipeline: raw -> daily -> dekadal -> monthly.

This is the engine's R1 (img2ts reshuffle) + R3 (extend_ts incremental
append) in one resumable object — the reference's flagship lifecycle
(``/root/reference/src/c3s_sm/reshuffle.py:135-280`` and ``:67-133``).

Design (Spark-first, scale-first):

- every tier is a :class:`~c3s_sm_spark.sources.tableio.SnapshotTable`
  hive-partitioned by ``pmonth`` (the window-start month). Month is the
  natural overwrite unit: daily/dekadal/monthly windows never cross a
  month boundary (3rd dekads end at month end,
  ``/root/reference/src/c3s_sm/download.py:326-333``), so recomputing the
  affected months and *dynamic-partition-overwriting* them is exact,
  idempotent, and hence crash-resumable by simply re-running — while
  keeping file counts ~30x lower than day-grain partitions;
- each tier refresh is **incremental**: it diffs its *source* table's
  snapshots against the high-water-mark snapshot recorded in the lineage
  table, derives the affected window set from only the delta files
  (file-level manifest diff — no scan), recomputes exactly those windows
  from the source tier, and overwrites them. The lineage row advances the
  HWM in the same logical step; if the process dies between tiers, the
  next run redoes only the unfinished tiers (reference analog: the
  ``000_overview.yml`` period record consumed by extend,
  ``/root/reference/src/c3s_sm/reshuffle.py:94-133``);
- dekadal aggregates the *daily* tier and monthly the *dekadal* tier
  (continuous-aggregate cascade): each step shuffles ~10x fewer rows than
  raw, which is what keeps the cascade cheap at 10^12 points;
- raw ingest salts its repartition on ``(cell, salt)`` so a hot source
  (70% "cc" in the synth fixture) cannot pin a single task; AQE handles
  residual skew at runtime;
- lineage + per-partition metrics are tables themselves (reference S9/A4:
  yml summaries + coverage scan, ``/root/reference/src/c3s_sm/misc.py``).
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from c3s_sm_spark.functions.codecs import pack_series, unpack_series
from c3s_sm_spark.operators.dedup import keep_latest
from c3s_sm_spark.operators.rollup import cascade, rollup
from c3s_sm_spark.sources.tableio import SnapshotTable

#: tier name -> source tier (None = raw points table)
TIERS: dict[str, str | None] = {
    "daily": None,
    "dekadal": "daily",
    "monthly": "dekadal",
}

_LINEAGE_COLS = (
    "run_id string, tier string, src_snapshot string, dst_snapshot string, "
    "n_months int, n_rows bigint, wall_s double, finished_at double, "
    "status string, note string"
)
#: tail-table shape (only ever used to build EMPTY frames — truncate and
#: overwrite-to-empty commits, which write no data files, so the string
#: doc_id here never conflicts with a long-keyed pipeline's tail files)
_TAIL_SCHEMA = "doc_id string, ts timestamp, v_mean double, pmonth string, kb int"
#: point reads decode blobs ON THE DRIVER below this blob count (one
#: blob = up to codecs.CHUNK points, so 512 blobs ~ 4.2M points — far
#: past any real single-key tier series); beyond it, or when the caller
#: forces it, the decode runs distributed via unpack_series
_LOCAL_DECODE_MAX_BLOBS = 512
_METRICS_COLS = (
    "run_id string, tier string, pmonth string, n_rows bigint, n_points bigint, "
    "ts_min timestamp, ts_max timestamp, written_at double"
)


class TierPipeline:
    """Resumable cascading rollup over snapshot tables under ``base_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        key: str = "doc_id",
        n_buckets: int = 32,
        n_salts: int = 8,
    ):
        # pmonth (the partition/recompute unit) is derived with
        # date_format(ts), which renders in the SESSION timezone: a
        # refresh run under a different tz than the ingest would compute
        # different affected months for edge-of-month rows and silently
        # skip them forever. The engine pins UTC (session.py); fail loud
        # on a foreign session instead of corrupting partitions.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise ValueError(
                f"TierPipeline requires an UTC session (pmonth derivation "
                f"is timezone-dependent); got spark.sql.session.timeZone="
                f"{tz!r} — build the session with c3s_sm_spark.session."
                f"get_spark or set the conf to 'UTC'"
            )
        self.spark = spark
        self.base = base_dir
        self.key = key
        self.n_buckets = n_buckets
        self.n_salts = n_salts
        self.raw = SnapshotTable(os.path.join(base_dir, "raw"), ["pmonth"])
        # tiers carry a second, key-hash partition level: pack_tier's
        # incremental repack reads "all rows of these key buckets", and
        # with kb in the path that member scan file-prunes to
        # touched_buckets/n_buckets of the tier instead of scanning all
        # of it (the month-only layout's documented 10^12-row weak spot).
        # The refresh overwrite unit stays the month (replace_grain=1).
        self.tiers = {
            t: SnapshotTable(os.path.join(base_dir, t), ["pmonth", "kb"])
            for t in TIERS
        }
        self.packed = {
            t: SnapshotTable(os.path.join(base_dir, f"{t}_packed"), ["bucket"])
            for t in TIERS
        }
        # LSM-style unpacked tail per packed tier (r4 verdict task 3):
        # incremental pack APPENDS delta rows here instead of re-encoding
        # whole hash buckets — a 10% key delta hash-spreads over every
        # bucket, so bucket-grain repack degenerated to a full repack's
        # cost. The tail is month-partitioned (refresh recomputes whole
        # months, so every delta month arrives complete and the tail
        # write is an idempotent month overwrite); kb stays a DATA column
        # for parquet row-group pushdown — the tail is bounded small by
        # the fold policy, so partition-level kb dirs would only bloat
        # file counts. Gorilla/Prometheus hot-block + sealed-block shape.
        self.tails = {
            t: SnapshotTable(os.path.join(base_dir, f"{t}_tail"), ["pmonth"])
            for t in TIERS
        }
        #: fold (full repack + tail truncate) once the tail holds more
        #: than this fraction of the packed table's bytes — unpacked
        #: parquet runs ~3x the packed size per row, so 0.5 means the
        #: tail folds at roughly 1/6 of the rows
        self.tail_fold_frac = 0.5
        self.lineage = SnapshotTable(os.path.join(base_dir, "lineage"))
        self.metrics = SnapshotTable(os.path.join(base_dir, "metrics"))
        # F6: stamp each tier table with the reference's per-product
        # global attributes as table properties (once; merge is idempotent)
        from c3s_sm_spark.functions.product_attrs import global_attrs

        for t, tbl in self.tiers.items():
            if "product_full_name" not in tbl.properties():
                tbl.set_properties(global_attrs(t, "TCDR"))

    def table_properties(self) -> DataFrame:
        """All tier tables' properties as one relation
        ``(tier, key, value)`` — the engine's relational surface for the
        reference's global attributes (F6): metadata joins/filters like
        any other table instead of living in opaque file headers."""
        rows = [
            (t, k, v)
            for t, tbl in self.tiers.items()
            for k, v in sorted(tbl.properties().items())
        ]
        return self.spark.createDataFrame(
            rows, "tier string, key string, value string"
        )

    # ---------------------------------------------------------------- ingest

    def ingest(self, points: DataFrame, summary: dict | None = None) -> str:
        """Append raw observation points.

        Expected columns: ``key, ts, v`` (+ optional ``flag``, ``version``,
        ``cell``). Adds the ``pmonth`` partition column and salts the
        write repartition on ``(pmonth, salt)`` so one hot month/source
        cannot serialize the write (north_rule skew requirement). Dedup is
        NOT done here — keep-latest runs at rollup read time so
        reprocessed rows appended later still win (reference
        ``sort_last``, ``/root/reference/src/c3s_sm/interface.py:347-356``).
        """
        # a null key would hash to kb=null (__HIVE_DEFAULT_PARTITION__)
        # and crash every later incremental pack; a null ts has no month.
        # raise_error costs no extra pass — it fires inside the write job.
        bad = F.col(self.key).isNull() | F.col("ts").isNull()
        pmonth = F.when(
            bad,
            F.raise_error(
                F.lit(
                    f"ingest: null {self.key}/ts rows are not allowed "
                    "(partition values would be undefined)"
                )
            ),
        ).otherwise(F.date_format("ts", "yyyy-MM"))
        df = points.withColumn("pmonth", pmonth)
        salt = F.pmod(F.xxhash64(self.key, F.lit(17)), F.lit(self.n_salts))
        df = df.repartition(F.col("pmonth"), salt)
        return self.raw.append(df, {"op": "ingest", **(summary or {})})

    # ----------------------------------------------------------------- state

    def _hwm(self, tier: str) -> str | None:
        """Source-table snapshot already folded into ``tier`` (lineage)."""
        try:
            lin = self.lineage.read(self.spark)
        except FileNotFoundError:
            return None
        row = (
            lin.where((F.col("tier") == tier) & (F.col("status") == "ok"))
            .orderBy(F.col("finished_at").desc())
            .select("src_snapshot")
            .head()
        )
        return row["src_snapshot"] if row else None

    def _retention_through(self, table_name: str) -> str | None:
        """Newest month dropped from ``table_name`` by retention (lineage
        ``status='retention'`` rows carry it in ``note``), or None."""
        try:
            lin = self.lineage.read(self.spark)
        except FileNotFoundError:
            return None
        if "note" not in lin.columns:
            return None
        row = (
            lin.where(
                (F.col("tier") == table_name)
                & (F.col("status") == "retention")
                & F.col("note").isNotNull()
            )
            .agg(F.max("note").alias("m"))
            .head()
        )
        return row["m"] if row else None

    def _source_table(self, tier: str) -> SnapshotTable:
        src = TIERS[tier]
        return self.raw if src is None else self.tiers[src]

    # --------------------------------------------------------------- refresh

    def _affected_months(self, tier: str, delta: DataFrame) -> list[str]:
        """Partition months touched by the source delta.

        No window arithmetic needed beyond month truncation: every tier's
        windows nest inside calendar months, so "months containing new
        source rows" is exactly the set of partitions to recompute.
        """
        rows = (
            delta.select(F.date_format("ts", "yyyy-MM").alias("m"))
            .distinct()
            .collect()
        )
        return sorted(r["m"] for r in rows)

    def _compute_tier(self, tier: str, months: list[str]) -> DataFrame:
        """Recompute every ``tier`` window inside the given months from
        the source tier (delta tells us *which* months; the recompute
        itself must see every source row in them). The ``pmonth``
        predicate is pure partition pruning — unaffected directories are
        never listed, let alone read."""
        src_tbl = self._source_table(tier)
        src = src_tbl.read(self.spark).where(F.col("pmonth").isin(months))
        if TIERS[tier] is None:
            # raw -> daily: keep-latest dedup then first-level rollup
            # 'ts' is constant within a (key, ts) group — ordering by it
            # made the survivor partition-dependent; the value column gives
            # a deterministic keep-largest tiebreak when no version exists
            order = ["version"] if "version" in src.columns else ["v"]
            src = keep_latest(src, [self.key, "ts"], order)
            out = rollup(
                src,
                [self.key],
                "ts",
                tier,
                value_col="v",
                flag_col="flag" if "flag" in src.columns else None,
            )
        else:
            out = cascade(src, [self.key], tier)
        out = out.withColumn(
            "pmonth", F.date_format("ts", "yyyy-MM")
        ).withColumn("kb", self._kb())
        # one shuffle keyed on the partition tuple so the partitionBy
        # write emits ~one file per (pmonth, kb) dir — without it every
        # write task opens a file per dir it touches (tasks x months x
        # buckets small files; measured 3.5x slower end-to-end and a
        # per-scan task-count tax forever after)
        return out.repartition(F.col("pmonth"), F.col("kb"))

    def _kb(self, col: str | Column | None = None) -> Column:
        """Key-bucket partition value: ``pmod(xxhash64(key), n_buckets)``.
        One definition shared by the tier writer, pack_tier, and the
        packed table's ``bucket`` column so bucket sets compose."""
        target = self.key if col is None else col
        return F.pmod(F.xxhash64(target), F.lit(self.n_buckets)).cast("int")

    def refresh(self, tiers: list[str] | None = None) -> dict[str, dict]:
        """Incrementally fold new source snapshots into each tier.

        Returns per-tier stats. Safe to re-run at any point: each tier is
        an idempotent partition overwrite + lineage append; a crashed run
        leaves the HWM untouched so the next run redoes the same windows.
        """
        run_id = uuid.uuid4().hex[:12]
        report: dict[str, dict] = {}
        for tier in tiers or list(TIERS):
            t0 = time.perf_counter()
            src_tbl = self._source_table(tier)
            src_head = src_tbl.head()
            hwm = self._hwm(tier)
            if src_head is None or src_head == hwm:
                report[tier] = {"months": 0, "rows": 0, "skipped": True}
                continue
            delta = src_tbl.read_incremental(self.spark, hwm, src_head)
            if delta is None:
                report[tier] = {"months": 0, "rows": 0, "skipped": True}
                continue
            months = self._affected_months(tier, delta)
            src_name = "raw" if TIERS[tier] is None else TIERS[tier]
            horizon = self._retention_through(src_name)
            if horizon is not None:
                aged = [m for m in months if m <= horizon]
                if aged:
                    # the source no longer holds these months in full —
                    # recomputing from the partial remainder would destroy
                    # the coarser history that justified the drop. Late
                    # rows older than the retention horizon are dropped by
                    # policy (the reference reprocesses such periods from
                    # the archive instead; here that is rollback + re-ingest).
                    months = [m for m in months if m > horizon]
                    report.setdefault(tier, {})["skipped_aged_months"] = aged
            if not months:
                report[tier] = {**report.get(tier, {}), "months": 0,
                                "rows": 0, "skipped": True}
                continue
            out = self._compute_tier(tier, months)
            # replace_grain=1: the recompute unit is the month — every
            # (pmonth, kb) file under a recomputed month is superseded,
            # including buckets the new month data happens not to touch
            dst_snap = self.tiers[tier].overwrite_partitions(
                out,
                {"run_id": run_id, "months": len(months)},
                replace_grain=1,
            )
            # per-partition metrics (A4 coverage analog) from what we wrote
            written = self.tiers[tier].read(self.spark).where(
                F.col("pmonth").isin(months)
            )
            mrows = written.groupBy("pmonth").agg(
                F.count("*").alias("n_rows"),
                F.sum("nobs").alias("n_points"),
                F.min("ts").alias("ts_min"),
                F.max("ts").alias("ts_max"),
            )
            n_rows = mrows.agg(F.sum("n_rows")).head()[0] or 0
            wall = time.perf_counter() - t0
            self.metrics.append(
                mrows.select(
                    F.lit(run_id).alias("run_id"),
                    F.lit(tier).alias("tier"),
                    "pmonth",
                    "n_rows",
                    "n_points",
                    "ts_min",
                    "ts_max",
                    F.lit(time.time()).alias("written_at"),
                )
            )
            self.lineage.append(
                self.spark.createDataFrame(
                    [
                        (
                            run_id,
                            tier,
                            src_head,
                            dst_snap,
                            len(months),
                            int(n_rows),
                            wall,
                            time.time(),
                            "ok",
                            None,
                        )
                    ],
                    _LINEAGE_COLS,
                )
            )
            # merge, don't replace: an earlier skipped_aged_months note
            # for this tier must survive alongside the refresh stats
            report[tier] = {
                **report.get(tier, {}),
                "months": len(months),
                "rows": int(n_rows),
                "wall_s": round(wall, 3),
            }
        return report

    # ---------------------------------------------------------------- packed

    def _table_bytes(self, tbl: SnapshotTable) -> int:
        """On-disk bytes of a table's current snapshot (manifest walk +
        stat; Iceberg manifests carry file sizes, this layer stats)."""
        return sum(
            os.path.getsize(os.path.join(tbl.root, f)) for f in tbl._files()
        )

    def _truncate_tail(self, tier: str, summary: dict | None = None) -> None:
        """Drop every tail row after a fold (the packed table is current
        again). Runs AFTER the packed commit: a crash in between leaves a
        harmless stale tail — point_read only consults tail months that
        the packed manifest still masks, and the next incremental pack's
        month overwrite replaces any month it re-touches."""
        tail = self.tails[tier]
        if tail.head() is None or not tail._files():
            return
        empty = self.spark.createDataFrame([], _TAIL_SCHEMA)
        # replace_values=[()] — the zero-length prefix matches EVERY
        # partition, so the commit drops all tail files; an empty df
        # alone would replace nothing (the dynamic replace set is
        # derived from written files, and there are none)
        tail.overwrite_partitions(
            empty,
            {"op": "fold_truncate", **(summary or {})},
            replace_values=[()],
        )

    def pack_tier(
        self, tier: str, incremental: bool = True, fold: bool | None = None
    ) -> str | None:
        """Materialize the packed-series form of a tier (delta-of-delta ts
        + Gorilla-XOR values, chunked), bucketed by key hash for pruned
        point reads.

        Incremental by default — LSM-shaped (r4 verdict task 3): the
        tier's snapshot delta since the last pack is APPENDED (as an
        idempotent month-partition overwrite) to the tier's unpacked
        ``tail`` table, and the packed table advances its recorded source
        snapshot with a data-free commit whose summary lists the
        ``masked_months`` — months whose packed blobs are superseded by
        tail rows. No re-encoding happens on the incremental path at all.
        Re-encoding is paid only at FOLD time (full repack + tail
        truncate), triggered when the tail outgrows
        ``tail_fold_frac`` of the packed bytes, on ``fold=True``, or on
        ``incremental=False`` — the amortized write shape of Gorilla /
        Prometheus (hot unpacked head, sealed compressed blocks).

        Why not repack touched hash buckets (the pre-r5 design): a
        realistic delta (new month for a spread of keys) hash-lands in
        ~every bucket, so bucket-grain repack re-encoded the whole table
        while wearing an "incremental" label — measured at full-repack
        cost for a 10% key delta. Month-masking works because refresh
        recomputes WHOLE months (``replace_grain=1``): every delta month
        arrives complete, so "packed minus masked months, plus tail" is
        exactly the tier. A retention drop (``delete_partitions``)
        degrades to a fold (months vanished below the mask's horizon); a
        rewrite-only window (compaction) advances the source snapshot
        with a data-free commit carrying the mask forward. Months named
        ONLY by removed files (a caller overwrite that drops keys with no
        replacement rows) still enter the mask — the dropped file's
        ``pmonth`` path segment names them at zero I/O (ADVICE r2).
        """
        tbl = self.tiers[tier]
        ptbl = self.packed[tier]
        head = tbl.head()
        if head is None or not tbl._files(head):
            # empty tier (never refreshed, or every month retained away):
            # nothing to pack — and tbl.read would raise
            return None
        # pack_series output always names the key column 'doc_id'
        bucket_of = self._kb("doc_id")
        prev_src = None
        prev_sum: dict = {}
        if incremental and ptbl.head() is not None:
            prev_sum = ptbl._manifest(ptbl.head())["summary"]
            prev_src = prev_sum.get("src_snapshot")
        snaps = tbl.snapshots()
        chain_ids = [m["snapshot_id"] for m in snaps]
        if prev_src is not None and prev_src in chain_ids and prev_src != head:
            window = snaps[chain_ids.index(prev_src) + 1 :]
            if any(m["operation"] == "delete_partitions" for m in window):
                prev_src = None  # rows vanished: month delta can't see it
        if prev_src is not None and prev_src in chain_ids and not fold:
            if prev_src == head:
                return ptbl.head()  # already current
            delta = tbl.read_incremental(self.spark, prev_src, head)
            months: set[str] = set()
            if delta is not None:
                months |= {
                    r["m"]
                    for r in delta.select(
                        F.col("pmonth").alias("m")
                    ).distinct().collect()
                }
            # months named only by removed files (keys superseded by an
            # overwrite, no replacement row): read the pmonth path
            # segment of each file an overwrite dropped vs its parent
            for i in range(chain_ids.index(prev_src) + 1, len(snaps)):
                m = snaps[i]
                if m["operation"] == "compact":
                    continue
                parent = set(snaps[i - 1]["files"]) if i > 0 else set()
                for f in parent - set(m["files"]):
                    pm = tbl._partition_of(f, ["pmonth"])[0]
                    if pm is not None:
                        months.add(pm)
            key_type = (
                tbl.read(self.spark).schema[self.key].dataType.simpleString()
            )
            if not months:
                # rewrite-only window (compact): data unchanged — record
                # the new source snapshot without touching any file; the
                # mask (and the tail rows it points at) carries forward
                empty = self.spark.createDataFrame(
                    [], self.packed_schema(key_type)
                )
                return ptbl.overwrite_partitions(
                    empty,
                    {
                        "tier": tier,
                        "src_snapshot": head,
                        "noop": True,
                        "masked_months": prev_sum.get("masked_months", []),
                    },
                )
            masked = sorted(set(prev_sum.get("masked_months", [])) | months)
            if fold is None:
                # pre-append tail size: the threshold crossing lags one
                # pack call, which only delays the fold by one delta
                fold = self._table_bytes(
                    self.tails[tier]
                ) > self.tail_fold_frac * max(self._table_bytes(ptbl), 1)
            if not fold:
                if delta is not None:
                    tail_df = delta.select(
                        F.col(self.key).cast(key_type).alias("doc_id"),
                        "ts",
                        "v_mean",
                        "pmonth",
                        F.col("kb").cast("int"),
                    ).repartition(F.col("pmonth"))
                else:
                    tail_df = self.spark.createDataFrame([], _TAIL_SCHEMA)
                # month-grain overwrite, replace_values covering months
                # with NO delta rows (overwrite-to-empty): their old tail
                # rows are superseded even though nothing replaces them
                self.tails[tier].overwrite_partitions(
                    tail_df,
                    {"op": "tail_append", "src_snapshot": head},
                    replace_values=[(m,) for m in sorted(months)],
                )
                empty = self.spark.createDataFrame(
                    [], self.packed_schema(key_type)
                )
                return ptbl.overwrite_partitions(
                    empty,
                    {
                        "tier": tier,
                        "src_snapshot": head,
                        "mode": "tail_append",
                        "masked_months": masked,
                        "delta_months": len(months),
                    },
                )
        df = tbl.read(self.spark)
        # one shuffle keyed on bucket before the partitioned write:
        # without it every pack task spills a sliver into every bucket
        # dir (tasks x buckets tiny files — measured 1264 files for 2k
        # packed rows, costing ~3 s of driver file listing PER point
        # read). One file per bucket per commit is the layout the
        # bucket-pruned read wants; packed blobs are compact, so this
        # shuffle moves little data.
        packed = (
            pack_series(df, key=self.key, ts_col="ts", val_col="v_mean")
            .withColumn("bucket", bucket_of)
            .repartition("bucket")
        )
        # replace_grain=0: a FULL repack supersedes every existing packed
        # partition, including buckets the new pack writes no rows for.
        # No masked_months in the summary: the fresh pack IS the tier.
        snap = ptbl.overwrite_partitions(
            packed,
            {"tier": tier, "src_snapshot": head, "mode": "full"},
            replace_grain=0,
        )
        # after the packed commit (crash ordering: see _truncate_tail)
        self._truncate_tail(tier, {"folded_into": snap})
        return snap

    @staticmethod
    def packed_schema(key_type: str = "string") -> str:
        from c3s_sm_spark.functions.codecs import packed_schema_for

        return packed_schema_for(key_type) + ", bucket int"

    # ----------------------------------------------------------------- reads

    def read_tier(self, tier: str) -> DataFrame:
        # kb is physical layout (key-hash partition level), not schema
        return self.tiers[tier].read(self.spark).drop("kb")

    def _read_packed_local(
        self, packed: DataFrame, tier: str, key_value, masked: list[str]
    ):
        """Collect pruned packed blobs AND the key's masked-month tail
        rows in ONE Spark job (tagged union with per-branch limits),
        decode + mask + merge on the DRIVER with the same numpy codecs;
        returns a pandas frame, or None past either cap (the
        ``limit(cap+1)`` probes bound the collect itself, so a
        pathological key cannot flood the driver — the caller then
        degrades to the distributed decode). A point read's blob set is
        bounded by construction (one key, bucket- and sidecar-pruned)
        and its tail rows likewise (one key, masked months only); the
        distributed path pays a ~200 ms fixed Python-worker + Arrow
        round trip per read (r4 bench: 337 ms packed vs 129 ms unpacked
        — nearly all fixed cost), and a separate tail collect would pay
        a second job's scheduling on every between-fold read.
        """
        import pandas as pd

        from c3s_sm_spark.functions.codecs import decode_ts, decode_vals

        tail_cap = _LOCAL_DECODE_MAX_BLOBS * 1024  # ~ same point budget
        sel = packed.select(
            "doc_id",
            "ts_blob",
            "v_blob",
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("double").alias("v_mean"),
        ).limit(_LOCAL_DECODE_MAX_BLOBS + 1)
        if masked:
            t = self._tail_rows(tier, key_value, masked)
            if t is not None:
                sel = sel.unionByName(
                    t.select(
                        "doc_id",
                        F.lit(None).cast("binary").alias("ts_blob"),
                        F.lit(None).cast("binary").alias("v_blob"),
                        "ts",
                        "v_mean",
                    ).limit(tail_cap + 1)
                )
        rows = sel.collect()
        blobs = [r for r in rows if r["ts_blob"] is not None]
        tails = [r for r in rows if r["ts_blob"] is None]
        if len(blobs) > _LOCAL_DECODE_MAX_BLOBS or len(tails) > tail_cap:
            return None
        frames = [
            pd.DataFrame(
                {
                    "doc_id": r["doc_id"],
                    "ts": decode_ts(bytes(r["ts_blob"])).view(
                        "datetime64[us]"
                    ),
                    "v_mean": decode_vals(bytes(r["v_blob"])),
                }
            )
            for r in blobs
        ]
        pdf = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=object),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "v_mean": pd.Series([], dtype=np.float64),
                }
            )
        )
        if masked:
            pdf = pdf[~pdf["ts"].dt.strftime("%Y-%m").isin(masked)]
            if tails:
                tail_pdf = pd.DataFrame(
                    {
                        "doc_id": [r["doc_id"] for r in tails],
                        "ts": pd.to_datetime(
                            [r["ts"] for r in tails]
                        ).astype("datetime64[us]"),
                        # _tail_rows already coalesced NULL -> NaN
                        "v_mean": np.array(
                            [r["v_mean"] for r in tails], dtype=np.float64
                        ),
                    }
                )
                pdf = pd.concat([pdf, tail_pdf], ignore_index=True)
        return pdf

    def _tail_rows(
        self, tier: str, key_value, masked: list[str]
    ) -> DataFrame | None:
        """The tail rows for one key within the masked months, pruned to
        the month partitions and (via parquet row-group stats on the kb
        data column) the key's hash bucket. None when the tail is empty.
        The ``pmonth`` IN-list matters beyond pruning: a crash between a
        fold's packed commit and its tail truncate leaves stale tail rows
        for UNMASKED months, which this filter keeps invisible."""
        tail = self.tails[tier]
        if tail.head() is None or not tail._files():
            return None
        tdf = tail.read(self.spark)
        key_lit = F.lit(key_value).cast(tdf.schema["doc_id"].dataType)
        return tdf.where(
            F.col("pmonth").isin(masked)
            & (F.col("kb") == self._kb(key_lit))
            & (F.col("doc_id") == key_value)
        ).select(
            "doc_id",
            "ts",
            # packed blobs store an all-null window as NaN (pandas
            # float64 coercion); the tail must agree
            F.coalesce(F.col("v_mean"), F.lit(float("nan"))).alias("v_mean"),
        )

    def point_read(
        self,
        key_value: str,
        tier: str = "daily",
        start: str | None = None,
        end: str | None = None,
        local_decode: bool | None = None,
    ) -> DataFrame:
        """S5 point time-series query: one key's series, time-ordered,
        optionally restricted to ``[start, end]``.

        Served from the packed table when materialized: bucket-pruned
        scan, then the ``(ts_min, ts_max)`` sidecar columns drop whole
        blobs BEFORE any decode (SURVEY.md §4 — min/max pruning instead
        of a custom Catalyst rule for packed columns), then the exact
        ``ts`` predicate trims the decoded edge chunks; months superseded
        since the last fold are masked out of the decode and served from
        the unpacked tail instead (see :meth:`pack_tier`). The decode
        itself runs on the driver for normal-sized series
        (``local_decode`` auto; see :meth:`_decode_packed`) — pass
        ``False`` to force the distributed ``unpack_series`` path. Falls
        back to the tier rows when no packed table exists.
        """
        try:
            ptbl = self.packed[tier]
            head = ptbl.head()
            if head is None:
                raise FileNotFoundError(ptbl.root)
            # staleness guard: the packed form is a materialization of a
            # specific tier snapshot; after later ingest+refresh the tier
            # moves on and the packed table would silently serve OLD data
            # — fall back to the (always-current) tier rows until the
            # next pack_tier()
            psum = ptbl._manifest(head)["summary"]
            if psum.get("src_snapshot") != self.tiers[tier].head():
                raise FileNotFoundError("packed table is stale")
            masked = list(psum.get("masked_months", []))
            packed = ptbl.read(self.spark)
            # cast the literal to the stored key dtype BEFORE hashing:
            # xxhash64 hashes int and long differently, so an int32-sized
            # Python literal against a LongType column would name the
            # wrong bucket and silently return zero rows
            doc_lit = F.lit(key_value).cast(packed.schema["doc_id"].dataType)
            packed = packed.where(
                (F.col("bucket") == self._kb(doc_lit))
                & (F.col("doc_id") == key_value)
            )
            if start is not None:
                packed = packed.where(F.col("ts_max") >= F.lit(start))
            if end is not None:
                packed = packed.where(F.col("ts_min") <= F.lit(end))
            key_type = packed.schema["doc_id"].dataType.simpleString()
            out_schema = f"doc_id {key_type}, ts timestamp, v_mean double"
            out = None
            if local_decode is not False:
                # driver-side assembly: one Spark job collects blobs +
                # tail rows, then decode + mask + merge happen in
                # pandas, ONE createDataFrame — the distributed variant
                # pays a Spark job for the union and another for the
                # masked filter on every read
                pdf = self._read_packed_local(packed, tier, key_value, masked)
                if pdf is not None:
                    if len(pdf):
                        out = self.spark.createDataFrame(
                            pdf, schema=out_schema
                        )
                    else:
                        out = self.spark.createDataFrame([], out_schema)
            if out is None:
                # distributed decode (caller-forced, or past the local
                # caps): same semantics, Spark-side mask + tail union
                out = unpack_series(packed)
                if masked:
                    out = out.where(
                        ~F.date_format("ts", "yyyy-MM").isin(masked)
                    )
                    tail_out = self._tail_rows(tier, key_value, masked)
                    if tail_out is not None:
                        out = out.unionByName(tail_out)
        except FileNotFoundError:
            # kb partition predicate: the fallback point read file-prunes
            # to the key's bucket (1/n_buckets of the tier) before the
            # exact key filter touches a row
            tdf = self.tiers[tier].read(self.spark)
            # same dtype-before-hash rule as the packed branch above
            key_lit = F.lit(key_value).cast(tdf.schema[self.key].dataType)
            out = (
                tdf.where(
                    (F.col("kb") == self._kb(key_lit))
                    & (F.col(self.key) == key_value)
                )
                # SAME schema as the packed branch (unpack_series emits
                # (doc_id, ts, v_mean)): the caller must not see a
                # different shape depending on packed-table freshness.
                # NULL v_mean (a window whose values were all null)
                # becomes NaN too — pandas float64 coercion stores NaN in
                # the packed form, so the fallback must agree
                .select(
                    F.col(self.key).alias("doc_id"),
                    "ts",
                    F.coalesce(F.col("v_mean"), F.lit(float("nan"))).alias(
                        "v_mean"
                    ),
                )
            )
        if start is not None:
            out = out.where(F.col("ts") >= F.lit(start))
        if end is not None:
            out = out.where(F.col("ts") <= F.lit(end))
        return out.orderBy("ts")

    # ------------------------------------------------------------- retention

    #: which tier must already cover a month before it may be dropped from
    #: the finer one (raw ages out once daily is rolled up, etc.)
    _COARSER = {"raw": "daily", "daily": "dekadal", "dekadal": "monthly", "monthly": None}

    def retention(
        self, policy: dict[str, int], as_of: str | None = None
    ) -> dict[str, dict]:
        """Cascading retention: age out month partitions per tier.

        ``policy`` maps tier name (``raw``/``daily``/``dekadal``/
        ``monthly``) to the number of trailing months to keep. A month is
        dropped from a tier only when (a) it is older than the tier's
        horizon measured back from ``as_of`` (default: the newest month
        present in the raw table) AND (b) the next-coarser tier already
        has data for that month — the downsampled history must exist
        before the fine-grained rows age out (TimescaleDB
        drop_chunks-with-continuous-aggregate semantics; the reference
        keeps all three C3S product frequencies side by side for the same
        reason). The drop itself is a metadata-only
        :meth:`~c3s_sm_spark.sources.tableio.SnapshotTable.delete_partitions`
        commit — no data rewrite, no scan, time travel intact until
        ``expire_snapshots`` — and each drop appends a ``status=
        'retention'`` lineage row (the HWM query filters ``status='ok'``,
        so retention never perturbs incremental refresh).
        """
        run_id = uuid.uuid4().hex[:12]
        tables = {"raw": self.raw, **self.tiers}

        def _months(tbl: SnapshotTable) -> set[str]:
            return {
                tbl._partition_of(f, ["pmonth"])[0] for f in tbl._files()
            }

        if as_of is None:
            raw_months = _months(self.raw)
            if not raw_months:
                return {}
            as_of = max(raw_months)
        year, month = int(as_of[:4]), int(as_of[5:7])
        report: dict[str, dict] = {}
        for tier, keep in policy.items():
            tbl = tables[tier]
            # keep exactly `keep` trailing months: as_of back to horizon incl.
            m_total = (year * 12 + month - 1) - (int(keep) - 1)
            horizon = f"{m_total // 12:04d}-{m_total % 12 + 1:02d}"
            old = sorted(m for m in _months(tbl) if m < horizon)
            cov = self._COARSER[tier]
            if cov is not None:
                covered = _months(self.tiers[cov])
                old = [m for m in old if m in covered]
            if not old:
                report[tier] = {"dropped_months": 0}
                continue
            pre_drop = tbl.head()  # BEFORE the commit: the snapshot to
            # time-travel to when auditing what this run removed
            snap = tbl.delete_partitions(
                [(m,) for m in old], {"op": "retention", "run_id": run_id}
            )
            if tier in self.tiers:
                # tombstone metrics rows: without them coverage()'s
                # latest-row-per-(tier, pmonth) would keep reporting the
                # dropped months' last refresh stats forever
                self.metrics.append(
                    self.spark.createDataFrame(
                        [
                            (run_id, tier, m, 0, 0, None, None, time.time())
                            for m in old
                        ],
                        _METRICS_COLS,
                    )
                )
            self.lineage.append(
                self.spark.createDataFrame(
                    [
                        (
                            run_id,
                            tier,
                            pre_drop,
                            snap,
                            len(old),
                            0,
                            0.0,
                            time.time(),
                            "retention",
                            old[-1],  # note: horizon month dropped through
                        )
                    ],
                    _LINEAGE_COLS,
                )
            )
            report[tier] = {
                "dropped_months": len(old),
                "through": old[-1],
                "snapshot": snap,
            }
        return report

    #: who consumes each table's incremental snapshot stream
    _CONSUMER = {"raw": "daily", "daily": "dekadal", "dekadal": "monthly"}

    def maintain(
        self, target_rows_per_file: int = 4_000_000, keep_snapshots: int = 3
    ) -> dict[str, dict]:
        """Table maintenance across all pipeline tables: small-file
        compaction (incremental refreshes leave one file set per run)
        then snapshot expiry + orphan-file removal. The storage-side half
        of resumability: snapshots accumulate per refresh, and without
        expiry a 10^12-point table's manifest chain would grow
        unboundedly.

        Expiry PROTECTS every downstream high-water mark: the consuming
        tier's lineage HWM and the packed table's recorded source
        snapshot. Expiring below a HWM doesn't corrupt anything, but it
        silently degrades the consumer's next run from incremental to a
        full rebuild — and a raw full-rebuild can resurrect months that
        retention already dropped from the tier (raw may still hold
        them). read_incremental's contract says callers must not expire
        below consumers' HWMs; maintain is that caller.

        The unpartitioned bookkeeping tables (lineage, metrics) and the
        packed tiers are maintained too — lineage/metrics append one
        single-file snapshot per refresh, and their manifest-driven read
        unions one scan branch per append, so an unmaintained pipeline's
        _hwm() plan would grow O(#runs) for its lifetime.
        """
        report: dict[str, dict] = {}
        for name, tbl in {"raw": self.raw, **self.tiers}.items():
            protect = []
            consumer = self._CONSUMER.get(name)
            if consumer is not None:
                hwm = self._hwm(consumer)
                if hwm is not None:
                    protect.append(hwm)
            if name in self.packed and self.packed[name].head() is not None:
                src = self.packed[name]._manifest(self.packed[name].head())[
                    "summary"
                ].get("src_snapshot")
                if src is not None:
                    protect.append(src)
            compacted = tbl.compact(self.spark, target_rows_per_file)
            expired = tbl.expire_snapshots(
                keep_last=keep_snapshots, protect=protect
            )
            report[name] = {"compacted": bool(compacted), **expired}
        bookkeeping = {
            "lineage": self.lineage,
            "metrics": self.metrics,
            **{f"{t}_packed": p for t, p in self.packed.items()},
            **{f"{t}_tail": p for t, p in self.tails.items()},
        }
        for name, tbl in bookkeeping.items():
            if tbl.head() is None:
                continue
            compacted = tbl.compact(self.spark, target_rows_per_file)
            expired = tbl.expire_snapshots(keep_last=keep_snapshots)
            report[name] = {"compacted": bool(compacted), **expired}
        return report

    def coverage(self) -> DataFrame:
        """A4/A5 analog: per-tier coverage from the metrics table — no
        data scan (manifest/metrics only, like Iceberg table stats).

        Each refresh appends one metrics row per recomputed month that
        describes the whole overwritten partition, so only the NEWEST row
        per (tier, pmonth) is current — summing across runs would inflate
        counts for every re-refreshed month."""
        from pyspark.sql import Window

        met = self.metrics.read(self.spark)
        if "written_at" not in met.columns:  # pre-upgrade tables
            met = met.withColumn("written_at", F.lit(None).cast("double"))
        w = Window.partitionBy("tier", "pmonth").orderBy(
            F.col("written_at").desc_nulls_last(), F.col("run_id").desc()
        )
        latest = met.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") == 1
        )
        return latest.groupBy("tier").agg(
            F.min("ts_min").alias("period_from"),
            F.max("ts_max").alias("period_to"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_points").alias("n_points"),
        )
