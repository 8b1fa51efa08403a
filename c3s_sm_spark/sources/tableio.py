"""Snapshot-versioned Parquet table layer (Iceberg-fallback TableIO).

SURVEY.md §7 plans Iceberg for the tier tables; this sandbox has no Iceberg
runtime jar and no network, so this module provides the same *semantics*
behind a thin interface that an Iceberg catalog can replace verbatim:

- **atomic commits**: every write produces an immutable snapshot manifest
  (JSON list of data files); the table HEAD advances by an atomic
  ``os.replace`` — readers never see a half-written table. The reference's
  analog is the all-or-nothing netCDF cell-file append plus the
  ``000_overview.yml`` lineage record written after success
  (``/root/reference/src/c3s_sm/misc.py:163-250``).
- **append / dynamic partition overwrite**: ``append(df)`` adds files;
  ``overwrite_partitions(df)`` replaces exactly the partitions present in
  ``df`` (Iceberg ``overwritePartitions``), which makes window recompute
  idempotent — the engine's crash-resume story.
- **snapshot reads & incremental scans**: ``read(spark, snapshot_id=...)``
  time-travels; ``read_incremental(spark, since, until)`` reads only files
  added in ``(since, until]`` — the Iceberg ``start-snapshot-id`` pattern
  the incremental tier refresh uses (reference extend_ts,
  ``/root/reference/src/c3s_sm/reshuffle.py:67-133``).

Layout::

    <root>/data/s<snapshot>/<partition dirs>/*.parquet   (immutable)
    <root>/_manifests/snap-<id>.json                     (immutable)
    <root>/_manifests/HEAD                               (atomic pointer)

Scale notes: manifests list files, not rows, so commit cost is O(files);
partition values are encoded in directory names (hive-style via
``partitionBy``) so partition pruning works through Spark's file index, and
``basePath`` keeps partition columns when reading an explicit file subset.
On a real deployment swap this class for Iceberg — the pipeline only calls
the five methods above.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

#: sentinel: "caller did not capture a base snapshot" (None is a real
#: parent value — the first commit's)
_UNCHECKED = object()

#: _read_cache entries kept per table (plans are cheap but not free, and
#: entries for expired snapshots would otherwise accumulate forever)
_READ_CACHE_MAX = 32


class CommitConflictError(RuntimeError):
    """Another writer advanced HEAD between a mutator's base-state read
    and its commit — the optimistic-concurrency failure Iceberg surfaces
    as CommitFailedException. The losing writer must recompute from the
    new HEAD and retry (``append`` does so itself)."""


class SnapshotTable:
    """A partitioned Parquet table with atomic snapshot commits."""

    def __init__(self, root: str, partition_by: list[str] | None = None):
        self.root = root
        # snapshot-id -> DataFrame memo for read(): snapshots are
        # immutable, so the planned scan over a snapshot's file list can
        # be reused verbatim. The explicit-file-list read costs a
        # driver-side per-path listing (~2-3 ms/file — measured 3 s to
        # construct a 1264-file scan), which a repeated point-read loop
        # would otherwise pay on every call. This is the moral twin of
        # Iceberg caching manifests for a snapshot.
        self._read_cache: dict[tuple[int, str], DataFrame] = {}
        self.data_dir = os.path.join(root, "data")
        self.man_dir = os.path.join(root, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.man_dir, exist_ok=True)
        props_path = os.path.join(self.man_dir, "table.json")
        if os.path.exists(props_path):
            with open(props_path) as f:
                self.props = json.load(f)
            if partition_by is not None and partition_by != self.props["partition_by"]:
                raise ValueError(
                    f"table at {root} is partitioned by "
                    f"{self.props['partition_by']}, not {partition_by}"
                )
        else:
            self.props = {"partition_by": partition_by or []}
            tmp = props_path + f".tmp{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(self.props, f)
            os.replace(tmp, props_path)

    # ------------------------------------------------------------- snapshots

    @property
    def partition_by(self) -> list[str]:
        return self.props["partition_by"]

    # ------------------------------------------------------- table properties

    def _write_props(self) -> None:
        path = os.path.join(self.man_dir, "table.json")
        tmp = path + f".tmp{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(self.props, f)
        os.replace(tmp, path)

    def set_properties(self, properties: dict[str, str]) -> None:
        """Merge string table properties (Iceberg ``ALTER TABLE ... SET
        TBLPROPERTIES`` analog) into the table metadata atomically. The
        engine uses this for the reference's per-product global
        attributes (product name / temporal sampling / cdr / version,
        ``/root/reference/src/c3s_sm/metadata.py:163-177``) — metadata
        that belongs to the TABLE, not to any row."""
        merged = {**self.props.get("properties", {})}
        merged.update({str(k): str(v) for k, v in properties.items()})
        self.props["properties"] = merged
        self._write_props()

    def properties(self) -> dict[str, str]:
        """Current table properties (empty dict when never set)."""
        return dict(self.props.get("properties", {}))

    def head(self) -> str | None:
        """Current snapshot id, or None for an empty table."""
        try:
            with open(os.path.join(self.man_dir, "HEAD")) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _manifest(self, snapshot_id: str) -> dict:
        with open(os.path.join(self.man_dir, f"snap-{snapshot_id}.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All snapshots, oldest first (parent-chain walk from HEAD)."""
        out: list[dict] = []
        sid = self.head()
        while sid:
            m = self._manifest(sid)
            out.append(m)
            sid = m["parent"]
        out.reverse()
        return out

    def _files(self, snapshot_id: str | None = None) -> list[str]:
        sid = snapshot_id or self.head()
        return self._manifest(sid)["files"] if sid else []

    def _lock(self):
        """Acquire the table's commit lock (O_CREAT|O_EXCL lockfile).
        Returns the lock path; stale locks (holder died) are broken
        after 60 s."""
        path = os.path.join(self.man_dir, "COMMIT.lock")
        deadline = time.time() + 60
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return path
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(path) > 60:
                        os.remove(path)  # stale: holder died mid-commit
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"commit lock busy: {path}")
                time.sleep(0.05)

    def _commit(
        self,
        files: list[str],
        operation: str,
        summary: dict,
        expected_parent: object = _UNCHECKED,
    ) -> str:
        """Atomic commit with optimistic concurrency: when the caller
        passes the HEAD it computed ``files`` against, a concurrent
        commit in between raises :class:`CommitConflictError` instead of
        silently orphaning the other writer's snapshot (the last-writer-
        wins hazard Iceberg closes with CAS on the metadata pointer).
        Every public mutator passes its base; ``append`` retries."""
        lock = self._lock()
        try:
            parent = self.head()
            if expected_parent is not _UNCHECKED and parent != expected_parent:
                raise CommitConflictError(
                    f"{self.root}: HEAD moved {expected_parent!r} -> "
                    f"{parent!r} during commit"
                )
            sid = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
            manifest = {
                "snapshot_id": sid,
                "parent": parent,
                "operation": operation,
                "committed_at": time.time(),
                "files": sorted(files),
                "summary": summary,
            }
            man_path = os.path.join(self.man_dir, f"snap-{sid}.json")
            tmp = man_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, man_path)
            head_tmp = os.path.join(self.man_dir, f"HEAD.tmp{uuid.uuid4().hex}")
            with open(head_tmp, "w") as f:
                f.write(sid)
            os.replace(head_tmp, os.path.join(self.man_dir, "HEAD"))
            return sid
        finally:
            try:
                os.remove(lock)
            except FileNotFoundError:
                pass

    # ---------------------------------------------------------------- writes

    def _write_files(self, df: DataFrame) -> tuple[str, list[str]]:
        """Write ``df`` into an immutable per-snapshot subtree; return
        (subtree, data files relative to the table root)."""
        sub = f"s{int(time.time() * 1000):013d}{uuid.uuid4().hex[:6]}"
        out_dir = os.path.join(self.data_dir, sub)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(out_dir)
        files = []
        for dirpath, _dirs, fnames in os.walk(out_dir):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    files.append(
                        os.path.relpath(os.path.join(dirpath, fn), self.root)
                    )
        return sub, files

    def append(self, df: DataFrame, summary: dict | None = None) -> str:
        """Atomically add ``df``'s rows; returns the new snapshot id.
        Retries on commit conflict — an append composes with ANY
        concurrent commit by recomputing its base file list (the data
        files are already written and stay valid)."""
        _sub, new_files = self._write_files(df)
        for _attempt in range(5):
            base = self.head()
            try:
                return self._commit(
                    self._files(base) + new_files,
                    "append",
                    summary or {},
                    expected_parent=base,
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(f"{self.root}: append lost 5 races")

    @staticmethod
    def _partition_of(relpath: str, partition_by: list[str]) -> tuple:
        """Hive partition tuple of a data file path (k=v dir segments)."""
        vals = dict(
            seg.split("=", 1) for seg in relpath.split(os.sep) if "=" in seg
        )
        return tuple(vals.get(k) for k in partition_by)

    def overwrite_partitions(
        self,
        df: DataFrame,
        summary: dict | None = None,
        replace_grain: int | None = None,
        replace_values: list[tuple] | None = None,
    ) -> str:
        """Replace exactly the partitions present in ``df`` (dynamic
        partition overwrite). Idempotent: re-running the same write yields
        the same table state — the engine's resume primitive.

        ``replace_grain`` replaces at a COARSER unit: the first
        ``replace_grain`` partition columns define the replace set, and
        every existing file under a touched coarse partition is dropped
        even when the new data has no rows for its sub-partition. A table
        hive-partitioned ``(pmonth, kb)`` whose recompute unit is the
        month needs ``replace_grain=1`` — plain dynamic overwrite would
        leave a stale ``(pmonth, kb)`` file behind whenever a recomputed
        month no longer has rows for that key bucket (Iceberg's static
        ``REPLACE WHERE`` on the month predicate vs dynamic mode).

        ``replace_values`` adds an EXPLICIT static replace set (partition
        value tuples, prefix-matched like :meth:`delete_partitions`):
        those partitions are dropped even when ``df`` writes no rows
        into them — the "this partition is now empty" half of a static
        overwrite that dynamic mode cannot express.
        """
        if not self.partition_by:
            base = self.head()
            _sub, new_files = self._write_files(df)
            return self._commit(
                new_files, "overwrite", summary or {}, expected_parent=base
            )
        base = self.head()
        g = len(self.partition_by) if replace_grain is None else replace_grain
        _sub, new_files = self._write_files(df)
        replaced = {
            self._partition_of(f, self.partition_by)[:g] for f in new_files
        }
        if replace_values is not None:
            replaced |= {tuple(str(x) for x in v) for v in replace_values}
        lens = {len(v) for v in replaced}
        kept = [
            f
            for f in self._files(base)
            if not any(
                self._partition_of(f, self.partition_by)[:n] in replaced
                for n in lens
            )
        ]
        return self._commit(
            kept + new_files,
            "overwrite_partitions",
            {**(summary or {}), "replaced_partitions": len(replaced)},
            expected_parent=base,
        )

    # ----------------------------------------------------------------- reads

    def _read_files(self, spark: SparkSession, files: list[str]) -> DataFrame:
        """Read an explicit file list, preserving hive partition columns.

        Files live under per-snapshot subtrees (``data/s<id>/k=v/...``), so
        each subtree is read with its own ``basePath`` (partition columns
        survive) and the reads are unioned — a manifest-driven scan, the
        moral equivalent of Iceberg planning file groups per snapshot.
        """
        by_sub: dict[str, list[str]] = {}
        for f in files:
            rel = os.path.relpath(f, "data")
            sub = rel.split(os.sep, 1)[0]
            by_sub.setdefault(sub, []).append(os.path.join(self.root, f))
        dfs = [
            spark.read.option(
                "basePath", os.path.join(self.data_dir, sub)
            ).parquet(*paths)
            for sub, paths in sorted(by_sub.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def read(
        self, spark: SparkSession, snapshot_id: str | None = None
    ) -> DataFrame:
        """Scan the table at HEAD or a past snapshot (time travel)."""
        sid = snapshot_id or self.head()
        if sid is not None:
            memo = self._read_cache.get((id(spark), sid))
            if memo is not None:
                return memo
        files = self._files(snapshot_id)
        if not files:
            raise FileNotFoundError(f"table {self.root} is empty")
        df = self._read_files(spark, files)
        if sid is not None:
            # bounded FIFO: entries for superseded/expired snapshots must
            # not accumulate for the driver's lifetime
            while len(self._read_cache) >= _READ_CACHE_MAX:
                self._read_cache.pop(next(iter(self._read_cache)))
            self._read_cache[(id(spark), sid)] = df
        return df

    def read_incremental(
        self,
        spark: SparkSession,
        since: str | None,
        until: str | None = None,
    ) -> DataFrame | None:
        """Rows added by DATA-CHANGING snapshots in ``(since, until]``;
        None if empty.

        Walks the manifest chain and collects each snapshot's file delta
        vs its parent, skipping ``compact`` commits — a compaction
        rewrites existing rows into new files, and a naive two-manifest
        file diff would misread the entire rewritten table as fresh rows
        (degrading every post-maintenance refresh to a full rebuild).
        Same contract as Iceberg's incremental APPEND scan, which also
        excludes replace/rewrite snapshots. No data scan.

        Removals are attributed to the OPERATION that made them: a file a
        ``compact`` dropped from the manifest still holds live rows (the
        rewrite preserved them) and stays in the delta — its bytes remain
        on disk until :meth:`expire_snapshots`, which can only reclaim
        them after every manifest referencing them (including ``since``'s
        whole retained suffix) has been expired, and an expired ``since``
        already degrades to the full-read fallback below. Only
        ``delete_partitions`` / ``overwrite`` / ``overwrite_partitions``
        removals mean the rows themselves are gone or superseded: those
        drop every delta file in the affected partitions (the removal
        grain of both operations). The end-state ``files(until)`` filter
        this replaces silently LOST rows appended after ``since`` and
        compacted before ``until`` — the appends' files failed the
        end-state check while their compacted replacements were skipped.

        If ``since`` has been expired (manifest gone), degrades to the
        FULL ``until`` file set: with idempotent partition overwrite
        downstream this is correct, just not incremental — callers that
        must stay incremental should expire snapshots no older than their
        consumers' high-water marks.
        """
        until = until or self.head()
        if until is None:
            return None
        chain = self.snapshots()
        ids = [m["snapshot_id"] for m in chain]
        if since is not None and since not in ids:
            # since expired: full rebuild fallback (None when the current
            # file set is itself empty — e.g. every month retained away)
            files = self._files(until)
            return self._read_files(spark, files) if files else None
        lo = ids.index(since) + 1 if since is not None else 0
        hi = ids.index(until) + 1
        delta: list[str] = []
        seen: set[str] = set()
        for i in range(lo, hi):
            m = chain[i]
            if m["operation"] == "compact":
                continue  # rewrite-only: no logical row change
            parent_files = set(chain[i - 1]["files"]) if i > 0 else set()
            removed = parent_files - set(m["files"])
            if removed:
                # delete/overwrite removal: rows in the affected
                # partitions are gone/superseded — drop them from the
                # delta BEFORE adding this snapshot's own files
                if self.partition_by:
                    gone = {
                        self._partition_of(f, self.partition_by)
                        for f in removed
                    }
                    delta = [
                        f
                        for f in delta
                        if self._partition_of(f, self.partition_by)
                        not in gone
                    ]
                else:
                    delta = []  # unpartitioned full overwrite
                seen = set(delta)
            for f in m["files"]:
                if f not in parent_files and f not in seen:
                    seen.add(f)
                    delta.append(f)
        if not delta:
            return None
        return self._read_files(spark, delta)

    def delete_partitions(
        self, values: list[tuple], summary: dict | None = None
    ) -> str | None:
        """Metadata-only partition drop (Iceberg ``DELETE WHERE`` on a
        partition predicate): commit a manifest without the dropped
        partitions' files. No data is rewritten or removed from disk —
        time travel to earlier snapshots still sees the rows until
        :meth:`expire_snapshots` reclaims them. Returns the new snapshot
        id, or None when nothing matched.
        """
        if not self.partition_by:
            raise ValueError("delete_partitions needs a partitioned table")
        # prefix match: a tuple shorter than partition_by drops every
        # sub-partition under it (month drop on a (pmonth, kb) table)
        drop = {tuple(str(x) for x in v) for v in values}
        lens = {len(v) for v in drop}
        base = self.head()
        cur = self._files(base)
        kept = [
            f
            for f in cur
            if not any(
                self._partition_of(f, self.partition_by)[:n] in drop
                for n in lens
            )
        ]
        if len(kept) == len(cur):
            return None
        return self._commit(
            kept,
            "delete_partitions",
            {**(summary or {}), "dropped_files": len(cur) - len(kept)},
            expected_parent=base,
        )

    def compact(
        self,
        spark: SparkSession,
        target_rows_per_file: int = 4_000_000,
        min_files: int = 2,
        summary: dict | None = None,
    ) -> str | None:
        """Small-file compaction (Iceberg ``rewriteDataFiles``): rewrite
        every partition holding >= ``min_files`` data files into
        ~``target_rows_per_file``-row files, commit as one data-preserving
        snapshot. Incremental appends (one file set per ingest) are what
        fragment partitions; at 10^12 rows an uncompacted month would pay
        a task per tiny file on every scan. Returns the new snapshot id,
        or None when nothing needed compacting.
        """
        from collections import Counter

        base = self.head()
        cur = self._files(base)
        if not self.partition_by:
            # unpartitioned squash (lineage/metrics bookkeeping tables):
            # one append per refresh leaves one file subtree per run, and
            # the manifest-driven read unions one scan branch per subtree
            # — O(#runs) plan growth unless periodically rewritten
            if len(cur) < min_files:
                return None
            df = self._read_files(spark, cur)
            n_rows = df.count()
            n_out = max(1, -(-n_rows // target_rows_per_file))
            _sub, new_files = self._write_files(df.repartition(n_out))
            return self._commit(
                new_files,
                "compact",
                {
                    **(summary or {}),
                    "rewritten_files": len(cur),
                    "new_files": len(new_files),
                },
                expected_parent=base,
            )
        counts = Counter(self._partition_of(f, self.partition_by) for f in cur)
        todo = {p for p, n in counts.items() if n >= min_files}
        if not todo:
            return None
        victims = [
            f for f in cur if self._partition_of(f, self.partition_by) in todo
        ]
        df = self._read_files(spark, victims)
        n_rows = df.count()
        n_out = max(1, -(-n_rows // target_rows_per_file))
        _sub, new_files = self._write_files(
            df.repartition(n_out, *self.partition_by)
        )
        kept = [f for f in cur if f not in set(victims)]
        return self._commit(
            kept + new_files,
            "compact",
            {
                **(summary or {}),
                "rewritten_files": len(victims),
                "new_files": len(new_files),
            },
            expected_parent=base,
        )

    def expire_snapshots(
        self, keep_last: int = 1, protect: list[str] | tuple[str, ...] = ()
    ) -> dict:
        """Expire all but the newest ``keep_last`` snapshots and delete
        data files no retained snapshot references (Iceberg
        ``expireSnapshots`` + orphan-file removal). This is what makes
        :meth:`delete_partitions` and :meth:`overwrite_partitions`
        eventually reclaim space; until it runs, every historical
        snapshot stays time-travelable.

        ``protect`` names snapshot ids that must STAY in the retained
        chain (plus everything after them) — downstream consumers'
        incremental high-water marks. Expiring below a consumer's HWM
        silently degrades its next refresh to a full rebuild (and can
        resurrect retention-dropped months from a fuller source), so
        the pipeline's ``maintain`` passes every known HWM here.

        Crash ordering: the kept-root manifest is rewritten FIRST, then
        dropped manifests are removed, and data files are deleted LAST —
        a crash at any point leaves at worst orphan data files (space,
        reclaimed by re-running), never a retained manifest chain that
        references deleted parquet.
        """
        chain = self.snapshots()
        ids = [m["snapshot_id"] for m in chain]
        cut = len(chain) - keep_last
        for pid in protect:
            if pid in ids:
                cut = min(cut, ids.index(pid))
        if cut <= 0:
            return {"expired": 0, "files_deleted": 0}
        keep, drop = chain[cut:], chain[:cut]
        live = {f for m in keep for f in m["files"]}
        dead = {f for m in drop for f in m["files"]} - live
        # 1) earliest kept snapshot becomes the chain root
        first_kept = dict(self._manifest(keep[0]["snapshot_id"]))
        first_kept["parent"] = None
        path = os.path.join(self.man_dir, f"snap-{first_kept['snapshot_id']}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(first_kept, f)
        os.replace(tmp, path)
        # 2) drop expired manifests (chain no longer references them)
        for m in drop:
            try:
                os.remove(
                    os.path.join(self.man_dir, f"snap-{m['snapshot_id']}.json")
                )
            except FileNotFoundError:
                pass
        # 3) only now is no retained manifest referencing the dead files
        for rel in dead:
            try:
                os.remove(os.path.join(self.root, rel))
            except FileNotFoundError:
                pass
        return {"expired": len(drop), "files_deleted": len(dead)}

    def rollback(self, snapshot_id: str) -> None:
        """Reset HEAD to an earlier snapshot (manifests are immutable)."""
        self._manifest(snapshot_id)  # existence check
        tmp = os.path.join(self.man_dir, f"HEAD.tmp{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(snapshot_id)
        os.replace(tmp, os.path.join(self.man_dir, "HEAD"))
