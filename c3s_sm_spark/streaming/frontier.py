"""Stateful completeness-frontier tracking (custom stateful operator).

Batch reference analog: ``first_missing_date(last, freq)`` infers where
the archive stops and what to fetch next
(``/root/reference/src/c3s_sm/download.py:312-335``); the lineage yml
records ``period_to`` per archive (``/root/reference/src/c3s_sm/
misc.py:182-188``). In streaming mode that becomes per-key mutable state:
track each series' latest seen timestamp and emit a row whenever an
arriving batch reveals a GAP on the expected daily grid (one or more
missing days between the stored frontier and the new data).

Implemented with ``applyInPandasWithState`` — Spark's arbitrary-stateful
grouped-map for Python: state is a tuple ``(frontier_us,)`` per key;
each invocation sees the key's new rows as pandas batches, compares
against the stored frontier, emits gap records, and advances the state.
Timeouts are not used (the frontier never expires); at 10^12 keys the
state store shards with the shuffle partitioning on the key, which is
exactly how the engine partitions everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: emitted when a batch reveals missing expected days for a key
GAP_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("gap_start", TimestampType()),
        StructField("gap_end", TimestampType()),
        StructField("n_missing_days", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("frontier_us", LongType())])

_DAY_US = 86_400_000_000


def track_frontier_gaps(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap detector over the regular daily grid.

    For every key group in every micro-batch: let ``f`` be the stored
    frontier (max day previously seen). Any day in
    ``(f, min_new_day)`` missing from the union of state+batch is
    reported once as a gap row ``(key, gap_start, gap_end, n_missing)``;
    the frontier then advances to the batch max. Gaps *inside* the batch
    are detected the same way (the reference's IOError-per-missing-date,
    ``/root/reference/src/c3s_sm/interface.py:439-444``, surfaced as data
    instead of an exception).

    State bound (by design): only the frontier is stored, so days at or
    before it are indistinguishable replays vs late first arrivals and
    are dropped — a reported gap is never retracted here. The
    authoritative heal is the batch pipeline (refresh recomputes any
    month a late row lands in); this stream is the operational ALERT
    surface, not the ledger. Null timestamps are ignored (NaT has no
    day).
    """
    import numpy as np
    import pandas as pd

    def _track(key_tuple, pdf_iter, state: GroupState):
        days = []
        for pdf in pdf_iter:
            ts = pd.to_datetime(pdf[ts_col]).to_numpy().astype("datetime64[D]")
            ts = ts[~np.isnat(ts)]  # a null ts would poison hi/arange
            if ts.size:
                days.append(np.unique(ts))
        if not days:
            return
        new_days = np.unique(np.concatenate(days)).astype("datetime64[D]")
        if state.exists:
            (frontier_us,) = state.get
            frontier = np.datetime64(frontier_us, "us").astype("datetime64[D]")
            # consider only days beyond the stored frontier; replays of
            # already-seen days are idempotent no-ops
            new_days = new_days[new_days > frontier]
            if new_days.size == 0:
                return
            expected_start = frontier + 1
        else:
            expected_start = new_days[0]
        hi = new_days[-1]
        expected = np.arange(expected_start, hi + 1)
        missing = np.setdiff1d(expected, new_days, assume_unique=True)
        state.update((int(hi.astype("datetime64[us]").astype(np.int64)),))
        if missing.size:
            # contiguous missing runs -> one gap row per run
            breaks = np.flatnonzero(np.diff(missing) > np.timedelta64(1, "D"))
            starts = np.concatenate(([0], breaks + 1))
            ends = np.concatenate((breaks, [missing.size - 1]))
            yield pd.DataFrame(
                {
                    "doc_id": key_tuple[0],
                    "gap_start": missing[starts].astype("datetime64[us]"),
                    "gap_end": missing[ends].astype("datetime64[us]"),
                    "n_missing_days": (ends - starts + 1).astype(np.int64),
                }
            )

    return (
        points_stream.groupBy(key)
        .applyInPandasWithState(
            _track,
            outputStructType=GAP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
