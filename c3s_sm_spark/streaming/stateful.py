"""Custom stateful streaming operators (SURVEY.md §2.8, arbitrary state).

The reference's incremental consumers carry per-series state between
runs — the lineage high-water mark that ``extend_ts`` resumes from
(``/root/reference/src/c3s_sm/reshuffle.py:67-133``). The streaming
analog here generalizes that to a per-key RECURRENCE carried across
micro-batches: the exponentially weighted moving average, the standard
online smoother a telemetry tier keeps per series for drift/alert
thresholds (the stateful twin of the batch
``operators.timeseries.ewma``).

Implemented with ``applyInPandasWithState`` (the same machinery as
``frontier.track_frontier_gaps``): state per key is
``(last_ewma float64, frontier_us int64)``. Each invocation sorts the
key's new rows by timestamp, folds the recurrence vectorized in numpy,
emits one output row per accepted input row, and advances the state.
At 10^12 keys the state store shards with the shuffle partitioning on
the key — the same layout the engine uses everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ewma", DoubleType()),
        StructField("frontier_us", LongType()),
    ]
)


def stream_ewma(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Streaming per-key EWMA: ``s_t = alpha*v_t + (1-alpha)*s_{t-1}``
    carried across micro-batches in keyed state.

    Exactness contract: fed the same rows in timestamp order (across
    any micro-batch slicing), the emitted ewma values are bit-identical
    to the batch :func:`~c3s_sm_spark.operators.timeseries.ewma` —
    pinned by ``tests/test_streaming.py`` over a 2-batch split.
    PRECONDITION: timestamps are unique per key (feed the deduped /
    pre-aggregated tier, the same contract as every order-recursive
    operator here). The frontier drop below is ``ts > frontier``
    (at-or-before is discarded), so a second DISTINCT event sharing the
    frontier timestamp across a batch boundary would be dropped too —
    equality-drop is deliberate: it is what makes a whole-file replay
    idempotent (the restart test), and with unique per-key timestamps
    it never discards new data. Inside one micro-batch rows are sorted
    per key before folding, so only CROSS-batch disorder is a semantic
    hazard: a row at or before the stored frontier would rewrite
    history that downstream consumers already saw, so it is DROPPED
    (the same late-data policy as ``track_frontier_gaps`` — the batch
    pipeline is the healing ledger, the stream is the live surface).
    Null timestamps and null values are likewise dropped (NaN would
    poison the recurrence forever).

    Output (append mode): one row per accepted event —
    ``(key, ts, value, ewma)``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    out_schema = StructType(
        [
            StructField(key, points_stream.schema[key].dataType),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("ewma", DoubleType()),
        ]
    )

    def _fold(key_tuple, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts = pd.to_datetime(pdf[ts_col])
        keep = ts.notna() & pdf[value_col].notna()
        if state.exists:
            last_ewma, frontier_us = state.get
            frontier = pd.Timestamp(np.datetime64(frontier_us, "us"))
            keep &= ts > frontier
        else:
            last_ewma = None
        pdf = pdf.loc[keep].sort_values(ts_col, kind="stable")
        if not len(pdf):
            return
        v = pdf[value_col].to_numpy(dtype=np.float64)
        # bit-exactness with the batch operator demands the SAME
        # sequential fold pandas ewm(adjust=False) runs in C — not an
        # algebraically equal scaled-cumsum (different rounding order).
        # The carry-in is injected by prepending the stored state as a
        # synthetic row: ewm then yields y_0 = s and
        # y_1 = (1-a)*s + a*v_1 — exactly the cross-batch recurrence —
        # and the prepended row is sliced off the output.
        s = last_ewma
        if s is None:
            folded = pd.Series(v).ewm(alpha=alpha, adjust=False).mean()
            out = folded.to_numpy()
        else:
            seeded = np.concatenate(([s], v))
            folded = pd.Series(seeded).ewm(alpha=alpha, adjust=False).mean()
            out = folded.to_numpy()[1:]
        s = float(out[-1])
        frontier_us = int(
            pd.to_datetime(pdf[ts_col]).to_numpy().astype("datetime64[us]").astype(np.int64).max()
        )
        state.update((s, frontier_us))
        yield pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                value_col: v,
                "ewma": out,
            }
        )

    return points_stream.groupBy(key).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("n_seen", LongType()),
        StructField("frontier_us", LongType()),
    ]
)


def stream_holt(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """X142 streaming per-key Holt level+trend smoothing — the stateful
    twin of :func:`~c3s_sm_spark.operators.timeseries.holt_smooth`,
    carrying ``(level, trend, n_seen, frontier)`` across micro-batches:
    the live "where is this series and which way is it drifting" surface
    a telemetry tier serves between batch recomputes.

    Same contracts as :func:`stream_ewma` (unique per-key timestamps,
    equality-drop at the frontier for idempotent replay, null drop,
    per-key in-batch sort — only CROSS-batch disorder is dropped as
    late data). Initialization matches the batch operator exactly:
    ``l_0 = v_0``, ``b_0 = v_1 - v_0`` (0 for a one-point series so
    far) — the ``n_seen`` state replays the batch init across a batch
    boundary that splits the first two observations. The stream is
    bit-identical to the batch operator for EVERY row except one
    documented case: row 0's emitted trend is the batch operator's
    anticausal ``b_0 = v_1 - v_0``, which a stream can only reproduce
    when both points share a batch — a 1-point first batch emits trend
    0 there (levels and all later trends still match bit-for-bit;
    pinned both ways in tests/test_streaming.py).

    Output (append mode): ``(key, ts, value, holt_level, holt_trend)``
    per accepted event.
    """
    if not (0 < alpha <= 1) or not (0 <= beta <= 1):
        raise ValueError(f"need 0<alpha<=1, 0<=beta<=1, got {alpha}, {beta}")

    out_schema = StructType(
        [
            StructField(key, points_stream.schema[key].dataType),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("holt_level", DoubleType()),
            StructField("holt_trend", DoubleType()),
        ]
    )

    def _fold(key_tuple, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts = pd.to_datetime(pdf[ts_col])
        keep = ts.notna() & pdf[value_col].notna()
        if state.exists:
            lev, tr, n_seen, frontier_us = state.get
            frontier = pd.Timestamp(np.datetime64(frontier_us, "us"))
            keep &= ts > frontier
        else:
            lev = tr = None
            n_seen = 0
        pdf = pdf.loc[keep].sort_values(ts_col, kind="stable")
        if not len(pdf):
            return
        v = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(v)
        out_l = np.empty(n, dtype=np.float64)
        out_t = np.empty(n, dtype=np.float64)
        i = 0
        if n_seen == 0:
            # batch init: l_0 = v_0 and the ANTICAUSAL b_0 = v_1 - v_0.
            # A stream can only reproduce row 0's trend when the second
            # point is in the same batch; a 1-point first batch emits
            # trend 0 for row 0 (the only permitted divergence from the
            # batch operator — see docstring).
            lev = v[0]
            tr = (v[1] - v[0]) if n >= 2 else 0.0
            out_l[0], out_t[0] = lev, tr
            i = 1
            n_seen = 1
        if n_seen == 1 and i < n:
            # second observation overall: seed b_0 = v_1 - l_0. After a
            # 1-point batch lev is exactly v_0, so this equals the batch
            # b_0; when the seed already happened at emission above the
            # formula reproduces the same value — idempotent either way.
            tr = v[i] - lev
            prev = lev
            lev = alpha * v[i] + (1 - alpha) * (prev + tr)
            tr = beta * (lev - prev) + (1 - beta) * tr
            out_l[i], out_t[i] = lev, tr
            i += 1
            n_seen = 2
        for j in range(i, n):
            prev = lev
            lev = alpha * v[j] + (1 - alpha) * (prev + tr)
            tr = beta * (lev - prev) + (1 - beta) * tr
            out_l[j], out_t[j] = lev, tr
        n_seen += max(0, n - i)
        frontier_us = int(
            pd.to_datetime(pdf[ts_col]).to_numpy().astype("datetime64[us]").astype(np.int64).max()
        )
        state.update((float(lev), float(tr), int(n_seen), frontier_us))
        yield pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                value_col: v,
                "holt_level": out_l,
                "holt_trend": out_t,
            }
        )

    return points_stream.groupBy(key).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("cp", LongType()),
        StructField("cp_min", LongType()),
        StructField("cm", LongType()),
        StructField("cm_min", LongType()),
        StructField("frontier_us", LongType()),
    ]
)


def stream_cusum(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    micro_col: str = "vm",
    target: int = 0,
    slack: int = 0,
    h: int = 0,
) -> DataFrame:
    """X152 streaming per-key Page CUSUM drift alarm — the stateful
    twin of :func:`~c3s_sm_spark.operators.anomaly.page_cusum`,
    carrying the EXACT INTEGER prefix-sum state ``(C⁺, min C⁺, C⁻,
    min C⁻, frontier)`` across micro-batches. Because the statistic
    is pure BIGINT arithmetic (``s⁺_k = C_k − min_{0≤j≤k} C_j`` in
    micro units — no float ever enters), the stream is bit-identical
    to the batch operator under ANY micro-batch slicing, with no
    documented divergence case at all (unlike stream_holt's row-0
    trend) — pinned in tests/test_streaming.py.

    Same ingestion contracts as :func:`stream_ewma`: unique per-key
    timestamps, cross-batch late rows dropped at the frontier
    (equality-drop for idempotent replay), null ts/value dropped,
    in-batch rows sorted per key before folding. No-restart variant
    (see the batch docstring): alarms do not reset the statistic.

    Output (append mode): ``(key, ts, vm, s_plus, s_minus, alarm)``
    per accepted event.
    """
    out_schema = StructType(
        [
            StructField(key, points_stream.schema[key].dataType),
            StructField(ts_col, TimestampType()),
            StructField(micro_col, LongType()),
            StructField("s_plus", LongType()),
            StructField("s_minus", LongType()),
            StructField("alarm", IntegerType()),
        ]
    )
    target, slack, h = int(target), int(slack), int(h)

    def _fold(key_tuple, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts = pd.to_datetime(pdf[ts_col])
        keep = ts.notna() & pdf[micro_col].notna()
        if state.exists:
            cp, cp_min, cm, cm_min, frontier_us = state.get
            frontier = pd.Timestamp(np.datetime64(frontier_us, "us"))
            keep &= ts > frontier
        else:
            cp = cm = 0
            cp_min = cm_min = 0  # C_0 = 0 participates in the min
        pdf = pdf.loc[keep].sort_values(ts_col, kind="stable")
        if not len(pdf):
            return
        v = pdf[micro_col].to_numpy(dtype=np.int64)
        # exact integer prefix folds (object dtype avoided: int64 cum
        # sums are the batch operator's own overflow contract)
        xs = v - target - slack
        ys = target - v - slack
        cps = cp + np.cumsum(xs, dtype=np.int64)
        cms = cm + np.cumsum(ys, dtype=np.int64)
        cp_mins = np.minimum(np.minimum.accumulate(cps), cp_min)
        cm_mins = np.minimum(np.minimum.accumulate(cms), cm_min)
        s_plus = cps - cp_mins
        s_minus = cms - cm_mins
        frontier_us = int(
            pd.to_datetime(pdf[ts_col]).to_numpy().astype("datetime64[us]").astype(np.int64).max()
        )
        state.update(
            (
                int(cps[-1]),
                int(cp_mins[-1]),
                int(cms[-1]),
                int(cm_mins[-1]),
                frontier_us,
            )
        )
        yield pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                micro_col: v,
                "s_plus": s_plus,
                "s_minus": s_minus,
                "alarm": ((s_plus > h) | (s_minus > h)).astype(np.int32),
            }
        )

    return points_stream.groupBy(key).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TOPK_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
        StructField("n_total", LongType()),
        StructField("frontier_us", LongType()),
    ]
)


def stream_topk(
    points_stream: DataFrame,
    key: str = "source",
    ts_col: str = "ts",
    item_col: str = "token",
    k: int = 10,
    capacity: int = 64,
) -> DataFrame:
    """X154 streaming per-key heavy hitters via the Space-Saving sketch
    (Metwally et al. 2005) — the live twin of the batch
    ``heavy_hitters`` / ``token_freq`` queries: which token/item ids
    dominate each source RIGHT NOW, in O(capacity) state per key
    regardless of stream length or vocabulary size.

    Sketch semantics (batched mergeable variant): each micro-batch's
    items are exact-counted first (pandas value_counts — no per-row
    Python), then folded into the tracked set in deterministic order
    (count DESC, item ASC): tracked items add exactly; new items take
    a free slot, or evict the current minimum m and start at ``m +
    c`` with error bound ``err = m`` recorded. Standard guarantees:
    estimated count overshoots the true count by at most ``err`` <=
    n_total/capacity, and any item with true count > n_total/capacity
    is tracked. EXACTNESS contract: while a key has seen <= capacity
    distinct items, every count is exact and ``err = 0`` — pinned
    against the batch exact counts in tests/test_streaming.py.

    Ingestion contracts match :func:`stream_ewma`: cross-batch rows at
    or before the frontier are dropped (idempotent whole-file replay —
    a re-fed batch must not double-count), null ts/item dropped.
    Items are LongType ids (token ids, hashed terms); hash strings
    upstream with ``xxhash64`` if needed.

    Output (append mode): one SNAPSHOT per key per micro-batch that
    touched it — the current top-``k`` rows ``(key, item, est, err,
    n_total)``. ``n_total`` is monotone per key, so the latest
    snapshot is the max-``n_total`` row group (how the parity test
    reads it back).
    """
    if k < 1 or capacity < k:
        raise ValueError(f"need 1 <= k <= capacity, got k={k}, capacity={capacity}")

    out_schema = StructType(
        [
            StructField(key, points_stream.schema[key].dataType),
            StructField("item", LongType()),
            StructField("est", LongType()),
            StructField("err", LongType()),
            StructField("n_total", LongType()),
        ]
    )

    def _fold(key_tuple, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts = pd.to_datetime(pdf[ts_col])
        keep = ts.notna() & pdf[item_col].notna()
        if state.exists:
            items, counts, errs, n_total, frontier_us = state.get
            sk = {
                int(i): [int(c), int(e)]
                for i, c, e in zip(items, counts, errs)
            }
            frontier = pd.Timestamp(np.datetime64(frontier_us, "us"))
            keep &= ts > frontier
        else:
            sk = {}
            n_total = 0
        pdf = pdf.loc[keep]
        if not len(pdf):
            return
        vc = pdf[item_col].astype("int64").value_counts()
        # deterministic fold order: count DESC, item ASC
        batch = sorted(
            ((int(c), int(i)) for i, c in vc.items()),
            key=lambda t: (-t[0], t[1]),
        )
        for c, item in batch:
            n_total += c
            if item in sk:
                sk[item][0] += c
            elif len(sk) < capacity:
                sk[item] = [c, 0]
            else:
                m_item = min(sk, key=lambda j: (sk[j][0], j))
                m = sk.pop(m_item)[0]
                sk[item] = [m + c, m]
        frontier_us = int(
            pd.to_datetime(pdf[ts_col]).to_numpy().astype("datetime64[us]").astype(np.int64).max()
        )
        tracked = sorted(sk.items(), key=lambda t: (-t[1][0], t[0]))
        state.update(
            (
                [i for i, _ in tracked],
                [c for _, (c, _e) in tracked],
                [e for _, (_c, e) in tracked],
                int(n_total),
                frontier_us,
            )
        )
        top = tracked[:k]
        kv = key_tuple[0]
        yield pd.DataFrame(
            {
                key: [kv] * len(top),
                "item": [i for i, _ in top],
                "est": [c for _, (c, _e) in top],
                "err": [e for _, (_c, e) in top],
                "n_total": [int(n_total)] * len(top),
            }
        )

    return points_stream.groupBy(key).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SWI_STATE_SCHEMA = StructType(
    [
        StructField("swi", DoubleType()),
        StructField("gain", DoubleType()),
        StructField("last_t_us", LongType()),
        StructField("frontier_us", LongType()),
    ]
)


def stream_swi(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    ctime_days: float = 5.0,
) -> DataFrame:
    """X155 streaming SWI exponential filter — the stateful twin of
    :func:`~c3s_sm_spark.operators.timeseries.swi_filter`, carrying
    ``(swi, gain, last_t, frontier)`` across micro-batches: the live
    profile-soil-moisture / gap-aware-smoothed surface a telemetry
    tier serves between batch recomputes (the reference ecosystem's
    pytesmo ``exp_filter`` applied on arrival).

    Bit-parity: the recurrence is the identical float-op sequence in
    timestamp order, and the gain K plus the last observation time are
    exactly the sufficient state — so stream equals batch bit-for-bit
    under ANY micro-batch slicing, from row 0, with no divergence
    caveat (pinned in tests/test_streaming.py). Same ingestion
    contracts as :func:`stream_ewma` (unique per-key timestamps,
    frontier equality-drop for idempotent replay, in-batch per-key
    sort); null values are dropped HERE (unlike the batch operator's
    pass-through) because an append-mode stream has no reason to emit
    a row the filter ignored.

    Output (append mode): ``(key, ts, value, swi, swi_gain)``.
    """
    import math

    if ctime_days <= 0:
        raise ValueError(f"ctime_days must be > 0, got {ctime_days}")
    t_char = float(ctime_days)

    out_schema = StructType(
        [
            StructField(key, points_stream.schema[key].dataType),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("swi", DoubleType()),
            StructField("swi_gain", DoubleType()),
        ]
    )

    def _fold(key_tuple, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts = pd.to_datetime(pdf[ts_col])
        keep = ts.notna() & pdf[value_col].notna()
        if state.exists:
            s, k, last_t_us, frontier_us = state.get
            frontier = pd.Timestamp(np.datetime64(frontier_us, "us"))
            keep &= ts > frontier
        else:
            s = k = last_t_us = None
        pdf = pdf.loc[keep].sort_values(ts_col, kind="stable")
        if not len(pdf):
            return
        t_us = (
            pd.to_datetime(pdf[ts_col]).to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        v = pdf[value_col].to_numpy(dtype=np.float64)
        out_s = np.empty(len(v))
        out_k = np.empty(len(v))
        for i in range(len(v)):
            # identical float-op ORDER as the batch fold: day floats
            # derive from the same int64 microseconds / 86_400e6
            ti = t_us[i] / 86_400_000_000.0
            if s is None:
                s, k = v[i], 1.0
            else:
                e = math.exp(-(ti - last_t_us / 86_400_000_000.0) / t_char)
                k = k / (k + e)
                s = s + k * (v[i] - s)
            last_t_us = int(t_us[i])
            out_s[i], out_k[i] = s, k
        state.update((float(s), float(k), int(last_t_us), int(t_us.max())))
        yield pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                value_col: v,
                "swi": out_s,
                "swi_gain": out_k,
            }
        )

    return points_stream.groupBy(key).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=_SWI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HAMPEL_STATE_SCHEMA = StructType(
    [
        StructField("buf_ts_us", ArrayType(LongType())),
        StructField("buf_v", ArrayType(LongType())),
        StructField("n_unemitted", LongType()),
        StructField("total_seen", LongType()),
        StructField("frontier_us", LongType()),
    ]
)


def stream_hampel(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    micro_col: str = "vm",
    half_window: int = 3,
    k: int = 3,
) -> DataFrame:
    """X178 streaming Hampel despiker — the stateful twin of
    :func:`~c3s_sm_spark.operators.timeseries.hampel_filter`. The
    batch operator's window is CENTERED, so the stream holds each row
    until ``half_window`` successors have arrived, then emits its
    flag/replacement computed over exactly the batch window — every
    decision is the same doubled/quadrupled-integer arithmetic, so
    emitted rows are BIT-IDENTICAL to the batch operator under any
    micro-batch slicing. The documented divergence is structural, not
    numeric: the LAST ``half_window`` rows of each key remain pending
    (a stream cannot know the series ended; the batch operator emits
    them with right-truncated windows) — pinned in
    tests/test_streaming.py as parity on all-but-the-pending-tail.

    State per key: the tail buffer (pending rows + ``half_window``
    rows of emitted left context — at most ``2·half_window`` rows),
    the pending count, total rows seen, and the usual frontier for
    the cross-batch late-row drop (same ingestion contracts as
    :func:`stream_ewma`).

    Output (append mode): ``(key, ts, vm, n_win, med2, mad4, is_out,
    rep2)`` per emitted (fully-contexted) row.
    """
    if half_window < 1:
        raise ValueError(f"half_window must be >= 1, got {half_window}")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    h, kk = int(half_window), int(k)
    out_schema = StructType(
        [
            StructField(key, points_stream.schema[key].dataType),
            StructField(ts_col, TimestampType()),
            StructField(micro_col, LongType()),
            StructField("n_win", LongType()),
            StructField("med2", LongType()),
            StructField("mad4", LongType()),
            StructField("is_out", LongType()),
            StructField("rep2", LongType()),
        ]
    )

    def _fold(key_tuple, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
        )
        ts = pd.to_datetime(pdf[ts_col])
        keep = ts.notna() & pdf[micro_col].notna()
        if state.exists:
            buf_ts, buf_v, n_un, total, frontier_us = state.get
            buf_ts = list(buf_ts)
            buf_v = list(buf_v)
            frontier = pd.Timestamp(np.datetime64(frontier_us, "us"))
            keep &= ts > frontier
        else:
            buf_ts, buf_v, n_un, total = [], [], 0, 0
        pdf = pdf.loc[keep].sort_values(ts_col, kind="stable")
        if not len(pdf):
            return
        new_ts = (
            pd.to_datetime(pdf[ts_col])
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        new_v = pdf[micro_col].to_numpy(dtype=np.int64)
        full_ts = buf_ts + new_ts.tolist()
        full_v = buf_v + new_v.tolist()
        total_new = total + len(new_v)
        L = len(full_v)
        n_un_full = n_un + len(new_v)
        # rows emittable now: unemitted rows with >= h successors
        first_un = L - n_un_full  # in-buffer index of earliest pending
        rows = []
        emitted = 0
        # global index of full[i] is total_new - L + i; left bound of
        # the batch window is max(0, g - h) -> in-buffer via offset
        off = total_new - L
        for i in range(first_un, L - h):
            g = off + i
            lo = max(0, g - h) - off
            wnd = sorted(full_v[lo:i + h + 1])
            m = len(wnd)
            med2 = (
                2 * wnd[m // 2]
                if m % 2 == 1
                else wnd[m // 2 - 1] + wnd[m // 2]
            )
            dv = sorted(abs(2 * x - med2) for x in wnd)
            mad4 = (
                2 * dv[m // 2]
                if m % 2 == 1
                else dv[m // 2 - 1] + dv[m // 2]
            )
            iso = 1 if 2 * abs(2 * full_v[i] - med2) > kk * mad4 else 0
            rows.append(
                (
                    full_ts[i],
                    full_v[i],
                    m,
                    med2,
                    mad4,
                    iso,
                    med2 if iso else 2 * full_v[i],
                )
            )
            emitted += 1
        n_un_new = n_un_full - emitted  # = min(n_un_full, h)
        keep_n = min(L, n_un_new + h)
        state.update(
            (
                full_ts[L - keep_n:],
                full_v[L - keep_n:],
                int(n_un_new),
                int(total_new),
                int(max(full_ts)),
            )
        )
        if rows:
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(rows),
                    ts_col: np.array(
                        [r[0] for r in rows], dtype="datetime64[us]"
                    ),
                    micro_col: [r[1] for r in rows],
                    "n_win": [r[2] for r in rows],
                    "med2": [r[3] for r in rows],
                    "mad4": [r[4] for r in rows],
                    "is_out": [r[5] for r in rows],
                    "rep2": [r[6] for r in rows],
                }
            )

    return points_stream.groupBy(key).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=_HAMPEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
