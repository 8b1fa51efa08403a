"""Climatology + anomaly (drought-index style) operators.

The reference's dekadal/monthly C3S products exist to feed exactly this
kind of consumer: drought indicators computed as departures of the
current aggregate from the location's long-term climatology (the product
line the reference ships via its 10-day/monthly averages,
``/root/reference/src/c3s_sm/const.py:42-46``; product semantics in
``/root/reference/src/c3s_sm/metadata.py:163-231``). The engine makes the
departure computation itself a first-class operator:

- :func:`climatology` — per key x calendar-cycle slot (month-of-year /
  day-of-week / hour-of-day) mean, sample std and count over the full
  history. One hash aggregation; at 10^12 points the map-side partial
  agg collapses each task to ``keys x cycle`` partial tuples before the
  shuffle, so the shuffle is tiny regardless of input size.
- :func:`anomaly` — z-score of each row against its key's climatology
  slot. The climatology relation is ``|keys| x cycle`` rows —
  broadcast-joined back; the raw side never shuffles. Slots with a
  degenerate std (n <= 1 or all-equal values) yield NULL z, never a
  division blow-up.

Both are pure DataFrame transforms (no UDF anywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: cycle name -> column expression extracting the climatology slot
_CYCLES = {
    "month": lambda c: F.month(c),
    "dayofweek": lambda c: F.dayofweek(c),
    "hour": lambda c: F.hour(c),
}


def cycle_col(ts: Column, cycle: str) -> Column:
    if cycle not in _CYCLES:
        raise ValueError(f"cycle must be one of {sorted(_CYCLES)}, got {cycle!r}")
    return _CYCLES[cycle](ts).cast("int")


def climatology(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    cycle: str = "month",
) -> DataFrame:
    """Per-key climatology over calendar-cycle slots.

    Output: ``keys..., cyc, clim_mean, clim_std, clim_n`` (std is the
    sample standard deviation; NULL when n <= 1).
    """
    return (
        df.groupBy(*keys, cycle_col(F.col(ts_col), cycle).alias("cyc"))
        .agg(
            F.avg(value_col).alias("clim_mean"),
            F.stddev_samp(value_col).alias("clim_std"),
            F.count(value_col).alias("clim_n"),
        )
    )


def anomaly(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    cycle: str = "month",
    clim: DataFrame | None = None,
    broadcast_clim: bool = True,
) -> DataFrame:
    """Z-score anomaly of every row vs its key's climatology slot.

    ``clim`` may be a precomputed (possibly longer-history) climatology
    frame from :func:`climatology` — the operational pattern, where the
    baseline spans decades but anomalies are computed for the current
    window only. Adds ``cyc, clim_mean, clim_std, z`` columns; ``z`` is
    NULL where the slot's std is NULL or zero.

    ``broadcast_clim=False`` drops the broadcast hint for
    HIGH-CARDINALITY keys: the climatology is ``|keys| x cycle`` rows,
    and force-broadcasting 10^8+ keys would OOM the driver — a shuffle
    join (AQE still broadcasts when it measures small) is the scale
    path there.
    """
    if clim is None:
        clim = climatology(df, keys, ts_col, value_col, cycle)
    if broadcast_clim:
        clim = F.broadcast(clim)
    out = df.withColumn("cyc", cycle_col(F.col(ts_col), cycle)).join(
        clim, [*keys, "cyc"], "left"
    )
    z = (F.col(value_col) - F.col("clim_mean")) / F.nullif(
        F.col("clim_std"), F.lit(0.0)
    )
    return out.withColumn("z", z)


def climatology_doy_window(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    half_window: int = 17,
) -> DataFrame:
    """Circular day-of-year climatology with a moving window — the
    smoothing the reference's anomaly consumers actually use: pytesmo's
    ``calc_climatology`` (the library c3s_sm ships its time series
    into, ``/root/reference/src/c3s_sm/interface.py`` readers feed it)
    defaults to a **35-day window wrapped around the year boundary**,
    because a bare per-DOY mean over a few decades has ~30 samples per
    slot and is far too noisy to difference against. Jan 3 averages
    Dec 17 .. Jan 20 — the wrap is the whole point.

    Exact integer pieces: per (keys, doy 0..364) emits ``clim_sum`` /
    ``clim_n`` over every observation whose circular DOY distance is
    <= ``half_window`` (the mean derives outside the witness;
    ``value_col`` must already be integer micro-units). DOY is
    ``(dayofyear - 1) mod 365`` — leap day 366 folds onto slot 0,
    stated contract rather than silent engine drift.

    Plan: each observation EXPLODES to its ``2*half_window + 1``
    target slots (one Generate), then one (keys, doy) hash aggregate —
    map-side combine collapses every task to <= |keys| x 365 partial
    rows before the only shuffle. The alternative (a range window over
    tripled year-shifted copies) is wrong on gappy series (it windows
    observed ROWS, not calendar days) and needs a sort; the explode
    form is exact and sort-free. The 35x row fan-out happens AFTER the
    upstream daily reduction, on already-tiny rows.
    """
    if not 0 <= half_window <= 182:
        raise ValueError(f"half_window must be in [0, 182], got {half_window}")
    doy = (F.dayofyear(F.col(ts_col)) - 1) % 365
    off = F.explode(
        F.sequence(F.lit(-half_window), F.lit(half_window))
    ).alias("__off")
    return (
        df.select(*keys, doy.alias("__doy"), F.col(value_col).alias("__v"), off)
        .groupBy(
            *keys,
            F.pmod(F.col("__doy") + F.col("__off"), F.lit(365))
            .cast("int")
            .alias("doy"),
        )
        .agg(
            F.sum("__v").cast("long").alias("clim_sum"),
            F.count(F.lit(1)).cast("long").alias("clim_n"),
        )
    )


def anomaly_vs_doy_climatology(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    half_window: int = 17,
    clim: DataFrame | None = None,
    broadcast_clim: bool = True,
) -> DataFrame:
    """Departure of each observation from its circular-DOY windowed
    climatology — the actual drought-indicator product the reference's
    dekadal/monthly tiers feed (pytesmo ``calc_anomaly`` subtracts
    exactly this smoothed climatology): soil-moisture-below-normal is
    ``v - clim_mean(doy)`` with the 35-day wraparound baseline.

    Exact integer pieces: adds ``doy``, ``clim_sum``, ``clim_n`` and
    ``dep_n`` = ``v * clim_n - clim_sum`` (the departure in
    clim_n-denominated micro-units — ``dep_n / clim_n`` is the float
    departure, derived outside any witness). NULL-free by
    construction: every observation's own slot contains at least
    itself (clim_n >= 1), so the join never misses.

    ``clim`` accepts a precomputed (longer-history) frame from
    :func:`climatology_doy_window` — the operational pattern. The
    climatology is |keys| x 365 rows; ``broadcast_clim=False`` is the
    high-cardinality escape, same contract as :func:`anomaly`.
    """
    if clim is None:
        clim = climatology_doy_window(df, keys, ts_col, value_col, half_window)
    if broadcast_clim:
        clim = F.broadcast(clim)
    doy = ((F.dayofyear(F.col(ts_col)) - 1) % 365).cast("int")
    out = df.withColumn("doy", doy).join(clim, [*keys, "doy"])
    return out.withColumn(
        "dep_n",
        (F.col(value_col) * F.col("clim_n") - F.col("clim_sum")).cast("long"),
    )


def percentile_index(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    cycle: str = "month",
) -> DataFrame:
    """Empirical percentile (SPI/SMI-style drought index) of every
    observation within its key x cycle-slot climatology distribution —
    the non-parametric sibling of :func:`anomaly`'s z-score (operational
    drought products rank the current aggregate against the same
    calendar slot's history instead of assuming normality).

    One window per ``(keys, cyc)`` group ordered by value:
    ``pr_num = rank - 1`` and ``pr_den = n - 1`` are exact integers on
    any engine (ties share a rank, SQL-standard), and
    ``pct_rank = pr_num / pr_den`` is the familiar ``percent_rank``
    float (0 when the slot has a single observation). NULL values are
    dropped (a NULL can't hold a rank, and leaving it in would skew
    rank() against count(value) inconsistently).

    Scale shape: one hash shuffle on ``(keys, cyc)`` and a per-slot
    sort; slots are calendar-bounded (<= 12 months / 7 days / 24 hours
    per key), so slot size ~ history length per key — the same per-key
    series bound as the plain window operators.
    """
    out = df.filter(F.col(value_col).isNotNull()).withColumn(
        "cyc", cycle_col(F.col(ts_col), cycle)
    )
    w = Window.partitionBy(*keys, "cyc").orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*keys, "cyc")
    return (
        out.withColumn("pr_num", (F.rank().over(w) - F.lit(1)).cast("long"))
        .withColumn("pr_den", (F.count(value_col).over(wn) - F.lit(1)).cast("long"))
        .withColumn("pct_rank", F.percent_rank().over(w))
    )


def cusum_scores(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    micro_col: str = "vm",
) -> DataFrame:
    """Integer-exact CUSUM changepoint score per key: where, and how
    strongly, a series' mean most likely shifted — the drift detector a
    training-data pipeline points at per-source token/quality series to
    catch a scraper or dedup-policy change (the classic
    maximum-of-cumulative-deviations statistic behind change-of-mean
    tests; same family as the reference's climatology-departure
    consumers, but for a single break instead of a seasonal cycle).

    For the k-th of n values (``ts``-ordered): ``D_k = n * prefix_k -
    k * total`` is ``n *`` the cumulative deviation ``prefix_k - k *
    mean`` with the division cleared, so it stays in exact BIGINT
    arithmetic — identical on every engine and partitioning. Output one
    row per key: ``peak = max|D_k|``, ``peak_epoch`` = earliest ts
    attaining it (epoch seconds; the estimated change location), ``n``.

    Overflow bound: ``|D_k| <= n * |total| ~ n^2 * mean_micro``; at
    mean 1e10 micro-units the int64 range holds to n ~ 3e4 rows per key
    — pre-aggregate longer series to a coarser grid first (the engine's
    tier cascade exists for exactly that), or drop the micro scaling a
    decimal. Requires non-null values and unique ``ts`` per key.

    Plan: one hash shuffle on ``keys``; the running sum, row number and
    whole-partition total all evaluate in one per-key sort, then a
    map-side-combinable groupBy collapses each key to one row (struct
    max = argmax without a second shuffle or self-join).
    """
    keys = list(keys)
    order = F.col(ts_col).asc()
    wcum = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*keys)
    v = F.col(micro_col).cast("long")
    rows = df.select(
        *keys,
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("__ep"),
        F.sum(v).over(wcum).alias("__pre"),
        F.row_number().over(Window.partitionBy(*keys).orderBy(order)).alias("__k"),
        F.sum(v).over(wall).alias("__tot"),
        F.count(v).over(wall).alias("__n"),
    ).withColumn(
        "__absd",
        F.abs(F.col("__n") * F.col("__pre") - F.col("__k") * F.col("__tot")),
    )
    # lexicographic struct max == (max |D|, then min epoch): the argmax
    # rides the same aggregation as the max — no join-back on the peak
    peak = F.max(F.struct(F.col("__absd").alias("a"), (-F.col("__ep")).alias("b")))
    return (
        rows.groupBy(*keys)
        .agg(peak.alias("__s"), F.max("__n").alias("__nn"))
        .select(
            *keys,
            F.col("__s.a").cast("long").alias("peak"),
            (-F.col("__s.b")).cast("long").alias("peak_epoch"),
            F.col("__nn").cast("long").alias("n"),
        )
    )


def page_cusum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    micro_col: str,
    target: int,
    slack: int,
    h: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """X152 Page CUSUM drift monitor (Page 1954) — the ONLINE
    change-of-mean alarm, complementing :func:`cusum_scores` (which
    locates a single historical break offline): per observation, the
    one-sided statistics ``s⁺ = max(0, s⁺ + (v − target − slack))``
    (upward drift) and ``s⁻ = max(0, s⁻ + (target − v − slack))``
    (downward), alarm when either exceeds ``h``. This is the detector
    a live rollup tier runs against every per-source quality/volume
    series; the streaming twin
    :func:`~c3s_sm_spark.streaming.stateful.stream_cusum` carries the
    identical integer state across micro-batches.

    The recurrence is window-expressible exactly: with increments
    ``x_k`` and prefix sums ``C_k`` (``C_0 = 0``), ``s⁺_k = C_k −
    min_{0≤j≤k} C_j`` — a running sum and a running min, both exact
    BIGINT in micro units, so batch and stream agree bit-for-bit and
    every engine hashes identically. No-restart variant: the
    statistic is NOT reset after an alarm (restart policy is
    caller-side — resetting breaks both the window form and
    replay-idempotence; consumers cut at the first ``alarm`` row per
    key when they want the classical stopping time).

    Output: input keys + ``ts`` (+ tiebreak) + ``s_plus``, ``s_minus``
    (BIGINT) and ``alarm`` (int 0/1). Overflow: |C_k| <= n·(|v|max +
    target + slack) — micro-unit series are safe past 1e12 rows/key.

    Plan: ONE hash shuffle on ``keys``, one per-key sort serving all
    four running aggregates — pure JVM window, no join, no pandas.
    """
    keys = list(keys)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(micro_col).cast("long")
    x = v - F.lit(int(target)) - F.lit(int(slack))
    y = F.lit(int(target)) - v - F.lit(int(slack))
    out_cols = [*keys, ts_col] + ([tiebreak] if tiebreak else [])
    # two chained Window operators over the SAME partitioning+ordering:
    # Catalyst plans one Exchange + one Sort serving both
    staged = df.select(
        *out_cols,
        v.alias(micro_col),
        F.sum(x).over(w).cast("long").alias("__cp"),
        F.sum(y).over(w).cast("long").alias("__cm"),
    )
    # min over j in 0..k of C_j == least(C_0 = 0, running min of C_1..k)
    s_plus = F.col("__cp") - F.least(F.lit(0), F.min("__cp").over(w))
    s_minus = F.col("__cm") - F.least(F.lit(0), F.min("__cm").over(w))
    return staged.select(
        *out_cols,
        micro_col,
        s_plus.cast("long").alias("s_plus"),
        s_minus.cast("long").alias("s_minus"),
    ).withColumn(
        "alarm",
        (
            (F.col("s_plus") > F.lit(int(h)))
            | (F.col("s_minus") > F.lit(int(h)))
        ).cast("int"),
    )
