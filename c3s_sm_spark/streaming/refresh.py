"""Streaming-mode tier refresh (SURVEY.md §2.8).

The reference's incremental surface is poll-based: ``update_img`` detects
the last local image and fetches everything newer, ``extend_ts`` re-runs
the reshuffle from the lineage high-water mark
(``/root/reference/src/c3s_sm/cli.py:88-131``,
``/root/reference/src/c3s_sm/reshuffle.py:67-133``). Structured Streaming
is the Spark-native version of that loop — two flavors here:

1. :func:`stream_pipeline_refresh` — file-source stream of raw point
   parquet; each micro-batch is ingested into the
   :class:`~c3s_sm_spark.plans.pipeline.TierPipeline` and the cascade
   refreshed. Exactly-once overall effect: the stream checkpoint dedups
   input files across restarts, and the pipeline's month-partition
   overwrites are idempotent, so replaying a failed batch converges to
   the same table state.

2. :func:`stream_daily_rollup` — a pure watermark + tumbling-window
   aggregate kept in streaming state, for deployments that want the
   daily tier continuously materialized with bounded late-data handling
   (watermark = the completeness frontier the reference derives from
   ``first_missing_date``, ``/root/reference/src/c3s_sm/download.py:312-335``).
   Dekad/month windows are intentionally NOT streamed: they are
   non-uniform-width calendar windows (``window()`` can't express them)
   and cascading them in batch off the daily tier is cheaper than keeping
   months of streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from c3s_sm_spark.plans.pipeline import TierPipeline


def stream_pipeline_refresh(
    spark: SparkSession,
    input_dir: str,
    schema: StructType | str,
    pipeline: TierPipeline,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuously fold new raw-point files into the tier cascade.

    ``input_dir`` is watched as a parquet file source (the reference's
    image-archive directory analog). Each micro-batch appends to the raw
    snapshot table and refreshes daily/dekadal/monthly incrementally —
    only months present in the batch are recomputed.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # foreachBatch is at-least-once: a crash after the raw append but
        # before the checkpoint offset commit replays this batch_id, and
        # a second blind append would permanently duplicate raw rows
        # (tiers self-heal via keep-latest; raw would not). The batch id
        # rides in the append's commit summary, so the replay check is a
        # manifest walk — no data scan.
        done = {
            m["summary"].get("stream_batch_id")
            for m in pipeline.raw.snapshots()
            if m["operation"] == "append"
        }
        if batch_id not in done:
            pipeline.ingest(batch, summary={"stream_batch_id": batch_id})
        # refresh is idempotent partition overwrite — always safe to rerun
        pipeline.refresh()

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("tier_refresh")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_daily_rollup(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "v",
    flag_col: str | None = "flag",
    watermark: str = "3 days",
) -> DataFrame:
    """Watermarked tumbling-window daily aggregate (append-mode ready).

    Emits the same columns as the batch rollup (``ts v_mean v_sum nobs
    flags``) once the watermark passes a window's end — late rows within
    the watermark are folded in, later ones dropped (the reference instead
    reprocesses the whole affected period; the batch pipeline keeps that
    restatement path via partition overwrite).
    """
    from c3s_sm_spark.operators.rollup import TIER_COLS, finish_tier, tier_aggs

    out = (
        points_stream.withWatermark(ts_col, watermark)
        .groupBy(key, F.window(ts_col, "1 day").alias("w"))
        .agg(*tier_aggs(value_col, flag_col))
        .withColumn("ts", F.col("w.start"))
        .drop("w")
    )
    out = finish_tier(out, flag_col)
    return out.select(key, "ts", *TIER_COLS)


def stream_dedup(
    points_stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "3 days",
) -> DataFrame:
    """Streaming duplicate suppression for late/reprocessed rows (J5's
    streaming analog, §2.8 "Late / reprocessed data").

    ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival per key
    within the watermark horizon and bounds the dedup state by event
    time — at any corpus size the state holds only the watermark window,
    never all history. Semantics note vs the batch path: the reference's
    ``sort_last`` (``/root/reference/src/c3s_sm/interface.py:347-356``)
    prefers the *newest version* among duplicates, which needs to see all
    candidates — a batch decision. Streaming first-wins is the bounded-
    state approximation; authoritative version-aware restatement remains
    the batch pipeline's keep-latest + month-partition overwrite.
    """
    keys = keys or ["doc_id", ts_col]
    return points_stream.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


def stream_sessionize(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "3 days",
) -> DataFrame:
    """Watermarked streaming sessionization via Spark's native
    ``session_window`` (gap-based merging windows) — the streaming analog
    of ``operators.timeseries.sessionize``. A session closes (and emits,
    in append mode) once the watermark passes session_end + gap; state is
    bounded by the watermark horizon, never all history.

    Semantics note vs the batch operator: ``session_window`` uses a
    half-open ``[start, start+gap)`` merge rule, so an event at EXACTLY
    ``gap`` after its predecessor starts a NEW session, while the batch
    ``sessionize`` (``delta > gap_s`` test) continues the old one — on
    microsecond-timestamped corpora the exact-boundary case never occurs
    (tests/test_timeseries.py pins the batch/native parity on real data).

    Emits one row per closed session: key, session_start, session_end,
    n_events.
    """
    return (
        points_stream.withWatermark(ts_col, watermark)
        .groupBy(key, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_interval_tag(
    points_stream: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
    interval_cols: list[str] | None = None,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Streaming point-in-interval enrichment: tag each arriving event
    with every same-key STATIC interval containing its timestamp — the
    live version of "which maintenance window / campaign / outage is
    this event inside" (``operators.intervals.interval_join`` is the
    batch twin and supplies the entire implementation).

    A stream-static INNER equi-join is stateless in Structured
    Streaming — each micro-batch joins against the static side with no
    streaming state, no watermark requirement, and the static relation
    re-evaluated per batch (so an interval table backed by a snapshot
    store picks up newly registered windows on the next trigger). The
    bucketized formulation matters doubly here: Structured Streaming
    REJECTS the naive ``BETWEEN``-only formulation outright unless it
    can find an equality predicate, and the (key, bucket) equi-join is
    exactly that predicate, with the same exactly-once pair semantics
    as the batch operator.

    Unmatched events are dropped (inner semantics); run a second
    pass-through sink if the unmatched stream is also needed.
    """
    from c3s_sm_spark.operators.intervals import interval_join

    return interval_join(
        points_stream,
        intervals,
        keys,
        ts_col=ts_col,
        start_col=start_col,
        end_col=end_col,
        bucket_s=bucket_s,
        interval_cols=interval_cols,
        max_span_buckets=max_span_buckets,
    )


def stream_sliding_rollup(
    points_stream: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window rollup — the live "rate over the last
    hour, refreshed every 15 minutes" panel next to
    :func:`stream_daily_rollup`'s tumbling daily tier. Each event lands
    in ``window/slide`` overlapping windows; Spark keeps one aggregate
    state row per (key, window) and drops it once the watermark passes
    the window end, so state is bounded by
    ``keys x (watermark + window)/slide`` regardless of stream length.

    Emits (append mode) one final row per closed window: key,
    win_start, win_end, n, v_sum_micro — the micro-integer sum
    convention of the batch tiers, so a downstream exactness check can
    diff this against a batch recompute bit-for-bit.
    """
    v_micro = F.round(F.col(value_col) * 1_000_000).cast("long")
    return (
        points_stream.withWatermark(ts_col, watermark)
        .groupBy(key, F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(value_col).alias("n"),
            F.sum(v_micro).alias("v_sum_micro"),
        )
        .select(
            key,
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n",
            "v_sum_micro",
        )
    )
