"""Streaming refresh: file-source micro-batches must converge to the same
tier state as one batch build, and the watermarked daily window agg must
equal the batch rollup on closed windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c3s_sm_spark.operators.dedup import keep_latest
from c3s_sm_spark.operators.rollup import cascade, rollup
from c3s_sm_spark.plans.pipeline import TierPipeline
from c3s_sm_spark.streaming.refresh import (
    stream_daily_rollup,
    stream_pipeline_refresh,
)
from c3s_sm_spark.synth import gen_points_raw


def _tier_rows(df):
    return {
        (r["doc_id"], str(r["ts"]), round(r["v_mean"], 9), r["nobs"], r["flags"])
        for r in df.select("doc_id", "ts", "v_mean", "nobs", "flags").collect()
    }


def test_stream_refresh_converges_to_batch(spark, tmp_path):
    raw = gen_points_raw(spark, 20, start="2019-10-01", end="2019-11-30").cache()
    in_dir = str(tmp_path / "in")
    # two arrival batches, written as separate files into the watched dir
    raw.where(F.col("ts") < "2019-11-01").coalesce(2).write.parquet(
        in_dir, mode="overwrite"
    )
    raw.where(F.col("ts") >= "2019-11-01").coalesce(2).write.parquet(
        in_dir, mode="append"
    )

    p = TierPipeline(spark, str(tmp_path / "tp"))
    q = stream_pipeline_refresh(
        spark,
        in_dir,
        raw.schema,
        p,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # force >1 micro-batch
    )
    q.awaitTermination(300)

    dd = keep_latest(raw, ["doc_id", "ts"], ["version"])
    mon_e = cascade(cascade(rollup(dd, ["doc_id"], "ts", "daily"), ["doc_id"], "dekadal"), ["doc_id"], "monthly")
    assert _tier_rows(p.read_tier("monthly")) == _tier_rows(mon_e)
    # restart with no new files: stream is a no-op (checkpoint dedups input)
    q2 = stream_pipeline_refresh(
        spark, in_dir, raw.schema, p, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert _tier_rows(p.read_tier("monthly")) == _tier_rows(mon_e)


def test_stream_daily_rollup_matches_batch(spark, tmp_path):
    raw = gen_points_raw(spark, 10, start="2019-10-01", end="2019-10-20").drop(
        "version"
    )
    in_dir = str(tmp_path / "in")
    raw.write.parquet(in_dir, mode="overwrite")
    stream = spark.readStream.schema(raw.schema).parquet(in_dir)
    agg = stream_daily_rollup(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("daily_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from daily_stream")
    exp = rollup(raw, ["doc_id"], "ts", "daily")
    # availableNow + append emits only windows closed by the final
    # watermark; every emitted row must match the batch rollup exactly
    exp_map = {
        (r["doc_id"], str(r["ts"])): (round(r["v_mean"], 9), r["nobs"], r["flags"])
        for r in exp.collect()
    }
    rows = got.collect()
    assert len(rows) > 0
    for r in rows:
        assert exp_map[(r["doc_id"], str(r["ts"]))] == (
            round(r["v_mean"], 9),
            r["nobs"],
            r["flags"],
        )


def test_stream_dedup_suppresses_replayed_rows(spark, tmp_path):
    from c3s_sm_spark.streaming.refresh import stream_dedup

    raw = gen_points_raw(spark, 8, start="2019-10-01", end="2019-10-15").cache()
    in_dir = str(tmp_path / "in")
    raw.coalesce(1).write.parquet(in_dir, mode="overwrite")
    raw.coalesce(1).write.parquet(in_dir, mode="append")  # full replay
    stream = spark.readStream.schema(raw.schema).parquet(in_dir)
    out = stream_dedup(stream, keys=["doc_id", "ts", "version"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT doc_id, ts, version, count(*) n FROM dedup_sink GROUP BY 1,2,3"
    ).collect()
    # every replayed (key, ts, version) row appears exactly once
    assert got and all(r["n"] == 1 for r in got)
    assert len(got) == raw.select("doc_id", "ts", "version").distinct().count()


def test_stream_sessionize_matches_native_batch_sessions(spark, tmp_path):
    """Streaming session_window (watermarked, append mode) must emit
    exactly the sessions the same data produces under batch
    session_window — and every emitted session must match one batch
    session bit-for-bit (start/end/count)."""
    from c3s_sm_spark.streaming.refresh import stream_sessionize

    raw = gen_points_raw(spark, 8, start="2019-10-01", end="2019-10-10").drop(
        "version"
    )
    in_dir = str(tmp_path / "sess_in")
    raw.write.parquet(in_dir, mode="overwrite")
    stream = spark.readStream.schema(raw.schema).parquet(in_dir)
    q = (
        stream_sessionize(stream, gap="2 hours")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from sess_stream").collect()
    exp = (
        raw.groupBy("doc_id", F.session_window("ts", "2 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    exp_set = {
        (r["doc_id"], str(r["w"]["start"]), str(r["w"]["end"]), r["n_events"])
        for r in exp
    }
    assert len(got) > 0
    for r in got:
        key = (
            r["doc_id"],
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
        )
        assert key in exp_set


def test_stream_interval_tag_matches_batch(spark, tmp_path):
    """Stream-static interval tagging over >1 micro-batch equals the
    batch interval_join on the same data (stateless per-batch join)."""
    from c3s_sm_spark.operators.intervals import interval_join
    from c3s_sm_spark.streaming.refresh import stream_interval_tag

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
        .drop("d")
    )
    pts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    in_dir = str(tmp_path / "in")
    pts.repartition(4).write.parquet(in_dir)

    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(in_dir)
    )
    tagged = stream_interval_tag(stream, iv, ["user_id"], bucket_s=3600)
    q = (
        tagged.writeStream.format("memory")
        .queryName("iv_tag")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["iv_start"], r["iv_end"])
        for r in spark.table("iv_tag").collect()
    }
    want = {
        (r["event_id"], r["iv_start"], r["iv_end"])
        for r in interval_join(pts, iv, ["user_id"], bucket_s=3600).collect()
    }
    assert got == want and len(want) > 0


def test_stream_ewma_matches_batch_across_restarts(spark, tmp_path):
    """The stateful streaming EWMA must be BIT-identical to the batch
    operator when rows arrive in ts order across micro-batches (the
    carry-in state is a pandas-ewm prepend, the same C fold), and a
    late row at/before the stored frontier must be dropped."""
    from c3s_sm_spark.operators.timeseries import ewma
    from c3s_sm_spark.streaming.stateful import stream_ewma

    raw = (
        gen_points_raw(spark, 6, start="2019-10-01", end="2019-11-30")
        .where(F.col("version") == "v1")
        .select("doc_id", "ts", F.col("v").cast("double").alias("value"))
        .cache()
    )
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck_ewma")
    early = raw.where(F.col("ts") < "2019-11-01")
    late = raw.where(F.col("ts") >= "2019-11-01")
    early.coalesce(1).write.parquet(in_dir, mode="overwrite")

    out_dir = str(tmp_path / "out_ewma")

    def _run():
        # memory sink can't recover from a checkpoint; foreachBatch +
        # parquet append is the restart-capable harness
        stream = spark.readStream.schema(raw.schema).parquet(in_dir)
        q = (
            stream_ewma(stream, key="doc_id", ts_col="ts", value_col="value", alpha=0.3)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()  # micro-batch 1: october
    late.coalesce(1).write.parquet(in_dir, mode="append")
    _run()  # micro-batch 2: november, carry-in state from batch 1

    got = {
        (r["doc_id"], str(r["ts"])): r["ewma"]
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        (r["doc_id"], str(r["ts"])): r["ewma"]
        for r in ewma(raw, ["doc_id"], "ts", "value", alpha=0.3).collect()
    }
    assert got == exp  # bit-identical floats, no tolerance
    assert len(got) == raw.count()

    # a replayed/late file (ts before the frontier) emits NOTHING new
    early.coalesce(1).write.parquet(in_dir, mode="append")
    _run()
    assert spark.read.parquet(out_dir).count() == len(exp)

    import pytest as _pt

    with _pt.raises(ValueError, match="alpha"):
        stream_ewma(spark.readStream.schema(raw.schema).parquet(in_dir), alpha=0.0)


def test_stream_sliding_rollup_matches_batch_windows(spark, tmp_path):
    """Closed sliding windows emitted by the stream must equal the batch
    computation of the same window expression (micro-int sums, exact)."""
    from c3s_sm_spark.streaming.refresh import stream_sliding_rollup

    raw = (
        gen_points_raw(spark, 5, start="2019-10-01", end="2019-10-10")
        .where(F.col("version") == "v1")
        .select("doc_id", "ts", F.col("v").cast("double").alias("value"))
    )
    in_dir = str(tmp_path / "in_slide")
    raw.coalesce(1).write.parquet(in_dir, mode="overwrite")
    stream = spark.readStream.schema(raw.schema).parquet(in_dir)
    out = stream_sliding_rollup(
        stream, window="48 hours", slide="24 hours", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("slide_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from slide_stream").collect()
    assert len(got) > 0
    exp = {
        (r["doc_id"], str(r["w"]["start"]), str(r["w"]["end"])): (
            r["n"],
            r["v_sum_micro"],
        )
        for r in raw.groupBy(
            "doc_id", F.window("ts", "48 hours", "24 hours").alias("w")
        )
        .agg(
            F.count("value").alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "v_sum_micro"
            ),
        )
        .collect()
    }
    for r in got:
        assert exp[(r["doc_id"], str(r["win_start"]), str(r["win_end"]))] == (
            r["n"],
            r["v_sum_micro"],
        )
    # every event lands in window/slide = 2 overlapping windows: emitted
    # (closed) windows are a subset, but n must tile <= 2x the row count
    assert sum(r["n"] for r in got) <= 2 * raw.count()


def test_stream_holt_matches_batch_across_restarts(spark, tmp_path):
    """Streaming Holt must be bit-identical to the batch operator for
    every row when the first two points of each series share a batch;
    a split first pair may only differ in row 0's anticausal trend."""
    from c3s_sm_spark.operators.timeseries import holt_smooth
    from c3s_sm_spark.streaming.stateful import stream_holt

    raw = (
        gen_points_raw(spark, 6, start="2019-10-01", end="2019-11-30")
        .where(F.col("version") == "v1")
        .select("doc_id", "ts", F.col("v").cast("double").alias("value"))
        .cache()
    )
    in_dir = str(tmp_path / "in_h")
    ck = str(tmp_path / "ck_holt")
    out_dir = str(tmp_path / "out_holt")
    early = raw.where(F.col("ts") < "2019-11-01")
    late = raw.where(F.col("ts") >= "2019-11-01")
    early.coalesce(1).write.parquet(in_dir, mode="overwrite")

    def _run():
        stream = spark.readStream.schema(raw.schema).parquet(in_dir)
        q = (
            stream_holt(
                stream, key="doc_id", ts_col="ts", value_col="value",
                alpha=0.3, beta=0.1,
            )
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()
    late.coalesce(1).write.parquet(in_dir, mode="append")
    _run()

    got = {
        (r["doc_id"], str(r["ts"])): (r["holt_level"], r["holt_trend"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        (r["doc_id"], str(r["ts"])): (r["holt_level"], r["holt_trend"])
        for r in holt_smooth(
            raw, ["doc_id"], "ts", "value", alpha=0.3, beta=0.1
        ).collect()
    }
    # every series here has both of its first two points in october
    # (gen_points_raw emits daily points), so the stream must match the
    # batch operator bit-for-bit on EVERY row including row 0
    assert got == exp
    assert len(got) == raw.count()

    # replayed early file: frontier drops everything, no new rows
    early.coalesce(1).write.parquet(in_dir, mode="append")
    _run()
    assert spark.read.parquet(out_dir).count() == len(exp)


def test_stream_holt_split_first_pair_row0_caveat(spark, tmp_path):
    """A 1-point first batch can't know the anticausal b0 = v1 - v0:
    row 0 emits trend 0, every later row still matches batch exactly."""
    import datetime as _dt

    from c3s_sm_spark.operators.timeseries import holt_smooth
    from c3s_sm_spark.streaming.stateful import stream_holt

    t0 = _dt.datetime(2024, 1, 1)
    rows = [("k", t0 + _dt.timedelta(hours=i), float(v))
            for i, v in enumerate([10.0, 16.0, 13.0, 20.0])]
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    in_dir = str(tmp_path / "in_s")
    ck = str(tmp_path / "ck_s")
    out_dir = str(tmp_path / "out_s")
    df.where(F.col("value") == 10.0).coalesce(1).write.parquet(
        in_dir, mode="overwrite"
    )

    def _run():
        stream = spark.readStream.schema(df.schema).parquet(in_dir)
        q = (
            stream_holt(stream, key="doc_id", alpha=0.4, beta=0.2)
            .writeStream.foreachBatch(
                lambda d, _eid: d.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()  # batch 1: only the first point
    df.where(F.col("value") != 10.0).coalesce(1).write.parquet(
        in_dir, mode="append"
    )
    _run()  # batch 2: the rest

    got = {
        str(r["ts"]): (r["holt_level"], r["holt_trend"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        str(r["ts"]): (r["holt_level"], r["holt_trend"])
        for r in holt_smooth(df, ["doc_id"], "ts", "value", 0.4, 0.2).collect()
    }
    k0 = str(rows[0][1])
    assert got[k0][0] == exp[k0][0]  # level matches
    assert got[k0][1] == 0.0 and exp[k0][1] == 6.0  # documented caveat
    for k in got:
        if k != k0:
            assert got[k] == exp[k]  # bit-identical from row 1 on


def test_stream_cusum_bit_parity_and_replay(spark, tmp_path):
    """X152 streaming Page CUSUM must be bit-identical to the batch
    operator under any micro-batch slicing — the state is exact BIGINT
    prefix sums, so unlike stream_holt there is NO permitted divergence
    row. Also pins the idempotent-replay frontier drop."""
    from c3s_sm_spark.operators.anomaly import page_cusum
    from c3s_sm_spark.streaming.stateful import stream_cusum

    raw = (
        gen_points_raw(spark, 6, start="2019-10-01", end="2019-11-30")
        .where(F.col("version") == "v1")
        .select("doc_id", "ts", F.col("v").cast("long").alias("vm"))
        .cache()
    )
    in_dir = str(tmp_path / "in_c")
    ck = str(tmp_path / "ck_cusum")
    out_dir = str(tmp_path / "out_cusum")
    early = raw.where(F.col("ts") < "2019-11-01")
    late = raw.where(F.col("ts") >= "2019-11-01")
    early.coalesce(1).write.parquet(in_dir, mode="overwrite")

    TGT, SLK, H = 5000, 300, 20000

    def _run():
        stream = spark.readStream.schema(raw.schema).parquet(in_dir)
        q = (
            stream_cusum(
                stream, key="doc_id", ts_col="ts", micro_col="vm",
                target=TGT, slack=SLK, h=H,
            )
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()
    late.coalesce(1).write.parquet(in_dir, mode="append")
    _run()

    got = {
        (r["doc_id"], str(r["ts"])): (r["s_plus"], r["s_minus"], r["alarm"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        (r["doc_id"], str(r["ts"])): (r["s_plus"], r["s_minus"], r["alarm"])
        for r in page_cusum(
            raw, ["doc_id"], "ts", "vm", target=TGT, slack=SLK, h=H
        ).collect()
    }
    assert got == exp  # bit parity, every row, no caveat
    assert len(got) == raw.count()
    assert any(v[2] == 1 for v in got.values())  # something alarmed

    # whole-file replay: frontier equality-drop keeps output unchanged
    early.coalesce(1).write.parquet(in_dir, mode="append")
    _run()
    assert spark.read.parquet(out_dir).count() == len(exp)
    raw.unpersist()


def test_stream_topk_exact_under_capacity_and_replay(spark, tmp_path):
    """X154 Space-Saving heavy hitters: while distinct items per key fit
    the capacity, every estimate is EXACT with err=0 — pinned against
    batch value counts across a 2-batch split; whole-file replay must
    not double-count (frontier drop)."""
    from c3s_sm_spark.streaming.stateful import stream_topk

    raw = (
        gen_points_raw(spark, 4, start="2019-10-01", end="2019-11-30")
        .where(F.col("version") == "v1")
        .select(
            "doc_id", "ts",
            # small item domain (20 ids) so capacity=64 never evicts
            F.pmod(F.col("v").cast("long"), F.lit(20)).alias("item_id"),
        )
        .cache()
    )
    in_dir = str(tmp_path / "in_t")
    ck = str(tmp_path / "ck_topk")
    out_dir = str(tmp_path / "out_topk")
    early = raw.where(F.col("ts") < "2019-11-01")
    late = raw.where(F.col("ts") >= "2019-11-01")
    early.coalesce(1).write.parquet(in_dir, mode="overwrite")

    def _run():
        stream = spark.readStream.schema(raw.schema).parquet(in_dir)
        q = (
            stream_topk(
                stream, key="doc_id", ts_col="ts", item_col="item_id",
                k=5, capacity=64,
            )
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()
    late.coalesce(1).write.parquet(in_dir, mode="append")
    _run()

    snaps = spark.read.parquet(out_dir)
    # latest snapshot per key = max n_total rows
    latest = (
        snaps.withColumn(
            "mx", F.max("n_total").over(__import__("pyspark").sql.Window.partitionBy("doc_id"))
        )
        .where(F.col("n_total") == F.col("mx"))
    )
    got = {
        (r["doc_id"], r["item"]): (r["est"], r["err"], r["n_total"])
        for r in latest.collect()
    }
    # batch truth: exact counts over the full input, top-5 per key
    exact = (
        raw.groupBy("doc_id", "item_id").count()
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("doc_id")
                .orderBy(F.col("count").desc(), F.col("item_id").asc())
            ),
        )
        .where(F.col("rn") <= 5)
    )
    totals = {r["doc_id"]: r["n"] for r in
              raw.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    want = {
        (r["doc_id"], r["item_id"]): (r["count"], 0, totals[r["doc_id"]])
        for r in exact.collect()
    }
    assert got == want  # exact under capacity, correct totals
    # replay: no double counting
    early.coalesce(1).write.parquet(in_dir, mode="append")
    _run()
    snaps2 = spark.read.parquet(out_dir)
    assert snaps2.agg(F.max("n_total")).head()[0] == max(totals.values())
    raw.unpersist()


def test_stream_topk_eviction_bounds(spark, tmp_path):
    """Over-capacity behavior: estimates overshoot by at most err, and
    a true heavy hitter is tracked."""
    import datetime as dt

    from c3s_sm_spark.streaming.stateful import stream_topk

    # 30 distinct items, capacity 8: item 999 is the planted hitter
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(300):
        item = 999 if i % 3 == 0 else (i % 30)
        rows.append(("k", t0 + dt.timedelta(seconds=i), item))
    df = spark.createDataFrame(rows, "src string, ts timestamp, item_id long")
    in_dir = str(tmp_path / "in_e")
    ck = str(tmp_path / "ck_e")
    out_dir = str(tmp_path / "out_e")
    df.coalesce(1).write.parquet(in_dir, mode="overwrite")
    stream = spark.readStream.schema(df.schema).parquet(in_dir)
    q = (
        stream_topk(stream, key="src", ts_col="ts", item_col="item_id",
                    k=3, capacity=8)
        .writeStream.foreachBatch(
            lambda d, _eid: d.write.mode("append").parquet(out_dir)
        )
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = {r["item"]: r for r in spark.read.parquet(out_dir).collect()}
    assert 999 in out  # the hitter survives eviction pressure
    r = out[999]
    true_c = sum(1 for i in range(300) if i % 3 == 0)
    assert r["est"] >= true_c  # Space-Saving never undercounts
    assert r["est"] - r["err"] <= true_c  # ... and overshoot <= err
    assert r["n_total"] == 300


def test_stream_swi_bit_parity(spark, tmp_path):
    """X155 streaming SWI must be bit-identical to the batch operator
    under a 2-batch split — (swi, gain, last_t) is the exact sufficient
    state of the recurrence."""
    from c3s_sm_spark.operators.timeseries import swi_filter
    from c3s_sm_spark.streaming.stateful import stream_swi

    raw = (
        gen_points_raw(spark, 5, start="2019-10-01", end="2019-11-30")
        .where(F.col("version") == "v1")
        .select("doc_id", "ts", F.col("v").cast("double").alias("value"))
        .cache()
    )
    in_dir = str(tmp_path / "in_s")
    ck = str(tmp_path / "ck_swi")
    out_dir = str(tmp_path / "out_swi")
    early = raw.where(F.col("ts") < "2019-11-01")
    late = raw.where(F.col("ts") >= "2019-11-01")
    early.coalesce(1).write.parquet(in_dir, mode="overwrite")

    def _run():
        stream = spark.readStream.schema(raw.schema).parquet(in_dir)
        q = (
            stream_swi(
                stream, key="doc_id", ts_col="ts", value_col="value",
                ctime_days=5.0,
            )
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()
    late.coalesce(1).write.parquet(in_dir, mode="append")
    _run()

    got = {
        (r["doc_id"], str(r["ts"])): (r["swi"], r["swi_gain"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        (r["doc_id"], str(r["ts"])): (r["swi"], r["swi_gain"])
        for r in swi_filter(raw, ["doc_id"], "ts", "value", ctime_days=5.0).collect()
    }
    assert got == exp  # bit parity, every row
    assert len(got) == raw.count()
    raw.unpersist()


def test_stream_hampel_bit_parity_and_replay(spark, tmp_path):
    """X178 streaming Hampel: emitted rows must be bit-identical to
    the batch hampel_filter (integer decisions, centered window
    buffered until half_window successors arrive); the documented
    divergence is only structural — the last half_window rows per key
    stay pending. Whole-file replay must not re-emit (frontier
    drop)."""
    from c3s_sm_spark.operators.timeseries import hampel_filter
    from c3s_sm_spark.streaming.stateful import stream_hampel

    raw = (
        gen_points_raw(spark, 5, start="2019-10-01", end="2019-11-30")
        .where(F.col("version") == "v1")
        .select("doc_id", "ts", F.col("v").cast("long").alias("vm"))
        .cache()
    )
    H = 3
    in_dir = str(tmp_path / "in_h")
    ck = str(tmp_path / "ck_hampel")
    out_dir = str(tmp_path / "out_hampel")
    early = raw.where(F.col("ts") < "2019-11-01")
    late = raw.where(F.col("ts") >= "2019-11-01")
    early.coalesce(1).write.parquet(in_dir, mode="overwrite")

    def _run():
        stream = spark.readStream.schema(raw.schema).parquet(in_dir)
        q = (
            stream_hampel(
                stream, key="doc_id", ts_col="ts", micro_col="vm",
                half_window=H, k=3,
            )
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run()
    late.coalesce(1).write.parquet(in_dir, mode="append")
    _run()

    got = {
        (r["doc_id"], str(r["ts"])): (
            r["n_win"], r["med2"], r["mad4"], r["is_out"], r["rep2"]
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = hampel_filter(
        raw, ["doc_id"], "ts", "vm", half_window=H, k=3
    ).collect()
    # per-key last H rows are legitimately pending in the stream
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in batch:
        by_key[r["doc_id"]].append(r)
    exp = {}
    pend = 0
    for rows in by_key.values():
        rows.sort(key=lambda r: r["ts"])
        for r in rows[:-H]:
            exp[(r["doc_id"], str(r["ts"]))] = (
                r["n_win"], r["med2"], r["mad4"], r["is_out"], r["rep2"]
            )
        pend += min(H, len(rows))
    assert got == exp  # bit parity on every emitted row
    assert len(got) == raw.count() - pend
    assert any(v[3] == 1 for v in got.values())  # something flagged

    # whole-file replay: nothing re-emitted
    early.coalesce(1).write.parquet(in_dir, mode="append")
    _run()
    assert spark.read.parquet(out_dir).count() == len(exp)
    raw.unpersist()
