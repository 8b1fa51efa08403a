"""Stateful streaming gap detector: gaps inside a batch, across batches,
and idempotence on replayed days."""

from __future__ import annotations

from datetime import datetime

from c3s_sm_spark.streaming.frontier import track_frontier_gaps


def _run_stream(spark, tmp_path, batches):
    """Feed parquet file batches through the stateful op; return gap rows."""
    in_dir = str(tmp_path / "in")
    schema = "doc_id string, ts timestamp"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    gaps = track_frontier_gaps(stream)
    q = (
        gaps.writeStream.format("memory")
        .queryName(f"gaps_{tmp_path.name}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from gaps_{tmp_path.name}").collect()


def _d(s):
    return datetime.fromisoformat(s)


def test_gap_inside_batch(spark, tmp_path):
    rows = [("k1", _d("2024-01-01")), ("k1", _d("2024-01-02")), ("k1", _d("2024-01-05"))]
    gaps = _run_stream(spark, tmp_path, [rows])
    assert len(gaps) == 1
    g = gaps[0]
    assert str(g["gap_start"]).startswith("2024-01-03")
    assert str(g["gap_end"]).startswith("2024-01-04")
    assert g["n_missing_days"] == 2


def test_gap_across_batches_and_replay_idempotent(spark, tmp_path):
    b1 = [("k1", _d("2024-01-01")), ("k1", _d("2024-01-02"))]
    # batch 2 jumps to Jan 6 (gap 3-5) and REPLAYS Jan 2 (must not re-gap)
    b2 = [("k1", _d("2024-01-06")), ("k1", _d("2024-01-02"))]
    # batch 3 contiguous -> no new gaps
    b3 = [("k1", _d("2024-01-07")), ("k2", _d("2024-02-01"))]
    gaps = _run_stream(spark, tmp_path, [b1, b2, b3])
    assert len(gaps) == 1
    g = gaps[0]
    assert g["doc_id"] == "k1"
    assert str(g["gap_start"]).startswith("2024-01-03")
    assert str(g["gap_end"]).startswith("2024-01-05")
    assert g["n_missing_days"] == 3


def test_frontier_ignores_null_timestamps(spark, tmp_path):
    """A null ts in a batch must not poison the frontier (NaT used to
    reach np.arange and kill the query; an all-null fresh-key batch
    used to IndexError)."""
    import pandas as pd

    from c3s_sm_spark.streaming.frontier import track_frontier_gaps

    src = tmp_path / "src"
    chk = str(tmp_path / "chk")
    rows = pd.DataFrame(
        {
            "doc_id": ["a", "a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01", None, "2024-01-04", pd.NaT]
            ),
        }
    )
    spark.createDataFrame(rows).write.parquet(str(src))
    stream = spark.readStream.schema("doc_id string, ts timestamp").parquet(
        str(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        track_frontier_gaps(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    # key a: gap (Jan 2 - Jan 3); key b (all-null): silently ignored
    assert len(got) == 1
    assert got[0]["doc_id"] == "a" and got[0]["n_missing_days"] == 2
