"""CLI-vs-API parity for the corpus-preparation job (same pattern as
test_cli_parity.py: the subprocess CLI must reproduce the in-process
API stage-for-stage on identical input)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run_cli(out: str) -> dict:
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "pipeline", "--chunk-tokens", "64", "--budget", "512",
      "--min-tokens", "2"])
"""
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    stages = {}
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            stages[d["stage"]] = d
    return stages


def test_corpus_cli_pipeline_parity(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stages = _run_cli(out)
    assert set(stages) == {"stats", "filter", "dedup", "chunk", "pack"}

    from c3s_sm_spark.operators.dedup_text import dedup_corpus
    from c3s_sm_spark.operators.textstats import (
        chunk_documents,
        quality_score,
        words_col,
    )

    docs = spark.read.parquet(DOCS)
    # filter stage: same predicate in-process
    q = quality_score(docs).select("doc_id", "n_tokens")
    kept_api = docs.join(q, "doc_id").filter(F.col("n_tokens") >= 2)
    assert stages["filter"]["n_kept"] == kept_api.count()

    # dedup stage: survivor COUNT matches the in-process composition on
    # the filtered corpus (the survivor set itself is deterministic)
    deduped_cli = spark.read.parquet(stages["dedup"]["path"])
    api_survivors = dedup_corpus(
        kept_api.drop("n_tokens"), k=2, verify_threshold=0.5
    )
    assert {r["doc_id"] for r in deduped_cli.select("doc_id").collect()} == {
        r["doc_id"] for r in api_survivors.select("doc_id").collect()
    }

    # chunk stage: parquet rows == in-process chunking of the deduped set
    chunks_cli = spark.read.parquet(stages["chunk"]["path"])
    chunks_api = chunk_documents(deduped_cli, chunk_tokens=64)
    assert chunks_cli.count() == stages["chunk"]["n_chunks"]
    assert (
        chunks_cli.select("doc_id", "chunk_id", "chunk_text")
        .exceptAll(chunks_api.select("doc_id", "chunk_id", "chunk_text"))
        .isEmpty()
    )
    # token conservation: chunk totals equal the deduped corpus totals
    total_api = deduped_cli.select(
        F.sum(F.size(words_col("text"))).alias("t")
    ).head()["t"]
    assert stages["chunk"]["total_tokens"] == total_api

    # pack stage: bin_id = floor(stream_prefix / budget), so a chunk
    # straddling a boundary may push its bin past the budget by at most
    # chunk_tokens - 1; the exclusive offset itself always sits inside
    packed = spark.read.parquet(stages["pack"]["path"])
    assert packed.filter(
        (F.col("pos_in_bin") < 0) | (F.col("pos_in_bin") >= 512)
    ).isEmpty()
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")
    )
    assert per_bin.filter(F.col("t") > 512 + 63).isEmpty()
    assert stages["pack"]["n_bins"] == per_bin.count()
    assert stages["pack"]["n_rows"] == stages["chunk"]["n_chunks"]


def test_corpus_cli_resume_skips_completed_stages(spark, tmp_path):
    """pipeline --skip-existing: a resumed run skips stages whose
    _SUCCESS marker exists and still chains outputs correctly."""
    out = str(tmp_path / "resume")
    code_tpl = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "pipeline", "--chunk-tokens", "64", "--budget", "512",
      "--skip-existing"])
"""
    first = subprocess.run(
        [sys.executable, "-c", code_tpl],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert first.returncode == 0, first.stderr[-3000:]
    # simulate a crash after dedup: remove the chunk + pack outputs
    import shutil
    shutil.rmtree(os.path.join(out, "chunks"))
    shutil.rmtree(os.path.join(out, "packed"))
    second = subprocess.run(
        [sys.executable, "-c", code_tpl],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert second.returncode == 0, second.stderr[-3000:]
    lines = [json.loads(ln) for ln in second.stdout.splitlines()
             if ln.strip().startswith("{")]
    by = {d["stage"]: d for d in lines}
    assert by["stats"].get("skipped") and by["filter"].get("skipped")
    assert by["dedup"].get("skipped")
    assert "skipped" not in by["chunk"] and "skipped" not in by["pack"]
    # the rebuilt chunk stage consumed the SKIPPED dedup output
    n_dedup = spark.read.parquet(os.path.join(out, "deduped")).count()
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.select("doc_id").distinct().count() <= n_dedup
    assert chunks.count() == by["chunk"]["n_chunks"]


def test_corpus_cli_clean_stage_composes(spark, tmp_path):
    """--strip-spans inserts the span-dedup stage between dedup and
    chunk; chunk totals must equal the CLEANED corpus (kept tokens =
    deduped tokens - tokens_removed)."""
    out = str(tmp_path / "clean")
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "pipeline", "--chunk-tokens", "64", "--budget", "512",
      "--strip-spans", "--span-k", "4"])
"""
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    by = {
        json.loads(ln)["stage"]: json.loads(ln)
        for ln in res.stdout.splitlines() if ln.strip().startswith("{")
    }
    assert set(by) == {"stats", "filter", "dedup", "clean", "chunk", "pack"}
    from c3s_sm_spark.operators.textstats import words_col

    deduped_tokens = (
        spark.read.parquet(by["dedup"]["path"])
        .select(F.sum(F.size(words_col("text"))).alias("t")).head()["t"]
    )
    assert (
        by["chunk"]["total_tokens"]
        == deduped_tokens - by["clean"]["tokens_removed"]
    )
    assert by["clean"]["tokens_removed"] > 0


def test_corpus_cli_resume_invalidates_stale_downstream(spark, tmp_path):
    """If an upstream stage re-runs, downstream _SUCCESS markers from
    the earlier run are STALE and must not be skipped — otherwise the
    final output silently mixes old intermediates with new upstream."""
    out = str(tmp_path / "stale")
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "pipeline", "--chunk-tokens", "64", "--budget", "512",
      "--skip-existing"])
"""
    first = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert first.returncode == 0, first.stderr[-3000:]
    # crash scenario: dedup output lost, downstream outputs intact
    import shutil
    shutil.rmtree(os.path.join(out, "deduped"))
    second = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert second.returncode == 0, second.stderr[-3000:]
    by = {
        json.loads(ln)["stage"]: json.loads(ln)
        for ln in second.stdout.splitlines() if ln.strip().startswith("{")
    }
    assert by["stats"].get("skipped") and by["filter"].get("skipped")
    # dedup re-ran, so chunk and pack must have re-run too
    for stage in ("dedup", "chunk", "pack"):
        assert "skipped" not in by[stage], stage


def test_corpus_cli_merges_parity(spark, tmp_path):
    """The merges subcommand must emit exactly the in-process
    phrase_merge_train table for the same flags."""
    out = str(tmp_path / "m")
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "merges", "--n-merges", "4", "--min-count", "5"])
"""
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    got = None
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("stage") == "merges":
                got = d["rows"]
    assert got is not None

    from c3s_sm_spark.operators.textstats import phrase_merge_train

    docs = spark.read.parquet(DOCS)
    want = [
        r.asDict()
        for r in phrase_merge_train(docs, n_merges=4, min_count=5)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want
    assert len(got) == 4


def test_corpus_cli_mix_parity(spark, tmp_path):
    """The mix subcommand must emit exactly the in-process
    waterfill_alloc plan for the same weights/budget, including a
    weighted source and the budget-fraction arithmetic."""
    out = str(tmp_path / "mx")
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "mix", "--weights", '{{"src1": 9}}', "--budget-frac", "0.4"])
"""
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    got = None
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("stage") == "mix":
                got = d
    assert got is not None

    from c3s_sm_spark.operators.sampling import waterfill_alloc
    from c3s_sm_spark.operators.textstats import words_col

    per_src = (
        spark.read.parquet(DOCS)
        .groupBy("source")
        .agg(F.sum(F.size(words_col("text"))).cast("long").alias("a"))
        .withColumn(
            "w",
            F.when(F.col("source") == "src1", 9).otherwise(1).cast("long"),
        )
    )
    total = per_src.agg(F.sum("a")).collect()[0][0]
    budget = total * 2 // 5
    assert got["budget"] == budget
    want = [
        r.asDict()
        for r in waterfill_alloc(per_src, "source", "a", "w", budget)
        .orderBy("source")
        .collect()
    ]
    assert got["rows"] == want
    # the weighted source grabs more than an unweighted sibling
    by = {r["source"]: r for r in want}
    assert by["src1"]["alloc"] >= by["src0"]["alloc"]


def test_cli_split_and_audit(tmp_path, spark):
    # split: CLI assignment must equal the in-process API on the same
    # input, and the hive layout must read back disjoint+exhaustive
    out = str(tmp_path / "cli_sa")
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.corpus_job import main
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "split", "--val", "0.15", "--test", "0.05"])
main(["--input", {DOCS!r}, "--out", {out!r}, "--master", "local[4]",
      "audit"])
"""
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    stages = {}
    for line in res.stdout.splitlines():
        if line.strip().startswith("{"):
            d = json.loads(line)
            stages[d["stage"]] = d
    from c3s_sm_spark.operators.sampling import assign_splits

    api = {
        r["split"]: r["n"]
        for r in assign_splits(
            spark.read.parquet(DOCS),
            "doc_id",
            [("train", 0.8), ("val", 0.15), ("test", 0.05)],
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert stages["split"]["counts"] == api
    back = spark.read.parquet(stages["split"]["out"])
    assert back.count() == sum(api.values())
    assert set(r["split"] for r in back.select("split").distinct().collect()) == set(api)
    # audit card carries all four sections with sane shapes
    card = stages["audit"]
    assert set(card["normalization"]) == {"raw", "ws", "lower_ws", "alnum"}
    assert len(card["group_diversity"]) == 20
    assert 0.0 <= card["char_mass_gini"] <= 1.0
    assert card["cross_group_leaks"] == []  # sf0.001 is leak-free
