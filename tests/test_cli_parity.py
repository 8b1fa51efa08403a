"""CLI-vs-API parity (the reference's test pattern: every reshuffle test
runs twice, python API vs CLI subprocess —
``/root/reference/tests/test_reshuffle.py:32-33,95-97``).

The CLI subprocess builds a pipeline from the same deterministic synth
input as the in-process API; tiers must match row-for-row.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from c3s_sm_spark.plans.pipeline import TierPipeline
from c3s_sm_spark.synth import gen_sequences, sequences_to_points

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = 60


def _run_cli(base: str) -> list[str]:
    """synth + rollup + status + read in ONE subprocess JVM."""
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from jobs.rollup_job import main
main(["--base", {base!r}, "--master", "local[4]", "synth", "--docs", "{DOCS}"])
main(["--base", {base!r}, "--master", "local[4]", "rollup"])
main(["--base", {base!r}, "--master", "local[4]", "status"])
main(["--base", {base!r}, "--master", "local[4]", "read",
      "--key", "doc0000000003", "--tier", "monthly", "--limit", "100"])
main(["--base", {base!r}, "--master", "local[4]", "retention",
      "--keep", "raw=1", "--as-of", "2019-12"])
main(["--base", {base!r}, "--master", "local[4]", "maintain",
      "--keep-snapshots", "2"])
main(["--base", {base!r}, "--master", "local[4]", "pack", "--tier", "daily"])
main(["--base", {base!r}, "--master", "local[4]", "status"])
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return [l for l in out.stdout.splitlines() if l.startswith("{")]


def test_cli_matches_api(spark, tmp_path):
    cli_lines = _run_cli(str(tmp_path / "cli"))
    # line 0: synth, 1: rollup report, 2: status, 3+: read rows
    report = json.loads(cli_lines[1])
    assert report["daily"]["rows"] > 0
    status = json.loads(cli_lines[2])
    assert set(status["tiers"]) == {"daily", "dekadal", "monthly"}
    # tail: retention, maintain, pack, then a final status whose packed
    # section reports the freshly-packed daily tier (r5 LSM view)
    status2 = json.loads(cli_lines[-1])
    assert status2["packed"]["daily"]["stale"] is False
    assert status2["packed"]["daily"]["mode"] == "full"
    assert status2["packed"]["daily"]["masked_months"] == []
    assert status2["packed"]["daily"]["fold_pressure"] == 0.0
    pack_line = json.loads(cli_lines[-2])
    assert pack_line["tier"] == "daily" and pack_line["snapshot"]
    maintain = json.loads(cli_lines[-3])
    # maintain also reports the bookkeeping tables it maintains
    # (lineage/metrics squash, packed expiry) when they exist
    assert {"raw", "daily", "dekadal", "monthly"} <= set(maintain)
    retention = json.loads(cli_lines[-4])
    assert retention["raw"]["dropped_months"] >= 1  # 2019-10/11 aged out
    read_rows = [json.loads(l) for l in cli_lines[3:-4]]
    assert read_rows

    # API path on the same deterministic input
    p = TierPipeline(spark, str(tmp_path / "api"))
    p.ingest(sequences_to_points(gen_sequences(spark, DOCS)))
    p.refresh()
    api_rows = (
        p.read_tier("monthly")
        .where(F.col("doc_id") == "doc0000000003")
        .orderBy("ts")
        .collect()
    )
    assert len(api_rows) == len(read_rows)
    # point_read projects the packed-path schema (doc_id, ts, v_mean)
    # on BOTH paths — nobs/flags live on read_tier, not the point read
    for cli_r, api_r in zip(read_rows, api_rows):
        assert cli_r["ts"] == str(api_r["ts"])
        assert float(cli_r["v_mean"]) == api_r["v_mean"]
        assert set(cli_r) == {"doc_id", "ts", "v_mean"}


def test_spark_submit_py_files_launch(tmp_path):
    """The north-rule launch mode: ``spark-submit --py-files pkg.zip
    jobs/rollup_job.py`` in a clean cwd — the package must resolve from
    the shipped zip on driver AND executors (pandas-UDF closures
    deserialize module functions worker-side)."""
    import shutil
    import zipfile

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    zpath = str(tmp_path / "c3s_sm_spark.zip")
    pkg = os.path.join(REPO, "c3s_sm_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _d, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    base = str(tmp_path / "tiers")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "rollup_job.py"),
            "--base", base,
            "synth", "--docs", "40",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo: only the zip provides the pkg
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert any(l.startswith("{") for l in out.stdout.splitlines())
    out2 = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "rollup_job.py"),
            "--base", base,
            "rollup",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    report = json.loads(
        [l for l in out2.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["daily"]["rows"] > 0
