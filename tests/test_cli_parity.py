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
    read_rows = [json.loads(l) for l in cli_lines[3:]]
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
    for cli_r, api_r in zip(read_rows, api_rows):
        assert cli_r["ts"] == str(api_r["ts"])
        assert float(cli_r["v_mean"]) == api_r["v_mean"]
        assert int(cli_r["nobs"]) == api_r["nobs"]
