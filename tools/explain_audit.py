#!/usr/bin/env python
"""Physical-plan audit: writes PLANS.md with `.explain("formatted")` for
the engine's load-bearing plans plus automated checks that each plan has
the shape we designed for (filter pushdown reaching the scan, broadcast
on dimension sides, whole-stage codegen spans, partial aggregation).

Run: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from c3s_sm_spark.operators.calendar import temporal_grid  # noqa: E402
from c3s_sm_spark.operators.dedup import keep_latest  # noqa: E402
from c3s_sm_spark.operators.gapfill import gap_fill  # noqa: E402
from c3s_sm_spark.operators.rollup import cascade, rollup  # noqa: E402
from c3s_sm_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="explain_audit", master="local[4]")
    ev = spark.read.parquet(f"{SF}/events.parquet")

    sections: list[tuple[str, str, dict[str, bool]]] = []

    def audit(name: str, df, want: dict[str, str], extra=None) -> None:
        txt = plan_text(df)
        checks = {label: (needle in txt) for label, needle in want.items()}
        if extra:
            checks.update(extra(txt))
        sections.append((name, txt, checks))

    # 1. filter + projection pushdown into the parquet scan
    q = ev.where(
        (F.col("event_type") == "click") & (F.col("ts") > "2024-01-10")
    ).select("user_id", "value")
    audit(
        "predicate + column pushdown (P1/P4)",
        q,
        {
            "filters pushed to scan": "PushedFilters: [IsNotNull(event_type)",
            "only needed cols read": "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint,event_type:string,value:double>",
            "whole-stage codegen": "codegen id",
        },
    )

    # 2. daily rollup: partial (map-side) + final hash aggregate
    daily = rollup(
        ev.select(
            F.col("user_id").alias("doc_id"), "ts", F.col("value").alias("v")
        ),
        ["doc_id"],
        "ts",
        "daily",
        flag_col=None,
    )
    audit(
        "daily rollup (A1/A2): partial+final hash agg",
        daily,
        {
            "map-side partial agg": "partial_sum",
            "hash aggregate": "HashAggregate",
        },
        extra=lambda txt: {"single shuffle": txt.count("Exchange (") == 1},
    )

    # 3. cascade dekadal <- daily: agg on the (already tiny) daily tier
    audit(
        "dekadal cascade (R1)",
        cascade(daily, ["doc_id"], "dekadal"),
        {"hash aggregate": "HashAggregate", "partial agg": "partial_sum"},
    )

    # 4. gap-fill: calendar side broadcast, fact side not reshuffled
    filled = gap_fill(daily, ["doc_id"], "ts", "daily", "2024-01-01", "2024-03-31")
    audit(
        "gap-fill (J3): broadcast calendar x keys, left outer join",
        filled,
        {
            "calendar broadcast": "BroadcastExchange",
            "left outer join": "LeftOuter",
        },
    )

    # 5. dedup keep-latest: single shuffle ranking window
    dd = keep_latest(ev, ["user_id", "event_type"], ["ts", "event_id"])
    audit(
        "keep-latest dedup (J5/W2): one shuffle + window",
        dd,
        {
            "map-side top-1 pruning before shuffle": "row_number(), 1, Partial",
            "window group limit": "WindowGroupLimit",
        },
        extra=lambda txt: {"single shuffle": txt.count("Exchange (") == 1},
    )

    # 6. token_freq top-k: TakeOrderedAndProject (per-partition top-50
    # then merge), never a global single-partition rank window
    import __spark_entry__ as E

    tf = E._q_token_freq(spark, SF)
    tf_txt = plan_text(tf)
    sections.append(
        (
            "token_freq top-k: partial top-50, no global sort",
            tf_txt,
            {
                "TakeOrderedAndProject": "TakeOrderedAndProject" in tf_txt,
                # the only window left ranks the 50 surviving rows AFTER
                # the limit, never the full token relation
                "no pre-limit global window": tf_txt.index("TakeOrderedAndProject")
                > tf_txt.index("Window")
                if "Window" in tf_txt
                else True,
            },
        )
    )

    # 7. nearest_join k=1: map-side partial min_by, no window over the
    # expanded cross product
    ns = E._q_nearest_station(spark, SF)
    ns_txt = plan_text(ns)
    sections.append(
        (
            "nearest_join k=1 (J1): partial min_by aggregation",
            ns_txt,
            {
                "map-side partial min_by": "partial_min_by" in ns_txt,
                "no rank window": "row_number" not in ns_txt,
            },
        )
    )

    # 8. pure-projection text filters: single codegen span, NO exchange
    rep = E._q_repetition(spark, SF)
    rep_txt = plan_text(rep)
    sections.append(
        (
            "repetition / pattern filters: projection-only, shuffle-free",
            rep_txt,
            {
                "no exchange": "Exchange" not in rep_txt,
                "whole-stage codegen": "codegen id" in rep_txt,
            },
        )
    )

    # 9. deterministic sampling: predicate + single agg exchange only
    sm = E._q_sample_mix(spark, SF)
    sm_txt = plan_text(sm)
    sections.append(
        (
            "sample_mix: hash-cut predicate, one agg shuffle",
            sm_txt,
            {
                "single exchange": sm_txt.count("Exchange (") == 1,
                "map-side partial agg": "partial_count" in sm_txt
                or "partial_sum" in sm_txt,
            },
        )
    )

    # 10. temporal grid: generated relation, no scan at all
    grid_txt = plan_text(temporal_grid(spark, "dekadal", "2024-01-01", "2024-12-31"))
    sections.append(
        (
            "temporal grid (S4): generated, scan-free",
            grid_txt,
            {
                "no file scan": "Scan parquet" not in grid_txt,
                "generated from Range": "Range" in grid_txt,
            },
        )
    )

    # 11. pack member scan: tier tables are (pmonth, kb)-partitioned and
    # pack_tier's bucket repack filters on kb — the predicate must land
    # in the scan's PartitionFilters (file-listing-time pruning: only the
    # touched buckets' files are ever opened), not as a row filter
    import re
    import shutil
    import tempfile

    from c3s_sm_spark.plans.pipeline import TierPipeline
    from c3s_sm_spark.synth import gen_points_raw

    base = tempfile.mkdtemp(prefix="audit_tiers_")
    try:
        p = TierPipeline(spark, base)
        p.ingest(gen_points_raw(spark, 12, start="2019-10-01", end="2019-11-30"))
        p.refresh(["daily"])
        member = p.tiers["daily"].read(spark).where(F.col("kb").isin([0, 1, 2]))
        mtxt = plan_text(member)
        sections.append(
            (
                "pack-bucket-prune: (pmonth, kb) tier layout, kb IN-list prunes at file listing (pack_tier)",
                mtxt,
                {
                    "kb predicate in PartitionFilters": bool(
                        re.search(r"PartitionFilters: \[[^\]]*kb", mtxt)
                    ),
                    "kb not a data filter": "PushedFilters: [In(kb" not in mtxt,
                },
            )
        )

        # 12. packed point read: bucket partition-prunes at file listing,
        # doc_id + (ts_min, ts_max) sidecar predicates push into the
        # parquet scan so whole blobs are dropped BEFORE the Python
        # decode (unpack_series' MapInPandas) sees a row
        p.pack_tier("daily")
        pr = p.point_read(
            "doc0000000003", "daily", start="2019-10-15", end="2019-11-15"
        )
        pr_txt = plan_text(pr)
        sections.append(
            (
                "packed point read (S5): bucket prune + sidecar min/max pushdown before decode",
                pr_txt,
                {
                    "bucket in PartitionFilters": bool(
                        re.search(r"PartitionFilters: \[[^\]]*bucket", pr_txt)
                    ),
                    "doc_id pushed to scan": bool(
                        re.search(r"PushedFilters: \[[^\]]*EqualTo\(doc_id", pr_txt)
                    ),
                    "ts sidecar pushed to scan": "ts_max" in pr_txt.split("PushedFilters")[1].split("]")[0]
                    if "PushedFilters" in pr_txt
                    else False,
                    "decode after filters (MapInPandas present)": "MapInPandas" in pr_txt,
                },
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    out = ["# PLANS — physical-plan audit (generated by tools/explain_audit.py)\n"]
    ok_all = True
    for name, txt, checks in sections:
        out.append(f"\n## {name}\n")
        for label, ok in checks.items():
            ok_all &= bool(ok)
            out.append(f"- [{'x' if ok else ' '}] {label}\n")
        out.append("\n```\n" + txt.strip() + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.writelines(out)
    print("PLANS.md written;", "ALL CHECKS PASS" if ok_all else "SOME CHECKS FAILED")
    return 0 if ok_all else 1  # gate-usable: non-zero on plan regressions


if __name__ == "__main__":
    raise SystemExit(main())
