#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its ``oracle_sql()``
DuckDB twin at sf0.01 (or ``$SPARK_GRAFT_SF_DIR``), compares row count,
column set, and an order/column-order-insensitive value hash (floats
rounded to 4 decimals — same tolerance as the queries themselves emit).

The DuckDB result is materialized BOTH ways — ``fetch_arrow_table()``
(Arrow: HUGEINT -> Decimal) and ``fetchdf()`` (pandas: HUGEINT ->
float64, which is what the driver's gate sees) — and a query only
passes if Spark matches BOTH. Rationale (r3 post-mortem): an uncast
DuckDB ``sum(BIGINT)`` goes HUGEINT; the Arrow path rendered it as the
matching integer while the driver's pandas path rendered ``X.0``, so
this mirror stayed green for two rounds while the driver gate was red.
The mirror must be the stricter of the two materializations.

Usage: python tools/oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from c3s_sm_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows: list[dict], cols: list[str]) -> str:
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            # floats: round to the gate tolerance. pandas materializes
            # SQL NULL in a float column as NaN; the driver's gate
            # normalizes that back to null (its pandas-path rows with
            # NULLs pass), so canonicalize NaN -> "None" to match. The
            # HUGEINT catch is unaffected: a genuine integer rendered
            # float64 still stringifies "X.0" vs Spark's "X".
            if isinstance(v, float):
                v = "None" if math.isnan(v) else round(v, 4)
            vals.append(str(v))
        out.append("|".join(vals))
    return hashlib.md5("\n".join(sorted(out)).encode()).hexdigest()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or list(qs)
    fails = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(srows)}")
            continue
        # Arrow materialization (exact types: HUGEINT -> Decimal)
        orc = con.execute(oracles[name]).fetch_arrow_table()
        a_rows, ocols = orc.to_pylist(), orc.column_names
        # pandas materialization (the driver gate's path: HUGEINT -> float64)
        p_rows = con.execute(oracles[name]).fetchdf().to_dict("records")
        ok_n = len(srows) == len(a_rows) == len(p_rows)
        ok_c = sorted(scols) == sorted(ocols)
        s_h = canon(srows, scols) if ok_c else None
        ok_arrow = ok_n and ok_c and s_h == canon(a_rows, ocols)
        ok_pandas = ok_n and ok_c and s_h == canon(p_rows, ocols)
        if ok_arrow and ok_pandas:
            print(f"{name:22s} OK ({len(srows)} rows)")
        else:
            fails.append(name)
            print(
                f"{name:22s} FAIL n={ok_n}({len(srows)}/{len(a_rows)}) "
                f"cols={ok_c} arrow={ok_arrow} pandas={ok_pandas}"
                + ("  <-- materialization-dependent oracle typing"
                   if ok_arrow != ok_pandas else "")
            )
            if not ok_c:
                print(f"  spark cols:  {sorted(scols)}")
                print(f"  oracle cols: {sorted(ocols)}")
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
