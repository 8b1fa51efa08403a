#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its ``oracle_sql()``
DuckDB twin at sf0.01 (or ``$SPARK_GRAFT_SF_DIR``), compares row count,
column set, and an order/column-order-insensitive value hash (floats
rounded to 4 decimals — same tolerance as the queries themselves emit).

Usage: python tools/oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
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
            if isinstance(v, float):
                v = round(v, 4)
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
        orc = con.execute(oracles[name]).fetch_arrow_table()
        orows, ocols = orc.to_pylist(), orc.column_names
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_h = ok_n and ok_c and canon(srows, scols) == canon(orows, ocols)
        if ok_h:
            print(f"{name:22s} OK ({len(srows)} rows)")
        else:
            fails.append(name)
            print(
                f"{name:22s} FAIL n={ok_n}({len(srows)}/{len(orows)}) "
                f"cols={ok_c} hash={ok_h}"
            )
            if not ok_c:
                print(f"  spark cols:  {sorted(scols)}")
                print(f"  oracle cols: {sorted(ocols)}")
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
