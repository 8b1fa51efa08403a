#!/usr/bin/env python
"""Skew evidence: salted vs naive repartition on the Zipf-skewed corpus.

The synth ``source`` column is ~70% "cc" (FIXTURES.md F1). A plain
``repartition("source")`` routes 70% of all rows to ONE task — the
single-writer hot spot the north_rule calls out; salting on
``(source, pmod(xxhash64(doc_id), S))`` fans the hot source over S tasks.
(Simple sum/count aggregations do NOT need this — map-side partial
aggregation already collapses hot keys per task, which is why
``salted_agg`` exists for the collect/writer-shaped paths, not avg.)

Prints one JSON line with both wall times and the hot-partition row
spread; appended per-run to BASELINE.md by hand.

Run: python tools/bench_skew.py [--docs 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from c3s_sm_spark.operators.salting import salted_repartition  # noqa: E402
from c3s_sm_spark.session import get_spark  # noqa: E402
from c3s_sm_spark.synth import gen_sequences, sequences_to_points  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40_000)
    ap.add_argument("--salts", type=int, default=16)
    args = ap.parse_args()
    spark = get_spark(app_name="bench_skew")
    pts = sequences_to_points(gen_sequences(spark, args.docs, n_partitions=128))
    pts.limit(1000).count()  # warm

    import shutil
    import tempfile

    sink_base = "/dev/shm" if os.path.isdir("/dev/shm") else None

    def timed(df) -> float:
        out = tempfile.mkdtemp(prefix="skew_", dir=sink_base)
        t0 = time.perf_counter()
        # a real columnar sink: the hot writer task encodes+compresses its
        # whole partition, so writer skew shows up as wall time (a noop
        # sink hides it)
        df.write.mode("overwrite").parquet(out)
        dt = round(time.perf_counter() - t0, 3)
        shutil.rmtree(out, ignore_errors=True)
        return dt

    naive = pts.repartition(F.col("source"))
    salted = salted_repartition(pts, ["source"], "doc_id", n_salts=args.salts)

    # warm the WRITE path (committer/encoder class-load + JIT) before any
    # timed run, and interleave best-of-2 per variant — the first-timed
    # variant otherwise pays one-time costs, biasing the reported speedup
    timed(pts.limit(50_000).repartition(4))
    t_naive = min(timed(naive), timed(naive))
    t_salted = min(timed(salted), timed(salted))

    spread = (
        salted.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("parts"))
        .head()
    )
    naive_spread = (
        naive.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("parts"))
        .head()
    )
    total = pts.count()
    print(
        json.dumps(
            {
                "n_rows": total,
                "naive_repartition_sec": t_naive,
                "salted_repartition_sec": t_salted,
                "speedup": round(t_naive / t_salted, 2),
                "naive_hot_partition_rows": naive_spread["mx"],
                "naive_hot_fraction": round(naive_spread["mx"] / total, 3),
                "salted_hot_partition_rows": spread["mx"],
                "salted_hot_fraction": round(spread["mx"] / total, 3),
                "n_salts": args.salts,
            }
        )
    )


if __name__ == "__main__":
    main()
