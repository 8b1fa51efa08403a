#!/usr/bin/env python
"""spark-submit entry point for the training-corpus preparation pipeline.

The token-side sibling of ``jobs/rollup_job.py``: where that job runs the
reference-shaped tier cascade, this one runs the corpus stages a
training-data pipeline performs on a raw documents table —

    stats    per-doc token/quality/lang/pattern profile -> parquet + JSON
    filter   quality gate (min quality / token bounds / lang) -> parquet
    dedup    near-dup removal (MinHash-LSH default, --exact for
             n-gram-Jaccard pairs) -> surviving docs parquet
    clean    span-level exact-substring dedup (Lee et al. ExactSubstr:
             corpus-repeated spans removed in place) -> parquet
    chunk    context-window chunking (fixed tokens + stride) -> parquet
    pack     two-phase-scan sequence packing of chunks into fixed
             token-budget bins -> parquet
    curve    vocabulary-growth curve (exact, or --hll sketch) -> JSON rows
    drift    token-distribution drift between two sources -> JSON rows
    mix      token-budget waterfilling plan across sources -> JSON rows
    split    deterministic hash-range train/val/test assignment ->
             split-partitioned parquet + JSON summary with the cuts
    audit    one-shot dataset card (normalization-dedup ladder, per-
             group diversity pieces, char-mass Gini, cross-group
             exact-dup leakage) -> JSON
    pipeline stats -> filter -> dedup -> chunk -> pack in one run

Every stage reads/writes plain parquet directories under ``--out`` so
stages compose across separate spark-submit invocations (each stage is
idempotent: pure overwrite of its own output directory). ``pipeline
--skip-existing`` resumes a crashed run: a stage whose output directory
already holds a parquet `_SUCCESS` marker is skipped and its output fed
to the next stage — rerunning after a mid-pipeline failure redoes only
the unfinished stages (the reference's extend-from-high-water-mark
pattern, at stage granularity). Cluster launch::

    spark-submit --py-files dist/c3s_sm_spark.zip jobs/corpus_job.py \
        --input /data/documents --out /data/corpus pipeline

Local (this sandbox)::

    python jobs/corpus_job.py --input /root/testdata/sf0.001/documents.parquet \
        --out /tmp/corpus pipeline --chunk-tokens 64 --budget 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from c3s_sm_spark.session import get_spark, ship_package  # noqa: E402


def _spark(args) -> SparkSession:
    s = get_spark(app_name=f"corpus_job:{args.cmd}", master=args.master)
    ship_package(s)
    return s


def _docs(spark: SparkSession, args) -> DataFrame:
    return spark.read.parquet(args.input)


def _emit(payload: dict) -> None:
    print(json.dumps(payload, sort_keys=True))


def _write(df: DataFrame, out: str, name: str) -> str:
    """Overwrite-write a stage output. Post-write summaries below read
    the WRITTEN parquet back rather than re-aggregating the input frame
    — counting the original plan would re-execute the whole stage (the
    dedup stage would run its LSH pipeline twice), while a count on the
    written files is parquet-footer metadata, near-free."""
    path = os.path.join(out, name)
    df.write.mode("overwrite").parquet(path)
    return path


def cmd_stats(spark: SparkSession, args) -> str:
    from c3s_sm_spark.operators.textstats import (
        lang_id,
        pattern_counts,
        quality_score,
        token_stats,
    )

    docs = _docs(spark, args)
    prof = (
        token_stats(docs)
        .join(quality_score(docs).select("doc_id", "quality"), "doc_id")
        .join(lang_id(docs).select("doc_id", "lang_pred"), "doc_id")
        .join(pattern_counts(docs).select("doc_id", "n_urls", "digit_ratio"),
              "doc_id")
    )
    path = _write(prof, args.out, "stats")
    agg = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    ).head()
    _emit({"stage": "stats", "path": path, "n_docs": agg["n_docs"],
           "total_tokens": agg["total_tokens"],
           "mean_quality": agg["mean_quality"]})
    return path


def cmd_filter(spark: SparkSession, args) -> str:
    from c3s_sm_spark.operators.textstats import quality_score

    docs = _docs(spark, args)
    q = quality_score(docs).select("doc_id", "quality", "n_tokens")
    kept = (
        docs.join(q, "doc_id")
        .filter(
            (F.col("quality") >= args.min_quality)
            & (F.col("n_tokens") >= args.min_tokens)
            & (F.col("n_tokens") <= args.max_tokens)
        )
        .drop("quality", "n_tokens")
    )
    path = _write(kept, args.out, "filtered")
    _emit({"stage": "filter", "path": path, "n_in": docs.count(),
           "n_kept": spark.read.parquet(path).count()})
    return path


def cmd_dedup(spark: SparkSession, args) -> str:
    from c3s_sm_spark.operators.dedup_text import (
        dedup_corpus,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, args)
    pairs = None
    if args.exact:
        pairs = ngram_jaccard_pairs(
            docs, k=args.shingle_k, threshold=args.threshold
        ).select("a", "b")
    kept = dedup_corpus(
        docs, k=args.shingle_k, verify_threshold=args.threshold, pairs=pairs
    )
    path = _write(kept, args.out, "deduped")
    _emit({"stage": "dedup", "path": path, "exact": bool(args.exact),
           "n_in": docs.count(),
           "n_kept": spark.read.parquet(path).count()})
    return path


def cmd_clean(spark: SparkSession, args) -> str:
    """Span-level exact-substring dedup (Lee et al. order: AFTER
    whole-doc dedup, BEFORE chunking — boilerplate spans survive doc
    dedup and would otherwise replicate into many chunks). Docs with
    zero tokens pass through unchanged (the operator emits only docs
    with >= 1 token; a cleaning stage must not lose rows), via an anti
    join — never a second corpus-wide join for columns the operator
    can carry itself."""
    from c3s_sm_spark.operators.dedup_text import strip_duplicate_spans

    docs = _docs(spark, args)
    carry = [c for c in ("source",) if c in docs.columns]
    cleaned = strip_duplicate_spans(
        docs, k=args.span_k, min_count=args.span_min_count,
        hash_shingles=True, carry_cols=carry,
    )
    out_df = cleaned.select(
        "doc_id", F.col("clean_text").alias("text"), *carry, "n_removed"
    )
    tokenless = docs.join(
        cleaned.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", "text", *carry, F.lit(0).cast("long").alias("n_removed"))
    path = _write(out_df.unionByName(tokenless), args.out, "cleaned")
    agg = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed").alias("tokens_removed"),
    ).head()
    _emit({"stage": "clean", "path": path, "n_docs": agg["n_docs"],
           "tokens_removed": agg["tokens_removed"]})
    return path


def cmd_chunk(spark: SparkSession, args) -> str:
    from c3s_sm_spark.operators.textstats import chunk_documents

    docs = _docs(spark, args)
    chunks = chunk_documents(
        docs,
        chunk_tokens=args.chunk_tokens,
        stride=args.stride,
        carry_cols=[c for c in ("source",) if c in docs.columns],
    )
    path = _write(chunks, args.out, "chunks")
    agg = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
    ).head()
    _emit({"stage": "chunk", "path": path, "n_chunks": agg["n_chunks"],
           "total_tokens": agg["total_tokens"]})
    return path


def cmd_pack(spark: SparkSession, args) -> str:
    from c3s_sm_spark.operators.sampling import pack_sequences

    chunks = spark.read.parquet(args.input)
    # pack needs one sortable id per row; chunks carry (doc_id, chunk_id)
    keyed = chunks.withColumn(
        "chunk_uid",
        F.concat_ws(
            "#", F.col("doc_id").cast("string"),
            F.lpad(F.col("chunk_id").cast("string"), 6, "0"),
        ),
    )
    packed = pack_sequences(
        keyed, budget=args.budget, token_col="n_tokens", id_col="chunk_uid"
    )
    path = _write(packed, args.out, "packed")
    written = spark.read.parquet(path)
    nb = written.agg(F.countDistinct("bin_id").alias("b")).head()["b"]
    _emit({"stage": "pack", "path": path, "budget": args.budget,
           "n_rows": written.count(), "n_bins": nb})
    return path


def cmd_curve(spark: SparkSession, args) -> None:
    from c3s_sm_spark.operators.textstats import (
        vocab_growth,
        vocab_growth_approx,
    )

    docs = _docs(spark, args)
    fn = vocab_growth_approx if args.hll else vocab_growth
    rows = [
        r.asDict() for r in fn(docs, bucket_size=args.bucket_size)
        .orderBy("bucket").collect()
    ]
    _emit({"stage": "curve", "hll": bool(args.hll), "rows": rows})


def cmd_drift(spark: SparkSession, args) -> None:
    from c3s_sm_spark.operators.textstats import source_divergence

    rows = [
        r.asDict()
        for r in source_divergence(
            _docs(spark, args), args.src_a, args.src_b, top_n=args.top_n
        ).collect()
    ]
    _emit({"stage": "drift", "a": args.src_a, "b": args.src_b, "rows": rows})


def cmd_mix(spark: SparkSession, args) -> None:
    """Token-budget waterfilling plan across sources: per-source
    availability from actual token counts, weights from --weights
    (JSON name->int map; absent sources weight 1), budget either
    absolute (--budget-tokens) or as a corpus fraction
    (--budget-frac, exact integer num/den arithmetic). Emits the
    (source, avail, weight, saturated, alloc) plan as JSON rows —
    feed the allocs to `filter`/`dedup` sampling stages."""
    import json as _json
    from fractions import Fraction

    from pyspark.sql import functions as F

    from c3s_sm_spark.operators.sampling import waterfill_alloc
    from c3s_sm_spark.operators.textstats import words_col

    weights = _json.loads(args.weights) if args.weights else {}
    wexpr = F.lit(1).cast("long")
    for name, wt in sorted(weights.items()):
        wexpr = F.when(F.col("source") == name, int(wt)).otherwise(wexpr)
    per_src = (
        _docs(spark, args)
        .groupBy("source")
        .agg(F.sum(F.size(words_col("text"))).cast("long").alias("a"))
        .withColumn("w", wexpr.cast("long"))
    )
    if args.budget_tokens is not None:
        budget = int(args.budget_tokens)
    else:
        frac = Fraction(str(args.budget_frac)).limit_denominator(10**6)
        total = per_src.agg(F.sum("a")).collect()[0][0] or 0
        budget = total * frac.numerator // frac.denominator
    rows = [
        r.asDict()
        for r in waterfill_alloc(per_src, "source", "a", "w", budget)
        .orderBy("source")
        .collect()
    ]
    _emit({"stage": "mix", "budget": budget, "rows": rows})


def cmd_merges(spark: SparkSession, args) -> None:
    from c3s_sm_spark.operators.textstats import phrase_merge_train

    rows = [
        r.asDict()
        for r in phrase_merge_train(
            _docs(spark, args), n_merges=args.n_merges, min_count=args.min_count
        )
        .orderBy("merge_rank")
        .collect()
    ]
    _emit({"stage": "merges", "rows": rows})


def cmd_split(spark: SparkSession, args) -> None:
    from c3s_sm_spark.operators.sampling import assign_splits, split_cuts

    fr = [
        ("train", args.train), ("val", args.val), ("test", args.test)
    ]
    out = assign_splits(_docs(spark, args), args.key, fr, salt=args.salt)
    path = os.path.join(args.out, "splits")
    # hive-partitioned by split so each consumer reads ONLY its split's
    # files (partition pruning); repartition first so each split writes
    # its own files instead of every task writing into all three
    out.repartition("split").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(path)
    back = spark.read.parquet(path)
    counts = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    _emit(
        {
            "stage": "split",
            "out": path,
            "counts": counts,
            "cuts": dict(split_cuts(fr)),
        }
    )


def cmd_audit(spark: SparkSession, args) -> None:
    """One-shot dataset card: normalization-dedup ladder, source
    diversity pieces, mass concentration, cross-source leakage."""
    from c3s_sm_spark.operators.dedup_text import (
        cross_group_dups,
        normalization_report,
    )
    from c3s_sm_spark.operators.profile import gini_from_pieces, lorenz_gini
    from c3s_sm_spark.operators.textstats import token_diversity

    docs = _docs(spark, args)
    norm = {
        r["form"]: {"distinct": r["n_distinct"], "redundant": r["redundant"]}
        for r in normalization_report(docs).collect()
    }
    div = [
        r.asDict()
        for r in token_diversity(docs, group_col=args.group)
        .orderBy(args.group)
        .collect()
    ]
    gini = gini_from_pieces(lorenz_gini(docs, "n_chars", "doc_id"))
    leaks = [
        r.asDict()
        for r in cross_group_dups(docs, group_col=args.group).collect()
    ]
    _emit(
        {
            "stage": "audit",
            "normalization": norm,
            "group_diversity": div,
            "char_mass_gini": round(gini, 4),
            "cross_group_leaks": leaks,
        }
    )


def _done(spark: SparkSession, out: str, name: str) -> str | None:
    """Path of a completed stage output (parquet _SUCCESS present).

    Checked through the Hadoop FileSystem API, not os.path — the
    cluster launch mode writes to hdfs://, s3a:// etc., where a local
    stat would always miss and silently disable resume."""
    path = os.path.join(out, name)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "_SUCCESS"))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return path if fs.exists(p) else None


def cmd_pipeline(spark: SparkSession, args) -> None:
    skip = getattr(args, "skip_existing", False)
    upstream_ran = False  # once any stage re-runs, every later stage must

    def stage(name: str, outdir: str, fn, feeds_downstream: bool = True) -> str:
        nonlocal upstream_ran
        # a downstream _SUCCESS from an EARLIER run is stale the moment
        # an upstream stage re-executes — skipping it would feed old
        # intermediates into the final output
        done = (
            _done(spark, args.out, outdir)
            if skip and not upstream_ran
            else None
        )
        if done:
            _emit({"stage": name, "path": done, "skipped": True})
            return done
        if feeds_downstream:
            upstream_ran = True
        return fn(spark, args)

    # stats is a side output nothing downstream consumes — re-running
    # it alone must not invalidate the chain
    stage("stats", "stats", cmd_stats, feeds_downstream=False)
    args.input = stage("filter", "filtered", cmd_filter)
    args.input = stage("dedup", "deduped", cmd_dedup)
    if getattr(args, "strip_spans", False):
        args.input = stage("clean", "cleaned", cmd_clean)
    args.input = stage("chunk", "chunks", cmd_chunk)
    stage("pack", "packed", cmd_pack)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input parquet path")
    p.add_argument("--out", required=True, help="output base directory")
    p.add_argument("--master", default="local[8]")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("stats")
    f = sub.add_parser("filter")
    d = sub.add_parser("dedup")
    cl = sub.add_parser("clean")
    c = sub.add_parser("chunk")
    k = sub.add_parser("pack")
    v = sub.add_parser("curve")
    m = sub.add_parser("merges")
    g = sub.add_parser("drift")
    mx = sub.add_parser("mix")
    sl = sub.add_parser("split")
    au = sub.add_parser("audit")
    pl = sub.add_parser("pipeline")

    for sp in (f, pl):
        sp.add_argument("--min-quality", type=float, default=0.0)
        sp.add_argument("--min-tokens", type=int, default=1)
        sp.add_argument("--max-tokens", type=int, default=1_000_000)
    for sp in (d, pl):
        sp.add_argument("--exact", action="store_true",
                        help="exact n-gram Jaccard pairs instead of LSH")
        sp.add_argument("--shingle-k", type=int, default=2)
        sp.add_argument("--threshold", type=float, default=0.5)
    for sp in (c, pl):
        sp.add_argument("--chunk-tokens", type=int, default=512)
        sp.add_argument("--stride", type=int, default=None)
    for sp in (k, pl):
        sp.add_argument("--budget", type=int, default=4096)
    pl.add_argument("--skip-existing", action="store_true",
                    help="resume: skip stages whose output has _SUCCESS")
    pl.add_argument("--strip-spans", action="store_true",
                    help="insert the span-level exact-substring dedup "
                         "stage between dedup and chunk")
    for sp in (cl, pl):
        sp.add_argument("--span-k", type=int, default=20)
        sp.add_argument("--span-min-count", type=int, default=2)
    m.add_argument("--n-merges", type=int, default=10)
    m.add_argument("--min-count", type=int, default=5)
    v.add_argument("--bucket-size", type=int, default=1000)
    v.add_argument("--hll", action="store_true")
    g.add_argument("--src-a", required=True)
    g.add_argument("--src-b", required=True)
    g.add_argument("--top-n", type=int, default=20)
    mx.add_argument("--weights", default=None,
                    help='JSON source->weight map, e.g. \'{"web": 5}\'; '
                         "absent sources weight 1")
    mx.add_argument("--budget-tokens", type=int, default=None)
    mx.add_argument("--budget-frac", type=float, default=0.5,
                    help="budget as corpus fraction (ignored when "
                         "--budget-tokens is set)")

    sl.add_argument("--key", default="doc_id")
    sl.add_argument("--train", type=float, default=0.8)
    sl.add_argument("--val", type=float, default=0.1)
    sl.add_argument("--test", type=float, default=0.1)
    sl.add_argument("--salt", default="")
    au.add_argument("--group", default="source")

    args = p.parse_args(argv)
    spark = _spark(args)
    {
        "stats": cmd_stats,
        "filter": cmd_filter,
        "dedup": cmd_dedup,
        "clean": cmd_clean,
        "chunk": cmd_chunk,
        "pack": cmd_pack,
        "curve": cmd_curve,
        "merges": cmd_merges,
        "drift": cmd_drift,
        "mix": cmd_mix,
        "split": cmd_split,
        "audit": cmd_audit,
        "pipeline": cmd_pipeline,
    }[args.cmd](spark, args)


if __name__ == "__main__":
    main()
