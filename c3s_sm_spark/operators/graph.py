"""Graph centrality over corpus-derived graphs: fixed-iteration PageRank
in exact integer arithmetic.

Training-data pipelines use link/co-occurrence centrality as a quality
prior (rank seed URLs, weight co-citation neighborhoods, pick canonical
docs inside near-dup clusters). The classic float PageRank is
nondeterministic across engines at the ulp level, so this operator runs
the whole recurrence in micro-units with floor division — bit-identical
in any ANSI engine, which is what lets a DuckDB oracle pin 3 unrolled
iterations exactly.

Recurrence (per-node-1.0 convention, damping d in thousandths):
``r0 = 1_000_000``; ``r_{i+1}(v) = (1000-d)·1000 + (d · Σ_{u→v}
(r_i(u) div outdeg(u))) div 1000``. All operands non-negative, so
Spark ``div`` == ANSI ``//``. Floor-division mass leakage is bounded
by outdeg per node per round — irrelevant for ranking, and identical
in every engine, which is the point.

Scale shape: outdegree joins into the edge list ONCE before the loop
(localCheckpoint pins it — the loop adds no lineage); each iteration
is one src-keyed join (ranks is node-sized — broadcastable for
dimension-scale graphs, sort-merge co-partitioned otherwise) + one
map-side-combined groupBy(dst). Iterations are a fixed small constant;
convergence-looped variants should reuse the pointer-jumping budget
discipline from neardup_components. Overflow: ranks stay ~1e6·N/N
scale (mass is conserved up to floor loss), single-node rank <
N·1e6 — inside int64 to ~9e12 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_micro(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_milli: int = 850,
) -> DataFrame:
    """Exact-integer PageRank over a DIRECTED edge list (symmetrize
    first for undirected graphs). Returns ``(node, rank_micro)`` for
    every node that appears in the edge list; ``rank_micro`` is the
    fixed-point rank after ``iterations`` rounds. Duplicate edges are
    collapsed (multigraph weighting is a different operator)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 < damping_milli < 1000:
        raise ValueError("damping_milli must be in (0, 1000)")
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # one edges+outdeg relation reused every round; checkpoint so the
    # loop's plans don't re-derive it (iterative-loop discipline from
    # neardup_components)
    ed = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    base = (1000 - damping_milli) * 1000  # (1-d) in micro-units
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = ed.join(
            ranks, ed["src"] == ranks["node"]
        ).select(F.col("dst"), F.expr("r div deg").alias("c"))
        sums = contrib.groupBy("dst").agg(
            F.sum("c").cast("long").alias("s")
        )
        ranks = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .select(
                "node",
                F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"),
            )
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({damping_milli}L * s) div 1000L")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def cooccurrence_edges(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Directed (both ways) token co-occurrence edge list: src and dst
    co-occur in at least one document. The distinct (doc, token) frame
    self-joins on doc_id — per-doc fanout is |distinct tokens|², so
    cap-per-doc dedup (distinct BEFORE the join) is load-bearing; a
    vocabulary-head filter (min_df) is the documented escape for
    heavy-tailed real corpora."""
    from c3s_sm_spark.operators.textstats import words_col

    toks = docs.select(
        "doc_id", F.explode(words_col(text_col)).alias("token")
    ).distinct()
    a, b = toks.alias("a"), toks.alias("b")
    return (
        a.join(b, "doc_id")
        .where(F.col("a.token") != F.col("b.token"))
        .select(
            F.col("a.token").alias("src"), F.col("b.token").alias("dst")
        )
        .distinct()
    )
