"""Single-pass table profiling (X33) — the ANALYZE TABLE / dataset-card
primitive a training-data pipeline runs on every new corpus drop:
per-column row/null/distinct counts and typed min/max, one row per
column.

Spark shape: ONE aggregate job. All per-column aggregates (count,
count-distinct, min, max) go into a single ``agg`` — Spark plans the
multi-count-distinct via one Expand + partial aggregation pass — and the
single result row is unpivoted to one row per column with a driver-free
``explode(array(struct...))``. No per-column jobs, no collect.

Scale: exact ``count(distinct)`` over k columns Expands the input k-fold
before the partial agg — fine into the billions, but at 10^12 rows pass
``exact_distinct=False`` to use ``approx_count_distinct`` (HLL — one
mergeable sketch per column, no Expand, ~2% error) — the same
exact/sketch duality as the quantile (X12/X24) and quality-selection
(X31) operators.

Typed min/max without cross-engine string-formatting hazards:
- numeric columns -> ``(min_num, max_num)`` as double (exact for longs
  up to 2^53; min/max SELECT a value, no arithmetic, so bits match any
  engine);
- string columns -> ``(min_str, max_str)`` (binary collation in both
  Spark and DuckDB);
- timestamp/date columns -> ``(min_str, max_str)`` via an explicit
  ``yyyy-MM-dd HH:mm:ss`` format (never engine-default rendering).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregate job.

    Output, one row per column:
    ``(col_name, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str)`` — the num/str min-max pair not applicable to a
    column's type is NULL.
    """
    cols = columns or df.columns
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    kinds: dict[str, str] = {}
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        nd = (
            F.countDistinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(nd.alias(f"_nd_{c}"))
        if isinstance(dt, NumericType):
            kinds[c] = "num"
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
        elif isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
            kinds[c] = "ts"
            aggs.append(F.date_format(F.min(c), _TS_FMT).alias(f"_min_{c}"))
            aggs.append(F.date_format(F.max(c), _TS_FMT).alias(f"_max_{c}"))
        elif isinstance(dt, StringType):
            kinds[c] = "str"
            aggs.append(F.min(c).alias(f"_min_{c}"))
            aggs.append(F.max(c).alias(f"_max_{c}"))
        else:  # arrays/binary/structs: counts only
            kinds[c] = "other"
    row = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    entries = []
    for c in cols:
        k = kinds[c]
        entries.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"_min_{c}") if k == "num" else null_d).alias("min_num"),
                (F.col(f"_max_{c}") if k == "num" else null_d).alias("max_num"),
                (F.col(f"_min_{c}") if k in ("ts", "str") else null_s).alias("min_str"),
                (F.col(f"_max_{c}") if k in ("ts", "str") else null_s).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def constraint_audit(
    df: DataFrame,
    constraints: list[tuple[str, "F.Column"]],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Deequ-style data-quality audit (X92): evaluate every declared
    constraint over the table in ONE aggregate job — the pre-ingest
    gate a training pipeline runs on each corpus drop before it is
    allowed to join the mix.

    ``constraints`` are ``(name, boolean Column)`` pairs where True
    means PASS; a NULL predicate result counts as a violation (the
    Deequ convention — ``value < 100`` with NULL value is not a pass).
    ``unique_cols`` adds per-column uniqueness checks: violations =
    non-null duplicate extras, ``count(col) - count(distinct col)``.

    Output ``(check_name string, n_checked long, n_violations long)``,
    one row per check. Plan: all checks fold into a single ``agg`` —
    per-check conditional sums plus Catalyst's Expand for the
    multi-count-distinct — then one ``explode(array(struct...))``
    unpivot; no per-check jobs, no driver collect. Referential checks
    need the dim side and therefore a join: see :func:`fk_orphans`,
    whose output unions onto this frame.
    """
    if not constraints and not unique_cols:
        raise ValueError("no checks declared")
    total = F.count(F.lit(1)).cast("long")
    entries = []
    for name, cond in constraints:
        viol = F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).cast("long")
        entries.append(
            F.struct(
                F.lit(name).alias("check_name"),
                total.alias("n_checked"),
                viol.alias("n_violations"),
            )
        )
    for col in unique_cols or []:
        entries.append(
            F.struct(
                F.lit(f"unique:{col}").alias("check_name"),
                total.alias("n_checked"),
                (F.count(col) - F.count_distinct(F.col(col)))
                .cast("long")
                .alias("n_violations"),
            )
        )
    row = df.agg(F.array(*entries).alias("a"))
    return row.select(F.explode("a").alias("c")).select("c.*")


def fk_orphans(
    fact: DataFrame, key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Referential-integrity check: one ``(check_name, n_checked,
    n_violations)`` row counting fact rows whose non-null ``key`` has
    no match in ``dim.dim_key`` (NULL keys are not orphans — they are
    the null-check's job).

    Plan: dim projects to its key and pre-DISTINCTs (map-side partial
    dedup), then ONE left-outer join — AQE picks broadcast when the
    deduped dim fits, shuffle-hash otherwise — and a single agg; the
    total and the orphan count share the pass, so the fact side is
    scanned once (a separate count + left-anti would scan twice).
    """
    marker = (
        dim.select(F.col(dim_key).alias(key))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = fact.select(key).join(marker, key, "left")
    return joined.agg(
        F.lit(f"fk:{key}").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            F.when(
                F.col(key).isNotNull() & F.col("__hit").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    )


def cube_stats(
    df: DataFrame,
    dims: list[str],
    measures: list[tuple[str, "F.Column"]],
    all_label: str = "(all)",
) -> DataFrame:
    """Multi-grain rollup in ONE pass (X97): every subset of ``dims``
    aggregated together via ``CUBE`` — the dataset-card / dashboard
    query ("by source, by language, by source x language, and overall")
    that would otherwise run 2^|dims| separate jobs over a 100 TB scan.

    Spark plans CUBE as a single Expand (2^|dims| grouping projections
    of each input row) feeding one partial+final aggregate — the corpus
    is READ ONCE; the 2^|dims| blow-up happens on the already-projected
    narrow rows and combines map-side. For high-cardinality dims prefer
    explicit grouping-set subsets (df.rollup or a union of grains) —
    CUBE's full lattice on a 10^6-distinct dim materializes every
    cross grain whether wanted or not.

    NULL disambiguation: a CUBE output NULL means "all values" — but a
    NULL in the DATA would collide with it. Dims are coalesced to
    ``'(null)'`` BEFORE the cube and the roll-up slots labelled
    ``all_label`` AFTER (via ``grouping()``), so data nulls and lattice
    totals stay distinct — the classic reporting-layer bug, fixed in
    the operator instead of in every consumer.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    pre = df.select(
        *[
            F.coalesce(F.col(d).cast("string"), F.lit("(null)")).alias(d)
            for d in dims
        ],
        *[df[c] for c in df.columns if c not in dims],
    )
    # grouping() is only legal inside the cube's agg list — surface it
    # as marker columns, then rewrite the dim labels
    aggs = [F.grouping(d).alias(f"__g_{d}") for d in dims] + [
        expr.alias(name) for name, expr in measures
    ]
    cubed = pre.cube(*dims).agg(*aggs)
    out = cubed.select(
        *[
            F.when(F.col(f"__g_{d}") == 1, F.lit(all_label))
            .otherwise(F.col(d))
            .alias(d)
            for d in dims
        ],
        *[F.col(name) for name, _ in measures],
    )
    return out


def join_degree(
    left: DataFrame, right: DataFrame, key: str, right_key: str | None = None
) -> DataFrame:
    """Pre-join cardinality audit (X101): BEFORE running an expensive
    join, measure exactly what it would produce — at 10^12 rows a
    many-to-many key you didn't know about turns a join into a
    cross-product-shaped explosion, and the time to learn that is
    before the shuffle, not 6 hours into it.

    Per-side key histograms (two map-side-combined groupBys over only
    the key column) full-outer joined key-to-key — an exchange of
    |distinct keys| rows, never the data — then one summary row
    (all BIGINT):

    - ``n_keys_both`` / ``n_keys_left_only`` / ``n_keys_right_only``
    - ``pairs_total`` = sum(n_l * n_r) — the EXACT inner-join output
      cardinality
    - ``max_degree_pairs`` = max per-key n_l * n_r (the hottest key's
      share — the skew headline the salting config needs)
    - ``argmax_key`` = the LARGEST key (string collation) attaining it
      — a deterministic tie rule via a single struct-max, no window;
      cast to string for schema stability.
    """
    rk = right_key or key
    lc = left.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    rc = right.groupBy(F.col(rk).alias("k")).agg(
        F.count(F.lit(1)).alias("nr")
    )
    j = lc.join(rc, "k", "full_outer")
    pairs = F.coalesce(F.col("nl"), F.lit(0)) * F.coalesce(
        F.col("nr"), F.lit(0)
    )
    staged = j.select(
        "k",
        F.col("nl").isNotNull().alias("inl"),
        F.col("nr").isNotNull().alias("inr"),
        pairs.alias("p"),
    )
    both = F.col("inl") & F.col("inr")
    return staged.agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_keys_both"),
        F.sum(F.when(F.col("inl") & ~F.col("inr"), 1).otherwise(0))
        .cast("long")
        .alias("n_keys_left_only"),
        F.sum(F.when(~F.col("inl") & F.col("inr"), 1).otherwise(0))
        .cast("long")
        .alias("n_keys_right_only"),
        F.sum("p").cast("long").alias("pairs_total"),
        F.coalesce(F.max("p"), F.lit(0)).cast("long").alias("max_degree_pairs"),
        F.max(
            F.struct(F.col("p").alias("p"), F.col("k").cast("string").alias("k"))
        )["k"].alias("argmax_key"),
    )


def lorenz_gini(
    df: DataFrame,
    value_col: str,
    id_col: str,
    buckets: int = 10,
) -> DataFrame:
    """X103 corpus-concentration audit (Lorenz curve + Gini pieces):
    how unequally is mass (tokens, chars, bytes) distributed across
    items? The dataset-card answer to "do 1% of the docs carry 60% of
    the corpus?" — the signal behind mix rebalancing and head-capping
    policies.

    Sorts items by (value, id) — a TOTAL order, so tied values are
    rank-stable — via the two-phase :func:`~c3s_sm_spark.operators.
    sampling.global_rank` (never the one-task global window), buckets
    ranks into ``buckets`` quantile bins (bin = ceil(rn*b/n), exact
    integer arithmetic), and emits per bin: item count, mass sum,
    rank-weighted mass sum and running cumulative mass — all BIGINT.

    Exact Gini derives caller-side from the pieces (lag_corr_pieces
    split): ``G = (2*Σ(rn·x) - (n+1)·Σx) / (n·Σx)`` with
    ``Σ(rn·x) = sum(ix_sum)`` — tie-invariant because equal values
    within a tie block contribute x·Σ(ranks) regardless of permutation.

    Scale: one range exchange + per-partition sort (global_rank), one
    map-side-combined groupBy on the bin id; the final cumulative
    window runs over ``buckets`` rows — dimension-sized by contract.
    Overflow bound: Σ(rn·x) < n²·max_x — inside int64 to ~10^8 items
    at max_x 10^3; past that, run per-shard and merge, or drop to the
    bucketed approximation (rank-weighting by bin midpoint).
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    from pyspark.sql import Window

    from c3s_sm_spark.operators.sampling import global_rank

    vals = df.select(
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("long").alias("__x"),
    )
    n1 = vals.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    ranked = global_rank(vals, ["__x", "__id"], out_col="__rn").crossJoin(
        F.broadcast(n1)
    )
    # ceil(rn*b/n) with non-negative ints: (rn*b + n - 1) div n
    binned = ranked.withColumn(
        "bucket",
        F.expr(f"(__rn * {int(buckets)}L + __n - 1) div __n").cast("long"),
    )
    agg = binned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("__x").cast("long").alias("x_sum"),
        F.sum(F.col("__rn") * F.col("__x")).cast("long").alias("ix_sum"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "bucket",
        "n_items",
        "x_sum",
        "ix_sum",
        F.sum("x_sum").over(w).cast("long").alias("cum_x"),
    )


def gini_from_pieces(pieces: DataFrame) -> float:
    """Exact Gini coefficient from :func:`lorenz_gini` output — a
    driver-side reduction over ``buckets`` rows (dimension-sized by
    contract; NOT a corpus collect)."""
    row = pieces.agg(
        F.sum("n_items").alias("n"),
        F.sum("x_sum").alias("sx"),
        F.sum("ix_sum").alias("six"),
    ).collect()[0]
    n, sx, six = row["n"], row["sx"], row["six"]
    if not n or not sx:
        return 0.0
    return (2 * six - (n + 1) * sx) / (n * sx)


def chisq_pieces(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """X122 chi-square contingency pieces (categorical×categorical
    independence — "did the label mix drift across sources?" — the
    categorical companion to the numeric two-sample tests): one row
    per observed cell with ``(r, c, o, row_total, col_total, n)`` all
    BIGINT. The statistic derives caller-side in exact rational form:
    ``chi2 = Σ (o·n − row_total·col_total)² / (n·row_total·
    col_total)`` — the numerator is an exact integer per cell, so the
    only float op is the final division.

    Plan: one cell groupBy + two margin groupBys over the CELL frame
    (dimension-sized — margins never rescan the corpus) + one
    broadcast 1-row total; cells with zero observed count are absent
    by construction (they contribute ``row_total·col_total/n`` to
    chi², which the caller adds via the margins it already has).
    """
    cells = df.groupBy(
        F.col(row_col).cast("string").alias("r"),
        F.col(col_col).cast("string").alias("c"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = cells.groupBy("r").agg(
        F.sum("o").cast("long").alias("row_total")
    )
    ct = cells.groupBy("c").agg(
        F.sum("o").cast("long").alias("col_total")
    )
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    return (
        cells.join(rt, "r")
        .join(ct, "c")
        .crossJoin(F.broadcast(n))
        .select("r", "c", "o", "row_total", "col_total", "n")
    )


def benford_pieces(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """X143 Benford first-digit audit: the fraud/corruption forensic —
    naturally-occurring multiplicative measurements follow
    ``P(d) = log10(1 + 1/d)`` for the leading digit; fabricated,
    truncated, default-filled or unit-mangled columns don't. A cheap
    whole-column screen a pipeline runs per ingest batch.

    Emits per ``keys + (digit,)``: the exact BIGINT observed count of
    leading digits 1-9 (zero/null values excluded — they have no
    leading digit) plus the group total ``n``. The chi-square distance
    to the Benford expectation and the per-digit deviation derive
    caller-side in :func:`benford_scores` (the expectation is
    irrational — it never enters the witness).

    Leading digit extracted arithmetically — ``d = floor(|v| /
    10^floor(log10(|v|)))`` — identical in both engines on BIGINT
    inputs (log10 of an exact integer magnitude is safely inside
    float64 here: the boundary cases are exact powers of ten, where
    IEEE log10 is exact).

    Plan: one map-side-combinable groupBy; shuffles carry 9 counters
    per group.
    """
    keys = list(keys)
    v = F.abs(F.col(value_col).cast("long"))
    digit = F.floor(
        v / F.pow(F.lit(10.0), F.floor(F.log10(v.cast("double"))))
    ).cast("long")
    staged = df.filter(v > 0).select(*keys, digit.alias("digit"))
    w = Window.partitionBy(*keys)
    return (
        staged.groupBy(*keys, "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .select("*", F.sum("o").over(w).cast("long").alias("n"))
    )


def benford_scores(pieces: DataFrame) -> DataFrame:
    """Per-digit Benford deviation from :func:`benford_pieces` — plain
    projection: ``expected = n * log10(1 + 1/d)``, the per-digit
    z-ish standardized residual ``(o - e)/sqrt(e)``, and the cell's
    chi-square contribution. Sum the contributions per key for the
    8-dof screen statistic."""
    d = F.col("digit").cast("double")
    n = F.col("n").cast("double")
    o = F.col("o").cast("double")
    e = n * F.log10(1.0 + 1.0 / d)
    return pieces.select(
        "*",
        e.alias("expected"),
        ((o - e) / F.sqrt(e)).alias("std_residual"),
        ((o - e) * (o - e) / e).alias("chi2_part"),
    )


def flatline_pieces(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """X144 flatline (stuck-at) detector: the longest run of IDENTICAL
    consecutive values per key — the classic failed-sensor signature
    (a soil-moisture probe reporting the same reading for nine dekads;
    a scraper re-serving one cached page). The complement of
    threshold_runs (X92), which measures exceedance runs, not equality.

    Emits per key, exact BIGINT: ``n``, ``max_run`` (longest equal
    run), ``run_value`` (the stuck value of the FIRST longest run),
    ``t_run_start`` (1-based position where it starts), and
    ``n_runs`` (count of maximal runs, = distinct consecutive
    segments). A healthy noisy series has max_run ~ 1-2.

    Plan: gaps-and-islands with two window passes on one key shuffle —
    change-flag via lag, run ids via cumulative sum, then one groupBy.
    Pure JVM.
    """
    keys = list(keys)
    order_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    w_time = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    # the cumulative run-id window runs AFTER the projection drops the
    # raw order columns — order by the materialized row index instead
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col("__v")
    staged = df.select(
        *keys, F.col(value_col).cast("long").alias("__v"), *order_cols
    ).select(
        *keys,
        "__v",
        F.row_number().over(w_time).cast("long").alias("__t"),
        F.when(
            F.lag("__v").over(w_time).isNull()
            | (F.lag("__v").over(w_time) != v),
            1,
        ).otherwise(0).alias("__new"),
    )
    runs = staged.select(
        *keys, "__v", "__t",
        F.sum("__new").over(w_cum).alias("__rid"),
    )
    per_run = runs.groupBy(*keys, "__rid").agg(
        F.count(F.lit(1)).cast("long").alias("__len"),
        F.min("__v").alias("__val"),
        F.min("__t").cast("long").alias("__start"),
    )
    pick = F.struct(
        (-F.col("__len")).alias("neglen"), F.col("__start").alias("s")
    )
    return per_run.groupBy(*keys).agg(
        F.sum("__len").cast("long").alias("n"),
        F.max("__len").cast("long").alias("max_run"),
        F.min_by("__val", pick).cast("long").alias("run_value"),
        F.min_by("__start", pick).cast("long").alias("t_run_start"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
    )


def brown_forsythe_pieces(
    df: DataFrame,
    keys: Sequence[str],
    group_col: str,
    value_col: str,
) -> DataFrame:
    """X146 Brown-Forsythe variance-homogeneity pieces (Brown &
    Forsythe 1974): did the VARIANCE shift between two regimes — the
    spread companion to Pettitt's mean-shift and KS's shape tests
    (a sensor going noisy before it dies; a source's quality variance
    blowing up after a scraper change). The robust Levene variant:
    one-way ANOVA on the absolute deviations from each group's MEDIAN.

    Exactness: the group median is the LOWER median (the X141 order
    statistic — deterministic under ties in every engine), so
    ``d = |v - med|`` is an exact integer and the emitted pieces are
    exact BIGINTs per ``keys + (group,)``: ``n``, ``sd`` (sum of d),
    ``sd2`` (sum of d^2). The F statistic
    ``F = (N-k)/(k-1) * sum n_g (dbar_g - dbar)^2 / sum sum (d - dbar_g)^2``
    derives caller-side in :func:`brown_forsythe_scores` (two-group
    case: one row per group feeds a trivial reduce).

    Plan: the median is a window aggregate over the value-ranked
    (keys, group) frame — one shuffle, no join-back — then one
    map-side-combinable groupBy.
    """
    keys = list(keys)
    part = keys + [group_col]
    w_rank = Window.partitionBy(*part).orderBy(F.col("__v").asc())
    w_grp = Window.partitionBy(*part)
    pos = (F.count(F.lit(1)).over(w_grp) + 1) / 2
    ranked = df.select(
        *part, F.col(value_col).cast("long").alias("__v")
    ).select(
        *part, "__v",
        F.row_number().over(w_rank).alias("__rn"),
        F.floor(pos).cast("int").alias("__pos"),
    )
    with_med = ranked.select(
        *part, "__v",
        F.min(F.when(F.col("__rn") == F.col("__pos"), F.col("__v")))
        .over(w_grp)
        .alias("__med"),
    )
    d = F.abs(F.col("__v") - F.col("__med"))
    return with_med.groupBy(*part).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d).cast("long").alias("sd"),
        F.sum(d * d).cast("long").alias("sd2"),
    )


def brown_forsythe_scores(pieces: DataFrame, keys: Sequence[str]) -> DataFrame:
    """The Brown-Forsythe F from per-group pieces — a groupBy over the
    group rows per key (k-1, N-k dof emitted alongside); null when any
    within-group variance degenerates or k < 2."""
    keys = list(keys)
    agg = pieces.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("__k"),
        F.sum("n").cast("double").alias("__N"),
        F.sum(F.col("sd")).cast("double").alias("__sd_all"),
        # between-group numerator pieces: sum over groups of sd^2/n
        F.sum(
            F.col("sd").cast("double") * F.col("sd") / F.col("n")
        ).alias("__sq_over_n"),
        F.sum("sd2").cast("double").alias("__sd2_all"),
    )
    k = F.col("__k")
    N = F.col("__N")
    # SS_between = sum n_g dbar_g^2 - N dbar^2 = sum sd_g^2/n_g - sd^2/N
    ssb = F.col("__sq_over_n") - F.col("__sd_all") ** 2 / N
    # SS_within = sum d^2 - sum sd_g^2/n_g
    ssw = F.col("__sd2_all") - F.col("__sq_over_n")
    ok = (k >= 2) & (ssw > 0) & (N > k)
    return agg.select(
        *keys,
        k.cast("long").alias("k_groups"),
        N.cast("long").alias("n_total"),
        F.when(ok, (ssb / (k - 1)) / (ssw / (N - k))).alias("bf_f"),
    )


def grubbs_pieces(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """X148 Grubbs extreme-studentized-deviate pieces (Grubbs 1950):
    is the single most extreme value in this group an OUTLIER relative
    to a normal noise model — the classic one-outlier screen run on
    every sensor batch / metric rollup before it poisons a mean (the
    single-point companion to X143's Benford digit forensics and
    X144's flatline detector).

    The key exactness insight: ``max_t |v_t - vbar|`` is always
    attained at the group max or min, so the whole test needs NO
    window and NO second pass — one map-side-combinable groupBy
    emitting exact BIGINTs: ``n``, ``sum_v``, ``sum_v2``, ``max_v``,
    ``min_v``, and ``g_num = max(n*max_v - sum_v, sum_v - n*min_v)``
    (``= n * max|v - vbar|``, exactly integral). ``G = g_num /
    (n * s)`` and the extreme-value expectation derive caller-side in
    :func:`grubbs_scores`.

    Overflow contract: same centi-scale bound as X147 — ``sum_v2``
    dominates, ``n * B^2 < 2^63`` with B = 5e4 holds to ~3.7e9 rows
    per group.

    Plan: ONE aggregate, no sort, no shuffle beyond the key exchange;
    partial aggregation (map-side combine) applies to every piece.
    """
    keys = list(keys)
    v = F.col("__v")
    prepared = df.select(*keys, F.col(value_col).cast("long").alias("__v"))
    agg = prepared.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("sum_v"),
        F.sum(v * v).cast("long").alias("sum_v2"),
        F.max(v).cast("long").alias("max_v"),
        F.min(v).cast("long").alias("min_v"),
    )
    hi = F.col("n") * F.col("max_v") - F.col("sum_v")
    lo = F.col("sum_v") - F.col("n") * F.col("min_v")
    return agg.select(
        "*",
        F.greatest(hi, lo).cast("long").alias("g_num"),
        # which tail the suspect sits in: +1 high, -1 low, 0 exact tie
        F.when(hi > lo, 1).when(lo > hi, -1).otherwise(0)
        .cast("int")
        .alias("side"),
    )


def grubbs_scores(pieces: DataFrame) -> DataFrame:
    """G and its normal-theory expectation from :func:`grubbs_pieces`
    — plain projection. ``G = (g_num/n) / s`` with the sample std
    ``s^2 = (sum_v2 - sum_v^2/n) / (n-1)``; the expected maximum of n
    standard normals ``E_max ~ sqrt(2 ln n) - (ln ln n + ln 4pi) /
    (2 sqrt(2 ln n))`` (the Gumbel/Cramer asymptotic) gives the
    distribution-calibrated excess ratio ``g_excess = G / E_max`` —
    a >~1.3 reading flags the group for the exact follow-up. Null
    when the group is constant or smaller than 3.
    """
    n = F.col("n").cast("double")
    var = (
        F.col("sum_v2").cast("double")
        - F.col("sum_v").cast("double") ** 2 / n
    ) / (n - 1.0)
    ok = (F.col("n") >= 3) & (var > 0)
    g = F.when(ok, F.col("g_num").cast("double") / n / F.sqrt(var))
    ln_n = F.log(n)
    emax = F.sqrt(2.0 * ln_n) - (
        (F.log(ln_n) + math.log(4.0 * math.pi))
        / (2.0 * F.sqrt(2.0 * ln_n))
    )
    return pieces.select(
        "*",
        g.alias("g_stat"),
        F.when(ok, emax).alias("e_max"),
        F.when(ok & (emax > 0), g / emax).alias("g_excess"),
    )


def welch_pieces(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """X156 Welch two-sample t pieces — the parametric location test
    completing the two-sample family (X120 rank_sum: rank location;
    X121 ks: any ECDF divergence; X146 brown_forsythe: variance;
    this: mean difference under unequal variances, the default "did
    the metric move between variants" test). One map-side-combinable
    aggregate; all pieces exact BIGINT (same centi/1e-4 scaling
    contract as the callers'): ``(n_a, sum_a, sum2_a, n_b, sum_b,
    sum2_b)`` in a single row. t, the Welch-Satterthwaite df and
    Cohen's d derive caller-side in :func:`welch_scores`.
    """
    p = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).cast("long").alias("v"),
        (F.col(group_col) == group_a).alias("ia"),
    )
    va = F.when(F.col("ia"), F.col("v"))
    vb = F.when(~F.col("ia"), F.col("v"))
    return p.agg(
        F.count(va).cast("long").alias("n_a"),
        F.coalesce(F.sum(va), F.lit(0)).cast("long").alias("sum_a"),
        F.coalesce(F.sum(va * va), F.lit(0)).cast("long").alias("sum2_a"),
        F.count(vb).cast("long").alias("n_b"),
        F.coalesce(F.sum(vb), F.lit(0)).cast("long").alias("sum_b"),
        F.coalesce(F.sum(vb * vb), F.lit(0)).cast("long").alias("sum2_b"),
    )


def welch_scores(pieces: DataFrame) -> DataFrame:
    """t statistic, Welch-Satterthwaite degrees of freedom and Cohen's
    d from :func:`welch_pieces` — plain projection. Null when either
    group has n < 2 or zero variance."""
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("sum_a").cast("double") / na
    mb = F.col("sum_b").cast("double") / nb
    va = (F.col("sum2_a").cast("double") - F.col("sum_a").cast("double") * ma) / (na - 1)
    vb = (F.col("sum2_b").cast("double") - F.col("sum_b").cast("double") * mb) / (nb - 1)
    se2 = va / na + vb / nb
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    t = F.when(ok, (ma - mb) / F.sqrt(se2))
    dof = F.when(
        ok & (va > 0) & (vb > 0),
        se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)),
    )
    sp = F.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = F.when(ok & (sp > 0), (ma - mb) / sp)
    return pieces.select(
        "*",
        t.alias("t_stat"),
        dof.alias("welch_df"),
        d.alias("cohens_d"),
    )
