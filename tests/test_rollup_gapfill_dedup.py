"""Rollup / cascade / gap-fill / dedup semantics vs an independent numpy
oracle on the deterministic synthetic fixture (FIXTURES.md F2/F3).

The gap-fill golden reproduces the reference's NaN-gap pattern
(/root/reference/tests/test_reshuffle.py:77-84) and the bit-union golden
the sensor=[768,768,256] pattern (:164).
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from c3s_sm_spark.operators import cascade, gap_fill, keep_latest, rollup
from c3s_sm_spark.operators.salting import salted_agg
from c3s_sm_spark.synth import gen_points_raw


@pytest.fixture(scope="module")
def raw(spark):
    df = gen_points_raw(spark, 12).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def raw_pd(raw):
    return raw.toPandas()


def test_keep_latest_matches_pandas(raw, raw_pd):
    got = keep_latest(raw, ["doc_id", "ts"], ["version"]).toPandas()
    exp = (
        raw_pd.sort_values(["doc_id", "ts", "version"])
        .groupby(["doc_id", "ts"], as_index=False)
        .last()
    )
    got = got.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["v"].to_numpy(), exp["v"].to_numpy())
    assert (got["version"].to_numpy() == exp["version"].to_numpy()).all()


def test_keep_latest_sort_first(raw, raw_pd):
    got = keep_latest(raw, ["doc_id", "ts"], ["version"], mode="sort_first").toPandas()
    exp = (
        raw_pd.sort_values(["doc_id", "ts", "version"])
        .groupby(["doc_id", "ts"], as_index=False)
        .first()
    )
    assert sorted(got["version"].unique()) == ["v1"]
    assert len(got) == len(exp)


@pytest.fixture(scope="module")
def tiers(spark, raw):
    dd = keep_latest(raw, ["doc_id", "ts"], ["version"])
    daily = rollup(dd, ["doc_id"], "ts", "daily").cache()
    dek = cascade(daily, ["doc_id"], "dekadal").cache()
    mon = cascade(dek, ["doc_id"], "monthly").cache()
    return dd.toPandas(), daily, dek, mon


def _np_rollup(pdf, bucket_fn):
    """Independent oracle: group valid obs by (doc_id, bucket)."""
    out = {}
    for row in pdf.itertuples():
        b = bucket_fn(row.ts)
        k = (row.doc_id, b)
        s = out.setdefault(k, [0.0, 0, 0])
        if row.v is not None and not (isinstance(row.v, float) and math.isnan(row.v)):
            s[0] += float(row.v)
            s[1] += 1
            s[2] |= int(row.flag)
    return out


def _bucket_day(ts):
    return dt.datetime(ts.year, ts.month, ts.day)


def _bucket_dekad(ts):
    d = 1 if ts.day <= 10 else 11 if ts.day <= 20 else 21
    return dt.datetime(ts.year, ts.month, d)


def _bucket_month(ts):
    return dt.datetime(ts.year, ts.month, 1)


@pytest.mark.parametrize("tier_ix,bucket", [(1, _bucket_day), (2, _bucket_dekad), (3, _bucket_month)])
def test_tier_vs_numpy_oracle(tiers, tier_ix, bucket):
    dd_pd = tiers[0]
    tier = tiers[tier_ix].toPandas()
    oracle = _np_rollup(dd_pd, bucket)
    assert len(tier) == len(oracle)
    for row in tier.itertuples():
        s, n, fl = oracle[(row.doc_id, row.ts.to_pydatetime())]
        assert n == row.nobs
        assert fl == row.flags
        assert math.isclose(s / n, row.v_mean, rel_tol=1e-12)


def test_cascade_equals_direct(spark, raw):
    """monthly-from-daily == monthly-from-raw (exact sums/counts)."""
    dd = keep_latest(raw, ["doc_id", "ts"], ["version"])
    direct = rollup(dd, ["doc_id"], "ts", "monthly").toPandas()
    casc = tiers_mon = cascade(
        cascade(rollup(dd, ["doc_id"], "ts", "daily"), ["doc_id"], "dekadal"),
        ["doc_id"],
        "monthly",
    ).toPandas()
    d = direct.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    c = casc.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    assert (d["nobs"] == c["nobs"]).all()
    assert (d["flags"] == c["flags"]).all()
    assert np.allclose(d["v_mean"], c["v_mean"], rtol=1e-12)


def test_gap_fill_golden_pattern(spark, raw):
    """Missing grid days appear as null rows — the reference's
    [66.07, nan, 80.71, 70.56, nan] pattern (test_reshuffle.py:77-84)."""
    dd = keep_latest(raw, ["doc_id", "ts"], ["version"])
    daily = rollup(dd, ["doc_id"], "ts", "daily")
    g = gap_fill(daily, ["doc_id"], "ts", "daily", "2019-10-01", "2020-03-31")
    n_keys = daily.select("doc_id").distinct().count()
    assert g.count() == n_keys * 183
    one = g.where(F.col("doc_id") == "doc0000000000").orderBy("ts").toPandas()
    assert len(one) == 183
    # the synthetic gap rule drops ~1/7 of days -> nulls present
    assert one["nobs"].isna().sum() > 0
    present = daily.where(F.col("doc_id") == "doc0000000000").count()
    assert one["nobs"].notna().sum() == present
    # grid is exactly the regular daily axis
    deltas = one["ts"].diff().dropna().dt.days.unique()
    assert list(deltas) == [1]


def test_gap_fill_fill_policy(spark, raw):
    dd = keep_latest(raw, ["doc_id", "ts"], ["version"])
    daily = rollup(dd, ["doc_id"], "ts", "daily")
    g = gap_fill(
        daily, ["doc_id"], "ts", "daily", "2019-10-01", "2019-10-31",
        fill={"nobs": 0, "flags": 0},
    )
    pdf = g.toPandas()
    assert pdf["nobs"].isna().sum() == 0
    assert (pdf.loc[pdf["v_mean"].isna(), "nobs"] == 0).all()


def test_salted_agg_invariance(spark, raw):
    """Two-phase salted aggregation == direct aggregation, exactly."""
    direct = (
        raw.groupBy("source" if "source" in raw.columns else "doc_id")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.bit_or("flag").alias("f"))
        .toPandas()
    )
    salted = salted_agg(
        raw,
        ["source" if "source" in raw.columns else "doc_id"],
        "doc_id",
        {"s": ("sum", "v"), "n": ("count", "v"), "f": ("bit_or", "flag")},
        n_salts=8,
    ).toPandas()
    key = direct.columns[0]
    d = direct.sort_values(key).reset_index(drop=True)
    s = salted.sort_values(key).reset_index(drop=True)
    assert (d["n"] == s["n"]).all()
    assert (d["f"] == s["f"]).all()
    assert np.allclose(d["s"], s["s"], rtol=1e-12)


# ------------------------------------------------------------- anomaly


def test_climatology_and_anomaly_zscore(spark):
    from c3s_sm_spark.operators.anomaly import anomaly, climatology

    rows = [
        # key a, month-1 slot: values 10, 20 over two years -> mean 15, std ~7.07
        ("a", "2019-01-05 00:00:00", 10.0),
        ("a", "2020-01-07 00:00:00", 20.0),
        # key a, month-2 slot: single obs -> std NULL -> z NULL
        ("a", "2019-02-01 00:00:00", 5.0),
        # key b, month-1: constant values -> std 0 -> z NULL (no div blowup)
        ("b", "2019-01-01 00:00:00", 3.0),
        ("b", "2020-01-01 00:00:00", 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    clim = {
        (r["k"], r["cyc"]): r.asDict()
        for r in climatology(df, ["k"], "ts", "v", cycle="month").collect()
    }
    assert clim[("a", 1)]["clim_mean"] == 15.0
    assert clim[("a", 1)]["clim_n"] == 2
    assert clim[("a", 2)]["clim_std"] is None  # n=1
    assert clim[("b", 1)]["clim_std"] == 0.0  # constant
    out = {
        (r["k"], str(r["ts"])): r["z"]
        for r in anomaly(df, ["k"], "ts", "v", cycle="month").collect()
    }
    import math

    assert out[("a", "2019-01-05 00:00:00")] == pytest.approx(
        (10.0 - 15.0) / math.sqrt(50.0)
    )
    assert out[("a", "2019-02-01 00:00:00")] is None  # std NULL
    assert out[("b", "2019-01-01 00:00:00")] is None  # std 0
    # precomputed (longer-history) climatology path
    out2 = anomaly(
        df.where(F.col("ts") >= "2020-01-01"),
        ["k"],
        "ts",
        "v",
        cycle="month",
        clim=climatology(df, ["k"], "ts", "v", cycle="month"),
    ).collect()
    z20 = {r["k"]: r["z"] for r in out2}
    assert z20["a"] == pytest.approx((20.0 - 15.0) / math.sqrt(50.0))


def test_tiers_bit_identical_across_partitionings(spark):
    """north_rule: rolled-up points must match bit-for-bit at different
    cluster sizes. The raw values are integer-valued doubles (token ids),
    so every partial sum is exact below 2^53 and float addition order —
    the only partitioning-dependent effect — cannot change any tier
    value. This test pins that: same input at 3 vs 64 partitions, both
    paths repartitioned differently, compared on raw value BITS."""
    import struct

    from c3s_sm_spark.synth import gen_sequences, sequences_to_points

    def tiers(n_parts):
        pts = sequences_to_points(gen_sequences(spark, 150, n_partitions=n_parts))
        pts = pts.repartition(n_parts)
        daily = rollup(pts, ["doc_key"], "ts", "daily", value_col="v", flag_col="flag")
        mon = cascade(cascade(daily, ["doc_key"], "dekadal"), ["doc_key"], "monthly")
        out = {}
        for name, df in (("daily", daily), ("monthly", mon)):
            out[name] = {
                (r["doc_key"], str(r["ts"])): (
                    struct.pack("<d", r["v_mean"]),
                    struct.pack("<d", r["v_sum"]),
                    r["nobs"],
                    r["flags"],
                )
                for r in df.collect()
            }
        return out

    a, b = tiers(3), tiers(64)
    assert a == b  # exact bit equality, including the float columns


def test_quantiles_approx_close(spark, sf_dir):
    """The approx_percentile sketch (mergeable, bounded-memory — the
    10^12-point scale path) must track the exact interpolating
    percentile closely: with accuracy=10000 and test groups far below
    10k rows the sketch is rank-exact, so the only gap is interpolation
    between adjacent samples."""
    import __spark_entry__ as E

    exact = {
        r["user_id"]: (r["p50"], r["p90"])
        for r in E._q_rollup_quantiles(spark, sf_dir).collect()
    }
    approx = {
        r["user_id"]: (r["p50"], r["p90"])
        for r in E._q_rollup_quantiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    # rank-exactness, not value-closeness: with tiny test groups the
    # exact (interpolating) and approx (sample-returning) forms can gap
    # by a whole inter-sample spacing at p90, so assert instead that the
    # sketch returned an actual group sample at the correct rank
    vals = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "value")
        .collect()
    ):
        vals.setdefault(r["user_id"], []).append(r["value"])
    for uid, (p50, p90) in approx.items():
        vs = sorted(vals[uid])
        n = len(vs)
        for q, a in ((0.5, p50), (0.9, p90)):
            # percentile_approx returns the sample at ceil(q*n) (1-based)
            # when the sketch is exact (accuracy >> n)
            lo = max(0, math.ceil(q * n) - 2)
            hi = min(n - 1, math.ceil(q * n))
            window = [round(v, 4) for v in vs[lo : hi + 1]]
            assert a in window, (uid, q, a, window)


def test_percentile_index_golden_and_ties(spark):
    """X46 empirical percentile index: exact rank pieces with ties
    sharing a rank (SQL-standard), a single-observation slot yielding
    pct_rank 0 with pr_den 0, and cross-slot independence."""
    from c3s_sm_spark.operators.anomaly import percentile_index

    rows = [
        # key A, January slot: values 1.0, 2.0, 2.0, 5.0
        ("A", "2024-01-05 00:00:00", 1.0),
        ("A", "2024-01-10 00:00:00", 2.0),
        ("A", "2024-01-15 00:00:00", 2.0),
        ("A", "2024-01-20 00:00:00", 5.0),
        # key A, February slot: single observation
        ("A", "2024-02-01 00:00:00", 9.0),
        # key B, January slot: must not mix with A
        ("B", "2024-01-07 00:00:00", 100.0),
        ("B", "2024-01-08 00:00:00", 50.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts_s", "v"]).select(
        "k", F.to_timestamp("ts_s").alias("ts"), "v"
    )
    out = percentile_index(df, ["k"], ts_col="ts", value_col="v", cycle="month")
    got = {
        (r["k"], r["cyc"], r["v"]): (r["pr_num"], r["pr_den"], r["pct_rank"])
        for r in out.collect()
    }
    assert got[("A", 1, 1.0)] == (0, 3, 0.0)
    assert got[("A", 1, 2.0)] == (1, 3, 1 / 3)  # both ties share rank 2
    assert got[("A", 1, 5.0)] == (3, 3, 1.0)
    assert got[("A", 2, 9.0)] == (0, 0, 0.0)  # single-row slot
    assert got[("B", 1, 50.0)] == (0, 1, 0.0)
    assert got[("B", 1, 100.0)] == (1, 1, 1.0)
    # pct_rank == pr_num / pr_den wherever the slot has >1 row
    bad = out.filter(
        (F.col("pr_den") > 0)
        & (F.abs(F.col("pct_rank") - F.col("pr_num") / F.col("pr_den")) > 1e-12)
    )
    assert bad.count() == 0


def test_keep_top_k_golden_ties_and_plan(spark):
    """X48 grouped top-k: exact k survivors with a total order, rank()
    tie expansion with keep_ties, k=1 equivalence to keep_latest, and
    the WindowGroupLimit map-side pruning in the physical plan."""
    from c3s_sm_spark.operators.dedup import keep_latest, keep_top_k

    rows = [
        ("a", 10.0, 1), ("a", 30.0, 2), ("a", 20.0, 3), ("a", 30.0, 4),
        ("b", 5.0, 5),
    ]
    df = spark.createDataFrame(rows, ["k", "v", "rid"])
    got = {
        (r["k"], r["rid"], r["topk_rn"])
        for r in keep_top_k(df, ["k"], ["v", "rid"], k=2).collect()
    }
    # ties on v broken by rid desc: (a,4) rank1, (a,2) rank2
    assert got == {("a", 4, 1), ("a", 2, 2), ("b", 5, 1)}

    # keep_ties via rank(): both v=30 rows share rank 1, k=1 keeps both
    tied = {
        (r["k"], r["rid"])
        for r in keep_top_k(df, ["k"], ["v"], k=1, keep_ties=True).collect()
    }
    assert tied == {("a", 2), ("a", 4), ("b", 5)}

    # k=1 row_number == keep_latest survivor set
    a = {(r["k"], r["rid"]) for r in keep_top_k(df, ["k"], ["v", "rid"], k=1).drop("topk_rn").collect()}
    b = {(r["k"], r["rid"]) for r in keep_latest(df, ["k"], ["v", "rid"]).collect()}
    assert a == b

    # plan: rank-limit pushdown prunes map-side before the exchange
    plan = keep_top_k(df, ["k"], ["v", "rid"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_climatology_doy_window_brute_force(spark):
    """Circular DOY window equals brute force across the year boundary
    (Dec observations feed Jan slots and vice versa), folds leap day
    366 to slot 0, and is invariant to partitioning."""
    import datetime as dt
    import random

    from c3s_sm_spark.operators.anomaly import climatology_doy_window

    rng = random.Random(85)
    rows = []
    # two keys, observations clustered at the year boundary + a leap day
    for key in ("a", "b"):
        for base in (dt.date(2023, 12, 15), dt.date(2024, 1, 5)):
            for off in range(10):
                d = base + dt.timedelta(days=off)
                rows.append((key, dt.datetime.combine(d, dt.time()), rng.randint(-99, 99)))
    rows.append(("a", dt.datetime(2024, 2, 29), 7))   # leap-day row
    rows.append(("a", dt.datetime(2024, 12, 31), 11)) # doy 366 -> slot 0
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")

    h = 17
    want = {}
    for key, ts, v in rows:
        doy = (ts.timetuple().tm_yday - 1) % 365
        for off in range(-h, h + 1):
            slot = (doy + off) % 365
            s, n = want.get((key, slot), (0, 0))
            want[(key, slot)] = (s + v, n + 1)

    for parts in (1, 6):
        got = {
            (r["k"], r["doy"]): (r["clim_sum"], r["clim_n"])
            for r in climatology_doy_window(
                df.repartition(parts), ["k"], "ts", "v", half_window=h
            ).collect()
        }
        assert got == want, parts

    # wrap really happened: a Dec observation contributes to slot 0..
    assert any(slot < 5 for (_, slot) in want)
    with pytest.raises(ValueError, match="half_window"):
        climatology_doy_window(df, ["k"], "ts", "v", half_window=183)


def test_anomaly_vs_doy_climatology_brute_force(spark):
    """Departure pieces equal brute force (every observation joined to
    its own circular-window climatology; never a missed slot), and a
    precomputed longer-history climatology frame is honored."""
    import datetime as dt

    from c3s_sm_spark.operators.anomaly import (
        anomaly_vs_doy_climatology,
        climatology_doy_window,
    )

    rows = []
    for key in ("a", "b"):
        for off in range(12):
            d = dt.date(2023, 12, 25) + dt.timedelta(days=off)
            rows.append((key, dt.datetime.combine(d, dt.time()), (off + 1) * (1 if key == "a" else -3)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")

    h = 5
    clim = {}
    for key, ts, v in rows:
        doy = (ts.timetuple().tm_yday - 1) % 365
        for off in range(-h, h + 1):
            slot = (doy + off) % 365
            s, n = clim.get((key, slot), (0, 0))
            clim[(key, slot)] = (s + v, n + 1)
    want = {}
    for key, ts, v in rows:
        doy = (ts.timetuple().tm_yday - 1) % 365
        s, n = clim[(key, doy)]
        want[(key, ts)] = (doy, s, n, v * n - s)

    out = anomaly_vs_doy_climatology(df, ["k"], "ts", "v", half_window=h)
    got = {
        (r["k"], r["ts"]): (r["doy"], r["clim_sum"], r["clim_n"], r["dep_n"])
        for r in out.collect()
    }
    assert got == want
    assert len(got) == len(rows)  # no observation lost by the join

    # precomputed clim frame (e.g. longer history) is used as-is
    pre = climatology_doy_window(df, ["k"], "ts", "v", half_window=h)
    out2 = anomaly_vs_doy_climatology(
        df, ["k"], "ts", "v", half_window=99, clim=pre
    )
    got2 = {
        (r["k"], r["ts"]): (r["doy"], r["clim_sum"], r["clim_n"], r["dep_n"])
        for r in out2.collect()
    }
    assert got2 == want  # half_window ignored when clim is supplied
