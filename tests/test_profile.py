

def test_benford_pieces_and_scores(spark):
    import math

    import pytest

    from c3s_sm_spark.operators.profile import benford_pieces, benford_scores

    vals = [1, 19, 123, 2000, 999, 42, -5, 0, 7, 88, 923, 30000]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "k string, v long"
    )
    out = {
        r["digit"]: r.asDict()
        for r in benford_pieces(df, ["k"], "v").collect()
    }
    # leading digits of |v|>0: 1,1,1,2,9,4,5,7,8,9,3 -> counts
    want = {1: 3, 2: 1, 3: 1, 4: 1, 5: 1, 7: 1, 8: 1, 9: 2}
    assert {d: r["o"] for d, r in out.items()} == want
    assert all(r["n"] == 11 for r in out.values())  # zero excluded
    s = {
        r["digit"]: r.asDict()
        for r in benford_scores(benford_pieces(df, ["k"], "v")).collect()
    }
    e1 = 11 * math.log10(2)
    assert s[1]["expected"] == pytest.approx(e1, rel=1e-12)
    assert s[1]["chi2_part"] == pytest.approx((3 - e1) ** 2 / e1, rel=1e-12)


def test_benford_detects_fabricated_data(spark):
    import numpy as np

    from c3s_sm_spark.operators.profile import benford_pieces, benford_scores

    rng = np.random.default_rng(137)
    # benford-ish: exp of uniform log-scale spans several decades
    nat = np.floor(10 ** rng.uniform(0, 5, 20000)).astype(np.int64)
    # fabricated: uniform in [40000, 90000] -> leading digits 4-8 only
    fab = rng.integers(40000, 90000, 20000)
    rows = [("nat", int(v)) for v in nat] + [("fab", int(v)) for v in fab]
    df = spark.createDataFrame(rows, "k string, v long")
    chi = {}
    for r in benford_scores(benford_pieces(df, ["k"], "v")).collect():
        chi[r["k"]] = chi.get(r["k"], 0.0) + r["chi2_part"]
    # 8-dof chi2: natural data small, fabricated astronomically large
    assert chi["nat"] < 30
    assert chi["fab"] > 10000


def test_flatline_pieces_brute_force(spark):
    import datetime as dt

    from c3s_sm_spark.operators.profile import flatline_pieces

    t0 = dt.datetime(2024, 1, 1)
    vals = [5, 5, 5, 2, 2, 9, 9, 9, 9, 1, 5, 5]
    rows = [
        ("g", t0 + dt.timedelta(hours=i), i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v long")
    out = flatline_pieces(df, ["k"], "ts", "v", tiebreak="eid").collect()[0]
    assert out["n"] == 12
    assert out["max_run"] == 4 and out["run_value"] == 9
    assert out["t_run_start"] == 6  # 1-based
    assert out["n_runs"] == 5
    # tie on run length: FIRST longest wins
    tie = [7, 7, 3, 3, 8]
    df2 = spark.createDataFrame(
        [("g", t0 + dt.timedelta(hours=i), i, v) for i, v in enumerate(tie)],
        "k string, ts timestamp, eid long, v long",
    )
    o2 = flatline_pieces(df2, ["k"], "ts", "v", tiebreak="eid").collect()[0]
    assert o2["max_run"] == 2 and o2["run_value"] == 7 and o2["t_run_start"] == 1


def test_brown_forsythe_pieces_and_f(spark):
    import numpy as np
    import pytest

    from c3s_sm_spark.operators.profile import (
        brown_forsythe_pieces,
        brown_forsythe_scores,
    )

    rng = np.random.default_rng(139)
    a = [int(v) for v in rng.integers(-10, 11, 40)]     # tight spread
    b = [int(v) for v in rng.integers(-200, 201, 40)]   # wide spread
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b]
    df = spark.createDataFrame(rows, "k string, grp string, v long")
    p = {
        r["grp"]: r.asDict()
        for r in brown_forsythe_pieces(df, ["k"], "grp", "v").collect()
    }
    for name, vals in (("a", a), ("b", b)):
        med = sorted(vals)[(len(vals) + 1) // 2 - 1]
        ds = [abs(v - med) for v in vals]
        assert p[name]["n"] == 40
        assert p[name]["sd"] == sum(ds)
        assert p[name]["sd2"] == sum(d * d for d in ds)
    out = brown_forsythe_scores(
        brown_forsythe_pieces(df, ["k"], "grp", "v"), ["k"]
    ).collect()[0]
    # reference F computed directly from the same deviations
    meds = {n: sorted(v)[(len(v) + 1) // 2 - 1] for n, v in (("a", a), ("b", b))}
    d_all = {n: [abs(x - meds[n]) for x in v] for n, v in (("a", a), ("b", b))}
    grand = sum(sum(d) for d in d_all.values()) / 80
    ssb = sum(40 * (sum(d) / 40 - grand) ** 2 for d in d_all.values())
    ssw = sum(
        sum((x - sum(d) / 40) ** 2 for x in d) for d in d_all.values()
    )
    want_f = (ssb / 1) / (ssw / 78)
    assert out["bf_f"] == pytest.approx(want_f, rel=1e-9)
    assert out["bf_f"] > 50  # 20x spread ratio is unmissable
    # equal-spread control: F small
    c = [int(v) for v in rng.integers(-50, 51, 40)]
    d2 = [int(v) for v in rng.integers(-50, 51, 40)]
    df2 = spark.createDataFrame(
        [("g", "a", v) for v in c] + [("g", "b", v) for v in d2],
        "k string, grp string, v long",
    )
    out2 = brown_forsythe_scores(
        brown_forsythe_pieces(df2, ["k"], "grp", "v"), ["k"]
    ).collect()[0]
    assert out2["bf_f"] < 5


def test_zipf_fit_recovers_planted_exponent(spark):
    import numpy as np
    import pytest

    from c3s_sm_spark.operators.textstats import zipf_fit

    # exact Zipf: cnt = round(C / rank)
    rows = [("c", r, max(1, round(100000 / r))) for r in range(1, 201)]
    df = spark.createDataFrame(rows, "k string, rank long, occurrences long")
    out = zipf_fit(df, ["k"]).collect()[0]
    assert out["n_ranks"] == 200
    assert out["zipf_slope"] == pytest.approx(-1.0, abs=0.01)
    assert out["zipf_r2"] > 0.9999
    # flat (template-stamped) corpus: slope ~ 0
    flat = spark.createDataFrame(
        [("f", r, 500) for r in range(1, 101)], "k string, rank long, occurrences long"
    )
    o2 = zipf_fit(flat, ["k"]).collect()[0]
    assert abs(o2["zipf_slope"]) < 1e-12
    # degenerate: single rank -> nulls
    one = spark.createDataFrame([("o", 1, 10)], "k string, rank long, occurrences long")
    oo = zipf_fit(one, ["o" == "o" and "k"]).collect()[0]
    assert oo["zipf_slope"] is None


def test_grubbs_pieces_brute_force_and_plant(spark):
    import numpy as np
    import pytest

    from c3s_sm_spark.operators.profile import grubbs_pieces, grubbs_scores

    rng = np.random.default_rng(149)
    base = [int(v) for v in rng.integers(-100, 101, 60)]
    vals = base + [5000]  # planted extreme high outlier
    df = spark.createDataFrame(
        [("g", v) for v in vals], "k string, v long"
    )
    out = grubbs_pieces(df, ["k"], "v").collect()[0]
    n = len(vals)
    assert out["n"] == n
    assert out["sum_v"] == sum(vals)
    assert out["sum_v2"] == sum(v * v for v in vals)
    assert out["max_v"] == 5000 and out["min_v"] == min(vals)
    want_gnum = max(
        n * max(vals) - sum(vals), sum(vals) - n * min(vals)
    )
    assert out["g_num"] == want_gnum
    assert out["side"] == 1
    s = grubbs_scores(grubbs_pieces(df, ["k"], "v")).collect()[0]
    mean = sum(vals) / n
    sd = (sum((v - mean) ** 2 for v in vals) / (n - 1)) ** 0.5
    want_g = max(abs(max(vals) - mean), abs(min(vals) - mean)) / sd
    assert s["g_stat"] == pytest.approx(want_g, rel=1e-9)
    assert s["g_excess"] > 1.3  # the plant screams
    # clean control: excess ~<= 1.3; low-side plant flips the side
    clean = spark.createDataFrame(
        [("c", int(v)) for v in rng.normal(0, 50, 200)], "k string, v long"
    )
    sc = grubbs_scores(grubbs_pieces(clean, ["k"], "v")).collect()[0]
    assert sc["g_excess"] < 1.6 and sc["g_stat"] > 0
    lo = spark.createDataFrame(
        [("l", v) for v in base + [-5000]], "k string, v long"
    )
    assert grubbs_pieces(lo, ["k"], "v").collect()[0]["side"] == -1
    # degenerate: constant group -> null scores, n<3 -> null scores
    flat = spark.createDataFrame([("f", 7)] * 5, "k string, v long")
    sf = grubbs_scores(grubbs_pieces(flat, ["k"], "v")).collect()[0]
    assert sf["g_stat"] is None and sf["g_excess"] is None


def test_welch_pieces_brute_force(spark):
    import numpy as np
    import pytest

    from c3s_sm_spark.operators.profile import welch_pieces, welch_scores

    rng = np.random.default_rng(193)
    a = [int(v) for v in rng.normal(100, 20, 80)]
    b = [int(v) for v in rng.normal(130, 40, 50)]  # shifted + wider
    rows = (
        [("a", v) for v in a]
        + [("b", v) for v in b]
        + [("c", 999)]  # third group must be excluded
    )
    df = spark.createDataFrame(rows, "g string, v long")
    p = welch_pieces(df, "g", "v", "a", "b").collect()[0]
    assert p["n_a"] == 80 and p["sum_a"] == sum(a)
    assert p["sum2_a"] == sum(v * v for v in a)
    assert p["n_b"] == 50 and p["sum_b"] == sum(b)
    assert p["sum2_b"] == sum(v * v for v in b)

    s = welch_scores(welch_pieces(df, "g", "v", "a", "b")).collect()[0]
    va = np.var(a, ddof=1)
    vb = np.var(b, ddof=1)
    se2 = va / 80 + vb / 50
    want_t = (np.mean(a) - np.mean(b)) / np.sqrt(se2)
    want_df = se2**2 / ((va / 80) ** 2 / 79 + (vb / 50) ** 2 / 49)
    assert s["t_stat"] == pytest.approx(want_t, rel=1e-12)
    assert s["welch_df"] == pytest.approx(want_df, rel=1e-12)
    assert s["t_stat"] < -4  # the shift is detected
    sp = np.sqrt((79 * va + 49 * vb) / 128)
    assert s["cohens_d"] == pytest.approx((np.mean(a) - np.mean(b)) / sp, rel=1e-12)

    # degenerate: constant groups -> null t
    flat = spark.createDataFrame(
        [("a", 5)] * 4 + [("b", 5)] * 4, "g string, v long"
    )
    sf = welch_scores(welch_pieces(flat, "g", "v", "a", "b")).collect()[0]
    assert sf["t_stat"] is None and sf["welch_df"] is None
