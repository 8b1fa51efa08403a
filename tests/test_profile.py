

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
