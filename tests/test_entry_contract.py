"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` through DuckDB
on the same parquet tables; compare row counts, (canonicalized) schemas,
and exact values — order-insensitive, like the driver's value hash."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sorted columns, sorted
    rows, normalized dtypes."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(dt):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(
        drop=True
    )


def _assert_match(name, spark_pdf, oracle_pdf):
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} != {list(o.columns)}"
    assert len(s) == len(o), f"{name}: row count {len(s)} != {len(o)}"
    for c in s.columns:
        a, b = s[c].to_numpy(), o[c].to_numpy()
        if s[c].dtype.kind == "f":
            eq = np.array_equal(a, b, equal_nan=True)
            if not eq:
                close = np.allclose(a, b, rtol=1e-9, equal_nan=True)
                raise AssertionError(
                    f"{name}.{c}: float mismatch (allclose={close}); "
                    f"first diffs: {[(x, y) for x, y in zip(a, b) if not (x == y or (np.isnan(x) and np.isnan(y)))][:5]}"
                )
        else:
            if not (a == b).all():
                bad = np.nonzero(a != b)[0][:5]
                raise AssertionError(f"{name}.{c}: mismatch at rows {bad}: {a[bad]} vs {b[bad]}")


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, con, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: must run and produce a stable schema
        assert spark_pdf.shape[1] > 0
        return
    oracle_pdf = con.sql(ORACLES[name]).df()
    _assert_match(name, spark_pdf, oracle_pdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_mean4_formula_is_decimal_exact_half_up():
    """The engine's bit-stable mean floor((2*sm + 100*n)/(200*n))/1e4 must
    equal DECIMAL-exact half-up rounding of sm/(1e2*n) at 4 places for
    any micro-unit sum and count (property test, no Spark needed)."""
    from decimal import ROUND_HALF_UP, Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(
        sm=st.integers(min_value=0, max_value=10**13),
        n=st.integers(min_value=1, max_value=10**5),
    )
    def check(sm, n):
        got = int((2 * sm + 100 * n) // (200 * n))  # integer form
        exp = int(
            (Decimal(sm) / (100 * n)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        assert got == exp, (sm, n, got, exp)
        # the float-division form used in the actual Column expression
        # agrees within the proven 1/(200n) >> 1-ulp safety margin
        import math

        got_f = math.floor((2 * sm + 100 * n) / (200 * n))
        assert got_f == exp, (sm, n, got_f, exp)

    check()


def test_registry_invariant_every_query_oracled_or_pinned():
    """r4 verdict task 8: the registry invariant is ENFORCED, not
    asserted — every ``queries()`` entry must have an ``oracle_sql()``
    twin, or (rows-only) a grep-able pytest pin: its name or one of its
    imported operators must appear somewhere under tests/. Runs the
    same check as ``tools/gen_registry.py`` (which refuses to write
    REGISTRY.md on violation)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ))
    import gen_registry

    bad = gen_registry.check_invariant(
        entrymod.queries(), entrymod.oracle_sql()
    )
    assert bad == [], f"rows-only queries with no pytest pin: {bad}"
