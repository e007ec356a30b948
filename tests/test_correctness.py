"""t2 correctness: every declared query hash-matches the DuckDB oracle.

This replicates the driver's gate at sf0.001 (fast); the driver itself runs
sf0.01. Run the sf0.01 replica manually with
``python scripts/check_correctness.py /root/testdata/sf0.01``.
"""

from __future__ import annotations

import pytest

from multi_model_vectorsearch_spark import dq
from multi_model_vectorsearch_spark.testing import compare, duckdb_connect

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("entry", dq.registry(), ids=lambda e: e.name)
def test_dq_matches_oracle(entry, tables, oracle_con):
    res = compare(entry.name, entry.builder(tables), entry.oracle, SF_SMOKE,
                  oracle_con)
    assert res.ok, res.detail
    # dq175/dq177 are threshold queries (value concentration, excess stock)
    # whose predicates legitimately select nothing from the 500-doc smoke
    # fixture; the sf0.01 oracle gate sees 1125 / 4 rows respectively.
    may_be_empty = {"dq07_left_anti", "dq175_tpch_q11", "dq177_tpch_q20"}
    assert res.spark_rows > 0 or entry.name in may_be_empty, (
        "declared query returned no rows — not exercising the operator"
    )


def test_registry_names_unique():
    names = [e.name for e in dq.registry()]
    assert len(names) == len(set(names))


def test_every_query_has_oracle_or_note():
    for e in dq.registry():
        assert e.oracle is not None or e.note, e.name


def test_oracle_types_lint_clean_registrywide(oracle_con):
    """Round-8 recurrence guard at the REGISTRATION level: every declared
    oracle must bind to cross-engine-inert output types. The runtime
    parity check (pandas_dtype_parity) catches the r5/r6 HUGEINT class at
    gate time; this catches it the moment a new entry is registered —
    binder-only, so the whole registry lints in seconds without executing
    a single oracle."""
    from multi_model_vectorsearch_spark.testing import oracle_type_hazards

    bad = {
        e.name: hz
        for e in dq.registry() if e.oracle is not None
        if (hz := oracle_type_hazards(oracle_con, e.oracle))
    }
    assert not bad, f"hazard-typed oracle outputs: {bad}"


def test_oracle_types_lint_rejects_bad_fixture(oracle_con):
    """Synthetic bad oracles — one per hazard class — must be rejected,
    proving the lint would stop a round-9 registration from
    reintroducing the class."""
    from multi_model_vectorsearch_spark.testing import oracle_type_hazards

    fixtures = {
        "HUGEINT": "SELECT SUM(x) AS n FROM (VALUES (1), (2)) t(x)",
        "DOUBLE": "SELECT 1.5::DOUBLE AS v",
        "DECIMAL": "SELECT 1.50 AS v",
        "TIMESTAMP": "SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts",
        "[]": "SELECT [1, 2] AS arr",
        "STRUCT": "SELECT {'a': 1} AS st",
    }
    for cls, sql in fixtures.items():
        hz = oracle_type_hazards(oracle_con, sql)
        assert hz and cls in hz[0], (cls, hz)
    good = ("SELECT CAST(SUM(x) AS BIGINT) AS n, 'ok' AS s, DATE '2024-01-01'"
            " AS d, TRUE AS b FROM (VALUES (1), (2)) t(x)")
    assert oracle_type_hazards(oracle_con, good) == []


def test_parity_check_catches_uncast_hugeint_sum(spark, oracle_con):
    """The r5/r6 driver-red class: a bare integer SUM in a DuckDB oracle is
    HUGEINT, which ``.df()`` converts to float64, which the driver hashes as
    '150.0' against Spark's '150'.  The gate's fetchall() canon converts
    HUGEINT to Python int and is blind to it; pandas_dtype_parity must not
    be.  A gate-level red here means the recurrence guard itself broke.
    """
    from multi_model_vectorsearch_spark.testing import (
        oracle_meta,
        pandas_dtype_parity,
    )

    sdf = spark.range(3).selectExpr("CAST(id AS BIGINT) AS n")
    srows = [tuple(r) for r in sdf.collect()]
    bad = "SELECT SUM(x) AS n FROM (VALUES (0), (1), (2)) t(x) GROUP BY 1=1"
    msg = pandas_dtype_parity(sdf, srows, *oracle_meta(oracle_con, bad))
    assert msg is not None and "n" in msg and "BIGINT" in msg
    good = ("SELECT CAST(SUM(x) AS BIGINT) AS n "
            "FROM (VALUES (0), (1), (2)) t(x) GROUP BY 1=1")
    assert pandas_dtype_parity(
        sdf, srows, *oracle_meta(oracle_con, good)) is None


def test_duckdb_pandas_kind_matches_real_df(oracle_con):
    """duckdb_pandas_kind PREDICTS what ``.df()`` would produce so the gate
    can skip the second oracle execution; this battery pins the prediction
    against DuckDB's actual to-pandas conversion for every type class the
    parity check distinguishes.  A DuckDB upgrade that changes the mapping
    turns this red instead of silently weakening the gate."""
    from multi_model_vectorsearch_spark.testing import duckdb_pandas_kind

    cases = [
        ("CAST(1 AS TINYINT)", False), ("CAST(1 AS SMALLINT)", False),
        ("CAST(1 AS INTEGER)", False), ("CAST(1 AS BIGINT)", False),
        ("CAST(1 AS UBIGINT)", False), ("CAST(1 AS HUGEINT)", False),
        ("CAST(1 AS DECIMAL(10,2))", False), ("CAST(1 AS DOUBLE)", False),
        ("CAST(1 AS FLOAT)", False), ("TRUE", False), ("'x'", False),
        ("CAST(NULL AS BIGINT)", True), ("CAST(NULL AS INTEGER)", True),
        ("CAST(NULL AS DOUBLE)", True), ("CAST(NULL AS BOOLEAN)", True),
    ]
    for expr, has_null in cases:
        rel = oracle_con.sql(f"SELECT {expr} AS c")
        duck_type = str(rel.types[0])
        actual = rel.df()["c"].dtype.kind
        predicted = duckdb_pandas_kind(duck_type, has_null)
        # 'O' is the conservative catch-all: it must only appear when the
        # real kind is also non-numeric (object/datetime/...), never for a
        # numeric/bool column the check would then misjudge
        if predicted == "O":
            assert actual not in "iufb" or (has_null and actual == "f"), (
                expr, duck_type, actual)
        else:
            assert predicted == actual, (expr, duck_type, predicted, actual)
