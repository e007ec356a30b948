"""Local replica of the driver's correctness gate.

Runs a declared query on the engine (Spark) and its oracle (DuckDB) over the
same parquet tables and compares row count + canonicalized value multisets
order-insensitively — the same contract CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

from multi_model_vectorsearch_spark.sources.registry import TABLES


def _canon_value(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (_decimal.Decimal,)):
        return f"{v:f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: engines agree to >=1e-12 on declared floats,
        # and declared queries round outputs anyway.
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    # sort the permutation case-insensitively to match the lowercased schema
    # comparison: Spark and DuckDB may case identical column names
    # differently, and a case-sensitive sort would then order the two sides'
    # columns differently and report a spurious value mismatch
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


def oracle_type_hazards(con, oracle: str) -> list[str]:
    """Binder-only lint of a declared oracle's output types — the DuckDB
    twin of the Spark-side declared-output type ban (tests/test_entry.py).

    The r5/r6 driver-red class was an oracle column whose DuckDB type
    canonicalizes differently through pandas than the Spark column it is
    hashed against: uncast integer ``SUM`` → HUGEINT → float64 vs Spark's
    int64. This lints every hazard class at BIND time (``con.sql`` resolves
    columns/types without executing the plan), so the full registry checks
    in seconds and a new registration cannot reintroduce the class:

    - HUGEINT/UHUGEINT/DECIMAL: pandas converts to float64 (no int128 /
      decimal dtype) — hashes ``150.0`` against Spark's ``150``.
    - DOUBLE/FLOAT/REAL: raw floats are banned on the Spark side (snap to
      micro-unit BIGINTs); an oracle emitting them can only mismatch.
    - TIMESTAMP*/INTERVAL/TIME: the driver's pandas canonicalizer diverges
      on temporal columns (dq92 r2, dq201 r5) — DATE and epoch-µs BIGINTs
      are the green forms.
    - nested types (LIST/STRUCT/MAP): pandas cannot sort/hash them stably.

    Returns ``["col: TYPE", ...]`` — empty means clean.
    """
    rel = con.sql(oracle)
    bad: list[str] = []
    for c, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        hazardous = (
            ts in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL")
            or ts.startswith("DECIMAL")
            or ts.startswith("TIMESTAMP")
            or ts.startswith("TIME")
            or ts.startswith("INTERVAL")
            or ts.endswith("[]")
            or ts.startswith("STRUCT")
            or ts.startswith("MAP")
            or ts.startswith("UNION")
        )
        if hazardous:
            bad.append(f"{c}: {ts}")
    return bad


def duckdb_pandas_kind(duck_type: str, has_null: bool) -> str:
    """Predicted ``.df()`` numpy dtype *kind* for a DuckDB column type.

    Mirrors DuckDB's to-pandas conversion for the types the parity check
    cares about: integer types stay integer-kind unless NULLs force float64;
    HUGEINT/DECIMAL always become float64 (pandas has no int128/decimal);
    BOOLEAN becomes object when nullable.  Everything else maps to 'O' —
    parity only compares against Spark integral/float/bool columns, where
    'O' correctly reads as a mismatch.  Pinned against the real ``.df()``
    behavior by tests/test_correctness.py (dtype battery), so a DuckDB
    version drift surfaces as a test red, not a silent gate hole.
    """
    t = duck_type.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "f" if has_null else "i"
    if t in ("UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "f" if has_null else "u"
    if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "f"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "f"
    if t == "BOOLEAN":
        return "O" if has_null else "b"
    return "O"


def oracle_meta(con, oracle: str) -> tuple[list[str], list[str], list[tuple]]:
    """Columns, DuckDB type names, and rows of an oracle query — ONE
    execution (the relation's columns/types come from the binder, only
    ``fetchall`` runs the plan)."""
    rel = con.sql(oracle)
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    return ocols, otypes, rel.fetchall()


def pandas_dtype_parity(spark_df: DataFrame, srows: list, ocols: list[str],
                        otypes: list[str], orows: list) -> str | None:
    """Driver-faithful dtype check: the driver canonicalizes BOTH sides
    through pandas, where DuckDB HUGEINT (e.g. an uncast integer ``SUM``)
    converts to float64 and hashes ``150.0`` against Spark's ``150`` — red
    even when values are numerically identical (the r5/r6 dq201/205/206/
    207/210 reds).  The ``fetchall()`` canon below converts HUGEINT to
    Python int and masked that class for two rounds, so value equality
    alone is NOT driver-green; this check closes the gap.

    Rule: for a Spark integral column whose values contain no NULL (pandas
    would keep it int64), the oracle's ``.df()`` dtype must be integer-kind;
    for a Spark float/double column it must be float-kind; for boolean,
    bool-kind.  Nullable promotion (int + NULLs -> float64) happens on both
    sides identically, so columns with NULLs are exempt.

    Takes the oracle's already-fetched metadata (``oracle_meta``) instead of
    re-running the query through ``.df()`` — the dtype kind is *predicted*
    from the DuckDB type name + NULL presence (``duckdb_pandas_kind``), so
    each oracle executes exactly once per gate entry.
    """
    from pyspark.sql import types as T

    okinds = {
        c.lower(): duckdb_pandas_kind(
            otypes[j], any(r[j] is None for r in orows))
        for j, c in enumerate(ocols)
    }
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    floating = (T.FloatType, T.DoubleType)
    for i, f in enumerate(spark_df.schema.fields):
        kind = okinds.get(f.name.lower())
        if kind is None:  # column mismatch — reported separately
            continue
        has_null = any(r[i] is None for r in srows)
        if isinstance(f.dataType, integral) and not has_null:
            if kind not in "iu":
                return (f"oracle pandas dtype for integral column "
                        f"'{f.name}' is kind '{kind}' (driver hashes e.g. "
                        f"'150.0' vs '150') — CAST(... AS BIGINT) the "
                        f"oracle expression")
        elif isinstance(f.dataType, floating):
            if kind not in "f" and not (has_null and kind == "O"):
                return (f"oracle pandas dtype for float column '{f.name}' "
                        f"is kind '{kind}' — driver stringifies '1' vs "
                        f"'1.0'")
        elif isinstance(f.dataType, T.BooleanType) and not has_null:
            if kind not in "bO":
                return (f"oracle pandas dtype for boolean column "
                        f"'{f.name}' is kind '{kind}'")
    return None


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # a Spark-written table is a DIRECTORY of part files (the
            # synthesized sf1 gate data) — read_parquet needs the glob;
            # driver testdata tables are single files and take the
            # literal path
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def compare(name: str, spark_df: DataFrame, oracle: str | None, sf_dir: str,
            con=None) -> CompareResult:
    srows = spark_df.collect()
    scols = spark_df.columns
    s = canon_rows(scols, [tuple(r) for r in srows])
    if oracle is None:
        return CompareResult(name, True, len(s), -1, "rows-only (no oracle)")
    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        ocols, otypes, orows = oracle_meta(con, oracle)
    finally:
        if own_con:
            con.close()
    o = canon_rows(ocols, orows)
    parity = pandas_dtype_parity(spark_df, srows, ocols, otypes, orows)
    if parity is not None:
        return CompareResult(name, False, len(s), len(o),
                             f"pandas-dtype parity: {parity}")
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return CompareResult(name, False, len(s), len(o),
                             f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(s) != len(o):
        return CompareResult(name, False, len(s), len(o), "row count mismatch")
    if s != o:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b)
        return CompareResult(name, False, len(s), len(o),
                             f"value mismatch at sorted-row {diff[0]}: spark={diff[1]} oracle={diff[2]}")
    return CompareResult(name, True, len(s), len(o))
