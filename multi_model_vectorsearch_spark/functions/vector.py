"""Vector math as Catalyst higher-order-function expressions.

Replaces the reference's NumPy/Redis vector path (serialization db.py:21-22,
cosine KNN db.py:35-39 + main.py:206-221, L2 normalization app.py:14-15) with
pure SQL expressions over ``ARRAY<FLOAT>`` columns. Everything here runs
JVM-side inside whole-stage codegen — no Python workers, no serialization of
vectors to bytes (Parquet stores lists natively).

Determinism contract (SURVEY.md §5.3): all folds promote to DOUBLE and
accumulate left-to-right per row, which is order-stable, so results are
bit-reproducible and comparable against a DuckDB oracle after round(., 6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns, computed in DOUBLE."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    """Euclidean norm of a float-array column (DOUBLE)."""
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + _as_double(x) * _as_double(x))
    )


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance between two array columns (DOUBLE): the ONE
    definition of the sequential squared-diff fold every L2 consumer
    (PQ codebook assign, k-means, ADC table, dq229's exact arm) shares —
    the IEEE sequence is pinned here so a reordered/FMA'd variant can't
    silently break the cross-engine bit-identity the oracle gates rely
    on (DuckDB ``list_distance`` is bit-identical to this fold).
    Callers pass DOUBLE arrays; FLOAT inputs promote per-element in the
    subtraction exactly as DuckDB's DOUBLE[] cast does."""
    return F.sqrt(F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    ))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in DOUBLE.

    The reference gets this from Redis as ``1 - vector_score`` (main.py:221);
    here it is one expression the optimizer can inline anywhere. The norm
    product is floored at 1e-12 so an all-zero embedding scores 0.0 instead
    of NaN (NaN compares false everywhere and would silently vanish from
    top-k results).
    """
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))


def l2_normalize(v: Column) -> Column:
    """Unit-normalize a float-array column (reference: app.py:14-15).

    Storing normalized vectors makes cosine == dot — the same trick the
    reference applies at embed time, kept as an engine convention so the KNN
    scan can skip the per-row norm at query time. Zero vectors stay zero
    (norm floored at 1e-12) rather than becoming NaN.
    """
    norm = F.greatest(l2_norm(v), F.lit(1e-12))
    return F.transform(v, lambda x: _as_double(x) / norm)


# --- SQL-text forms (for spark.sql pipelines and documentation) -------------

def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def l2_norm_sql(v: str) -> str:
    return (
        f"sqrt(aggregate({v}, CAST(0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def cosine_similarity_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)} / "
        f"greatest({l2_norm_sql(a)} * {l2_norm_sql(b)}, CAST(1e-12 AS DOUBLE)))"
    )


# --- named SQL surface (CREATE TEMPORARY FUNCTION) --------------------------

def register_sql_functions(spark) -> None:
    """Expose the vector battery to pure-SQL users as named scalar
    functions (Spark 4 SQL UDFs): ``vec_dot``, ``vec_l2_norm``,
    ``vec_l2_normalize``, ``vec_cosine``.

    SQL UDFs are inlined expressions — Catalyst substitutes the body at
    analysis, so they run inside whole-stage codegen exactly like the
    Column builders above (NOT Python UDFs; no serialization boundary).
    Idempotent (CREATE OR REPLACE), session-scoped.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_dot("
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE "
        f"RETURN {dot_sql('a', 'b')}"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_l2_norm(v ARRAY<FLOAT>) "
        f"RETURNS DOUBLE RETURN {l2_norm_sql('v')}"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_l2_normalize("
        "v ARRAY<FLOAT>) RETURNS ARRAY<DOUBLE> "
        "RETURN transform(v, x -> CAST(x AS DOUBLE) / "
        f"greatest({l2_norm_sql('v')}, CAST(1e-12 AS DOUBLE)))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_cosine("
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE "
        f"RETURN {cosine_similarity_sql('a', 'b')}"
    )


def cosine_with_norms(a: Column, b: Column,
                      norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity with the norm folds HOISTED: callers compute
    ``l2_norm`` once per row on each join side and pass the columns in,
    so the per-pair expression is a single dot fold instead of three —
    a cross-join CSE Catalyst cannot perform across the join boundary.

    BIT-IDENTICAL to ``cosine_similarity(a, b)``: the norm columns carry
    the same doubles the inline folds would produce (same expression over
    the same rows), and the final divide is the same IEEE sequence — the
    oracle gate re-verifies equality wherever this replaces the inline
    form.
    """
    return dot(a, b) / F.greatest(norm_a * norm_b, F.lit(1e-12))
