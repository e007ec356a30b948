"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``multi_model_vectorsearch_spark`` package; this
module only adapts it to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_model_vectorsearch_spark import dq  # noqa: E402
from multi_model_vectorsearch_spark.operators.graph import dq34_expand  # noqa: E402
from multi_model_vectorsearch_spark.sources.registry import load_tables  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: graph-expanded semantic search end-to-end.

    The reference's ``/search`` pipeline (main.py:90-125) in one declarative
    plan: exact cosine KNN seeds → KNN-graph edges with cross-modal boost →
    1-hop score-decay expansion → global top-k.
    """
    tables = load_tables(spark, "/root/testdata/sf0.001")
    return dq34_expand(tables, query_vec_id=0, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dq.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every hash-checked query."""
    return dq.oracle_sql()
