"""Physical-plan introspection helpers (SURVEY.md §4).

The engine's performance contract is expressed as plan-shape assertions:
broadcast joins for dimension tables, ``TakeOrderedAndProject`` for top-k,
pushed filters and pruned read schemas at the parquet scan, and whole-stage
codegen (no Python evaluation) in relational paths. ``tests/test_plans.py``
pins these so a regression that silently degrades the 100 TB plan fails CI.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """Capture ``df.explain('formatted')`` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def scan_leaf_classes(df: DataFrame) -> list[str]:
    """Class names of the physical plan's leaf nodes — the actual data
    sources execution will read. A cached query's textual explain still
    PRINTS the parquet lineage under its InMemoryRelation, so string
    checks for "Scan parquet" false-positive on fully-warm plans; the
    executed plan's leaves are the structural truth (InMemoryTableScan
    leaf = served from cache, FileSourceScan leaf = hits storage).
    AdaptiveSparkPlanExec presents as a leaf until executed — it is
    unwrapped into its initial plan. ReusedExchangeExec and AQE query
    stages are NOT unwrapped: they appear as leaves by class name, which
    the callers' assertions treat as non-storage nodes."""
    out: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        n = node.children().size()
        if n == 0:
            out.append(cls)
            return
        for i in range(n):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def plan_has(df: DataFrame, *fragments: str) -> bool:
    plan = explain_formatted(df)
    return all(f in plan for f in fragments)


def plan_lacks(df: DataFrame, *fragments: str) -> bool:
    plan = explain_formatted(df)
    return all(f not in plan for f in fragments)
