"""Time-window aggregations over events (SURVEY.md B41-B43, DQ-36..38).

These are the *batch* forms of the streaming windows in
``streaming/windows.py`` — same ``window()`` / ``session_window()``
expressions, so the streaming jobs are verified by batch equivalence
(SURVEY.md §5.4): replaying ``events`` through ``readStream`` must produce
exactly these results.

Window starts are exposed as epoch seconds (tumbling/sliding) or epoch micros
(session) so the DuckDB oracle can reproduce them with integer bucket math.
Money-ish sums go through DECIMAL(18,2) (order-independent exactness) and
emit exact integer cents (decimal × 100, lossless): DECIMAL outputs
hash-mismatch on repr after the driver's pandas round-trip, and rounded
DOUBLE outputs split on Spark-vs-DuckDB round() (the r5 reds); BIGINT
cents cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict


def _agg_cols(df):
    return [
        F.count("*").alias("c"),
        # exact cents: decimal sum × 100 is lossless and integer-typed —
        # no decimal-repr or rounded-double hash hazard in either engine
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint").alias("sv_cents"),
    ]


def dq36_tumbling(t: Tables) -> DataFrame:
    """B41: tumbling 1-hour window aggregation."""
    e = t["events"]
    g = e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
    return g.agg(*_agg_cols(e)).select(
        F.unix_timestamp(F.col("w.start")).alias("ws"), "event_type", "c",
        "sv_cents"
    )


def dq37_sliding(t: Tables) -> DataFrame:
    """B42: sliding 1-hour window, 30-minute slide (each event in 2 windows)."""
    e = t["events"]
    g = e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
    return g.agg(*_agg_cols(e)).select(
        F.unix_timestamp(F.col("w.start")).alias("ws"), "event_type", "c",
        "sv_cents"
    )


def dq38_session(t: Tables) -> DataFrame:
    """B43: session windows with a 30-minute gap, per user."""
    e = t["events"]
    g = e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
    return g.agg(*_agg_cols(e)).select(
        "user_id", F.unix_micros(F.col("w.start")).alias("ss"), "c", "sv_cents"
    )
