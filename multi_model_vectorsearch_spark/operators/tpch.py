"""Classic TPC-H query shapes over the fixture star schema.

The canonical analytics workloads every engine is judged on, adapted to the
fixture columns (orders has no shippriority; dates span 1995-2001). Money
arithmetic goes through DECIMAL casts per SURVEY.md §5.3 rule 2 so sums are
exact and order-independent; result scales equal the product scale (2+2 -> 4,
+2 -> 6) so no final rounding happens — Spark rounds DECIMAL casts half-up
while DuckDB rounds half-even, so any lossy cast is a latent mismatch; averages divide the exact sums in double and
round. All four plans are broadcast/partial-agg shapes Catalyst handles with
no hints beyond the dimension broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict

_D = "decimal(18,2)"


def dq77_tpch_q1(t: Tables) -> DataFrame:
    """Q1 pricing summary: ship-date cutoff, exact DECIMAL sums per flag."""
    li = t["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    ext = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_D)
    tax = F.col("l_tax").cast(_D)
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_D)).cast(_D).alias("sum_qty"),
        F.sum(ext).cast(_D).alias("sum_base"),
        F.sum(ext * (F.lit(1).cast(_D) - disc))
        .cast("decimal(18,4)").alias("sum_disc"),
        F.sum(ext * (F.lit(1).cast(_D) - disc) * (F.lit(1).cast(_D) + tax))
        .cast("decimal(18,6)").alias("sum_charge"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base", "sum_disc",
        "sum_charge",
        F.round(F.col("sum_qty").cast("double") / F.col("n"), 6).alias("avg_qty"),
        "n",
    )


def dq78_tpch_q3(t: Tables) -> DataFrame:
    """Q3 shipping priority (adapted): top-10 unshipped BUILDING orders."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    rev = (
        F.col("l_extendedprice").cast(_D)
        * (F.lit(1).cast(_D) - F.col("l_discount").cast(_D))
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("decimal(18,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def dq79_tpch_q5(t: Tables) -> DataFrame:
    """Q5 local supplier volume: revenue by nation, same-nation cust+supp."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    rev = (
        F.col("l_extendedprice").cast(_D)
        * (F.lit(1).cast(_D) - F.col("l_discount").cast(_D))
    )
    j = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(F.sum(rev).cast("decimal(18,4)").alias("revenue"))


def dq80_tpch_q6(t: Tables) -> DataFrame:
    """Q6 forecasting revenue change: one filtered exact-sum scan."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(_D) * F.col("l_discount").cast(_D)
    return li.agg(F.sum(rev).cast("decimal(18,4)").alias("revenue"))
