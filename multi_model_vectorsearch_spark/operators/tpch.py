"""Classic TPC-H query shapes over the fixture star schema.

The canonical analytics workloads every engine is judged on, adapted to the
fixture columns (orders has no shippriority; dates span 1995-2001). Money
arithmetic goes through DECIMAL casts per SURVEY.md §5.3 rule 2 so sums are
exact and order-independent; result scales equal the product scale (2+2 -> 4,
+2 -> 6) so no lossy cast happens — Spark rounds DECIMAL casts half-up
while DuckDB rounds half-even, so any lossy cast is a latent mismatch.
Final projections emit exact scaled-integer BIGINTs (decimal × 10^scale —
lossless, the fraction is zero by construction): DECIMAL output columns
hash-mismatch on repr ("253942.00" vs "253942.0" after the driver's pandas
round-trip), and rounded-DOUBLE outputs split on Spark's shortest-repr
round() vs DuckDB's binary round (the r5 driver reds); integer cents/e4/e6
units cannot diverge. Ratios (avg, share) use the floor(x·1e6 + 0.5) snap.
All plans are broadcast/partial-agg shapes Catalyst handles with no hints
beyond the dimension broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap

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
        "l_returnflag", "l_linestatus",
        # exact scaled-integer outputs: decimal × 10^scale is lossless
        (F.col("sum_qty") * 100).cast("bigint").alias("sum_qty_cents"),
        (F.col("sum_base") * 100).cast("bigint").alias("sum_base_cents"),
        (F.col("sum_disc") * 10000).cast("bigint").alias("sum_disc_e4"),
        (F.col("sum_charge") * 1000000).cast("bigint")
        .alias("sum_charge_e6"),
        snap(F.col("sum_qty").cast("double") / F.col("n"))
        .alias("avg_qty_micro"),
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
        .agg(F.sum(rev).cast("decimal(18,4)").alias("rev_d"))
        .orderBy(F.desc("rev_d"), F.asc("l_orderkey"))
        .limit(10)
        # DATE output, not timestamp_ntz: the driver canonicalizer
        # diverges on timestamps (dq92 flickered red in r2, dq201 red in
        # r5); DATE (dq68) has a green history. o_orderdate is midnight-
        # aligned in the testdata so the cast is lossless.
        .select("l_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                (F.col("rev_d") * 10000).cast("bigint").alias("revenue_e4"))
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
    return j.groupBy("n_name").agg(
        (F.sum(rev) * 10000).cast("bigint").alias("revenue_e4")
    )


def dq80_tpch_q6(t: Tables) -> DataFrame:
    """Q6 forecasting revenue change: one filtered exact-sum scan."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(_D) * F.col("l_discount").cast(_D)
    return li.agg((F.sum(rev) * 10000).cast("bigint").alias("revenue_e4"))


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(_D) * (
        F.lit(1).cast(_D) - F.col("l_discount").cast(_D)
    )


def dq87_tpch_q4(t: Tables) -> DataFrame:
    """Q4 order-priority checking (adapted): EXISTS → left-semi join.

    The fixture lacks l_commitdate/l_receiptdate, so "late" is re-expressed
    as any line shipped more than 60 days after the order date. Catalyst
    plans the EXISTS as a semi join on the order key with the inequality as
    a join residual — no decorrelation subquery survives to the physical
    plan, so it scales as one shuffle on l_orderkey.
    """
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def dq88_tpch_q10(t: Tables) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by returned revenue."""
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("decimal(18,4)").alias("rev_d"))
        .orderBy(F.desc("rev_d"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name",
                snap(F.col("c_acctbal"), 100).alias("c_acctbal_cents"),
                "n_name",
                (F.col("rev_d") * 10000).cast("bigint").alias("revenue_e4"))
    )


def dq89_tpch_q12(t: Tables) -> DataFrame:
    """Q12 (adapted): priority-class line counts per line status.

    The fixture has no l_shipmode; the Q12 shape — join + conditional
    two-bucket counts — is kept, bucketing on o_orderpriority instead.
    """
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
    )


def dq90_tpch_q14(t: Tables) -> DataFrame:
    """Q14 promotion effect: PROMO revenue share for one month.

    Both sums are exact DECIMAL; only the final ratio drops to double
    (rounded), so the scalar result is scale-independent.
    """
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    j = li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast(_D)))
        .cast("decimal(18,4)").alias("promo"),
        F.sum(_rev()).cast("decimal(18,4)").alias("total"),
    )
    return agg.select(
        snap(F.lit(100.0) * F.col("promo").cast("double")
             / F.col("total").cast("double")).alias("promo_share_micro")
    )


def dq91_tpch_q15(t: Tables) -> DataFrame:
    """Q15 top supplier: suppliers whose quarterly revenue equals the max.

    The max is attached via a broadcast cross join of the 1-row aggregate
    (scale-safe — no global window), and revenue is exact DECIMAL so the
    max comparison is deterministic across engines.
    """
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("decimal(18,4)").alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                (F.col("total_rev") * 10000).cast("bigint")
                .alias("total_rev_e4"))
    )


def dq92_tpch_q18(t: Tables) -> DataFrame:
    """Q18 large-volume customers: orders with total quantity > 250."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).cast(_D).alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(250).cast(_D))
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey",
                # DATE, not timestamp_ntz — this column made dq92 flicker
                # red in CORRECTNESS_r02 (driver timestamp canonicalizer)
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                (F.col("sum_qty") * 100).cast("bigint").alias("sum_qty_cents"))
    )


def dq93_tpch_q19(t: Tables) -> DataFrame:
    """Q19 discounted revenue: disjunctive brand/size/quantity predicates.

    The OR-of-ANDs lands as a single join residual after the broadcast hash
    join on p_partkey — the canonical "can your optimizer keep a disjunction
    out of the join key" shape.
    """
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(5, 15))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(15, 25))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(25, 35))
    )
    return j.filter(cond).agg(
        (F.sum(_rev()) * 10000).cast("bigint").alias("revenue_e4")
    )


def dq94_tpch_q22(t: Tables) -> DataFrame:
    """Q22 global sales opportunity (adapted): rich, recently-inactive custs.

    c_acctbal > avg(positive balances) is evaluated as
    ``bal * n > sum`` in exact DECIMAL — dividing first would compare
    against a double average whose last-ulp differs between engines and can
    flip rows at the threshold. NOT EXISTS recent orders → left-anti join;
    grouping key is the nation (the fixture has no phone country codes).
    """
    c = t["customer"]
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_D)).alias("s"),
        F.count("*").alias("n"),
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast(_D) * F.col("n") > F.col("s")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    inactive = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return inactive.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        (F.sum(F.col("c_acctbal").cast(_D)) * 100).cast("bigint")
        .alias("totacctbal_cents"),
    )


def dq156_tpch_q7(t: Tables) -> DataFrame:
    """Q7 volume shipping (adapted to the fixture's synthetic nations:
    bilateral trade between the AMERICA and ASIA *regions*, reported per
    nation pair and ship year — same plan shape, selective enough to be
    non-empty at every fixture scale). Dimension joins broadcast; the fact
    table shuffles once for the final aggregate."""
    reg = t["region"].select("r_regionkey", "r_name")
    n1 = (
        t["nation"].join(
            F.broadcast(reg),
            F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"),
                F.col("r_name").alias("supp_region"))
    )
    n2 = n1.select(F.col("snk").alias("cnk"),
                   F.col("supp_nation").alias("cust_nation"),
                   F.col("supp_region").alias("cust_region"))
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    j = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
        .filter(
            ((F.col("supp_region") == "AMERICA")
             & (F.col("cust_region") == "ASIA"))
            | ((F.col("supp_region") == "ASIA")
               & (F.col("cust_region") == "AMERICA")))
    )
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev()) * 10000).cast("bigint").alias("revenue_e4"))
    )


def dq157_tpch_q8(t: Tables) -> DataFrame:
    """Q8 national market share (adapted): NATION_2's share of PROMO-part
    revenue sold to ASIA customers, by order year. Exact DECIMAL sums;
    the share divides the two sums in double and rounds."""
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    r = t["region"].filter(F.col("r_name") == "ASIA")
    nc = t["nation"].join(F.broadcast(r),
                          F.col("n_regionkey") == F.col("r_regionkey")) \
        .select(F.col("n_nationkey").alias("cnk"))
    ns = t["nation"].select(F.col("n_nationkey").alias("snk"),
                            F.col("n_name").alias("supp_nation"))
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    j = (
        t["lineitem"].join(F.broadcast(p),
                           F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("snk"))
    )
    yearly = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", _rev())
              .otherwise(F.lit(0).cast(_D))).cast("decimal(18,4)")
        .alias("nation_rev"),
        F.sum(_rev()).cast("decimal(18,4)").alias("total_rev"),
    )
    return yearly.select(
        "o_year",
        snap(F.col("nation_rev").cast("double")
             / F.col("total_rev").cast("double")).alias("mkt_share_micro"),
    )


def dq158_tpch_q13(t: Tables) -> DataFrame:
    """Q13 customer order-count distribution (adapted filter: non-URGENT
    orders stand in for the comment pattern). Left join so zero-order
    customers land in the c_count=0 bucket; two hash aggs, no window."""
    o = t["orders"].filter(~F.col("o_orderpriority").like("%URGENT%")) \
        .select("o_orderkey", "o_custkey")
    per_cust = (
        t["customer"].select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def dq159_tpch_q17(t: Tables) -> DataFrame:
    """Q17 small-quantity-order revenue (adapted: Brand#1 + p_size=1 stands
    in for the container predicate): weekly-demand revenue from lineitems
    under 20% of the part's average quantity. The per-part average is a
    fact-side agg joined back — two shuffles on l_partkey, no correlated
    re-scan."""
    p = t["part"].filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") == 1)
    ).select("p_partkey")
    li = t["lineitem"].join(F.broadcast(p),
                            F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li.groupBy("l_partkey").agg(
        (F.avg(F.col("l_quantity").cast("double")) * 0.2).alias("qlim"))
    small = li.join(avg_q, "l_partkey").filter(
        F.col("l_quantity").cast("double") < F.col("qlim"))
    return small.agg(
        snap(
            F.sum(F.col("l_extendedprice").cast(_D)).cast("double") / 7.0,
            100).alias("avg_yearly_cents"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


def dq160_tpch_q21(t: Tables) -> DataFrame:
    """Q21 waiting-suppliers shape (adapted: l_returnflag='R' stands in for
    the late-receipt predicate — the fixture has no commit/receipt dates):
    suppliers who are the *only* R-flag supplier on a multi-supplier final
    order. Preserves the exists / not-exists double correlation as one
    semi- and one anti-join on (orderkey, suppkey)."""
    s = t["supplier"]
    o = t["orders"].filter(F.col("o_orderstatus") == "F") \
        .select("o_orderkey")
    l1 = (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
    )
    others = t["lineitem"].select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        "l_returnflag",
    )
    exists_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    not_exists_other_r = exists_other.join(
        others.filter(F.col("l_returnflag") == "R"),
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_anti",
    )
    return (
        not_exists_other_r
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- partsupp-dependent shapes (Q2/Q9/Q11/Q16/Q20) ---------------------------
# The fixtures ship no partsupp table, so these five shapes run over a
# deterministic surrogate derived from lineitem: availqty = total quantity
# ever shipped for the (part, supplier) pair, supplycost = the minimum
# observed unit price. Costs travel as integer cents (bigint) so every
# aggregate is exact and order-independent in both engines.


def _partsupp(t: Tables) -> DataFrame:
    li = t["lineitem"]
    # unit cost in cents via integer floor division: rounding the FP
    # quotient hits exact .xx5 halves (Spark rounds the decimal repr
    # HALF_UP, DuckDB rounds the binary double — they disagree), while
    # floor(line_cents / qty) is the same exact integer in both engines
    # (2-decimal prices make line_cents a true integer; the double
    # quotient's error is orders below the 1/qty step).
    line_cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    unit_cents = F.floor(line_cents / F.col("l_quantity").cast("bigint"))
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum("l_quantity").cast("bigint").alias("ps_availqty"),
        F.min(unit_cents).cast("bigint").alias("ps_cost_cents"),
    )


def dq173_tpch_q2(t: Tables) -> DataFrame:
    """Q2 shape: min-cost supplier per qualifying part within a region.

    Cost ties keep every minimal supplier (as TPC-H does); the min is an
    exact integer-cents comparison, so tie semantics are engine-stable.
    """
    from pyspark.sql import Window

    ps = _partsupp(t)
    j = (
        ps.join(F.broadcast(
            t["part"].filter(F.col("p_size").between(10, 20)
                             & (F.col("p_type") == "STANDARD"))),
            F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("mc", F.min("ps_cost_cents").over(w))
        .filter(F.col("ps_cost_cents") == F.col("mc"))
        .select(
            "p_partkey", F.col("ps_suppkey").alias("s_suppkey"), "s_name",
            snap(F.col("s_acctbal"), 100).alias("s_acctbal_cents"), "n_name",
            F.col("ps_cost_cents").alias("supplycost_cents"),
        )
    )


def dq174_tpch_q9(t: Tables) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year.

    Revenue sums exactly in DECIMAL; cost sums exactly in integer cents —
    the final profit is one subtraction of two exact sums, so the result
    is bit-stable under any aggregation order.
    """
    ps = _partsupp(t)
    j = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
              & (F.col("l_suppkey") == F.col("ps_suppkey")))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    rev = (F.col("l_extendedprice").cast(_D)
           * (F.lit(1).cast(_D) - F.col("l_discount").cast(_D)))
    # sum the cents products as decimal(38,0): Spark's bigint sum wraps
    # silently at 2^63 while the DuckDB oracle promotes to HUGEINT — at
    # fixture scale both paths give the identical integer (and the same
    # double after conversion), but only the decimal sum survives 100 TB
    cost_cents = (F.col("ps_cost_cents")
                  * F.col("l_quantity").cast("bigint")).cast("decimal(38,0)")
    return (
        j.groupBy("n_name",
                  F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(((F.sum(rev) * 10000).cast("bigint")
              - (F.sum(cost_cents) * 100).cast("bigint"))
             .alias("profit_e4"))
    )


def dq175_tpch_q11(t: Tables, nation: str = "NATION_1",
                   frac: float = 0.0001) -> DataFrame:
    """Q11 shape: inventory-value concentration for one nation's suppliers.

    Part values and the grand total are exact bigint cents; the threshold
    compare multiplies the total by ``frac`` once, so no accumulation
    noise can flip membership.
    """
    ps = _partsupp(t)
    natsupp = (
        t["supplier"].join(F.broadcast(t["nation"]),
                           F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == nation).select("s_suppkey")
    )
    vals = (
        ps.join(F.broadcast(natsupp),
                F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        # decimal(38,0) sum: overflow-safe at any scale (the oracle's
        # BIGINT sum promotes to HUGEINT; Spark's would wrap silently)
        .agg(F.sum((F.col("ps_cost_cents") * F.col("ps_availqty"))
                   .cast("decimal(38,0)")).alias("v"))
    )
    tot = vals.agg(F.sum("v").alias("tv"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(F.col("v").cast("double")
                > F.lit(frac) * F.col("tv").cast("double"))
        .select(
            "ps_partkey",
            F.col("v").cast("bigint").alias("value_cents"),
        )
    )


def dq176_tpch_q16(t: Tables) -> DataFrame:
    """Q16 shape: supplier counts per part attribute, excluding flagged
    suppliers (fixture-adapted: negative account balance stands in for the
    complaint filter). Pure integer counting — no FP anywhere."""
    ps = _partsupp(t)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (
        ps.join(F.broadcast(t["part"]),
                F.col("ps_partkey") == F.col("p_partkey"))
        .filter((F.col("p_brand") != "Brand#2")
                & ~F.col("p_type").like("PROMO%")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"),
              "left_anti")
    )
    return (
        j.groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.count_distinct("ps_suppkey").cast("bigint")
             .alias("supplier_cnt"))
    )


def dq177_tpch_q20(t: Tables, nation: str = "NATION_2",
                   year: str = "1996") -> DataFrame:
    """Q20 shape: suppliers holding excess stock of qualifying parts —
    availqty must exceed half the quantity they shipped of that part in
    the target year. Integer quantities both sides of the compare."""
    ps = _partsupp(t)
    shipped = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= f"{year}-01-01")
                & (F.col("l_shipdate") < f"{int(year) + 1}-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    j = (
        ps.join(F.broadcast(
            t["part"].filter(F.col("p_name").like("small%"))),
            F.col("ps_partkey") == F.col("p_partkey"))
        .join(shipped, (F.col("ps_partkey") == F.col("l_partkey"))
              & (F.col("ps_suppkey") == F.col("l_suppkey")))
        .filter(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        .join(F.broadcast(t["supplier"]),
              F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == nation)
    )
    return j.select("s_suppkey", "s_name").distinct()
