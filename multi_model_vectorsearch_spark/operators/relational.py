"""Relational operator surface (SURVEY.md §2.2 B1-B40, DQ-01..28 + §2.4 extensions).

Every builder takes the table dict from ``sources.registry.load_tables`` and
returns a DataFrame built with the declarative API, so Catalyst plans the
physical strategy (broadcast vs sort-merge joins, partial aggregation,
TakeOrderedAndProject top-k, pushed filters, pruned scans).

Determinism (SURVEY.md §5.3): computed columns are explicitly cast/aliased so
the DuckDB oracle produces an identical schema; money aggregates go through
DECIMAL(18,2); floats that cross a window are rounded only after order-stable
per-row computation. Output row order is NOT part of the contract (the
correctness gate hashes order-insensitively), so builders avoid presentation
sorts — a global sort that exists only for display would be a pure shuffle tax
at the 100 TB design point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.checkpointing import pin
from multi_model_vectorsearch_spark.functions.fixedpoint import snap

Tables = dict


# --- scans / projections / filters -----------------------------------------

def dq01_scan_project(t: Tables) -> DataFrame:
    """B1/B2/B6: pruned parquet scan — reads exactly three columns.

    l_quantity is emitted as exact cents (floor snap ×100): raw DOUBLE
    outputs are banned registry-wide (tests/test_entry.py) after the r5
    round()-divergence reds — the snap is the engine-identical encoding.
    """
    return t["lineitem"].select(
        "l_orderkey", "l_linenumber",
        snap(F.col("l_quantity"), 100).alias("l_quantity_cents"))


def dq02_filter_battery(t: Tables) -> DataFrame:
    """B7: comparison, BETWEEN, IN, LIKE as one pushed-down conjunction."""
    o = t["orders"]
    return o.filter(
        o.o_totalprice.between(1000, 5000)
        & o.o_orderstatus.isin("O", "F")
        & o.o_orderpriority.like("%URGENT%")
    ).select("o_orderkey")


def dq03_case_expr(t: Tables) -> DataFrame:
    """B8: CASE WHEN (the reference's self-pin / boost shape, main.py:223,273)."""
    li = t["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(li.l_discount > 0.05, "HI")
        .when(li.l_discount > 0.02, "MID")
        .otherwise("LO")
        .alias("band"),
    )


# --- joins ------------------------------------------------------------------

def dq04_join_broadcast(t: Tables) -> DataFrame:
    """B9/B10: 3-way equi-join; dims broadcast (no shuffle of customer)."""
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]),
              t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]),
              t["nation"].n_regionkey == t["region"].r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


def dq05_left_outer(t: Tables) -> DataFrame:
    """B11: left outer with null-producing side."""
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "left").select("c_custkey", "o_orderkey")


def dq06_left_semi(t: Tables) -> DataFrame:
    """B12: semi-join (reference node hydrate shape, main.py:181-193)."""
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


def dq07_left_anti(t: Tables) -> DataFrame:
    """B13: anti-join — the ingest-dedup shape (main.py:80-81)."""
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def dq08_range_join(t: Tables) -> DataFrame:
    """B14: theta/band join on acctbal (±10); small side broadcast."""
    s, c = t["supplier"], t["customer"]
    return (
        F.broadcast(s)
        .join(c, c.c_acctbal.between(s.s_acctbal - 10, s.s_acctbal + 10))
        .select("s_suppkey", "c_custkey")
    )


def dq09_asof_join(t: Tables) -> DataFrame:
    """B16: as-of — each event joined to its latest order at/before ts.

    Merged-stream window form: union both sides keyed (user, time, kind)
    with orders sorting before events at equal timestamps, then a running
    max over order keys — one shuffle by user, O(n log n). The naive
    range join (kept as ``asof_join_range`` for the equivalence test)
    expands every (event × qualifying-order) pair first, which is
    quadratic on active users and unusable at 100 TB.
    """
    e, o = t["events"], t["orders"]
    ev = e.select(
        F.col("user_id").alias("u"),
        F.col("ts").cast("timestamp").alias("tt"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("okey"),
        "event_id",
    )
    od = o.select(
        F.col("o_custkey").alias("u"),
        F.col("o_orderdate").cast("timestamp").alias("tt"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast(e.schema["event_id"].dataType).alias("event_id"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("tt", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = od.unionByName(ev).withColumn("ok", F.max("okey").over(w))
    return (
        merged.filter((F.col("kind") == 1) & F.col("ok").isNotNull())
        .select("event_id", "ok")
    )


def asof_join_range(t: Tables) -> DataFrame:
    """Range-join form of dq09 (reference shape; equivalence-tested)."""
    e, o = t["events"], t["orders"]
    return (
        e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
        .groupBy("event_id")
        .agg(F.max("o_orderkey").alias("ok"))
    )


# --- aggregations -----------------------------------------------------------

def dq10_hash_agg(t: Tables) -> DataFrame:
    """B18/B22: hash agg with map-side partials.

    Sums are computed in DECIMAL for exactness and emitted as exact cents
    BIGINTs (decimal × 100, zero fraction → lossless): DECIMAL repr and
    rounded-DOUBLE outputs both diverge across engines (round-1 hash
    mismatch; r5 round() reds), integer cents cannot.
    """
    li = t["lineitem"]
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(li.l_quantity.cast("decimal(18,2)")) * 100)
            .cast("bigint").alias("sq_cents"),
            (F.sum(li.l_extendedprice.cast("decimal(18,2)")) * 100)
            .cast("bigint").alias("sp_cents"),
            F.count("*").alias("c"),
        )
    )


def dq11_count_distinct(t: Tables) -> DataFrame:
    """B19: distinct aggregation."""
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("u"))
    )


def dq12_rollup(t: Tables) -> DataFrame:
    """B21: ROLLUP with grouping() disambiguation."""
    o, c, n = t["orders"], t["customer"], t["nation"]
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.rollup("n_name", "o_orderstatus")
        .agg(
            F.count("*").alias("c"),
            F.grouping("n_name").cast("int").alias("g1"),
            F.grouping("o_orderstatus").cast("int").alias("g2"),
        )
    )


def dq13_ordered_collect(t: Tables) -> DataFrame:
    """B23: deterministic list agg — sort_array(collect_list()), serialized.

    The reference materializes per-node neighbor lists (main.py:264-276); the
    engine's deterministic equivalent sorts the collected list (collect order
    is partition-dependent, sorted content is not) and serializes it for the
    cross-engine hash.
    """
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("o_orderkey")), ","
            ).alias("orderkeys")
        )
    )


def dq14_conditional_agg(t: Tables) -> DataFrame:
    """B24: conditional aggregation (modality split counts, main.py:227-242)."""
    e = t["events"]
    return (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(e.event_type == "purchase", 1).otherwise(0))
            .cast("bigint").alias("purchases"),
            F.sum(F.when(e.event_type == "error", 1).otherwise(0))
            .cast("bigint").alias("errors"),
        )
    )


# --- window functions -------------------------------------------------------

def dq15_topk_per_group(t: Tables) -> DataFrame:
    """B25/B31: per-group top-3 — the reference's k//2 quota shape (main.py:248)."""
    o = t["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey",
                 F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


def dq16_lag(t: Tables) -> DataFrame:
    """B26: lag over per-user event stream."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "event_id", F.lag("event_type").over(w).alias("prev")
    )


def dq17_running_sum(t: Tables) -> DataFrame:
    """B27: explicit-frame running sum (order-stable fold, then round)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["events"].select(
        "event_id", snap(F.sum("value").over(w), 100).alias("rs_cents")
    )


def dq18_ntile(t: Tables) -> DataFrame:
    """B28: ntile quartiles.

    r15: the original partitionless ``Window.orderBy`` funneled every
    customer row through ONE task — the canonical 100 TB scale funnel
    (the "No Partition Defined" WARN in every bench tail). Now the same
    sampled-boundary + offset-broadcast pass as its declared scale twin
    dq171 (``global_order_scalable`` — output row-identical: NTILE is
    rank-determined and the rank is exact)."""
    from multi_model_vectorsearch_spark.operators.scale import (
        global_order_scalable,
        ntile_from_rank,
    )

    ranked, n_total = global_order_scalable(
        t["customer"].select("c_custkey", "c_acctbal"),
        ["c_acctbal", "c_custkey"])
    return ranked.select(
        "c_custkey", ntile_from_rank(F.col("r"), n_total, 4).alias("q"))


# --- set operations ---------------------------------------------------------

def dq19_union(t: Tables) -> DataFrame:
    """B32: UNION (distinct)."""
    a = t["orders"].select(F.col("o_custkey").alias("x"))
    b = t["events"].select(F.col("user_id").alias("x"))
    return a.union(b).distinct()


def dq20_intersect_except(t: Tables) -> DataFrame:
    """B33/B34: INTERSECT and EXCEPT, tagged and unioned into one result."""
    a = t["orders"].select(F.col("o_custkey").alias("x"))
    b = t["events"].select(F.col("user_id").alias("x"))
    inter = a.intersect(b).withColumn("op", F.lit("intersect"))
    exc = a.subtract(b).withColumn("op", F.lit("except"))
    return inter.union(exc)


# --- scalar function batteries ----------------------------------------------

def dq21_string_battery(t: Tables) -> DataFrame:
    """B35: string functions."""
    p = t["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("ub"),
        F.lower("p_type").alias("lt"),
        F.length("p_name").cast("int").alias("ln"),
        F.substring("p_name", 1, 5).alias("s5"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("rp"),
        F.concat_ws(":", "p_brand", "p_name").alias("cc"),
    )


def dq22_datetime_battery(t: Tables) -> DataFrame:
    """B36: date/time extraction (UTC session)."""
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
    )


def dq23_math_battery(t: Tables) -> DataFrame:
    """B37: math functions (per-row, rounded at output)."""
    li = t["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        snap(F.sqrt("l_quantity")).alias("sq_micro"),
        snap(F.log("l_extendedprice")).alias("lp_micro"),
        snap(F.abs(li.l_discount - 0.05)).alias("ad_micro"),
        (li.l_orderkey % 7).alias("md"),
    )


def dq24_array_battery(t: Tables) -> DataFrame:
    """B38: array higher-order functions over embeddings."""
    e = t["embeddings"]
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n"),
        snap(F.element_at("embedding", 1).cast("double")).alias("e1_micro"),
        snap(
            F.aggregate("embedding", F.lit(0.0),
                        lambda acc, x: acc + x.cast("double")),
        ).alias("s_micro"),
    )


def dq25_json_extract(t: Tables) -> DataFrame:
    """B39/B40: JSON extraction from events.props."""
    return t["events"].select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def dq26_tokenize_explode(t: Tables) -> DataFrame:
    """B55/B58: tokenize + explode (UDTF shape) + token stats."""
    d = t["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.countDistinct("tok").alias("n_uniq"),
    )


def dq27_sha256(t: Tables) -> DataFrame:
    """B53/A4: SHA-256 content identity (main.py:282-287)."""
    return t["documents"].select("doc_id", F.sha2("text", 256).alias("h"))


def dq28_dedup_by_hash(t: Tables) -> DataFrame:
    """B53/A5: exact dedup by content hash — keeper + duplicate count."""
    hashed = t["documents"].select("doc_id", F.sha2("text", 256).alias("h"))
    return hashed.groupBy("h").agg(
        F.min("doc_id").alias("keeper"), F.count("*").alias("dups")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def dq58_pivot(t: Tables) -> DataFrame:
    """Pivot: order counts by status × priority (explicit value list).

    Pinning the pivot values keeps the schema static — at scale the implicit
    form would first run a distinct scan to discover them.
    """
    piv = (
        t["orders"]
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    cols = [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    return piv.select("o_orderstatus", *cols)


def dq59_percentiles(t: Tables) -> DataFrame:
    """Exact quartiles of l_quantity per return flag (linear interpolation).

    ``percentile`` (exact) rather than ``approx_percentile`` so the result is
    engine-portable; the approximate sketch is the 100 TB path but is
    excluded from the hash set (SURVEY.md §5.3 rule 5).
    """
    qs = F.expr(
        "percentile(l_quantity, array(0.25D, 0.5D, 0.75D))"
    )
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(qs.alias("raw"))
        .select(
            "l_returnflag",
            snap(F.element_at("raw", 1)).alias("q25_micro"),
            snap(F.element_at("raw", 2)).alias("q50_micro"),
            snap(F.element_at("raw", 3)).alias("q75_micro"),
        )
    )


def dq60_stats_agg(t: Tables) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance.

    Partial-mergeable moment sketches (Catalyst plans these as two-phase
    hash aggs); rounded to 6 since parallel merge order perturbs the last
    couple of float bits.
    """
    li = t["lineitem"]
    return li.groupBy("l_returnflag").agg(
        snap(F.stddev_samp("l_quantity")).alias("sd_qty_micro"),
        snap(F.var_samp("l_discount")).alias("var_disc_micro"),
        snap(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp_micro"),
        snap(F.covar_samp("l_quantity", "l_extendedprice"))
        .alias("cov_qp_micro"),
    )


def dq57_approx_distinct(t: Tables) -> DataFrame:
    """B20: HyperLogLog approximate distinct counts per order status.

    At 100 TB, exact count-distinct shuffles every key; HLL sketches merge in
    fixed space (map-side partial, tiny exchange). HLL sketch bits differ by
    engine (SURVEY.md §5.3 rule 5), so the engine-specific estimate stays
    OUT of the hash set: the hash-checked outputs are the exact distinct
    (computed identically in both engines) and ``est_ok`` — the rsd=0.02
    sketch landing within a generous 10% of exact, which the oracle
    reproduces as the constant 1 (r5 fix: the old approx-only projection
    surfaced as ``err: no_oracle`` whenever the driver sampled it).
    """
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_u"),
            F.count_distinct("o_custkey").alias("exact_u"),
        )
        .select(
            "o_orderstatus", "exact_u",
            (F.abs(F.col("approx_u") - F.col("exact_u"))
             <= 0.1 * F.col("exact_u")).cast("int").alias("est_ok"),
        )
    )


def dq65_unpivot(t: Tables) -> DataFrame:
    """Unpivot/melt: wide measure columns to (key, metric, value) rows."""
    o = t["orders"].select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return o.unpivot(
        ["o_orderkey"], ["totalprice", "custkey"], "metric", "val"
    ).select("o_orderkey", "metric", snap(F.col("val"), 100).alias("val_cents"))


def dq66_regex_battery(t: Tables) -> DataFrame:
    """Regex battery: group extraction, occurrence count, match flag, strip."""
    p = t["part"]
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 1).alias("w1"),
        F.size(F.expr("regexp_extract_all(p_name, 'a', 0)")).cast("int")
        .alias("n_a"),
        F.col("p_name").rlike("^b").cast("int").alias("starts_b"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("novowel"),
    )


def dq67_null_battery(t: Tables) -> DataFrame:
    """Null-handling: coalesce/nullif/greatest/least over outer-join nulls."""
    c, o = t["customer"], t["orders"]
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.coalesce("o_orderkey", F.lit(-1)).alias("ok_filled"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nz"),
        snap(F.greatest(F.col("c_acctbal"), F.coalesce(F.col("o_totalprice"),
             F.lit(0.0))), 100).alias("hi_cents"),
        snap(F.least(F.col("c_acctbal"), F.coalesce(F.col("o_totalprice"),
             F.lit(1e18))), 100).alias("lo_cents"),
        F.isnull("o_orderkey").cast("int").alias("no_orders"),
    )


def dq68_date_arith(t: Tables) -> DataFrame:
    """Date arithmetic: offsets, diffs, boundary snapping, truncation."""
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.date_add("o_orderdate", 30).alias("plus30"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
        .alias("days_since"),
        F.last_day("o_orderdate").alias("eom"),
        F.trunc("o_orderdate", "month").alias("som"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
    )


def dq69_array_ops(t: Tables) -> DataFrame:
    """Array set operations over token arrays (sorted for portability)."""
    d = t["documents"]
    toks = F.split("text", " ")
    probe = F.array(F.lit("the"), F.lit("data"), F.lit("spark"))
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(toks, probe)), ",")
        .alias("hit"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_uniq"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",")
        .alias("first3"),
        F.array_contains(toks, "vector").cast("int").alias("has_vector"),
    )


def dq73_cube(t: Tables) -> DataFrame:
    """B21 completion: CUBE — all 2^n grouping combinations in one pass."""
    o = t["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("c"),
        F.grouping("o_orderstatus").cast("int").alias("g1"),
        F.grouping("o_orderpriority").cast("int").alias("g2"),
    )


def dq74_histogram(t: Tables, n_bins: int = 10) -> DataFrame:
    """Equal-width histogram of l_extendedprice (data-driven bounds).

    Min/max come from one tiny aggregate broadcast across the scan; the
    bucket expression is pure arithmetic so the histogram is a single
    shuffle-light pass — the profile-a-column primitive every data-quality
    sweep starts with.
    """
    li = t["lineitem"]
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    # hi == lo (constant column) → one bucket; without the guard Spark's
    # null-division and DuckDB's inf/nan diverge on degenerate input
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / n_bins)
            ),
        )
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(stats))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dq75_window_battery(t: Tables) -> DataFrame:
    """B25-B28 completion: first/nth value, cume_dist, percent_rank."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("best"),
        F.nth_value("o_orderkey", 2).over(w).alias("second"),
        snap(F.cume_dist().over(w)).alias("cd_micro"),
        snap(F.percent_rank().over(w)).alias("pr_micro"),
    )


def dq76_nullsafe_join(t: Tables) -> DataFrame:
    """Null-safe equality (<=>): nulls match nulls, unlike plain =.

    Built over a derived nullable key (custkey, nulled for every 50th
    order) so the null-matching path carries a bounded group on both sides.
    """
    o = t["orders"]
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 50 != 0, F.col("o_custkey")).alias("pk"),
    )
    a = keyed.select(F.col("o_orderkey").alias("k1"), F.col("pk").alias("p1"))
    b = keyed.select(F.col("o_orderkey").alias("k2"), F.col("pk").alias("p2"))
    j = a.join(b, a.p1.eqNullSafe(b.p2) & (a.k1 < b.k2))
    return j.groupBy("p1").agg(
        F.count("*").alias("pairs"),
        F.countDistinct("k1").alias("lhs"),
    )


def dq81_sql_text(t: Tables) -> DataFrame:
    """SQL-text front door: the same engine through spark.sql over views.

    Everything else in the registry uses the DataFrame API; this entry
    proves the SQL surface end-to-end (view registration, parsing, the same
    Catalyst plan underneath) with a revenue-per-nation query.
    """
    spark = t["orders"].sparkSession
    for name in ("orders", "customer", "nation"):
        t[name].createOrReplaceTempView(f"sql_{name}")
    return spark.sql(
        "SELECT n_name, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) "
        "AS total_cents, count(*) AS n_orders "
        "FROM sql_orders JOIN sql_customer ON o_custkey = c_custkey "
        "JOIN sql_nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    )


def dq82_correlated_subquery(t: Tables) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into a join.

    Written as SQL text because the correlation is the point: the optimizer
    rewrites the per-row subquery into an aggregate + left join (no
    nested-loop re-execution), which is what survives at scale.
    """
    spark = t["customer"].sparkSession
    t["customer"].createOrReplaceTempView("corr_customer")
    t["orders"].createOrReplaceTempView("corr_orders")
    return spark.sql(
        "SELECT c_custkey, "
        "(SELECT CAST(floor(max(o_totalprice) * 100.0 + 0.5) AS BIGINT) "
        " FROM corr_orders "
        " WHERE o_custkey = c_custkey) AS mx_cents "
        "FROM corr_customer"
    )


def dq83_map_ops(t: Tables) -> DataFrame:
    """B39: map-typed column ops over parsed JSON props."""
    e = t["events"]
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
    )


def dq124_lateral_topn(t: Tables) -> DataFrame:
    """Correlated LATERAL subquery: each customer's top-2 orders by price.

    The SQL-native per-group top-n (every row of the outer query drives a
    correlated inner query). Catalyst decorrelates the LATERAL into a
    ranked window join — same physical plan family as dq15 — so the
    per-customer "subquery" never actually re-executes per row at scale.
    """
    spark = t["orders"].sparkSession
    for name in ("orders", "customer"):
        t[name].createOrReplaceTempView(f"lat_{name}")
    return spark.sql(
        "SELECT c.c_custkey, o.o_orderkey, "
        "CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) "
        "AS o_totalprice_cents "
        "FROM lat_customer c, "
        "LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders "
        "         WHERE o_custkey = c.c_custkey "
        "         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o "
        "WHERE c.c_custkey < 50 "
        "ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"
    )


def dq125_column_profile(t: Tables) -> DataFrame:
    """ANALYZE-style column profiler over `orders`: one stats row per
    column (nulls, distincts, min/max as canonical strings).

    Data-quality profiling is a first-class pipeline stage at 100 TB: each
    column's stats are independent aggregates over one scan each, and the
    tiny union'd result is the table you diff between ingest batches to
    catch drift. Numerics go through DECIMAL before stringifying so both
    engines print identical canonical forms.
    """
    o = t["orders"]

    def prof(col: str, expr) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            F.sum(F.col(col).isNull().cast("int")).cast("bigint")
            .alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(expr).cast("string").alias("min_s"),
            F.max(expr).cast("string").alias("max_s"),
        )

    parts = [
        prof("o_orderkey", F.col("o_orderkey")),
        prof("o_custkey", F.col("o_custkey")),
        prof("o_orderstatus", F.col("o_orderstatus")),
        prof("o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")),
        prof("o_orderdate", F.col("o_orderdate").cast("date")),
        prof("o_orderpriority", F.col("o_orderpriority")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("col_name")


def dq126_integrity_audit(t: Tables) -> DataFrame:
    """Referential-integrity audit between `events` and `customer`: orphan
    events (user_id with no customer row) and coverage (customers with no
    events), as one summary row.

    The ingest-gate check a 100 TB pipeline runs before joining fact to
    dim: both directions are anti-join counts. The dim side broadcasts;
    the fact side is scanned once per direction and never shuffled. One
    declarative plan (r14): the three counts used to be separate driver
    ``count()`` jobs inside the builder — three sequential job round
    trips for one summary row; now they are three one-row aggregates
    cross-joined, so the whole audit is a single action.
    """
    ev = t["events"].select("user_id")
    cust = t["customer"].select("c_custkey")
    orphans = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "left_anti"
    ).agg(F.count("*").alias("n_orphan_events"))
    users_with = ev.distinct()
    without = cust.join(
        users_with, cust.c_custkey == users_with.user_id, "left_anti"
    ).agg(F.count("*").alias("n_without_events"))
    totals = cust.agg(F.count("*").alias("n_customers"))
    return (
        totals.crossJoin(F.broadcast(without))
        .crossJoin(F.broadcast(orphans))
        .select(
            "n_customers",
            (F.col("n_customers") - F.col("n_without_events"))
            .alias("n_with_events"),
            "n_without_events", "n_orphan_events",
        )
    )


def dq134_heavy_hitters(t: Tables, k: int = 20) -> DataFrame:
    """Join-key skew profiler: top-k heaviest `user_id` keys in `events`
    with their share of the table — the measurement that decides between
    a plain shuffle join, AQE skew handling, and explicit salting (dq116).

    One aggregation plus a broadcast scalar; the top-k is a
    TakeOrderedAndProject over the (already tiny) per-key counts.
    """
    ev = t["events"]
    counts = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    total = ev.agg(F.count("*").alias("n_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id", "c",
            snap(F.col("c") / F.col("n_tot")).alias("share_micro"),
        )
        .orderBy(F.desc("c"), F.asc("user_id"))
        .limit(k)
    )


def dq140_approx_quantiles(t: Tables) -> DataFrame:
    """B20-family: approx_percentile (t-digest-like sketch) per return
    flag — the constant-memory quantile path for 100 TB columns.

    Sketch internals differ by engine (SURVEY §5.3 rule 5), so the raw
    sketch outputs stay OUT of the hash set. Hash-checked instead: the
    group count plus ``p50_ok``/``p95_ok`` — the sketch landing within
    ±1 quantity unit of the exact discrete quantile, computed Spark-side
    against a per-group sorted-position lookup and reproduced by the
    oracle as constant 1 (r5 fix for the ``err: no_oracle`` rows).
    l_quantity has ~50 distinct integer values, so the bound is loose
    for any sane sketch yet still pins the sketch to the data.
    """
    li = t["lineitem"]
    # exact discrete quantiles (inverted-CDF: smallest v with cum >= q*n)
    # via a window over DISTINCT values — tiny per group
    g = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("l_returnflag").orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    staged = (
        g.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wt))
    )
    exact = staged.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("l_quantity")))
        .alias("p50_exact"),
        F.min(F.when(20 * F.col("cum") >= 19 * F.col("n"),
                     F.col("l_quantity"))).alias("p95_exact"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_quantity", 0.95, 10000).alias("p95_approx"),
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag", "n",
            (F.abs(F.col("p50_approx") - F.col("p50_exact")) <= 1.0)
            .cast("int").alias("p50_ok"),
            (F.abs(F.col("p95_approx") - F.col("p95_exact")) <= 1.0)
            .cast("int").alias("p95_ok"),
        )
    )


def dq186_basket_lift(t: Tables, min_pair_n: int = 5, k: int = 30) -> DataFrame:
    """Market-basket association mining: top-k brand pairs co-purchased in
    the same order, scored by lift = P(ab) / (P(a)·P(b)) with support
    floor ``min_pair_n`` — the 2-itemset core of Apriori as one
    declarative plan.

    Baskets are built with ONE map-side-combinable ``collect_set`` per
    order (bounded by basket size), and pairs explode in-array — the
    same bounded-combinations move as the df-capped Jaccard build, with
    no self-join shuffle at all. Fan-out is items-per-basket squared,
    never corpus-squared. Brand marginals are a tiny aggregate,
    broadcast back onto the pair counts; final top-k is
    TakeOrderedAndProject. At 100 TB everything shuffles once on
    o_orderkey and once on the (b1, b2) pair key.
    """
    baskets = (
        t["lineitem"].join(t["part"],
                           F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
    )
    n_orders = t["orders"].select(F.countDistinct("o_orderkey").alias("n"))
    marg = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand").agg(F.count("*").alias("nb"))
    )
    pairs = (
        baskets.select(F.explode(F.expr(
            "flatten(transform(bs, (x, i) -> "
            "transform(slice(bs, i + 2, size(bs) - i - 1), "
            "y -> struct(x AS b1, y AS b2))))")).alias("p"))
        .groupBy("p.b1", "p.b2").agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_n)
    )
    scored = (
        pairs.join(F.broadcast(marg.select(F.col("brand").alias("b1"),
                                           F.col("nb").alias("n1"))), "b1")
        .join(F.broadcast(marg.select(F.col("brand").alias("b2"),
                                      F.col("nb").alias("n2"))), "b2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "b1", "b2", "pair_n",
            snap(F.col("pair_n") / F.col("n")).alias("support_micro"),
            snap(F.col("pair_n") * F.col("n")
                 / (F.col("n1") * F.col("n2"))).alias("lift_micro"),
        )
    )
    return scored.orderBy(F.desc("lift_micro"), "b1", "b2").limit(k)


def dq195_winsorized_stats(t: Tables) -> DataFrame:
    """Winsorized robust statistics per return flag: clip l_extendedprice
    at its group [p05, p95] (exact interpolated percentiles), then report
    the clipped mean, the clip bounds, and how many rows hit each side —
    the outlier-robust profile a feature pipeline publishes instead of
    raw means that one fat-finger row can move arbitrarily.

    Two passes by necessity (bounds, then clip): the per-group bounds
    table is group-count-sized and broadcasts back onto the scan, so the
    second pass is map-only. The clipped mean accumulates DECIMAL terms —
    order-independent, where a double sum over a 100 TB group would be
    partition-order-sensitive.
    """
    li = t["lineitem"].select("l_returnflag",
                              F.col("l_extendedprice").alias("v"))
    bounds = (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(v, array(0.05D, 0.95D))").alias("b"))
        .select(
            "l_returnflag",
            F.col("b")[0].alias("p05"), F.col("b")[1].alias("p95"),
        )
    )
    clipped = (
        li.join(F.broadcast(bounds), "l_returnflag")
        .select(
            "l_returnflag", "p05", "p95",
            F.least(F.greatest(F.col("v"), F.col("p05")), F.col("p95"))
            .alias("cv"),
            (F.col("v") < F.col("p05")).cast("int").alias("lo"),
            (F.col("v") > F.col("p95")).cast("int").alias("hi"),
        )
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            snap(F.max("p05")).alias("p05_micro"),
            snap(F.max("p95")).alias("p95_micro"),
            snap(
                F.sum(F.col("cv").cast("decimal(28,10)")).cast("double")
                / F.count("*")).alias("wins_mean_micro"),
            F.sum("lo").cast("bigint").alias("n_clipped_lo"),
            F.sum("hi").cast("bigint").alias("n_clipped_hi"),
            F.count("*").alias("n"),
        )
    )


def dq196_hll_rollup(t: Tables) -> DataFrame:
    """Mergeable-sketch distinct rollup: per-day HyperLogLog sketches of
    active users, unioned into period estimates — THE scalable pattern
    for "distinct users this month" at 100 TB: daily sketches are tiny,
    additive, and computed once, where exact monthly count-distinct
    re-shuffles every event every time the window moves.

    ``hll_sketch_agg`` per day → ``hll_union_agg`` across days →
    ``hll_sketch_estimate``. Sketch bits are engine-specific (Apache
    DataSketches), so the estimate stays OUT of the hash set: the
    hash-checked outputs are the exact audit columns (n_days, exact
    global distinct, sum of exact daily distincts — all oracle-
    computable) plus ``est_ok``, the merged-sketch estimate landing
    within 10% of exact (lgConfigK=12 → rsd ≈ 1.6%), which the oracle
    reproduces as constant 1 (r5 fix: this entry surfaced as
    ``err: no_oracle`` when the driver sampled it in r5).
    """
    ev = t["events"].select(
        F.date_trunc("DAY", "ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_daily"),
    )
    return daily.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint")
        .alias("est_distinct"),
        F.sum("exact_daily").cast("bigint").alias("sum_daily_distinct"),
    ).crossJoin(
        F.broadcast(ev.agg(
            F.count_distinct("user_id").cast("bigint")
            .alias("exact_distinct")))
    ).select(
        "n_days", "sum_daily_distinct", "exact_distinct",
        (F.abs(F.col("est_distinct") - F.col("exact_distinct"))
         <= 0.1 * F.col("exact_distinct")).cast("int").alias("est_ok"),
    )


def dq197_skyline(t: Tables) -> DataFrame:
    """Skyline (Pareto frontier) of parts minimizing (p_retailprice,
    p_size): every part not dominated by another that is <= on both
    attributes and < on at least one — the multi-criteria shortlist
    query (cheapest-AND-smallest tradeoff curve).

    Sort-based skyline, not the O(n²) dominance join: collapse to one
    min-size row per DISTINCT price (an aggregation), take a running
    strictly-before minimum over the price order, and a part survives
    iff it has its price's min size AND beats every cheaper price's
    size. r15: the running min runs through the dq171 sampled-boundary
    range pass (``global_order_scalable`` ``cum_mins``) — output
    identical, no single-task window even if the distinct-price domain
    grows. The oracle is the brute-force NOT EXISTS dominance scan:
    equality proves the sort-based rewrite.
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        global_order_scalable,
    )

    p = t["part"].select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    per_price = p.groupBy("price").agg(F.min("size").alias("mp"))
    ranked, _n = global_order_scalable(
        per_price, ["price"], rank_col="_r",
        cum_mins=(("prev_run", "mp"),))
    frontier = (
        ranked
        # dominated by a strictly-cheaper price iff its min size <= mp
        .filter(F.col("prev_run").isNull()
                | (F.col("mp") < F.col("prev_run")))
        .select("price", "mp")
    )
    return (
        p.join(F.broadcast(frontier), "price")
        .filter(F.col("size") == F.col("mp"))
        .select("p_partkey", snap(F.col("price"), 100).alias("price_cents"),
                "size")
    )


def dq199_weighted_median(t: Tables) -> DataFrame:
    """Exact weighted median per return flag: the smallest l_extendedprice
    whose cumulative l_quantity weight reaches half the group total — the
    robust 'typical price weighted by volume' statistic (quantity-weighted
    p50), which a plain median misstates whenever cheap items ship in bulk.

    r15: the selection runs through the two-phase bucket pass
    (``grouped_lower_median_scalable`` — ``cw·2 >= tw`` on integer
    weights is exactly ``cw >= (tw+1) div 2``, the helper's target).
    The bucket key is the 64Ki-cent band of the price — monotone in
    price, domain-bounded — so phase 1 is ONE map-side histogram
    aggregate straight off the scan (the old (flag, price) collapse
    shuffled the whole fact table once) and phase 2's per-flag running
    weight touches only the median's bucket, with the RANGE window frame
    summing tied prices exactly like the distinct-value collapse did.
    Quantities are integral doubles cast to bigint, so every comparison
    is exact integer arithmetic; the output price is carried untouched
    (no float summation anywhere).
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        grouped_lower_median_scalable,
    )

    li = t["lineitem"].select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    med = grouped_lower_median_scalable(
        li, "l_returnflag", "price", "q", "wmedian",
        F.shiftright(F.round(F.col("price") * 100).cast("bigint"), 16))
    return med.select(
        "l_returnflag", snap(F.col("wmedian"), 100).alias("wmedian_cents"))


def dq212_grouping_sets(t: Tables) -> DataFrame:
    """Explicit GROUPING SETS — the generalization of rollup (dq12) and
    cube (dq73) to arbitrary grouping combinations: per (flag, status),
    per flag alone, and the grand total in ONE pass, with grouping_id
    disambiguating which set produced each row.

    One aggregation operator: Spark expands the sets with an Expand node
    feeding a single partial+final hash aggregate, so the fact scan runs
    once no matter how many sets are declared (the naive UNION ALL of
    three groupBys scans three times). Sums accumulate DECIMAL —
    order-independent at any parallelism.
    """
    li = t["lineitem"]
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("bigint").alias("sum_qty_cents"),
        )
    )


#: dq225's collapsed (flag, cents, count) table — session-cached because
#: the median/MAD/census branches all re-derive it otherwise (see
#: _session_cached in textpipe.py; eviction-capped, unpersist-on-evict).
_DQ225_CACHE: dict = {}


def dq225_mad_outliers(t: Tables) -> DataFrame:
    """Median-absolute-deviation outlier census per return flag: the
    robust '3-sigma' (median ± 3·MAD) that a single fat-finger row
    cannot move, completing dq195's winsorized panel with the
    selection-based (not interpolated) robust scale estimate.

    Both medians are LOWER medians (exact value selection, no
    interpolation arithmetic), found dq199-style over integer CENTS:
    counts collapse onto DISTINCT cent values first (map-side
    combinable), the cumulative count runs over the distinct-value
    table, and the median is the smallest value whose running count
    reaches ⌊(n+1)/2⌋. The cent domain is fixed by the price range — so
    the per-flag window's input is bounded no matter how many ROWS the
    fact table has, where a raw-row row_number sort would funnel 100 TB
    through 3 tasks. The oracle deliberately uses that raw-row
    formulation — agreement proves the rewrite.

    The fact table is scanned ONCE: after the first (flag, cents)
    collapse, the deviation distribution is derived by value arithmetic
    on the distinct-value table itself (|x − med| carries its count c),
    so the MAD pass, the row census, and the outlier census are all
    domain-bounded aggregations — no second raw-row pass exists
    anywhere in the plan (the r4 form re-joined the raw rows per pass:
    3 fact scans). The collapsed table is session-cached (persist via
    ``_session_cached``, CacheManager dedups every branch onto one
    InMemoryRelation) because its four consumers are NOT deduplicated
    by exchange reuse in the static plan (8 fact scans unpinned). The
    r4-r13 form used a lazy ``localCheckpoint`` for the same sharing,
    but ``localCheckpoint(eager=False)`` forces physical planning at
    BUILDER time through ``DataFrame.rdd`` — measured r14 at sf0.1:
    1.1-2.9 s of build wall vs 0.2-0.4 s persisted, same exec.
    Deviations, 3·MAD, and the outlier test are all exact bigint
    arithmetic.
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        grouped_lower_median_scalable,
    )
    from multi_model_vectorsearch_spark.operators.textpipe import (
        _session_cached,
    )

    def collapsed(tt: Tables) -> DataFrame:
        li = tt["lineitem"].select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            .alias("x"),
        )
        return li.groupBy("l_returnflag", "x").agg(F.count("*").alias("c"))

    per_v = _session_cached(_DQ225_CACHE, t, collapsed, table="lineitem")

    # r15: both lower medians run through the two-phase bucket selection
    # (grouped_lower_median_scalable) — the old per-flag cumulative
    # windows funneled each flag's whole distinct-cents table into one
    # task, and the whole-partition `n` window buffered it a second
    # time. The 64Ki-cent bucket histogram is domain-bounded (a few
    # hundred rows collected), and the only windows left run over one
    # bucket per flag. The dev (|x − med|) distribution never
    # materializes as its own grouped table any more: the MAD selection
    # and the final census both derive it inline from the session-cached
    # per_v, which keeps every pass a map-side expression over the one
    # cached collapse.
    med = grouped_lower_median_scalable(
        per_v, "l_returnflag", "x", "c", "med_c",
        F.shiftright("x", 16))
    dev = (
        per_v.join(F.broadcast(med), "l_returnflag")
        .select("l_returnflag", "med_c", "c",
                F.abs(F.col("x") - F.col("med_c")).alias("d"))
    )
    mad = grouped_lower_median_scalable(
        dev, "l_returnflag", "d", "c", "mad_c",
        F.shiftright("d", 16))
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum("c").alias("n"),
            F.max("med_c").alias("med_cents"),
            F.max("mad_c").alias("mad_cents"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad_c"), F.col("c"))
                  .otherwise(F.lit(0))).alias("n_outliers"),
        )
    )


def dq233_benford_audit(t: Tables) -> DataFrame:
    """Benford first-digit audit of o_totalprice: observed leading-digit
    frequencies against Benford's law with the chi-square distance —
    the classic fabricated-numbers screen run over financial fact
    columns before trusting an upstream feed.

    The digit extraction is string-based (first character of the
    non-decimal representation — no float log in the bucketing, so the
    grouping is exact); counts are one map-side-combinable groupBy over
    9 groups. Expected shares use log10 on exact small integers —
    engine-identical — and the chi-square terms are floor-snapped to
    pico-unit BIGINTs before an exact integer sum (order-independent,
    no DECIMAL-cast-of-double repr hazard).
    """
    o = t["orders"].select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("string"), 1, 1)
        .alias("digit"),
    ).filter(F.col("digit").between("1", "9"))
    counts = o.groupBy("digit").agg(F.count("*").alias("n_obs"))
    tot = counts.agg(F.sum("n_obs").alias("n_total"))
    d = F.col("digit").cast("int").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / d)
    staged = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("p_obs", F.col("n_obs").cast("double")
                    / F.col("n_total"))
        .withColumn("p_exp", expected)
        .withColumn(
            "chi_term",
            # per-term pico floor snap, then exact integer sum — the
            # DECIMAL-cast-of-double staging it replaces splits on
            # shortest-repr-vs-binary across engines (dq206's r5 red)
            snap((F.col("p_obs") - F.col("p_exp"))
                 * (F.col("p_obs") - F.col("p_exp")) / F.col("p_exp"),
                 1_000_000_000_000),
        )
    )
    # r15: the whole-frame sum over the 9-row digit table rides a
    # broadcast one-row aggregate instead of a partitionless window
    chi_tot = staged.agg(F.sum("chi_term").alias("chi_sq_pico"))
    return staged.crossJoin(F.broadcast(chi_tot)).select(
        "digit", "n_obs",
        snap(F.col("p_obs")).alias("p_obs_micro"),
        snap(F.col("p_exp")).alias("p_exp_micro"),
        "chi_sq_pico",
    )


def dq234_equiheight_histogram(t: Tables, n_buckets: int = 8) -> DataFrame:
    """Equi-height (quantile) histogram of l_extendedprice per return
    flag: bucket boundaries chosen so each holds ~1/n of the rows — the
    histogram query optimizers and drift monitors actually store, where
    dq74's equal-width form wastes buckets on empty ranges.

    dq199/dq225's domain-bounded pattern: collapse to DISTINCT integer
    cents with counts, one cumulative window over the distinct-value
    table, then bucket = floor(exclusive_cum · n / total) — pure integer
    arithmetic, deterministic under ties (a value's rows all land in one
    bucket, so 'equi-height' is approximate exactly where duplicates
    force it to be, like every real equi-depth histogram).
    """
    li = t["lineitem"].select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("x"),
    )
    per_v = li.groupBy("l_returnflag", "x").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("l_returnflag")
    cum = (
        per_v
        .withColumn("cum_excl",
                    F.coalesce(F.sum("c").over(
                        wp.orderBy("x").rowsBetween(
                            Window.unboundedPreceding, -1)), F.lit(0)))
        .withColumn("n_tot", F.sum("c").over(wp))
    )
    bucket = F.floor(F.col("cum_excl") * n_buckets / F.col("n_tot")) \
        .cast("int")
    return (
        cum.withColumn("b", bucket)
        .groupBy("l_returnflag", "b")
        .agg(
            F.sum("c").alias("n_rows"),
            F.min("x").alias("lo_cents"),
            F.max("x").alias("hi_cents"),
        )
    )


def dq236_gini(t: Tables) -> DataFrame:
    """Gini coefficient of per-user total spend — the concentration
    audit ('do 1% of users drive 90% of volume') that decides whether
    per-user sampling caps are needed before training on behavioral
    data.

    Exact integer combinatorics over DISTINCT spend values: with tied
    values collapsed to (value, count) and ranks assigned in value
    order, Σ rank·x for a tied block is x·(c·cum_excl + c(c+1)/2) —
    all bigint — and G = (2·Σ rank·x)/(n·Σx) − (n+1)/n needs only two
    IEEE ops at the end. The cumulative count runs over the distinct
    spend-value table via the sampled-boundary range pass (dq18/dq171's
    ``global_order_scalable``) — spend SUMS are near-unique, so a
    partitionless window here was a genuine single-task funnel (r15).
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        global_order_scalable,
    )

    spend = (
        t["events"]
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("x"))
    )
    per_v = spend.groupBy("x").agg(F.count("*").alias("c"))
    # r15: the cumulative count used to run through a partitionless
    # window — but per-user spend SUMS are near-unique (they do not
    # collapse to a bounded cent domain the way raw cents do), so that
    # was a genuine whole-dataset single-task funnel. Same sampled-
    # boundary pass as dq18/dq171; exclusive cumsum = inclusive − c.
    cum, _n = global_order_scalable(
        per_v, ["x"], rank_col="_r", cum_sums=(("cum_in", "c"),))
    cum = cum.withColumn("cum_excl", F.col("cum_in") - F.col("c"))
    # c(c+1) is always even: integer `div` keeps the whole term bigint
    # (a float /2 would silently lose exactness past 2^53 at scale)
    block_rank_sum = F.col("x") * (
        F.col("c") * F.col("cum_excl")
        + F.expr("(c * (c + 1)) div 2")
    )
    agg = cum.agg(
        F.sum(block_rank_sum).alias("srx"),
        F.sum(F.col("x") * F.col("c")).alias("sx"),
        F.sum("c").alias("n"),
    )
    g = (
        2.0 * F.col("srx").cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
        - (F.col("n") + 1).cast("double") / F.col("n")
    )
    return agg.select("n", snap(g).alias("gini_micro"))
