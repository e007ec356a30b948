"""Scale infrastructure: bucketed co-located joins and skew-salted joins.

At 100 TB the dominant cost of every equi-join/agg is the shuffle. Two
standard mitigations, packaged as reusable operators:

- **Bucketing** (B4 sink generalization): persist fact tables bucketed and
  sorted by their join key. Two tables bucketed the same way join with ZERO
  Exchange — Catalyst proves co-partitioning from the catalog. This is what
  replaces `repartition()` guesswork for repeatedly-joined 100 TB tables.
- **Salting**: a hot key (power-law user, null-heavy foreign key) overloads
  one reducer. Salting splits each hot left-side key across `n_salts`
  sub-keys and replicates the matching right-side rows, so the hot key's
  rows spread over `n_salts` reducers. AQE's skew-join handles moderate
  skew automatically; salting is the explicit tool for extreme single-key
  skew. Join RESULTS are identical to the unsalted join by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.checkpointing import pin
from multi_model_vectorsearch_spark.functions.fixedpoint import snap


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                   overwrite: bool = True, path: str | None = None) -> None:
    """Persist `df` bucketed+sorted by `key` into the session catalog (B4).

    Pass `path` to create an external table at an explicit location
    (otherwise the managed warehouse dir is used).
    """
    writer = (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    if overwrite:
        writer = writer.mode("overwrite")
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed catalog tables — plans with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Inner equi-join with left-side salt spread + right-side replication.

    The left side's salt is derived from a hash of the whole row (stable,
    no RNG), so each hot key's rows scatter across `n_salts` reducers; the
    right side is exploded once per salt value. Row multiplicity is
    unchanged — output equals ``left.join(right, key)`` exactly.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_salted, [key, "_salt"])
    return out.drop("_salt")


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Hive-style partitioned parquet layout (B4): one directory per value.

    The physical layout that makes predicate-matching scans skip whole
    directories (static partition pruning) and lets joins prune at runtime
    from the dimension side (dynamic partition pruning) — the first lever
    for 100 TB fact tables.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_upsert(spark: SparkSession, state_path: str, updates: DataFrame,
                 key: str) -> int:
    """MERGE-style upsert into a parquet state store (B4 / A6 generalized).

    Updated keys replace existing rows; new keys append — the Delta
    ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` semantics over
    plain parquet. The merged result is checkpointed before the overwrite
    because Spark cannot overwrite a path it is still lazily reading.
    Returns the new row count. At scale this becomes a partition-scoped
    rewrite (or a real Delta MERGE) — same call site, same semantics.
    """
    import os

    if os.path.isdir(state_path) and any(
        f.endswith(".parquet") for f in os.listdir(state_path)
    ):
        current = spark.read.parquet(state_path)
        kept = current.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates).transform(pin)
    else:
        merged = updates.transform(pin)
    merged.write.mode("overwrite").parquet(state_path)
    return merged.count()


def dq116_salted_agg(t: dict, n_salts: int = 16) -> DataFrame:
    """Skew-safe two-phase aggregation: salt the hot low-cardinality key,
    partially aggregate per (key, salt), then merge partials per key.

    `event_type` has ~6 values over the whole events table — the canonical
    skewed-reducer shape. Salting fans each key across ``n_salts`` reducers
    in phase 1 so no single task sees a whole key's rows; phase 2 merges
    ``n_salts`` partials per key, which is trivially small. count/sum merge
    exactly and avg is derived from merged sum/count, so the result is
    bit-identical to the direct groupBy (the oracle runs the direct form).
    Catalyst's partial aggregation does this implicitly for built-in aggs;
    the explicit form is the template for algebraic UDAF-style merges that
    hash-partial aggregation can't express.
    """
    partial = (
        t["events"]
        .withColumn("salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("ps"),
        )
    )
    merged = partial.groupBy("event_type").agg(
        F.sum("pc").cast("bigint").alias("n"),
        F.sum("ps").cast("decimal(18,2)").alias("sum_d"),
    )
    return merged.select(
        "event_type", "n",
        (F.col("sum_d") * 100).cast("bigint").alias("sum_value_cents"),
        # derived from the exact decimal sum, so both engines divide the
        # same number — no FP summation-order exposure; floor-snapped to
        # micro units (round() is not cross-engine-identical)
        snap(F.col("sum_d").cast("double") / F.col("n"))
        .alias("avg_value_micro"),
    ).orderBy("event_type")


def global_order_scalable(df: DataFrame, order_cols: list,
                          rank_col: str = "r",
                          cum_sums: tuple = (),
                          n_ranges: int = 32) -> tuple[DataFrame, int]:
    """Global rank (and optional running sums) WITHOUT a single-task
    window — the range-partition + offset-broadcast pattern, reusable.

    ``Window.orderBy(...)`` with no partition funnels every row through
    one task; at 100 TB that task never finishes. The scalable plan:
    (1) range-partition on the sort key so partitions hold disjoint,
    ordered key ranges, (2) aggregate per-partition row counts (and sums
    for each requested running-sum column) — an ``n_ranges``-row table
    collected to the driver — and broadcast the exclusive running offsets
    back, (3) rank = per-partition row_number + the partition's offset
    (windows partitioned by range id run fully parallel); running sums
    likewise. Output is row-for-row IDENTICAL to the partitionless
    ``Window.orderBy`` form provided ``order_cols`` is a TOTAL order
    (include a unique tie-break column).

    ``order_cols``: Column expressions, may carry ``.desc()``/``.asc()``.
    ``cum_sums``: ``(out_name, in_col_name)`` pairs → inclusive running
    sums over the same order. Returns ``(df + rank/cum columns, n_total)``
    — the only driver materialization is one row per range partition.
    """
    from pyspark.sql import Window

    keyed = (
        df.repartitionByRange(n_ranges, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    keyed = keyed.transform(pin)  # pin partitioning for both passes
    aggs = [F.count("*").alias("_n")] + [
        F.sum(src).alias(f"_s_{out}") for out, src in cum_sums
    ]
    sizes = sorted(
        keyed.groupBy("_pid").agg(*aggs).collect(), key=lambda r: r._pid
    )
    offsets: dict[str, dict[int, int]] = {"_n": {}}
    acc: dict[str, int] = {"_n": 0}
    for out, _src in cum_sums:
        offsets[f"_s_{out}"], acc[f"_s_{out}"] = {}, 0
    for r in sizes:
        for key in offsets:
            offsets[key][r._pid] = acc[key]
            acc[key] += r[key] or 0
    n_total = acc["_n"]

    def off_col(key: str):
        return F.element_at(
            F.create_map(*[F.lit(x)
                           for kv in offsets[key].items() for x in kv]),
            F.col("_pid"),
        )

    wp = Window.partitionBy("_pid").orderBy(*order_cols)
    out_df = keyed.withColumn(rank_col, F.row_number().over(wp)
                              + off_col("_n"))
    run = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for out, src in cum_sums:
        out_df = out_df.withColumn(
            out, F.sum(src).over(run) + off_col(f"_s_{out}"))
    return out_df.drop("_pid"), n_total


def ntile_from_rank(rank, n_total: int, n_tiles: int):
    """SQL ``NTILE(n)`` as closed-form arithmetic on a global rank: the
    first ``n_total mod n`` tiles get ``ceil(n_total/n)`` rows, the rest
    ``floor(n_total/n)`` — exactly the standard NTILE split, with no
    window at all once the rank exists."""
    base, rem = n_total // n_tiles, n_total % n_tiles
    big = base + 1
    q = (
        F.when(rank <= rem * big, (rank - 1) / big)
        .otherwise(rem + (rank - 1 - rem * big) / F.greatest(
            F.lit(base), F.lit(1)))
    )
    return (F.floor(q) + 1).cast("int")


def dq171_global_ntile_scalable(t: dict, n_tiles: int = 4,
                                n_ranges: int = 32) -> DataFrame:
    """Global ntile without a single-partition window — the two-pass
    range-partition form of dq18 (see :func:`global_order_scalable`),
    producing IDENTICAL output."""
    ranked, n_total = global_order_scalable(
        t["customer"].select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")], n_ranges=n_ranges)
    return ranked.select(
        "c_custkey",
        ntile_from_rank(F.col("r"), n_total, n_tiles).alias("q"),
    )


def dq189_zorder_layout(t: dict, bits: int = 10, bucket_bits: int = 4) -> DataFrame:
    """Z-order (Morton) data layout for multi-column data skipping: interleave
    the bits of (l_partkey, l_suppkey) into one clustering key, bucket rows
    by the key's top ``bucket_bits`` bits, and report each bucket's min/max
    range of BOTH columns — the per-file zone-map stats a lakehouse
    OPTIMIZE ZORDER BY publishes, which let a scan prune files for
    predicates on EITHER column (a linear sort only prunes its leading
    column).

    Coordinates are range-binned into the ``bits``-bit domain first (the
    monotonic min/max rescale real OPTIMIZE ZORDER uses), so a bucket's
    rows genuinely cluster in BOTH original key ranges. The bounds are a
    one-row aggregate broadcast back; the Morton spread is pure bit
    arithmetic (shift/and/or), fully JVM-side and map-only; bucketing by
    the key's top bits needs no sort at all — at 100 TB the layout pass is
    `repartition(zbucket)` + write, and this query is its zone-map audit.
    Stats prove the point: every bucket covers ~1/2^(bucket_bits/2) of
    each key's domain instead of one full domain.
    """
    def spread(col: F.Column) -> F.Column:
        # 16-bit → 32-bit bit-spread (classic magic-mask interleave).
        x = col.bitwiseAND(F.lit((1 << bits) - 1))
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
        return x

    li = t["lineitem"].select(
        F.col("l_partkey").cast("bigint").alias("pk"),
        F.col("l_suppkey").cast("bigint").alias("sk"),
    )
    bounds = li.agg(
        F.min("pk").alias("pk_lo"), F.max("pk").alias("pk_hi"),
        F.min("sk").alias("sk_lo"), F.max("sk").alias("sk_hi"),
    )

    def binned(col: str, lo: str, hi: str) -> F.Column:
        # monotonic rescale into [0, 2^bits): floor((v-lo)*2^bits/(hi-lo+1))
        return F.floor(
            (F.col(col) - F.col(lo)) * (1 << bits)
            / (F.col(hi) - F.col(lo) + 1)
        ).cast("bigint")

    z = spread(binned("pk", "pk_lo", "pk_hi")).bitwiseOR(
        F.shiftleft(spread(binned("sk", "sk_lo", "sk_hi")), 1)
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            "pk", "sk",
            F.shiftrightunsigned(z, 2 * bits - bucket_bits).cast("int")
            .alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("pk").alias("pk_min"), F.max("pk").alias("pk_max"),
            F.min("sk").alias("sk_min"), F.max("sk").alias("sk_max"),
        )
    )


def dq201_compaction_plan(t: dict, target_rows: int = 500) -> DataFrame:
    """Small-file compaction planner: pack per-day `orders` partitions
    (the many-small-files shape a daily ingest leaves behind) into
    sequential compaction bins of ~``target_rows`` rows each, preserving
    date order so each output file stays range-prunable on o_orderdate —
    the plan an OPTIMIZE/compact job executes.

    Streaming next-fit chunker: bin = floor(exclusive-cumulative-size /
    target) over the date-ordered partition list. The window runs over
    the PARTITION LIST (one row per day — 100 TB of data is still only
    thousands of partitions), never the data, so the global sort is over
    a trivially small table; the data movement it plans is
    repartitionByRange on the emitted bin id. All arithmetic is exact
    bigint counts. d_min/d_max are emitted as DATE, not timestamp_ntz:
    the driver's pandas canonicalizer diverges on timestamp columns
    (dq185's array failure in temporal form — this entry was driver-red
    in CORRECTNESS_r05 with timestamp_ntz outputs; dq68's DATE outputs
    have a green history since r1).
    """
    from pyspark.sql import Window

    sizes = (
        t["orders"]
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    binned = sizes.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n").over(w), F.lit(0)) / target_rows)
        .cast("bigint"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_partitions"),
            F.sum("n").alias("total_rows"),
            F.min("d").cast("date").alias("d_min"),
            F.max("d").cast("date").alias("d_max"),
        )
    )
