"""Event time-series analytics: gap filling and funnel attribution.

Extensions over the `events` stream analog — the shapes a 100 TB behavioral
pipeline runs daily. Both are single-shuffle-per-stage window/join plans:

- **Gap fill / resample**: dense per-user hourly grid via ``sequence`` +
  ``explode`` (rows are generated executor-side, never on the driver), left
  join of actual buckets, forward fill with ``last(ignorenulls)``. Grid
  width is bounded per user by their own activity span, so generation is
  proportional to output, not to (users × global range).
- **Funnel**: strictly-ordered stage attribution (view → click → purchase)
  by cascading min-timestamp joins; per-stage timestamps must strictly
  increase, matching standard funnel semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap

Tables = dict

HOUR_US = 3_600_000_000


def _event_order_key() -> "F.Column":
    """Zero-padded (epoch_us, event_id) string: a total order usable as a
    min_by/max_by key in BOTH engines (DuckDB arg_min/arg_max can't take
    struct keys). epoch_us is offset by 2^62 so pre-1970 (negative)
    timestamps still sort correctly — a bare '%020d' of a negative value
    breaks the lexicographic = numeric equivalence ('-…009' < '-…123'
    although -9 > -123)."""
    return F.format_string(
        "%020d%020d", F.unix_micros("ts") + (1 << 62), F.col("event_id")
    )


def dq70_gapfill(t: Tables) -> DataFrame:
    """Hourly resample per user with forward fill over activity gaps."""
    ev = t["events"].select(
        "user_id",
        F.floor(F.unix_micros("ts") / HOUR_US).cast("bigint").alias("hb"),
        "value",
    )
    hourly = ev.groupBy("user_id", "hb").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("bigint")
        .alias("sv")
    )
    # r15: bounds fold from the hourly aggregate (same hb set per user),
    # not a second scan+shuffle of the raw events table
    bounds = hourly.groupBy("user_id").agg(
        F.min("hb").alias("lo"), F.max("hb").alias("hi")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hb")
    )
    j = grid.join(hourly, ["user_id", "hb"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id", "hb",
        F.last("sv", ignorenulls=True).over(w).alias("filled_cents")
    )


def dq71_funnel(t: Tables) -> DataFrame:
    """Per-user funnel stage: view → click → purchase, strictly ordered."""
    ev = t["events"].select("user_id", "event_type", "ts")
    users = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    joined = (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return joined.select("user_id", stage.cast("int").alias("stage"))


def view_purchase_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Attribution interval join: each view paired with same-user purchases
    inside the following hour.

    Shared by the batch dq106 and the stream-stream join (streaming/windows
    .view_purchase_join_stream) so batch equivalence tests one expression.
    The equi-key (user_id) carries the shuffle; the time bounds are
    residual predicates evaluated inside the joined partitions — at scale
    this is a plain shuffled hash join, not a nested-loop.
    """
    v = views.select(
        F.col("user_id").alias("u"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    b = purchases.select(
        F.col("user_id").alias("bu"), F.col("ts").alias("b_ts"),
        F.col("event_id").alias("buy_id"),
    )
    return v.join(
        b,
        (F.col("u") == F.col("bu"))
        & (F.col("b_ts") >= F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(F.col("u").alias("user_id"), "view_id", "buy_id")


def dq106_view_purchase_join(t: Tables) -> DataFrame:
    """Batch twin of the stream-stream interval join (B-ext): view→purchase
    pairs per user within one hour."""
    e = t["events"]
    return view_purchase_pairs(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


def dq117_sessionize(t: Tables, gap_sec: int = 1800) -> DataFrame:
    """Gaps-and-islands sessionization: assign explicit per-user session
    indexes from inactivity gaps, then aggregate each session.

    The batch complement of dq38's session_window: this form keeps the
    session *id* on every event (needed for downstream joins), built from
    lag + cumulative-sum-of-flags — one shuffle on user_id, both windows
    share the same partitioning so Catalyst plans a single Exchange.
    """
    ep = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = t["events"].select(
        "user_id", "event_id", "ts",
        F.when(ep - F.lag(ep).over(w) > gap_sec, 1).otherwise(0)
        .alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    ev = flagged.select(
        "user_id", "event_id", "ts",
        F.sum("new_sess").over(run).alias("sess"),
    )
    return (
        ev.groupBy("user_id", "sess")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts")))
            .alias("dur_sec"),
        )
    )


def dq118_rolling_range(t: Tables, days: int = 7) -> DataFrame:
    """Trailing 7-day per-user rolling aggregates via a RANGE frame on
    event time (not row counts) — the moving-average shape row frames
    can't express when events are irregularly spaced.

    Epoch-seconds ordering makes the frame arithmetic engine-portable and
    keeps the comparison integer-exact. One shuffle on user_id; the frame
    scan is linear per partition (Spark's bounded range frame slides two
    pointers, no per-row rescan).
    """
    ep = F.unix_timestamp("ts").alias("ep")
    w = (
        Window.partitionBy("user_id").orderBy("ep")
        .rangeBetween(-days * 86400, 0)
    )
    ev = t["events"].select(
        "user_id", "event_id", ep,
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    return (
        ev.select(
            "user_id", "event_id",
            F.count("*").over(w).alias("n_7d"),
            (F.sum("v").over(w) * 100).cast("bigint").alias("sum_7d_cents"),
        )
    )


def dq129_reagg_rollup(t: Tables) -> DataFrame:
    """Materialized-view-style reaggregation: daily partial aggregates
    merged into weekly rollups, proving sum/count associativity end to end.

    The incremental-pipeline pattern at 100 TB: the fact stream is
    aggregated once per day (the expensive pass), and every coarser
    granularity is derived from partials — merging 7 partial rows per key
    instead of re-scanning the week's raw events. DECIMAL sums make the
    merge bit-exact, so the oracle computes weekly directly from raw
    events and must match.
    """
    day_us = F.lit(86400000000)
    ev = t["events"].select(
        (F.unix_micros("ts") / day_us).cast("bigint").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count("*").alias("pn"),
        F.sum("v").cast("decimal(18,2)").alias("ps"),
    )
    weekly = (
        daily.withColumn("wk", F.floor(F.col("day") / 7).cast("bigint"))
        .groupBy("wk", "event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n"),
            (F.sum("ps") * 100).cast("bigint").alias("sum_value_cents"),
        )
    )
    return weekly.orderBy("wk", "event_type")


def dq132_latest_event(t: Tables) -> DataFrame:
    """Latest-wins compaction via max_by: each user's most recent event of
    each type, with deterministic (ts, event_id) tie-breaking.

    The CDC-compaction primitive (Kafka log-compaction semantics as a
    batch query): one partial-aggregating groupBy — max_by carries the
    whole payload through the merge, so there's no second self-join to
    re-fetch the winning row, unlike the window-rank form (dq15) which
    must sort every partition. At 100 TB this halves the shuffle of the
    naive rank-then-join compaction.
    """
    ev = t["events"]
    # composite key as a zero-padded string: engine-portable total order
    # (DuckDB's arg_max can't take struct/list keys)
    key = _event_order_key()
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max_by("event_id", key).alias("last_event_id"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
            F.max_by(F.round(F.col("value") * 100).cast("bigint"), key)
            .alias("last_value_cents"),
        )
        .orderBy("user_id", "event_type")
    )


def dq142_count_anomalies(t: Tables, window_days: int = 7,
                          z_thresh: float = 2.0) -> DataFrame:
    """Volume anomaly detection: per (day, event_type), z-score the daily
    event count against the trailing ``window_days`` baseline (excluding
    the current day); flag |z| above threshold.

    The ingest-monitoring primitive: a source whose daily volume z-spikes
    is a crawler loop or an outage. Two stacked windows share one shuffle
    on event_type; counts are integers so the baseline stats are exact
    regardless of partition order.
    """
    day_us = F.lit(86400000000)
    daily = (
        t["events"]
        .select((F.unix_micros("ts") / day_us).cast("bigint").alias("day"),
                "event_type")
        .groupBy("day", "event_type").agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    scored = daily.select(
        "day", "event_type", "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count("n").over(w).alias("n_base"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(F.col("n_base") >= window_days)
        .filter(F.col("sd") > 0)
        .select(
            "day", "event_type", "n",
            snap(z).alias("z_micro"),
            (F.abs(z) > z_thresh).cast("int").alias("anomaly"),
        )
    )


def dq143_retention_cohorts(t: Tables) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active week, with
    distinct active users at each later week offset — the classic
    retention triangle.

    Two aggregations over one fact scan: first-seen week per user (a
    groupBy on user), broadcast back onto the user's weekly activity to
    compute offsets. At 100 TB the cohort map is |users| rows — the only
    reshuffle — and the triangle itself is tiny.
    """
    wk_us = F.lit(7 * 86400000000)
    ev = t["events"].select(
        "user_id",
        (F.unix_micros("ts") / wk_us).cast("bigint").alias("wk"),
    ).distinct()
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ev.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def dq144_transition_matrix(t: Tables) -> DataFrame:
    """Event-type transition counts (first-order Markov matrix) over each
    user's time-ordered stream — the sequence-modeling prep stat
    (next-event prediction baselines, funnel leak analysis).

    One window shuffle on user_id to order each stream, then a global
    groupBy on the (from, to) pair — at most |types|² rows out.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"),
                 F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )


def dq178_interpolate(t: Tables) -> DataFrame:
    """Linear interpolation over hourly gaps per user — the dq70 follow-on
    every time-series stack needs (forward fill biases toward the past;
    interpolation weights both known neighbors by distance).

    The spine join and all four neighbor lookups share one hash partition
    on user_id (single Exchange); the interpolation itself is a fixed
    scalar expression of two exact 2-decimal endpoints and an integer
    ratio, so both engines evaluate the identical IEEE operation sequence.
    Edges hold their nearest known value.
    """
    ev = t["events"].select(
        "user_id",
        F.floor(F.unix_micros("ts") / HOUR_US).cast("bigint").alias("hb"),
        "value",
    )
    hourly = ev.groupBy("user_id", "hb").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("bigint")
        .alias("sv")
    )
    # r15: bounds fold from the hourly aggregate (same hb set per user),
    # not a second scan+shuffle of the raw events table
    bounds = hourly.groupBy("user_id").agg(
        F.min("hb").alias("lo"), F.max("hb").alias("hi")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hb")
    )
    j = grid.join(hourly, ["user_id", "hb"], "left")
    # Both neighbor lookups use GROWING frames (unboundedPreceding →
    # currentRow), which Spark's window processor maintains as O(1)
    # running state per row. The naive "next known" form — first() over
    # currentRow → unboundedFollowing — re-scans to the partition end
    # from every row (O(span²) per user; 20.9 s at sf0.1, quadratic in
    # activity span). Ordering the frame DESCENDING turns the forward
    # lookup into the same linear running-state shape: the partitioning
    # key is identical, so both sorts share one Exchange.
    wb = (Window.partitionBy("user_id").orderBy("hb")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id").orderBy(F.col("hb").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    known_hb = F.when(F.col("sv").isNotNull(), F.col("hb"))
    e = (
        j.withColumn("pv", F.last("sv", ignorenulls=True).over(wb))
        .withColumn("ph", F.last(known_hb, ignorenulls=True).over(wb))
        .withColumn("nv", F.last("sv", ignorenulls=True).over(wf))
        .withColumn("nh", F.last(known_hb, ignorenulls=True).over(wf))
    )
    frac = (F.col("hb") - F.col("ph")) / (F.col("nh") - F.col("ph"))
    interp = (
        F.when(F.col("sv").isNotNull(), F.col("sv"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    # endpoints are exact integer cents, so interp is cents-valued with
    # only the frac multiply in IEEE; floor(x·100 + 0.5) emits e4 units
    # of the original value as a BIGINT — the same IEEE sequence in both
    # engines (round()/division-back would not be)
    return e.select(
        "user_id", "hb",
        F.floor(interp * 100 + F.lit(0.5)).cast("bigint").alias("v_e4"),
    )


def dq179_rolling_median(t: Tables, n: int = 5) -> DataFrame:
    """Exact rolling median of each user's last ``n`` event values — the
    robust-location rolling statistic (rolling mean chases outliers; ops
    dashboards want the median).

    Spark has no median window function, but for a small fixed frame the
    sorted-array form is exact and cheap: collect the frame, sort, index.
    The even-count midpoint is written as (a + b) / 2 in BOTH engines (the
    quantile-interpolation form a + (b-a)*0.5 is a different IEEE sequence
    and can differ in the last ulp). One window partition on user_id.
    """
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    arr = F.sort_array(F.collect_list(F.col("value")).over(w))
    sz = F.size(arr)
    mid = F.element_at(arr, ((sz + 1) / 2).cast("int"))  # odd: exact middle
    lo = F.element_at(arr, (sz / 2).cast("int"))
    hi = F.element_at(arr, (sz / 2).cast("int") + 1)
    med = F.when(sz % 2 == 1, mid).otherwise((lo + hi) / 2)
    return t["events"].select(
        "user_id", "event_id", snap(med).alias("med_5_micro")
    )


def dq184_ohlc_bars(t: Tables) -> DataFrame:
    """Per-user hourly OHLC downsampling: open/high/low/close/sum/count of
    `value` per (user, hour) — the candle-bar resample every metrics and
    market-data pipeline runs.

    One partial-aggregating groupBy: open/close ride ``min_by``/``max_by``
    on the (ts, event_id) total order (associative, so map-side combine
    applies), high/low/volume are plain min/max/sum — no window sort, no
    second pass. At 100 TB this is a single shuffle keyed on
    (user_id, hour), and hour inherits the natural time-partitioning of
    the source so AQE coalesces cleanly.
    """
    ev = t["events"]
    key = _event_order_key()
    v = F.col("value").cast("decimal(18,2)").cast("double")
    return (
        ev.select(
            "user_id",
            F.floor(F.unix_micros("ts") / HOUR_US).cast("bigint").alias("hb"),
            v.alias("v"), key.alias("k"),
        )
        .groupBy("user_id", "hb")
        .agg(
            snap(F.min_by("v", "k"), 100).alias("open_cents"),
            snap(F.max("v"), 100).alias("high_cents"),
            snap(F.min("v"), 100).alias("low_cents"),
            snap(F.max_by("v", "k"), 100).alias("close_cents"),
            (F.sum(F.col("v").cast("decimal(18,2)")) * 100).cast("bigint")
            .alias("volume_cents"),
            F.count("*").alias("n"),
        )
    )


def dq187_changelog_compact(t: Tables) -> DataFrame:
    """Changelog compaction with tombstones: replay `events` as a CDC
    stream keyed by user_id — 'purchase' rows are DELETE tombstones,
    everything else an upsert carrying `value` — and emit the final
    surviving state (Kafka log-compaction / Delta MERGE semantics as one
    batch query).

    Last-writer-wins on the (ts, event_id) total order via max_by, so the
    whole compaction is ONE partial-aggregating groupBy: each map task
    pre-compacts its partition and the reduce merges winners — no window
    sort, no join. Tombstoned keys are filtered after the merge (the
    tombstone must win the order race, not short-circuit it).
    """
    ev = t["events"]
    key = _event_order_key()
    tomb = (F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_ops"),
            F.max_by(tomb, key).alias("deleted"),
            F.max_by(F.round(F.col("value") * 100).cast("bigint"), key)
            .alias("last_value_cents"),
            F.max_by(F.unix_micros("ts"), key).alias("last_ts_us"),
        )
        .filter(~F.col("deleted"))
        .select("user_id", "n_ops", "last_value_cents", "last_ts_us")
    )


def dq188_psi_drift(t: Tables, n_buckets: int = 10) -> DataFrame:
    """Population Stability Index per event_type between two corpus halves
    (event_id parity as the snapshot key, as dq154 does for embeddings):
    the standard drift monitor a training pipeline runs between data
    refreshes. PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over ``n_buckets``
    equal-width value buckets whose bounds come from the REFERENCE half,
    with +0.5 Laplace smoothing so empty buckets stay finite.

    Two aggregations end-to-end: per-type reference bounds (tiny → rejoined
    by type, broadcast at any scale), then one groupBy over (type, half,
    bucket) and a final reshape — no window, no self-join; every pass is
    map-side combinable. At 100 TB the value scan dominates and it's one
    pass.
    """
    ev = t["events"].select(
        "event_type",
        (F.col("event_id") % 2 == 0).alias("is_ref"),
        F.col("value").cast("double").alias("v"),
    )
    bounds = (
        ev.filter("is_ref")
        .groupBy("event_type")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )
    nb = F.lit(n_buckets)
    # hi == lo (constant-valued reference half) → everything in bucket 0;
    # without the guard Spark's null-division and DuckDB's inf diverge
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            nb - 1,
            F.greatest(
                F.lit(0),
                F.floor((F.col("v") - F.col("lo"))
                        / (F.col("hi") - F.col("lo")) * nb).cast("int"),
            ),
        )
    )
    counts = (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", "is_ref", bucket.alias("b"))
        .groupBy("event_type", "is_ref", "b")
        .agg(F.count("*").alias("c"))
    )
    tot = counts.groupBy("event_type", "is_ref").agg(F.sum("c").alias("n"))
    sm = (
        counts.join(tot, ["event_type", "is_ref"])
        .select(
            "event_type", "b", "is_ref",
            ((F.col("c") + 0.5) / (F.col("n") + 0.5 * n_buckets)).alias("p"),
        )
    )
    # Reshape halves side-by-side; a bucket absent from one half gets the
    # smoothed floor 0.5/(n + 0.5*nb) — join totals back for that.
    grid = (
        sm.groupBy("event_type", "b")
        .agg(
            F.max(F.when(F.col("is_ref"), F.col("p"))).alias("p_ref"),
            F.max(F.when(~F.col("is_ref"), F.col("p"))).alias("p_cur"),
        )
        .join(
            tot.groupBy("event_type").agg(
                F.max(F.when(F.col("is_ref"), F.col("n"))).alias("n_ref"),
                F.max(F.when(~F.col("is_ref"), F.col("n"))).alias("n_cur"),
            ),
            "event_type",
        )
        .select(
            "event_type", "b",
            F.coalesce("p_ref", 0.5 / (F.col("n_ref") + 0.5 * n_buckets))
            .alias("p"),
            F.coalesce("p_cur", 0.5 / (F.col("n_cur") + 0.5 * n_buckets))
            .alias("q"),
        )
    )
    return (
        grid.groupBy("event_type")
        .agg(
            # per-bucket pico snap, exact integer sum (order-independent;
            # the old unordered double sum + round() was the r5 hazard
            # class)
            F.sum(snap((F.col("p") - F.col("q"))
                       * F.log(F.col("p") / F.col("q")),
                       1_000_000_000_000)).alias("psi_pico"),
            F.count("*").alias("n_buckets_hit"),
        )
    )


def dq191_pit_features(t: Tables) -> DataFrame:
    """Point-in-time-correct feature assembly (the feature-store join):
    for every `purchase` event, attach features computed ONLY from the
    user's strictly-earlier history — last prior `view` value, count and
    exact sum of `view` values in the trailing 24 h, and days since first
    activity. PIT discipline is what keeps training features free of
    label leakage; the as-of join (dq09) is its two-table special case.

    One window pass per frame type over the (user_id, time) ordering:
    the last-prior feature is a running ``last(ignorenulls)`` ROWS frame,
    the trailing-24 h features are a RANGE frame on epoch-micros — both
    linear running-state frames (never the O(n²) unbounded-following
    kind dq178 had to dodge). The 24 h sum accumulates in DECIMAL so the
    result is independent of row order within equal timestamps. Filtering
    to purchases happens AFTER the windows (features must see all rows)
    but Spark still prunes columns to the 5 used. At 100 TB this is one
    shuffle on user_id.
    """
    ev = t["events"].select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("value").cast("double").alias("v"),
    )
    is_view = F.col("event_type") == "view"
    w_rows = (
        Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_range = (
        Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-86_400_000_000, -1)
    )
    w_all = (
        Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    feat = ev.select(
        "user_id", "event_id", "event_type", "us",
        snap(F.last(F.when(is_view, F.col("v")), ignorenulls=True)
             .over(w_rows), 100).alias("last_view_value_cents"),
        F.count(F.when(is_view, F.lit(1))).over(w_range)
        .alias("views_24h"),
        (F.coalesce(
            F.sum(F.when(is_view, F.col("v").cast("decimal(18,2)")))
            .over(w_range),
            F.lit(0).cast("decimal(18,2)"),
        ) * 100).cast("bigint").alias("view_spend_24h_cents"),
        F.floor((F.col("us") - F.min("us").over(w_all)) / 86_400_000_000)
        .cast("int").alias("days_active"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "last_view_value_cents",
                "views_24h", "view_spend_24h_cents", "days_active")
    )


def dq193_user_trend(t: Tables, min_n: int = 5) -> DataFrame:
    """Per-user value trend: closed-form OLS slope and R² of value vs
    event day, from EXACT sufficient statistics — the entity-level trend
    scan (spend drifting up? engagement decaying?) a behavioral pipeline
    runs over every user every day.

    One partial-aggregating groupBy computes the five moments (Σx, Σx²,
    Σy, Σxy, Σy²) with x as integer days and y in DECIMAL — all exact and
    commutative, so the result is independent of partition count and
    merge order, where the built-in ``regr_slope``/``regr_r2``
    accumulate doubles whose merge order varies by engine. The closed
    forms divide two exactly-computed numbers in double at the very end.
    Degenerate users (one active day, or constant value) are filtered by
    the variance guards, not div-by-zero'd.
    """
    ev = t["events"].select(
        "user_id",
        F.floor(F.unix_micros("ts") / 86_400_000_000)
        .cast("bigint").alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    a = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    num_d = num.cast("double")
    den_x_d = den_x.cast("double")
    den_y_d = den_y.cast("double")
    return (
        a.filter((F.col("n") >= min_n) & (den_x > 0) & (den_y > 0))
        .select(
            "user_id", "n",
            snap(num_d / den_x_d).alias("slope_micro"),
            snap(num_d * num_d / (den_x_d * den_y_d)).alias("r2_micro"),
        )
    )


def dq198_ewma(t: Tables, span: int = 20) -> DataFrame:
    """Per-user hourly EWMA (alpha = 0.5) of event value, the smoothing
    pass behind every anomaly monitor and feature store — computed over a
    bounded ``span``-row trailing frame (the finite-impulse form feature
    pipelines actually ship: beyond 20 half-lives the dropped tail weighs
    2^-20 of the estimate).

    Exactness trick: alpha = 1/2 makes weights powers of two, so with
    values held as integer cents the weighted numerator
    sum(cents_i << (span-1-lag_i)) and denominator sum(1 << (span-1-lag))
    are EXACT bigints on both engines; one IEEE division at the end is
    identical everywhere — no float-summation-order hazard at all, where
    a naive double fold would diverge between Spark's frame order and the
    oracle's group-by order. The frame is rows-bounded, so the window is
    linear per partition (none of dq178's pre-fix O(n^2) frame hazard)
    and partition-local after one shuffle on user_id.
    """
    ev = t["events"]
    hourly = (
        ev.select(
            "user_id",
            F.floor(F.unix_micros("ts") / HOUR_US).cast("bigint").alias("hb"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "hb")
        .agg(F.sum("cents").alias("v"))
    )
    w = (
        Window.partitionBy("user_id").orderBy("hb")
        .rowsBetween(-(span - 1), Window.currentRow)
    )
    # arr is frame-ordered oldest->newest; fold newest-first so lag i
    # (from the current row) carries weight 2^(span-1-i)
    arr = F.collect_list("v").over(w)
    sized = F.size(F.col("arr"))
    # pow(2, k) for k <= span is integer-exact in a double, so the cast
    # back to bigint is lossless (shiftleft's numBits must be a Python
    # int, not a per-row Column — hence pow here)
    num = F.aggregate(
        F.sequence(F.lit(0), sized - 1),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.element_at(F.col("arr"), sized - i)
        * F.pow(F.lit(2.0), (F.lit(span - 1) - i).cast("double"))
        .cast("bigint"),
    )
    den = (
        F.lit(1 << span).cast("bigint")
        - F.pow(F.lit(2.0), (F.lit(span) - sized).cast("double"))
        .cast("bigint")
    )
    return (
        hourly.withColumn("arr", arr)
        .select(
            "user_id", "hb",
            snap(num.cast("double") / den / 100.0).alias("ewma_micro"),
        )
    )


def dq207_ks_test(t: Tables) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance per event_type between the
    even- and odd-event_id halves of the stream (the same snapshot split
    dq188's PSI uses) — the nonparametric drift test that catches
    distribution-shape changes equal-width buckets smooth over.

    Exact integer arithmetic end-to-end: with c1/c2 the cumulative counts
    at each distinct value and n1/n2 the half sizes, the KS statistic is
    max|c1·n2 − c2·n1| / (n1·n2) — the max runs over bigints, and the one
    IEEE division at the end is identical on both engines. The cumulative
    window is partitioned by event_type over DISTINCT values (collapsed
    first by a map-side-combinable groupBy), so no raw-row window exists;
    `v_at_micro` reports the value where the gap peaks (smallest, on
    ties). Outputs are micro-unit BIGINTs via the floor snap — this was
    driver-red in CORRECTNESS_r05 while ``ks`` ended in
    ``round(raw ratio, 6)`` (round() is not cross-engine-identical,
    SURVEY §5.3 rule 6).
    """
    ev = t["events"].select(
        "event_type",
        (F.col("event_id") % 2 == 0).alias("h1"),
        F.col("value").alias("v"),
    )
    per_v = ev.groupBy("event_type", "v").agg(
        F.sum(F.col("h1").cast("bigint")).alias("a"),
        F.sum((~F.col("h1")).cast("bigint")).alias("b"),
    )
    wc = (
        Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    staged = (
        per_v
        .withColumn("c1", F.sum("a").over(wc))
        .withColumn("c2", F.sum("b").over(wc))
        .withColumn("n1", F.sum("a").over(wt))
        .withColumn("n2", F.sum("b").over(wt))
        .withColumn("gap", F.abs(F.col("c1") * F.col("n2")
                                 - F.col("c2") * F.col("n1")))
    )
    peak = staged.groupBy("event_type").agg(
        F.max("gap").alias("maxgap"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
    )
    return (
        staged.select("event_type", "v", "gap")
        .join(F.broadcast(peak), "event_type")
        # degenerate-group guard (dq205/dq231/dq240's standard): a type
        # whose event_ids are all one parity has n1·n2 = 0, and 0/0 is
        # NULL in Spark (non-ANSI) but NaN in DuckDB — drop it, a KS
        # distance against an empty sample is undefined anyway
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .filter(F.col("gap") == F.col("maxgap"))
        .groupBy("event_type")
        .agg(
            F.max("n1").alias("n1"), F.max("n2").alias("n2"),
            snap(
                (F.max("maxgap").cast("double"))
                / (F.max("n1") * F.max("n2"))).alias("ks_micro"),
            snap(F.min("v")).alias("v_at_micro"),
        )
    )


def dq208_cusum(t: Tables) -> DataFrame:
    """CUSUM changepoint scan per event_type: the maximum deviation of the
    running value sum from its straight-line expectation, max_k |S_k −
    (k/n)·S_n| — the classic single-changepoint detector a pipeline runs
    on daily metric streams before retraining on 'business as usual' data.

    Integer-exact: values become cents, the deviation is |n·S_k − k·S_n|
    (bigint), and one final division by n·100 converts the max back to
    value units — no float accumulates anywhere. One window per type over
    the (ts, event_id) total order computes k and S_k in a single linear
    pass; the peak row (earliest k on ties) is selected by an integer
    argmax join, exactly dq207's shape.
    """
    key = _event_order_key()
    ev = t["events"].select(
        "event_type", key.alias("k"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wo = (
        Window.partitionBy("event_type").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    staged = (
        ev
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("event_type").orderBy("k")))
        .withColumn("sk", F.sum("cents").over(wo))
        .withColumn("n", F.count("*").over(wt))
        .withColumn("sn", F.sum("cents").over(wt))
        .withColumn("dev", F.abs(F.col("n") * F.col("sk")
                                 - F.col("rn") * F.col("sn")))
    )
    peak = staged.groupBy("event_type").agg(F.max("dev").alias("maxdev"))
    return (
        staged.select("event_type", "rn", "n", "dev")
        .join(F.broadcast(peak), "event_type")
        .filter(F.col("dev") == F.col("maxdev"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.min("rn").alias("k_at"),
            snap(
                F.max("maxdev").cast("double")
                / (F.max("n") * F.lit(100.0))).alias("cusum_micro"),
        )
    )


def dq213_rolling_zscore(t: Tables, lookback: int = 20,
                         min_n: int = 10, z_thresh: int = 2) -> DataFrame:
    """Rolling z-score anomalies per user: each event scored against the
    mean/std of its own trailing ``lookback`` events (exclusive of
    itself) — the self-calibrating point-anomaly detector every metrics
    pipeline runs, needing no global model.

    Flagging is EXACT integer arithmetic: with cents x, trailing sums
    sx/sxx over n rows, |z| > thresh ⟺ (n·x − sx)²·(n−1) >
    thresh²·n·(n·sxx − sx²) — all bigint, no float compare at the
    boundary. The reported |z| itself needs one sqrt of an exact
    rational, and IEEE sqrt is correctly rounded, so both engines emit
    the same double. One linear bounded-row window per user partition.
    """
    key = _event_order_key()
    ev = t["events"].select(
        "user_id", "event_id", key.alias("k"),
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("k")
        .rowsBetween(-lookback, -1)
    )
    staged = (
        ev
        .withColumn("n", F.count("*").over(w))
        .withColumn("sx", F.sum("x").over(w))
        .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(w))
        .filter(F.col("n") >= min_n)
        .withColumn("dev", F.col("n") * F.col("x") - F.col("sx"))
        .withColumn("varn", F.col("n") * F.col("sxx")
                    - F.col("sx") * F.col("sx"))
        .filter(F.col("varn") > 0)
    )
    z2num = F.col("dev") * F.col("dev") * (F.col("n") - 1)
    z2den = F.col("varn") * F.col("n")
    return (
        staged
        .filter(z2num > F.lit(z_thresh * z_thresh) * z2den)
        .select(
            "user_id", "event_id", "n",
            snap(F.sqrt(z2num.cast("double") / z2den.cast("double")))
            .alias("abs_z_micro"),
        )
    )


def dq216_seasonal_profile(t: Tables) -> DataFrame:
    """Hour-of-day seasonal profile per event type: each (type, hour)
    bucket's mean value and its deviation from the type's overall mean —
    the seasonality fingerprint subtracted before anomaly detection
    (dq213) so a nightly dip doesn't read as a regression.

    Two map-side-combinable aggregations (bucket sums, type sums) joined
    on the tiny type key; cents keep both sums exact, means are exact
    integer ratios, and the deviation is one IEEE subtraction of
    identical doubles. The 100 TB scan happens once.
    """
    ev = t["events"].select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    buckets = ev.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s"))
    totals = buckets.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts"))
    mean_h = F.col("s").cast("double") / (100.0 * F.col("n"))
    mean_g = F.col("ts").cast("double") / (100.0 * F.col("tn"))
    return (
        buckets.join(F.broadcast(totals), "event_type")
        .select(
            "event_type", "hod", "n",
            snap(mean_h).alias("mean_val_micro"),
            snap(mean_h - mean_g).alias("dev_micro"),
        )
    )


def dq219_order_audit(t: Tables) -> DataFrame:
    """Ingest order-quality audit per user: how many events arrived with
    an event-time EARLIER than something already ingested (arrival order
    = event_id sequence) — the lateness profile that decides watermark
    width before any streaming job is deployed (dq44-style QA for time).

    One linear window per user partition: running max of epoch-µs over
    the preceding arrival rows, compared as exact integers. late_frac is
    one IEEE division.
    """
    ev = t["events"].select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("us"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "late", (F.col("us") < F.max("us").over(w)).cast("bigint"))
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("late"), F.lit(0)).alias("n_late"),
            snap(
                F.coalesce(F.sum("late"), F.lit(0)).cast("double")
                / F.count("*")).alias("late_frac_micro"),
        )
    )


def dq223_nearest_event_join(t: Tables) -> DataFrame:
    """Nearest-event (bidirectional as-of) join inside each user's stream:
    every 'view' matched to its nearest-in-time 'purchase', past OR
    future — the attribution variant dq09's backward-only as-of can't
    express, and the pattern behind sensor alignment and label joining.

    Both directions are LINEAR running windows: previous purchase via
    last(ignorenulls) over ascending order, next purchase via the same
    frame over DESCENDING order (the dq178-fix trick — never an
    unboundedFollowing frame, whose processor rescans O(n²)). The nearer
    side wins; exact integer µs deltas, ties to the earlier purchase.
    """
    key = _event_order_key()
    ev = t["events"].select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"), key.alias("k"),
    )
    pcol = F.when(
        F.col("event_type") == "purchase",
        F.struct(F.col("us").alias("pus"), F.col("event_id").alias("pid")),
    )
    asc = (
        Window.partitionBy("user_id").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    desc = (
        Window.partitionBy("user_id").orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        ev.withColumn("p", pcol)
        .withColumn("prev", F.last("p", ignorenulls=True).over(asc))
        .withColumn("nxt", F.last("p", ignorenulls=True).over(desc))
        .filter(F.col("event_type") == "view")
    )
    d_prev = F.col("us") - F.col("prev.pus")
    d_next = F.col("nxt.pus") - F.col("us")
    take_prev = F.col("nxt").isNull() | (
        F.col("prev").isNotNull() & (d_prev <= d_next))
    return staged.select(
        "user_id", "event_id",
        F.when(F.col("prev").isNull() & F.col("nxt").isNull(), F.lit(None))
        .when(take_prev, F.col("prev.pid")).otherwise(F.col("nxt.pid"))
        .alias("purchase_id"),
        F.when(F.col("prev").isNull() & F.col("nxt").isNull(), F.lit(None))
        .when(take_prev, d_prev).otherwise(d_next).alias("delta_us"),
    )


def dq226_time_weighted_avg(t: Tables) -> DataFrame:
    """Time-weighted average per user: integrate the last-known value
    over each inter-event interval and divide by the user's active span
    — the irregular-sampling mean (TimescaleDB/InfluxDB `time_weight`)
    where a plain AVG over-weights chatty periods.

    One lead() per user partition (linear, single shuffle) gives each
    event its holding interval; the integral accumulates EXACT bigints
    (cents × µs ≈ 10^14 per term — bigint holds ~10^5 such terms per
    user; cast the sum to DECIMAL(38,0) if a user's span ever nears
    that), and the final division is one shared IEEE op. Users with a
    single event report their value (zero-length span guard).
    """
    key = _event_order_key()
    ev = t["events"].select(
        "user_id",
        F.unix_micros("ts").alias("us"), key.alias("k"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("k")
    seg = ev.withColumn("nxt_us", F.lead("us").over(w))
    agg = (
        seg.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("us").alias("t0"),
            F.max("us").alias("t1"),
            F.sum(F.col("cents") * (F.col("nxt_us") - F.col("us")))
            .alias("integral"),
            F.min_by("cents", "k").alias("first_cents"),
        )
    )
    span = F.col("t1") - F.col("t0")
    return agg.select(
        "user_id", "n",
        F.when(span > 0,
               snap(F.col("integral").cast("double") / span / 100.0))
        # single-event users: exact micro units (cents × 10^4)
        .otherwise(F.col("first_cents") * 10000).alias("twa_micro"),
    )


def dq231_autocorr(t: Tables, min_n: int = 10) -> DataFrame:
    """Lag-1 autocorrelation of each user's hourly value series — the
    'is this metric momentum or noise' statistic that gates whether
    yesterday's value belongs in a feature vector at all.

    dq193's exact-sufficient-statistics pattern on consecutive-pair
    sums: one lead() per user partition pairs (x_t, x_{t+1}) in integer
    cents, the five sums are exact bigints, and Pearson r over the
    pairs is assembled from them with IEEE ops written identically on
    both engines. Degenerate (zero-variance) sides are filtered before
    the division, the same guard class as dq131/dq193.
    """
    ev = t["events"].select(
        "user_id",
        F.floor(F.unix_micros("ts") / HOUR_US).cast("bigint").alias("hb"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    hourly = ev.groupBy("user_id", "hb").agg(F.sum("cents").alias("x"))
    w = Window.partitionBy("user_id").orderBy("hb")
    pairs = (
        hourly.withColumn("y", F.lead("x").over(w))
        .filter(F.col("y").isNotNull())
    )
    a = pairs.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        a.filter((F.col("n") >= min_n) & (den_x > 0) & (den_y > 0))
        .select(
            "user_id", "n",
            snap(
                num.cast("double")
                / F.sqrt(den_x.cast("double") * den_y.cast("double")))
            .alias("r1_micro"),
        )
    )


def dq232_period_over_period(t: Tables) -> DataFrame:
    """Week-over-week change per event type: weekly value totals with
    absolute and relative deltas against the previous week — the
    period-over-period report every metrics dashboard leads with.

    One map-side-combinable weekly aggregate, then a lag() over the
    tiny (type × week) table — the window input is period-count-sized
    no matter the row count. Totals are exact cents; deltas are exact
    bigint differences; the relative change is one IEEE division, NULL
    on a zero base (no fake infinities).
    """
    ev = t["events"].select(
        "event_type",
        F.floor(F.unix_micros("ts") / (7 * 24 * HOUR_US)).cast("bigint")
        .alias("wk"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    weekly = ev.groupBy("event_type", "wk").agg(
        F.count("*").alias("n"), F.sum("cents").alias("c"))
    w = Window.partitionBy("event_type").orderBy("wk")
    staged = weekly.withColumn("prev_c", F.lag("c").over(w))
    return staged.select(
        "event_type", "wk", "n",
        F.col("c").alias("total_cents"),
        (F.col("c") - F.col("prev_c")).alias("delta_cents"),
        F.when(
            F.col("prev_c") > 0,
            snap((F.col("c") - F.col("prev_c")).cast("double")
                 / F.col("prev_c")),
        ).alias("rel_change_micro"),
    )


def dq235_markov_nll(t: Tables, add_k: float = 0.5) -> DataFrame:
    """Per-user behavioral surprise: mean negative log-likelihood of the
    user's event-type sequence under the corpus-wide first-order Markov
    transition model (dq144's matrix, smoothed) — the sequence analog of
    dq202's bigram LM, flagging users whose click-paths are improbable
    (bots, new surfaces) for triage.

    Transitions come from one lag() per user partition; the corpus
    transition counts and state marginals are tiny aggregates broadcast
    back, so scoring is map-side. Per-user means sum a handful of ln
    terms (dq127's accepted float class) and round once.
    """
    key = _event_order_key()
    ev = t["events"].select("user_id", "event_type", key.alias("k"))
    w = Window.partitionBy("user_id").orderBy("k")
    trans = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("user_id", F.col("event_type").alias("a"),
                F.col("nxt").alias("b"))
    )
    cab = trans.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ca = cab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    ns = ev.agg(F.count_distinct("event_type").alias("n_states"))
    # per-transition micro snap, then exact integer sum — the sum is
    # order-independent (the old float sum + round() was the r5 hazard
    # class); the mean divides exact integers with one floor snap
    lp_micro = snap(F.log((F.col("c_ab") + add_k)
                          / (F.col("c_a") + add_k * F.col("n_states"))))
    return (
        trans.join(F.broadcast(cab), ["a", "b"])
        .join(F.broadcast(ca), "a")
        .crossJoin(F.broadcast(ns))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_transitions"),
            F.floor(-F.sum(lp_micro) / F.count("*") + F.lit(0.5))
            .cast("bigint").alias("mean_nll_micro"),
        )
    )


def dq238_rfm_segments(t: Tables, n_tiles: int = 5) -> DataFrame:
    """RFM segmentation: quintile scores for Recency (last activity),
    Frequency (event count), and Monetary (total cents) per user — the
    classic behavioral segmentation grid, here as three ntile scores
    over the user-level aggregate (user-count-sized input, not the raw
    stream; ties broken by user_id so every score is deterministic).

    One map-side-combinable aggregate builds the per-user triple; each
    score is a ``global_order_scalable`` pass (range-partition + offset
    broadcast + closed-form NTILE arithmetic — round-8 migration off the
    partitionless ``Window.orderBy``, output identical): the user
    dimension is unbounded at 100 TB, so the single-task global windows
    this used to plan were a genuine scale funnel, not a domain-bounded
    one.
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        global_orders_scalable,
        ntile_from_rank,
    )

    ev = t["events"].select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    u = ev.groupBy("user_id").agg(
        F.max("us").alias("last_us"),
        F.count("*").alias("freq"),
        F.sum("cents").alias("monetary_c"),
    )
    # one fused pass: the user table pins ONCE and one driver sample
    # serves all three boundary sets (r15 — the chained form paid a
    # sampling job + eager pin + collect per score)
    u, n = global_orders_scalable(u, [
        ("_rr", [("last_us", "desc"), "user_id"], (), ()),
        ("_rf", [("freq", "desc"), "user_id"], (), ()),
        ("_rm", [("monetary_c", "desc"), "user_id"], (), ()),
    ])
    return u.select(
        "user_id", "freq",
        F.col("monetary_c").alias("monetary_cents"),
        ntile_from_rank(F.col("_rr"), n, n_tiles).alias("r_score"),
        ntile_from_rank(F.col("_rf"), n, n_tiles).alias("f_score"),
        ntile_from_rank(F.col("_rm"), n, n_tiles).alias("m_score"),
    )


def dq240_burstiness(t: Tables, min_n: int = 10) -> DataFrame:
    """Burstiness coefficient B = (σ−μ)/(σ+μ) of each user's inter-event
    gaps (Goh-Barabási): −1 = metronome, 0 = Poisson, →1 = heavy bursts
    — the temporal fingerprint that separates organic users from
    schedulers and scrapers, read next to dq231's value autocorrelation.

    Gaps are exact integer SECONDS (µs gaps square past bigint range on
    week-long idle users; second-resolution gaps keep n·Σg² exact
    through ~10^9-second spans — past that, cast the sums to
    DECIMAL(38,0)) from one lag() per user partition; μ and σ assemble
    from exact bigint sums (n, Σg, Σg²) — dq193's pattern — with one
    sqrt+division at the end written identically on both engines.
    Population σ (the standard form for this statistic).
    """
    key = _event_order_key()
    ev = t["events"].select(
        "user_id",
        F.floor(F.unix_micros("ts") / 1_000_000).cast("bigint").alias("us"),
        key.alias("k"))
    w = Window.partitionBy("user_id").orderBy("k")
    gaps = (
        ev.withColumn("g", F.col("us") - F.lag("us").over(w))
        .filter(F.col("g").isNotNull())
    )
    a = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    # sigma = sqrt(n*sgg - sg^2)/n, mu = sg/n: B = (sqrt(n*sgg - sg^2)
    # - sg) / (sqrt(n*sgg - sg^2) + sg), the n's cancelling exactly
    root = F.sqrt((F.col("n") * F.col("sgg")
                   - F.col("sg") * F.col("sg")).cast("double"))
    return (
        a.filter((F.col("n") >= min_n) & (F.col("sg") > 0))
        .select(
            "user_id", "n",
            snap((root - F.col("sg")) / (root + F.col("sg")))
            .alias("burstiness_micro"),
        )
    )


def dq243_lorenz_deciles(t: Tables) -> DataFrame:
    """Lorenz curve by spend deciles: each user-decile's share of total
    spend and the running cumulative share — the interpretable 80/20
    report behind dq236's single Gini number ('the top decile carries
    X% of volume').

    Users aggregate once (map-side combinable); the decile split is a
    ``global_order_scalable`` rank (range-partition + offset broadcast —
    round-8 migration: the user dimension is unbounded, so the old
    partitionless ntile window was a genuine single-task funnel) with a
    deterministic (spend, user_id) tie-break; shares are exact integer
    cents ratios. The running share over the 10-row decile table is a
    broadcast non-equi self-join (r15) — no partitionless window left.
    """
    from multi_model_vectorsearch_spark.operators.scale import (
        global_order_scalable,
        ntile_from_rank,
    )

    spend = (
        t["events"].groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("c"))
    )
    ranked, n = global_order_scalable(
        spend, ["c", "user_id"], rank_col="_r")
    tiled = ranked.withColumn(
        "decile", ntile_from_rank(F.col("_r"), n, 10))
    per_d = tiled.groupBy("decile").agg(
        F.count("*").alias("n_users"), F.sum("c").alias("dc"))
    tot = per_d.agg(F.sum("dc").alias("tc"))
    # r15: the running share over the 10-row decile table comes from a
    # broadcast non-equi self-join (exact integer sums) instead of a
    # partitionless window — 10×10 pairs, bounded by construction
    prior = per_d.select(F.col("decile").alias("d2"),
                         F.col("dc").alias("dc2"))
    cum = (
        per_d.join(F.broadcast(prior), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_users", "dc")
        .agg(F.sum("dc2").alias("cum_dc"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_users",
            snap(F.col("dc").cast("double") / F.col("tc"))
            .alias("share_micro"),
            snap(F.col("cum_dc").cast("double") / F.col("tc"))
            .alias("cum_share_micro"),
        )
    )


def dq244_growth_accounting(t: Tables) -> DataFrame:
    """Weekly growth accounting: new vs returning active users per week
    — the activation/retention ledger every growth dashboard opens with,
    and the cohort denominator feeding dq143's retention matrix.

    Two aggregates: first-seen week per user (map-side min), then the
    distinct weekly active set joined against it — both shuffles keyed
    on user_id/week, no window over raw events. Counts exact; the
    returning share is one IEEE division.
    """
    wk = F.floor(F.unix_micros("ts") / (7 * 24 * HOUR_US)).cast("bigint")
    ev = t["events"].select("user_id", wk.alias("wk"))
    active = ev.distinct()
    first = active.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    j = active.join(first, "user_id")
    return (
        j.groupBy("wk")
        .agg(
            F.count("*").alias("active"),
            F.sum((F.col("wk") == F.col("wk0")).cast("bigint"))
            .alias("new_users"),
            F.sum((F.col("wk") > F.col("wk0")).cast("bigint"))
            .alias("returning"),
            snap(
                F.sum((F.col("wk") > F.col("wk0")).cast("bigint"))
                .cast("double") / F.count("*")).alias("returning_share_micro"),
        )
    )
