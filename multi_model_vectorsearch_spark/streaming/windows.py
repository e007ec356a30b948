"""Structured Streaming window jobs (SURVEY.md B41-B45).

The reference's only notion of a stream is point-at-a-time `/submit` ingest
(main.py:48-87). The engine generalizes to real streams: the same window
expressions as the batch operators (operators/windows_batch.py), run over
``readStream`` — so every streaming job is verified by *batch equivalence*
(SURVEY.md §5.4): replaying the events table through the stream must produce
exactly the batch result.

The file-replay source splits events into N parquet files consumed one per
micro-batch (``maxFilesPerTrigger=1``) — a deterministic stand-in for
Kafka/Kinesis with identical plan shapes downstream.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap
from multi_model_vectorsearch_spark.sources.registry import load_tables


def write_replay_dir(spark: SparkSession, sf_dir: str, replay_dir: str,
                     n_files: int = 8) -> None:
    """Materialize events as N files for micro-batch replay."""
    ev = load_tables(spark, sf_dir)["events"]
    ev.repartition(n_files).write.mode("overwrite").parquet(replay_dir)


def read_event_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    """File-source stream: one file per trigger → N micro-batches."""
    schema = spark.read.parquet(replay_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
    )


def _agg(df_grouped):
    return df_grouped.agg(
        F.count("*").alias("c"),
        # exact cents — must stay expression-identical to the batch twins
        # in operators/windows_batch.py (batch-equivalence contract)
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint").alias("sv_cents"),
    )


def tumbling_stream(events: DataFrame) -> DataFrame:
    """B41: streaming tumbling 1h window (same expr as batch dq36)."""
    g = _agg(events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type"))
    return g.select(
        F.unix_timestamp(F.col("w.start")).alias("ws"), "event_type", "c",
        "sv_cents"
    )


def sliding_stream(events: DataFrame) -> DataFrame:
    """B42: streaming sliding 1h/30m window (same expr as batch dq37)."""
    g = _agg(
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                       "event_type")
    )
    return g.select(
        F.unix_timestamp(F.col("w.start")).alias("ws"), "event_type", "c",
        "sv_cents"
    )


def session_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """B43/B44: streaming session windows (30m gap) with a watermark.

    The watermark bounds state: sessions older than max(event time) − delay
    are finalized and evicted — the knob that keeps state finite at 100 TB/day.
    """
    g = _agg(
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
    )
    return g.select(
        "user_id", F.unix_micros(F.col("w.start")).alias("ss"), "c", "sv_cents"
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """B45: stateful streaming dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextlib.contextmanager
def state_store_provider(spark: SparkSession, provider: str):
    """Run streaming queries under an alternate state-store provider.

    The default HDFS-backed provider keeps every store's full state map in
    executor heap — fine for windowed aggs whose state is O(open windows),
    but the B44/B45 dedup contract holds state proportional to the key
    space inside the watermark horizon, and ``applyInPandasWithState``
    holds O(groups): at 100 TB those outgrow the heap. RocksDB
    (``ROCKSDB_PROVIDER``, rocksdbjni ships with Spark) spills state to
    local disk with a block-cache working set, bounding the footprint by
    disk instead of heap. The provider is read per-query at ``start()``,
    so this only needs to wrap the query launch; checkpointed queries must
    keep the provider they started with (state files are format-specific).
    Equivalence across providers is pinned by
    tests/test_streaming.py::test_stateful_surface_rocksdb_equivalence.
    """
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, provider)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)


def run_to_memory(stream_df: DataFrame, table: str, mode: str = "complete"):
    """Drain a finite replay stream into an in-memory sink; returns the query."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """B46-adjacent: custom stateful operator via ``applyInPandasWithState``.

    Per-user running (event count, value sum) carried in explicit group
    state across micro-batches — the surface for stateful logic that
    built-in windowed aggs can't express (custom eviction, conditional
    resets, model state). Emits one row per user per micro-batch touching
    that user; the *last* emission per user equals the batch aggregate
    (asserted by the equivalence test).

    State is (count, sum) per user — O(users) bytes, the same bound a
    shuffle-hash aggregation would hold; NoTimeout because replay is
    finite (production would set an event-time timeout to evict idle
    users).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        (user_id,) = key
        cnt, sv = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            sv += float(pdf["value"].sum())
        state.update((cnt, sv))
        yield pd.DataFrame({"user_id": [user_id], "n": [cnt], "sv": [sv]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n bigint, sv double",
        stateStructType="n bigint, sv double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def view_purchase_join_stream(events: DataFrame,
                              watermark: str = "365 days") -> DataFrame:
    """Stream-stream inner join: views ⨝ same-user purchases within 1 hour.

    Both sides carry watermarks and the join has an event-time range bound,
    so Spark can evict buffered rows once the watermark passes v_ts + 1h —
    the state-cleanup contract that keeps a 100 TB/day join finite. Replayed
    with a wide watermark it must equal the batch dq106 exactly.
    """
    from multi_model_vectorsearch_spark.operators.timeseries import (
        view_purchase_pairs,
    )

    views = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", watermark)
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
    )
    return view_purchase_pairs(views, buys)


def dedup_within_watermark_stream(events: DataFrame,
                                  watermark: str = "1 hour") -> DataFrame:
    """B45 variant: ``dropDuplicatesWithinWatermark`` — dedup state is evicted
    once the watermark passes, so late re-sends inside the horizon are
    dropped but state stays bounded by the delay window (exact
    ``dropDuplicates`` keeps every key forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def ohlc_stream(events: DataFrame) -> DataFrame:
    """dq184's streaming twin: per-user hourly OHLC bars as a streaming
    aggregation. min_by/max_by/min/max/sum are all algebraic aggregates,
    so the incremental state per open (user, hour) group is one partial
    row — the same map-side-combine property that makes the batch form
    one shuffle makes the streaming form bounded-state (add a watermark
    in production to evict closed hours, as session_stream does).
    """
    from multi_model_vectorsearch_spark.operators.timeseries import (
        _event_order_key,
    )

    key = _event_order_key()
    v = F.col("value").cast("decimal(18,2)").cast("double")
    g = (
        events.select(
            "user_id", "ts", v.alias("v"), key.alias("k"),
        )
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            # cents outputs — expression-identical to batch dq184
            snap(F.min_by("v", "k"), 100).alias("open_cents"),
            snap(F.max("v"), 100).alias("high_cents"),
            snap(F.min("v"), 100).alias("low_cents"),
            snap(F.max_by("v", "k"), 100).alias("close_cents"),
            (F.sum(F.col("v").cast("decimal(18,2)")) * 100).cast("bigint")
            .alias("volume_cents"),
            F.count("*").alias("n"),
        )
    )
    return g.select(
        "user_id",
        F.floor(F.unix_micros(F.col("w.start")) / 3_600_000_000)
        .cast("bigint").alias("hb"),
        "open_cents", "high_cents", "low_cents", "close_cents",
        "volume_cents", "n",
    )


def ewma_stream(events: DataFrame, span: int = 20) -> DataFrame:
    """dq198's streaming twin: per-user hourly EWMA served incrementally
    via ``applyInPandasWithState`` — the B46-style pattern for keeping a
    smoothed per-entity feature fresh as events arrive.

    State per user is the (hour-bucket → cents) map; each micro-batch
    merges its buckets and re-emits the user's EWMA series (update mode —
    the LAST emission per (user, hb) is the converged value, which the
    equivalence test checks against batch dq198). Recomputing the whole
    series per touched user keeps the twin correct under the replay's
    arbitrary file order (a late bucket changes every downstream frame);
    production would bound state and emission by finalizing buckets older
    than ``span`` hours behind the watermark — the same O(activity-span)
    state bound the batch window holds per partition. All arithmetic is
    the batch kernel's exact power-of-two integer form; the one float
    division per row is IEEE-identical to the JVM's.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hour_us = 3_600_000_000

    def update(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            hbs, vals = state.get
            buckets = dict(zip(hbs, vals))
        else:
            buckets = {}
        for pdf in pdfs:
            us = pdf["ts"].astype("datetime64[us]").astype("int64")
            hb = us // hour_us
            # HALF_UP away-from-zero, matching batch dq198's F.round —
            # pandas .round() is banker's (half-to-even) and disagrees
            # with the JVM by one cent at exact half-cent boundaries
            v100 = (pdf["value"] * 100.0).to_numpy()
            cents = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)) \
                .astype("int64")
            for h, c in zip(hb, cents):
                buckets[int(h)] = buckets.get(int(h), 0) + int(c)
        state.update((list(buckets), list(buckets.values())))
        hbs_sorted = sorted(buckets)
        out_hb, out_ewma = [], []
        for i, h in enumerate(hbs_sorted):
            frame = hbs_sorted[max(0, i - span + 1): i + 1]
            num = sum(
                buckets[fh] << (span - 1 - j)
                for j, fh in enumerate(reversed(frame))
            )
            den = (1 << span) - (1 << (span - len(frame)))
            out_hb.append(h)
            out_ewma.append(num / den / 100.0)
        yield pd.DataFrame({
            "user_id": [user_id] * len(out_hb),
            "hb": out_hb,
            "ewma": out_ewma,
        })

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, hb bigint, ewma double",
        stateStructType="hbs array<bigint>, vals array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
