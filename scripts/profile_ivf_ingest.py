"""Phase-level profile of the maintained-IVF ingest path (round-8 verdict
item 2: where do the +57% go at 12.5k-doc batches on the 10x corpus?).

Replays scale_probe.bench_ingest's exact workload with a timed copy of the
process_batch body so each eager point (fresh build, corpus write, KNN
checkpoint, edge write, index upkeep) reports its own wall time.

Usage:
    python scripts/profile_ivf_ingest.py /tmp/sf_scaled [--maintain] [--batches 4]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed_process_batch(pipe, batch, batch_id):
    """process_batch with per-phase timers — body mirrors
    streaming.ingest.IngestPipeline.process_batch (keep in sync)."""
    from multi_model_vectorsearch_spark.functions.embedding import (
        route_embedding,
    )
    from multi_model_vectorsearch_spark.streaming.ingest import CORPUS_SCHEMA

    t: dict[str, float] = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 2)
        return time.perf_counter()

    key = pipe._batch_key(batch_id)
    t0 = time.perf_counter()
    batch = batch.dropDuplicates(["doc_id"])
    embedded = (
        batch
        .withColumn("content_sha256", F.sha2("text", 256))
        .dropDuplicates(["content_sha256"])
        .withColumn("embedding",
                    route_embedding(F.col("text"), F.col("modality")))
        .filter(F.col("embedding").isNotNull())
        .select("doc_id", "content_sha256", "modality", "embedding")
    )
    prev = pipe._read_state_excluding(pipe.corpus_dir, CORPUS_SCHEMA, key)
    fresh = embedded.join(
        prev.select("content_sha256"), "content_sha256", "left_anti")
    fresh = fresh.localCheckpoint(eager=True)
    n_fresh = fresh.count()
    t0 = mark("fresh_build", t0)
    if n_fresh == 0:
        return t
    fresh.write.mode("overwrite").parquet(pipe._bdir(pipe.corpus_dir, key))
    t0 = mark("corpus_write", t0)
    neighbors = pipe.knn_against_corpus(
        fresh, n_queries=n_fresh).localCheckpoint(eager=True)
    t0 = mark("knn", t0)
    edges = pipe.build_edges(neighbors)
    edges.write.mode("overwrite").parquet(pipe._bdir(pipe.edges_dir, key))
    t0 = mark("edges_write", t0)
    if pipe.maintain_ivf:
        pipe._update_index(fresh, key)
        t0 = mark("index_upkeep", t0)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("--maintain", action="store_true")
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from multi_model_vectorsearch_spark.sources.registry import load_tables
    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    docs = load_tables(spark, args.src)["documents"].select(
        "doc_id", "text",
        F.element_at(F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
    ).localCheckpoint(eager=True)
    print(f"# docs={docs.count()} maintain={args.maintain}", flush=True)
    state = tempfile.mkdtemp(prefix="ivf_profile_")
    try:
        pipe = IngestPipeline(spark, state, maintain_ivf=args.maintain)
        total0 = time.perf_counter()
        for b in range(args.batches):
            t = timed_process_batch(
                pipe, docs.filter(F.col("doc_id") % args.batches == b), b)
            print(f"batch {b}: {t} total={sum(t.values()):.1f}", flush=True)
        per = (time.perf_counter() - total0) / args.batches
        print(f"# mean {per:.1f} s/batch", flush=True)
    finally:
        shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    main()
