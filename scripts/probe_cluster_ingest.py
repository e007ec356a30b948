#!/usr/bin/env python3
"""Ingest/serving smoke on a REAL multi-JVM topology (r13 verdict
item 1, second half).

``local[n]`` runs every task — and every Python UDF worker — inside the
driver JVM/process, which masks exactly the seams the round-13 ingest
changes cross: pandas-UDF closure pickling of the package (embed stub),
Arrow batch transport for the KNN kernel, broadcast of centroid blocks,
executor-side parquet reads of freshly-committed state directories, and
the warm() executor-memory pin. This probe drives the full writer-side
surface added/changed in r13 on ``local-cluster[2,8,4096]`` — two
separate executor JVMs with their own Python workers:

  bulk_load → process_batch ×3 → serve_search (exact + warm) →
  serve_search_ivf → compact() → retrain() → refresh_edges() →
  serve after every flip → serve_counters / freshness / governor.

Assertions are the linearizability basics the in-process suite pins:
a self-match query answers 1.0 after every mutation, corpus counts are
exactly-once across replayed batches, the facade never surfaces an
internal race, and serve_counters record zero exhausted queries.

Exit 0 iff every assertion holds on the multi-JVM master.

Usage:
    python3 scripts/probe_cluster_ingest.py
    python3 scripts/probe_cluster_ingest.py --master 'local-cluster[2,8,4096]'
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--master", default="local-cluster[2,8,4096]")
    ap.add_argument("--docs", type=int, default=400)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(args.master)
        .appName("probe-cluster-ingest")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from multi_model_vectorsearch_spark import load_tables
    from multi_model_vectorsearch_spark.session import ship_package
    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    ship_package(spark)  # executor Python workers import the package
    tables = load_tables(spark, args.sf_dir)

    def docs(lo: int, hi: int):
        return tables["documents"].filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).select(
            "doc_id", "text",
            F.element_at(
                F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("modality"))

    n = args.docs
    state = tempfile.mkdtemp(prefix="probe_cluster_ingest_")
    t0 = time.perf_counter()
    checks: dict[str, bool] = {}
    try:
        pipe = IngestPipeline(spark, state, k=5, maintain_ivf=True,
                              n_centroids=None, ivf_bootstrap=32,
                              min_flip_interval_s=0.0)
        # doc_id % 3 == 0 -> text modality (self-match assertions)
        q = docs(0, 1).first().text

        # 1) bulk backfill crosses executor-side embed + IVF bootstrap
        pipe.bulk_load(docs(0, n // 2))
        checks["bulk_corpus_exact"] = pipe.corpus().count() == n // 2
        rows = pipe.serve_search_ivf(q, k=5)
        checks["bulk_serve_ivf_selfmatch"] = bool(rows) and rows[0].s == 1.0

        # 2) incremental batches: embed UDF + KNN kernel + edge writes,
        #    with an exactly-once replay of batch 0 in the middle
        step = n // 8
        pipe.process_batch(docs(n // 2, n // 2 + step), 0)
        pipe.process_batch(docs(n // 2, n // 2 + step), 0)  # replay
        pipe.process_batch(docs(n // 2 + step, n // 2 + 2 * step), 1)
        checks["ingest_exactly_once"] = (
            pipe.corpus().count() == n // 2 + 2 * step)
        rows = pipe.serve_search(q, k=5)
        checks["serve_exact_selfmatch"] = bool(rows) and rows[0].score == 1.0

        # 3) warm serving pins snapshots in EXECUTOR memory on this
        #    topology (local[n] pins them in the driver)
        pipe.warm()
        rows = pipe.serve_search(q, k=5)
        checks["warm_serve_selfmatch"] = bool(rows) and rows[0].score == 1.0

        # 4) writer maintenance: compact -> retrain -> refresh_edges,
        #    serving green after every flip
        pipe.compact()
        rows = pipe.serve_search(q, k=5)
        checks["post_compact_selfmatch"] = bool(rows) and rows[0].score == 1.0
        info = pipe.retrain()
        checks["retrain_full_assign"] = (
            info["assigned"] == n // 2 + 2 * step)
        pipe.refresh_edges()
        rows = pipe.serve_search_ivf(q, k=5)
        checks["post_retrain_serve_ivf"] = bool(rows) and rows[0].s == 1.0

        # 5) observability stayed clean through every mutation
        c = pipe.serve_counters
        checks["no_exhausted_serves"] = c["exhausted"] == 0
        checks["freshness_gauge_ok"] = isinstance(pipe.freshness(), dict)

        execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        out = {"metric": "probe_cluster_ingest", "master": args.master,
               "executors_seen": int(execs), "docs": n,
               "serve_counters": dict(c),
               "wall_sec": round(time.perf_counter() - t0, 1),
               "checks": checks, "green": all(checks.values())}
        print(json.dumps(out), flush=True)
        return 0 if all(checks.values()) else 1
    finally:
        spark.stop()
        shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
