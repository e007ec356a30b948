#!/usr/bin/env python3
"""Local-cluster bench subset (r10 verdict item 8).

``local[n]`` runs every task inside the driver JVM, which never crosses
the serialization boundaries a real cluster enforces — Python closure
pickling for Arrow kernels, broadcast transport, shuffle over the block
manager, executor-side parquet reads. Only dq72 (the executor-loss
probe) ever crossed them before this script. Here the flagship bench
subset runs end-to-end on ``local-cluster[2,8,4096]`` — two SEPARATE
executor JVMs — asserting every entry completes and timing the run.

The subset is the driver's correctness-sample query list (the 50
entries CORRECTNESS_r*.json records), truncated to ``--entries``
(default 30, the verdict's ask) in registry order. Numbers are NOT
comparable to bench.py's local[32] totals (2x8 cores, multi-JVM
shuffle); the signal is green-ness plus a same-topology wall time to
track round over round.

Usage:
    python3 scripts/bench_local_cluster.py
    python3 scripts/bench_local_cluster.py --entries 50 --sf-dir /root/testdata/sf0.01
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--entries", type=int, default=30)
    ap.add_argument("--master", default="local-cluster[2,8,4096]")
    ap.add_argument("--extra", default=(
        "dq29_knn_topk,dq30_l2_normalize,dq31_knn_join,"
        "dq32_modality_balanced_topk,dq33_build_edges,dq34_expand,"
        "dq48_embed_stub,dq52_centroid_applyinpandas,"
        "dq40_minhash_signatures,dq41_minhash_lsh_pairs,"
        "dq47_ivf_knn,dq63_bm25_topk,dq64_hybrid_rrf"))
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(args.master)
        .appName("bench-local-cluster")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from multi_model_vectorsearch_spark import dq, load_tables
    from multi_model_vectorsearch_spark.session import ship_package

    # executor Python workers must import the package at UDF
    # deserialization on a multi-JVM master — the probe that caught the
    # gap: dq48's pandas-UDF closure references the package by module
    ship_package(spark)

    tables = load_tables(spark, args.sf_dir)
    # the driver's oracle gate checks the first 50 registry entries (the
    # pinned gate order); this subset is its first --entries of them,
    # plus --extra names — by default the Arrow-kernel entries (pandas
    # UDF embed, applyInPandas centroids/KNN, graph expansion), which are
    # exactly the plans that cross executor-JVM serialization boundaries
    registry = dq.registry()
    sample = registry[: args.entries]
    have = {e.name for e in sample}
    extra = [x for x in args.extra.split(",") if x and x not in have]
    sample += [e for e in registry if e.name in extra]

    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    t_suite = time.perf_counter()
    for e in sample:
        t0 = time.perf_counter()
        try:
            e.builder(tables).write.format("noop").mode("overwrite").save()
            timings[e.name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 - recorded, not raised
            failed[e.name] = f"{type(ex).__name__}: {ex}"[:200]
        print(f"{e.name}: {timings.get(e.name, 'FAIL')}", flush=True)
    total = round(time.perf_counter() - t_suite, 1)

    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    out = {"metric": "bench_local_cluster", "master": args.master,
           "executors_seen": int(execs), "sf_dir": args.sf_dir,
           "entries": len(sample), "green": len(timings),
           "failed": failed, "total_sec": total, "queries": timings}
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
