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

    tables = load_tables(spark, args.sf_dir)
    # the driver's oracle gate checks the first 50 registry entries (the
    # pinned gate order); this subset is its first --entries of them
    sample = dq.registry()[: args.entries]

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
