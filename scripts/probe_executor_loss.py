#!/usr/bin/env python3
"""Executor-loss divergence probe (r9 verdict item 3).

The reliable-checkpoint switch (checkpointing.pin, mode=reliable) exists
for exactly one property: an iterative chain whose lineage was cut must
survive losing the executors that held the cut's blocks. Until now that
was output-equivalence-tested only; this probe demonstrates the divergent
OUTCOMES on real multi-process cluster semantics:

  - master local-cluster[2,2,1536] — two separate executor JVMs, so
    killing one actually destroys its block manager (local[32] cannot
    show this; the one JVM is the driver).
  - build a flagship iterative entry (dq72 PageRank by default — its
    per-iteration pins are the lineage cuts), then kill -9 every
    CoarseGrainedExecutorBackend of this app mid-plan, then collect.
  - localCheckpoint mode: the standalone master replaces the executors,
    but the pinned blocks lived in the dead JVMs and the truncated
    lineage cannot recompute them -> the job FAILS (checkpoint block
    not found / FetchFailed).
  - reliable mode: blocks were written to the shared checkpoint store
    (sc.setCheckpointDir; HDFS/S3 on a real cluster, a local dir here),
    replacement executors re-read them -> the job COMPLETES with the
    same rows local[32] produces.

Usage: python3 scripts/probe_executor_loss.py [--sf /root/testdata/sf0.001]
Prints one JSON line per mode and a final verdict line; exits 0 iff the
divergence is exactly (local fails, reliable succeeds + rows match the
undisturbed run).
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _executor_pids(app_id: str) -> list[int]:
    out = subprocess.run(["pgrep", "-af", "CoarseGrainedExecutorBackend"],
                         capture_output=True, text=True).stdout
    pids = []
    for line in out.strip().splitlines():
        pid, _, cmd = line.partition(" ")
        if app_id in cmd:
            pids.append(int(pid))
    return pids


def run_mode(mode: str, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    from multi_model_vectorsearch_spark.checkpointing import (
        enable_reliable_checkpoints,
    )
    from multi_model_vectorsearch_spark.operators.graph import dq72_pagerank
    from multi_model_vectorsearch_spark.sources.registry import load_tables

    spark = (
        SparkSession.builder.master("local-cluster[2,2,1536]")
        .appName(f"exec-loss-{mode}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        # no automatic task/stage retry noise: we want the block loss
        # itself to decide the outcome, not 4 recompute attempts that
        # must all fail anyway (lineage is truncated)
        .getOrCreate()
    )
    ckdir = tempfile.mkdtemp(prefix=f"exec_loss_ck_{mode}_")
    if mode == "reliable":
        enable_reliable_checkpoints(spark, ckdir)
    try:
        tables = load_tables(spark, sf_dir)
        t0 = time.time()
        # building the frame materializes the eager per-iteration pins
        df = dq72_pagerank(tables)
        build_s = time.time() - t0

        app_id = spark.sparkContext.applicationId
        pids = _executor_pids(app_id)
        for pid in pids:
            os.kill(pid, signal.SIGKILL)
        time.sleep(5)  # let the master notice and replace them

        t0 = time.time()
        try:
            rows = sorted(map(tuple, df.collect()))
            return {"mode": mode, "killed": len(pids),
                    "build_s": round(build_s, 1),
                    "collect_s": round(time.time() - t0, 1),
                    "outcome": "completed", "n_rows": len(rows),
                    "rows": rows[:5]}
        except Exception as e:  # the divergence we are probing for
            return {"mode": mode, "killed": len(pids),
                    "build_s": round(build_s, 1),
                    "collect_s": round(time.time() - t0, 1),
                    "outcome": "failed",
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
    finally:
        spark.stop()
        time.sleep(3)


def reference_rows(sf_dir: str) -> list:
    from pyspark.sql import SparkSession

    from multi_model_vectorsearch_spark.operators.graph import dq72_pagerank
    from multi_model_vectorsearch_spark.sources.registry import load_tables

    spark = (SparkSession.builder.master("local[4]")
             .appName("exec-loss-ref")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    try:
        rows = sorted(map(tuple,
                          dq72_pagerank(load_tables(spark, sf_dir))
                          .collect()))
        return rows
    finally:
        spark.stop()
        time.sleep(3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    ref = reference_rows(args.sf)
    print(json.dumps({"mode": "reference(local[4])", "n_rows": len(ref)}),
          flush=True)
    local = run_mode("local", args.sf)
    print(json.dumps(local), flush=True)
    reliable = run_mode("reliable", args.sf)
    print(json.dumps(reliable), flush=True)

    ok = (local["outcome"] == "failed"
          and local["killed"] > 0
          and reliable["outcome"] == "completed"
          and reliable["n_rows"] == len(ref))
    print(json.dumps({"divergence_proven": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
