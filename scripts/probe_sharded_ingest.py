#!/usr/bin/env python3
"""Sharded multi-writer ingest probe (r13 verdict item 6).

The single-writer contract serializes a state root's ingest through one
driver (~32 docs/s in the chaos soak). The sharding contract
(IngestPipeline class docstring) scales that by partitioning the doc
key space into N disjoint shards, each with its own state root, writer
lease, and writer PROCESS. This probe measures and verifies it:

- **Throughput ladder**: ingest the same D docs through N = 1, 2, 4
  shard-writer processes (each a separate Python+JVM, ``local[32/N]``,
  fenced lease on its own root; docs routed ``doc_id % N``). Reports
  docs/s per arm and the scaling ratio vs N=1.
- **Per-shard linearizability**: after the 4-shard arm, one doc per
  shard is queried through that shard's pipeline — self-match pinned
  at 1.0, serve_counters clean.
- **Union view**: :class:`ShardedReadView` over the 4 roots must hold
  exactly-once globally (union corpus count == D, doc_ids distinct),
  answer global queries (per-shard top-k merge), and bound staleness:
  after ONE shard's writer ingests more, the union gauge reports
  exactly that shard behind; ``maybe_rewarm()`` clears it.

Exit 0 iff every check holds AND the 4-shard arm beats single-writer
throughput by >= --min-speedup (default 1.8; the host caps hard
linear scaling — writers share 32 cores and memory bandwidth — while a
real cluster gives each writer its own executors).

Usage:
    python3 scripts/probe_sharded_ingest.py --docs 2400
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def role_writer() -> int:
    """One shard writer: own SparkSession, fenced lease on its own
    root, ingests its shard slice in --batches micro-batches through
    the full submit path (embed -> dedup -> corpus -> KNN -> edges)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--role")
    ap.add_argument("--state", required=True)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--shard", type=int, required=True)
    ap.add_argument("--n-shards", type=int, required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark import get_spark, load_tables
    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    spark = get_spark(f"shard-writer-{args.shard}-{os.getpid()}",
                      master=f"local[{args.cpus}]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, args.sf_dir)["documents"].select(
        "doc_id", "text", F.lit("text").alias("modality")
    ).filter((F.col("doc_id") < args.docs)
             & (F.col("doc_id") % args.n_shards == args.shard))

    pipe = IngestPipeline(spark, args.state, k=6, maintain_ivf=True,
                          n_centroids=None, ivf_bootstrap=16)
    pipe.acquire_writer(owner=f"shard-{args.shard}")
    t0 = time.perf_counter()
    for b in range(args.batches):
        batch = docs.filter(
            F.floor(F.col("doc_id") / args.n_shards)
            % args.batches == b)
        pipe.process_batch(batch, b)
    wall = time.perf_counter() - t0
    n = pipe.corpus().count()
    print("RESULT " + json.dumps(
        {"shard": args.shard, "docs": int(n),
         "wall_sec": round(wall, 1)}), flush=True)
    spark.stop()
    return 0


def run_arm(n_shards: int, docs: int, sf_dir: str, batches: int,
            work: str, total_cpus: int = 32) -> dict:
    roots = [os.path.join(work, f"arm{n_shards}", f"shard-{s}")
             for s in range(n_shards)]
    cpus = max(4, total_cpus // n_shards)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--role", "writer",
         "--state", roots[s], "--sf-dir", sf_dir, "--shard", str(s),
         "--n-shards", str(n_shards), "--docs", str(docs),
         "--batches", str(batches), "--cpus", str(cpus)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        for s in range(n_shards)]
    t0 = time.perf_counter()
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        for line in reversed(out.splitlines()):
            if line.startswith("RESULT "):
                results.append(json.loads(line[7:]))
                break
    wall = time.perf_counter() - t0
    total = sum(r["docs"] for r in results)
    return {"n_shards": n_shards, "roots": roots,
            "ingested": total, "wall_sec": round(wall, 1),
            "docs_per_sec": round(total / wall, 2),
            "writers": results,
            "ok": len(results) == n_shards and total == docs}


def main() -> int:
    if "--role" in sys.argv:
        return role_writer()

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--docs", type=int, default=2400)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--arms", default="1,2,4")
    ap.add_argument("--min-speedup", type=float, default=1.8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark import get_spark, load_tables
    from multi_model_vectorsearch_spark.streaming.ingest import (
        ShardedReadView,
    )

    work = tempfile.mkdtemp(prefix="sharded_ingest_")
    arms = [int(a) for a in args.arms.split(",")]
    out: dict = {"metric": "sharded_ingest", "docs": args.docs,
                 "arms": []}
    checks: dict[str, bool] = {}
    try:
        for n in arms:
            arm = run_arm(n, args.docs, args.sf_dir, args.batches, work)
            out["arms"].append({k: v for k, v in arm.items()
                                if k != "roots"})
            checks[f"arm{n}_exactly_once"] = arm["ok"]
            print(json.dumps(out["arms"][-1]), flush=True)
            if n == max(arms):
                roots = arm["roots"]

        base = next(a for a in out["arms"] if a["n_shards"] == arms[0])
        top = next(a for a in out["arms"] if a["n_shards"] == max(arms))
        speedup = top["docs_per_sec"] / base["docs_per_sec"]
        out["speedup_vs_single"] = round(speedup, 2)
        checks["throughput_scales"] = speedup >= args.min_speedup

        # reader phase on the top arm's roots
        spark = get_spark("sharded-reader")
        spark.sparkContext.setLogLevel("ERROR")
        docs = load_tables(spark, args.sf_dir)["documents"].select(
            "doc_id", "text", F.lit("text").alias("modality")
        ).filter(F.col("doc_id") < args.docs)
        view = ShardedReadView(spark, roots, k=6, maintain_ivf=True,
                               n_centroids=None, ivf_bootstrap=16)

        n_union = view.corpus().count()
        n_distinct = view.corpus().select("doc_id").distinct().count()
        checks["union_exactly_once"] = (
            n_union == args.docs and n_distinct == args.docs)

        # per-shard linearizability: one doc per shard self-matches at
        # 1.0 through ITS shard pipeline, counters clean
        per_shard_ok = []
        for s, pipe in enumerate(view.pipes):
            q = docs.filter(F.col("doc_id") % len(roots) == s).first()
            rows = pipe.serve_search(q.text, k=6)
            per_shard_ok.append(
                bool(rows) and rows[0].score == 1.0
                and pipe.serve_counters["exhausted"] == 0)
        checks["per_shard_selfmatch"] = all(per_shard_ok)

        # union answers are the merged per-shard top-k and contain the
        # global self-match
        q = docs.first()
        rows = view.serve_search(q.text, k=6)
        checks["union_selfmatch"] = bool(rows) and rows[0].score == 1.0

        # staleness bound: warm the view, move ONE shard's writer,
        # the union gauge blames exactly that shard, rewarm clears
        view.warm()
        from multi_model_vectorsearch_spark.streaming.ingest import (
            IngestPipeline,
        )

        movers = load_tables(spark, args.sf_dir)["documents"].select(
            "doc_id", "text", F.lit("text").alias("modality")
        ).filter((F.col("doc_id") >= args.docs)
                 & (F.col("doc_id") < args.docs + 40)
                 & (F.col("doc_id") % len(roots) == 0))
        w0 = IngestPipeline(spark, roots[0], k=6, maintain_ivf=True,
                            n_centroids=None, ivf_bootstrap=16)
        w0.acquire_writer(owner="mover")
        w0.process_batch(movers, 99)
        g = view.freshness()
        behind = [not s["fresh"] for s in g["shards"]]
        checks["staleness_blames_one_shard"] = (
            behind[0] is True and not any(behind[1:])
            and g["behind_units_max"] >= 1)
        view.maybe_rewarm()
        checks["rewarm_clears"] = view.freshness()["fresh"]

        out["checks"] = checks
        out["ok"] = all(checks.values())
        print(json.dumps(out), flush=True)
        spark.stop()
        return 0 if out["ok"] else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
