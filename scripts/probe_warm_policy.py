#!/usr/bin/env python3
"""Cold vs partial-pin vs full-pin serving A/B (r13 verdict item 8).

``warm()`` pins the serving state in executor memory; at 100 TB the
corpus cannot pin, so ``warm(policy="index")`` pins only the
navigational state (centroids + IVF assignment + edges) and streams the
corpus scan per query. This probe quantifies the trade on a real corpus:

- per-query latency (p50/p90 over --queries probed searches) under
  three modes: cold (no warm), partial (policy="index"), full;
- measured pinned bytes per store (the ``pinned_bytes_*`` gauges warm()
  now reports), and the corpus's share of the full-policy footprint —
  the fraction that does NOT scale.

Expected shape (committed in BASELINE.md): full < partial < cold on
latency; partial's pinned bytes a few percent of full's. The knob's
100 TB story: the partial/full latency gap is one streamed corpus scan
bounded by probed-cell selectivity, while the memory gap grows with the
corpus — at some corpus size full stops being an option and partial IS
the warm path.

Usage:
    python3 scripts/probe_warm_policy.py --sf-dir /root/testdata/sf0.1
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--docs", type=int, default=0,
                    help="limit corpus (0 = the table's full doc count)")
    ap.add_argument("--queries", type=int, default=12)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark import get_spark, load_tables
    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    spark = get_spark("probe-warm-policy")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, args.sf_dir)["documents"].select(
        "doc_id", "text", F.lit("text").alias("modality"))
    if args.docs:
        docs = docs.limit(args.docs)

    state = tempfile.mkdtemp(prefix="probe_warm_policy_")
    try:
        pipe = IngestPipeline(spark, state, k=10, maintain_ivf=True,
                              n_centroids=None, ivf_bootstrap=64)
        pipe.bulk_load(docs)
        n = pipe.corpus().count()
        qtexts = [r.text for r in docs.filter(
            F.col("doc_id") % max(1, n // args.queries) == 0)
            .limit(args.queries).collect()]

        def measure(tag: str) -> dict:
            walls = []
            for qt in qtexts:
                t0 = time.perf_counter()
                rows = pipe.serve_search_ivf(qt, k=10)
                walls.append(time.perf_counter() - t0)
                assert rows, f"{tag}: empty answer"
            walls.sort()
            return {"p50_s": round(statistics.median(walls), 3),
                    "p90_s": round(walls[int(0.9 * (len(walls) - 1))], 3)}

        # one untimed query compiles the serving plans so every mode
        # measures steady state, not whole-stage-codegen compilation
        pipe.serve_search_ivf(qtexts[0], k=10)

        out: dict = {"metric": "warm_policy_ab", "docs": int(n),
                     "queries": len(qtexts)}
        out["cold"] = measure("cold")

        sizes = pipe.warm(policy="index")
        partial_bytes = {k: v for k, v in sizes.items()
                         if k.startswith("pinned_bytes_")}
        out["partial"] = {**measure("partial"),
                          "pinned_bytes": sum(partial_bytes.values()),
                          "per_store": partial_bytes}

        pipe.unwarm()
        sizes = pipe.warm(policy="full")
        full_bytes = {k: v for k, v in sizes.items()
                      if k.startswith("pinned_bytes_")}
        tot = sum(full_bytes.values())
        out["full"] = {**measure("full"), "pinned_bytes": tot,
                       "per_store": full_bytes,
                       "corpus_fraction": round(
                           full_bytes.get("pinned_bytes_corpus", 0)
                           / tot, 4) if tot else None}
        out["partial_vs_full_bytes"] = (
            round(out["partial"]["pinned_bytes"]
                  / out["full"]["pinned_bytes"], 4)
            if out["full"]["pinned_bytes"] else None)
        ok = (out["full"]["p50_s"] <= out["cold"]["p50_s"]
              and out["partial"]["pinned_bytes"]
              < out["full"]["pinned_bytes"])
        out["ok"] = bool(ok)
        print(json.dumps(out), flush=True)
        return 0 if ok else 1
    finally:
        spark.stop()
        shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
