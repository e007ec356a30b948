#!/usr/bin/env python3
"""Core-scaling spot-bench at the 10x (sf1) fixture (r14 verdict item 9).

The sf0.1 suite is fixed-overhead dominated (8 cores roughly ties 32), so
it cannot demonstrate data-parallel scaling; this probe times the heaviest
chains on the ~10x /tmp/sf1_gate fixture (synthesized by gate_sf1.py) at a
chosen core count, so an 8c vs 32c pair shows where compute actually
parallelizes at a scale where cores matter.

Usage:
    python3 scripts/gate_sf1.py --skip-gate        # ensure fixture exists
    SPARK_GRAFT_CPUS=32 python3 scripts/probe_scale_cores.py
    SPARK_GRAFT_CPUS=8  python3 scripts/probe_scale_cores.py

Prints one JSON line {"cpus": N, "queries": {...}, "total_sec": T}.
Timing methodology matches bench.py (noop sink, per-entry wall, shared
session caches warm in registry order), at the probe fixture instead of
the bench SF.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_model_vectorsearch_spark import dq, get_spark, load_tables  # noqa: E402

# heaviest sf0.1 chains + the r15-touched scale rewrites
DEFAULT_NAMES = [
    "dq42_ngram_jaccard_topk",
    "dq61_dedup_clusters",
    "dq183_prefix_filter_join",
    "dq135_curation_funnel",
    "dq225_mad_outliers",
    "dq247_simhash48_band_pairs",
    "dq248_simhash64_band_pairs",
    "dq178_interpolate",
    "dq168_dup_spans",
    "dq199_weighted_median",
    "dq238_rfm_segments",
    "dq18_ntile",
    "dq236_gini",
    "dq46_cosine_neardup_topk",
    "dq174_tpch_q9",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1_gate")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = sys.argv[1:] or DEFAULT_NAMES
    spark = get_spark("scale-cores-probe")
    tables = load_tables(spark, sf_dir)
    by = {e.name: e for e in dq.registry()}
    # small warmup: JIT + parquet footers (mirrors bench.py)
    for w in ["dq01_scan_project", "dq04_join_broadcast",
              "dq15_topk_per_group", "dq26_tokenize_explode"]:
        if w in by:
            by[w].builder(tables).write.format("noop").mode(
                "overwrite").save()
    timings: dict[str, float] = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"scale-cores:{n}")
        t0 = time.perf_counter()
        by[n].builder(tables).write.format("noop").mode("overwrite").save()
        timings[n] = round(time.perf_counter() - t0, 3)
        print(f"# {n}: {timings[n]} s", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir,
                      "queries": timings,
                      "total_sec": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
