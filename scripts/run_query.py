#!/usr/bin/env python3
"""Run any declared query by name: show rows, timing, and (optionally) plan.

Usage:
    python3 scripts/run_query.py dq29_knn_topk [--sf /root/testdata/sf0.01]
        [--explain] [--limit 20]
    python3 scripts/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_model_vectorsearch_spark import dq, get_spark  # noqa: E402
from multi_model_vectorsearch_spark.plans.explain import explain_formatted  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="declared query name (dqNN_*)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--list", action="store_true", dest="list_all")
    args = ap.parse_args()

    entries = {e.name: e for e in dq.registry()}
    if args.list_all or not args.name:
        for name, e in entries.items():
            kind = "oracle" if e.oracle else "rows-only"
            print(f"{name:35s} {kind}")
        return
    matches = [n for n in entries if n == args.name or n.startswith(args.name)]
    if len(matches) != 1:
        sys.exit(f"ambiguous or unknown query {args.name!r}: {matches}")
    entry = entries[matches[0]]

    spark = get_spark("run_query")
    from multi_model_vectorsearch_spark import load_tables

    df = entry.builder(load_tables(spark, args.sf))
    if args.explain:
        print(explain_formatted(df))
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    for r in rows[: args.limit]:
        print(tuple(r))
    print(f"-- {len(rows)} rows in {dt:.3f}s at {args.sf}")


if __name__ == "__main__":
    main()
