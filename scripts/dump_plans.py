#!/usr/bin/env python3
"""Dump explain("formatted") for named entries to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python3 scripts/dump_plans.py --tag r15 --suffix before dq18 dq236 ...

Names may be short prefixes (dq18) — resolved against the registry. The
plans are built at the bench SF (SPARK_GRAFT_SF_DIR, default sf0.1) so the
committed evidence matches what the bench executes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_model_vectorsearch_spark import dq, get_spark, load_tables  # noqa: E402
from multi_model_vectorsearch_spark.plans.explain import explain_formatted  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("dump_plans")
    tables = load_tables(spark, args.sf)
    entries = {e.name: e for e in dq.registry()}
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(root, exist_ok=True)
    for want in args.names:
        matches = [n for n in entries
                   if n == want or n.startswith(want + "_")]
        if len(matches) != 1:
            print(f"SKIP ambiguous/unknown {want!r}: {matches}")
            continue
        name = matches[0]
        df = entries[name].builder(tables)
        path = os.path.join(root, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
