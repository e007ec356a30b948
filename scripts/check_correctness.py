#!/usr/bin/env python3
"""Run every declared query against the DuckDB oracle (driver-gate replica).

Usage: python scripts/check_correctness.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from multi_model_vectorsearch_spark import dq, get_spark, load_tables  # noqa: E402
from multi_model_vectorsearch_spark.testing import compare, duckdb_connect  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark("correctness-check")
    tables = load_tables(spark, sf_dir)
    con = duckdb_connect(sf_dir)
    failures = 0
    for entry in dq.registry():
        if filters and not any(f in entry.name for f in filters):
            continue
        t0 = time.time()
        try:
            res = compare(entry.name, entry.builder(tables), entry.oracle, sf_dir, con)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {entry.name}: EXCEPTION {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        print(f"{status} {entry.name:32s} rows={res.spark_rows:<8d} {dt:5.1f}s {res.detail}")
        if not res.ok:
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
