#!/usr/bin/env python3
"""Benchmark harness: runs the declared-query suite and prints ONE JSON line.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).

Each query is materialized through the no-op sink (spark.write.format("noop"))
so timings measure plan execution, not driver-side result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_model_vectorsearch_spark import dq, get_spark, load_tables  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    tables = load_tables(spark, sf_dir)

    registry = dq.registry()
    # warm up JVM + parquet footer caches (not timed)
    materialize(registry[0].builder(tables))

    timings: dict[str, float] = {}
    for entry in registry:
        t0 = time.perf_counter()
        materialize(entry.builder(tables))
        timings[entry.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "dq_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
