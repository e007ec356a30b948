"""Serving-latency A/B at the 10x corpus (round-8 verdict item 3).

Ingests the 50k-doc synthesized corpus once (maintain_ivf on), then
measures per-query wall time for exact `/search` and probed `search_ivf`,
cold (per-query parquet state reads + full plan setup) vs warm
(``pipe.warm()`` cached state + driver-side query embed).

Usage:
    python scripts/scale_probe.py --factor 10 --keep   # once, builds /tmp/sf_scaled
    python scripts/bench_serving.py /tmp/sf_scaled
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timeit(fn, n=5):
    fn()  # untimed warm-up call (JIT, broadcast build)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return round((time.perf_counter() - t0) / n, 3)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from multi_model_vectorsearch_spark.sources.registry import load_tables
    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    docs = load_tables(spark, src)["documents"].select(
        "doc_id", "text",
        F.element_at(F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
    ).localCheckpoint(eager=True)
    n = docs.count()
    queries = [r.text for r in docs.orderBy("doc_id").limit(5).collect()]
    state = tempfile.mkdtemp(prefix="serving_bench_")
    try:
        pipe = IngestPipeline(spark, state, maintain_ivf=True)
        t0 = time.perf_counter()
        for b in range(4):
            pipe.process_batch(docs.filter(F.col("doc_id") % 4 == b), b)
        print(f"# ingest {n} docs: {time.perf_counter() - t0:.1f} s",
              flush=True)

        def run(tag, fn):
            per = timeit(lambda: [fn(q).collect() for q in queries]) / len(
                queries)
            print(f"{tag}: {per:.3f} s/q", flush=True)

        run("cold exact /search",
            lambda q: pipe.search(q, k=10))
        run("cold probed search_ivf",
            lambda q: pipe.search_ivf(q, k=10, probes=2))
        t0 = time.perf_counter()
        sizes = pipe.warm()
        print(f"# warm() {sizes} in {time.perf_counter() - t0:.1f} s",
              flush=True)
        run("warm exact /search",
            lambda q: pipe.search(q, k=10))
        run("warm probed search_ivf",
            lambda q: pipe.search_ivf(q, k=10, probes=2))
    finally:
        shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    main()
