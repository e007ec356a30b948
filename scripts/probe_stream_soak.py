#!/usr/bin/env python3
"""Sustained-stream soak probe (r9 verdict item 5).

``run_stream`` + ``compact()`` are functionally tested; this measures
what hundreds of micro-batches do to the state layout — the small-files
problem the per-batch-subdirectory design deliberately trades into — and
what compaction cadence buys back. Two arms, same 200-batch workload
(RocksDB state-store provider set, per the serving deployment default):

  - never-compact: per-batch subdirs accumulate for the whole soak.
  - compact every ``--cadence`` chunks: between stream runs (compaction
    is an ops operation on a quiesced writer), fold committed batches.

Recorded per batch: foreachBatch wall time; per chunk: state-dir file
count and a cold corpus().count() read time (the listing cost readers
actually pay). Emits one JSON document; the recommended cadence lands in
the IngestPipeline docstring and BASELINE.md.

Usage:
    python3 scripts/probe_stream_soak.py --batches 200 --chunk 10 --cadence 5
    (cadence is in CHUNKS: compact after every 5th chunk = every 50 batches)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from multi_model_vectorsearch_spark import get_spark, load_tables  # noqa: E402
from multi_model_vectorsearch_spark.streaming.ingest import (  # noqa: E402
    IngestPipeline,
)
from multi_model_vectorsearch_spark.streaming.windows import (  # noqa: E402
    ROCKSDB_PROVIDER,
    state_store_provider,
)


def count_files(root: str) -> int:
    n = 0
    for _r, _d, files in os.walk(root):
        n += len(files)
    return n


def make_source_batches(spark, sf_dir: str, out: str, batches: int,
                        docs_per_batch: int) -> list[str]:
    """One parquet file per micro-batch, unique doc_ids/texts throughout
    the soak (re-ingesting identical docs would dedup to empty batches
    and measure nothing)."""
    base = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text").orderBy("doc_id").limit(docs_per_batch).collect()
    files = []
    for b in range(batches):
        rows = [(int(r.doc_id + 100_000 * b),
                 f"{r.text} soak-{b}",
                 ("text", "image", "audio")[(r.doc_id + b) % 3])
                for r in base]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                         "modality string")
        tmp = os.path.join(out, f"_stage_{b:04d}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        # the file-stream source ingests FILES dropped into its dir, not
        # directories — ship the bare part file as the micro-batch unit
        path = os.path.join(out, f"batch_{b:04d}.parquet")
        os.rename(os.path.join(tmp, part), path)
        shutil.rmtree(tmp)
        files.append(path)
    return files


def run_arm(spark, files: list[str], chunk: int, cadence: int | None,
            workdir: str) -> dict:
    state = os.path.join(workdir, "state")
    ckpt = os.path.join(workdir, "ckpt")
    srcdir = os.path.join(workdir, "src")
    os.makedirs(srcdir)
    pipe = IngestPipeline(spark, state, k=10)
    batch_walls: list[float] = []
    orig_pb = pipe.process_batch

    def timed_pb(batch, batch_id):
        t0 = time.perf_counter()
        orig_pb(batch, batch_id)
        batch_walls.append(time.perf_counter() - t0)

    pipe.process_batch = timed_pb
    schema = "doc_id bigint, text string, modality string"
    chunks = []
    compact_total = 0.0
    for c0 in range(0, len(files), chunk):
        for f in files[c0:c0 + chunk]:
            # feeding the source dir incrementally: each file is one
            # micro-batch under maxFilesPerTrigger=1 + availableNow
            shutil.copy(f, os.path.join(srcdir, os.path.basename(f)))
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(srcdir))
        pipe.run_stream(stream, ckpt)
        did_compact = cadence and ((c0 // chunk) + 1) % cadence == 0
        if did_compact:
            t0 = time.perf_counter()
            pipe.compact()
            compact_total += time.perf_counter() - t0
        t0 = time.perf_counter()
        n_docs = pipe.corpus().count()
        read_s = time.perf_counter() - t0
        chunks.append({
            "batches_done": len(batch_walls),
            "state_files": count_files(state),
            "corpus_read_s": round(read_s, 2),
            "last_chunk_batch_s": round(
                sum(batch_walls[-chunk:]) / max(1, len(batch_walls[-chunk:])),
                3),
            "compacted": bool(did_compact),
        })
        print(f"## {json.dumps(chunks[-1])}", flush=True)
    return {
        "cadence_chunks": cadence, "n_batches": len(batch_walls),
        "n_docs": n_docs,
        "compact_total_s": round(compact_total, 1),
        "batch_s_first50": round(sum(batch_walls[:50]) / 50, 3),
        "batch_s_last50": round(sum(batch_walls[-50:]) / 50, 3),
        "final_state_files": chunks[-1]["state_files"],
        "final_corpus_read_s": chunks[-1]["corpus_read_s"],
        "chunks": chunks,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--batches", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--cadence", type=int, default=5,
                    help="compact every Nth chunk in the compacting arm")
    ap.add_argument("--docs-per-batch", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark("stream-soak-probe", shuffle_partitions=8)
    src = tempfile.mkdtemp(prefix="soak_src_")
    out = {"mode": "soak", "batches": args.batches, "chunk": args.chunk,
           "provider": "rocksdb", "arms": {}}
    try:
        files = make_source_batches(spark, args.sf, src, args.batches,
                                    args.docs_per_batch)
        with state_store_provider(spark, ROCKSDB_PROVIDER):
            for name, cadence in (("never_compact", None),
                                  ("compact_cadence", args.cadence)):
                workdir = tempfile.mkdtemp(prefix=f"soak_{name}_")
                try:
                    print(f"# arm {name}", flush=True)
                    out["arms"][name] = run_arm(
                        spark, files, args.chunk, cadence, workdir)
                finally:
                    shutil.rmtree(workdir, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    for arm in out["arms"].values():
        arm.pop("chunks", None)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
