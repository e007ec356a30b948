#!/usr/bin/env python3
"""Two-writer fencing probe (r11 verdict item 2) — separate PROCESSES.

The multi-driver deployment (BASELINE.md r11) makes "accidentally start
a second writer on the same state root" an easy operational mistake;
unfenced, it would interleave batch keys, double-flip `_CURRENT`
pointers, and corrupt the generation sweep SILENTLY. This probe runs
the mistake for real and asserts the lease turns it into a loud,
harmless failure:

  - writer A (subprocess): acquires the lease, ingests batches in a
    loop over the shared state root;
  - writer B (subprocess): started mid-run, acquires the SAME root's
    lease (epoch bump — fencing, not locking), ingests its own batches
    to completion;
  - required outcome: A raises WriterFencedError on its next mutation
    and stops; B finishes; the final state is a clean committed prefix
    (no torn keys, corpus == A's committed docs before the fence + all
    of B's, every doc exactly once) and still serves.

Exit 0 iff all of that held; emits one JSON document.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WRITER_SRC = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from multi_model_vectorsearch_spark import get_spark, load_tables
from multi_model_vectorsearch_spark.streaming.ingest import (
    IngestPipeline, WriterFencedError)
from pyspark.sql import functions as F

role, state, sf_dir, lo, hi, step = (
    sys.argv[1], sys.argv[2], sys.argv[3],
    int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6]))
spark = get_spark(f"fence-{{role}}-{{os.getpid()}}", master="local[8]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = load_tables(spark, sf_dir)["documents"].select(
    "doc_id", "text",
    F.element_at(F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
                 (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"))
pipe = IngestPipeline(spark, state, k=4)
epoch = pipe.acquire_writer(owner=role)
committed, fenced = [], None
for i, a in enumerate(range(lo, hi, step)):
    b = docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < a + step))
    key = f"{{role}}{{i}}"
    try:
        pipe.process_batch(b, i, key=key)
        committed.append(key)
    except WriterFencedError as exc:
        fenced = str(exc)[:200]
        break
    if role == "a":
        time.sleep(1.0)  # pace A so B's acquisition lands mid-run
print("RESULT " + json.dumps({{"role": role, "epoch": epoch,
                              "committed": committed,
                              "fenced": fenced}}), flush=True)
spark.stop()
'''


def run_writer(role, state, sf_dir, lo, hi, step, repo):
    src = WRITER_SRC.format(repo=repo)
    return subprocess.Popen(
        [sys.executable, "-c", src, role, state, sf_dir,
         str(lo), str(hi), str(step)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    state = os.path.join(tempfile.mkdtemp(prefix="fence_probe_"), "state")

    a = run_writer("a", state, sf_dir, 0, 200, 20, repo)   # 10 slow batches
    time.sleep(25)  # let A acquire + land a few batches
    b = run_writer("b", state, sf_dir, 200, 300, 50, repo)  # 2 batches
    results = {}
    for proc, role in ((b, "b"), (a, "a")):
        out, _ = proc.communicate(timeout=600)
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results[role] = json.loads(line[len("RESULT "):])
    ra, rb = results.get("a", {}), results.get("b", {})

    # verify the final state from a third process's viewpoint
    from multi_model_vectorsearch_spark import get_spark, load_tables  # noqa: E402
    from multi_model_vectorsearch_spark.streaming.ingest import (  # noqa: E402
        IngestPipeline,
    )

    spark = get_spark("fence-verify", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    pipe = IngestPipeline(spark, state, k=4)
    torn = sorted(pipe.torn_batch_keys())
    corpus = pipe.corpus()
    n = corpus.count()
    n_distinct = corpus.select("doc_id").distinct().count()
    expect = len(ra.get("committed", [])) * 20 \
        + len(rb.get("committed", [])) * 50
    q = load_tables(spark, sf_dir)["documents"].orderBy("doc_id").first()
    serves = bool(pipe.search(q.text, k=4).collect())

    out = {
        "metric": "writer_fence",
        "a_epoch": ra.get("epoch"), "b_epoch": rb.get("epoch"),
        "a_committed": len(ra.get("committed", [])),
        "a_fenced": bool(ra.get("fenced")),
        "a_fence_msg": (ra.get("fenced") or "")[:120],
        "b_committed": len(rb.get("committed", [])),
        "b_fenced": bool(rb.get("fenced")),
        "corpus_rows": n, "expected_rows": expect,
        "distinct_ok": n == n_distinct, "torn": torn, "serves": serves,
    }
    print(json.dumps(out), flush=True)
    ok = (ra.get("fenced") and not rb.get("fenced")
          and rb.get("epoch") == (ra.get("epoch") or 0) + 1
          and ra.get("committed") and len(rb.get("committed", [])) == 2
          and n == expect and n == n_distinct and not torn and serves)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
