#!/usr/bin/env python3
"""Serving QPS past the ~9/driver plateau via micro-batched queries
(r13 verdict item 7).

r10 measured warm serving plateauing around ~9 QPS/driver regardless of
concurrency: the ceiling is Spark job-LAUNCH overhead (driver-side plan
+ scheduling round-trips), not plan cost. ``search_many`` amortizes one
launch over M queries; this probe demonstrates the operational
composition — a coalescing facade in front of ``serve_search_many`` —
under the 8-client closed-loop ladder, A/B against per-query serving on
the same warmed pipeline:

- **A (per-query)**: 8 client threads, each looping
  ``serve_search(route="ivf")`` — the r10 serving shape, full /search
  semantics (balanced selection + expansion), like-for-like with B.
- **B (batched)**: the same 8 clients submit to a queue; a dispatcher
  drains up to ``--max-batch`` waiting queries (waiting at most
  ``--window-ms`` for stragglers) into ONE ``serve_search_many`` job
  and fans results back out. Client-observed latency INCLUDES queueing.

Gate (the verdict's Done): B's QPS >= 2x A's at p50 <= 2x A's, and
every B answer equals the per-query answer for its text (the
linearizability spot-check rides along).

Usage:
    python3 scripts/probe_qps_batching.py --docs 30000
"""
from __future__ import annotations

import argparse
import json
import os
import queue
import shutil
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CoalescingFacade:
    """Queue + dispatcher composing ``serve_search_many`` into a
    concurrent serving front: requests arriving while a batch job runs
    coalesce into the next batch, so the job-launch cost amortizes over
    exactly the concurrency actually offered."""

    def __init__(self, pipe, k: int, max_batch: int, window_ms: float):
        self.pipe, self.k = pipe, k
        self.max_batch, self.window_s = max_batch, window_ms / 1000.0
        self.q: queue.Queue = queue.Queue()
        self.stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def submit(self, text: str):
        ev = threading.Event()
        box: dict = {}
        self.q.put((text, ev, box))
        return ev, box

    def _run(self) -> None:
        while not self.stop:
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            texts = [b[0] for b in batch]
            try:
                groups = self.pipe.serve_search_many(
                    texts, k=self.k, route="ivf")
            except Exception as exc:  # noqa: BLE001 - fanned out to clients
                groups = [exc] * len(batch)
            for (_, ev, box), rows in zip(batch, groups):
                box["rows"] = rows
                ev.set()

    def close(self) -> None:
        self.stop = True
        self.thread.join(timeout=5)


def ladder(n_clients: int, n_each: int, call) -> dict:
    lat: list[float] = []
    lock = threading.Lock()
    errors: list[str] = []

    def client(cid: int) -> None:
        for i in range(n_each):
            t0 = time.perf_counter()
            try:
                rows = call(cid, i)
                assert rows, "empty answer"
            except Exception as exc:  # noqa: BLE001
                with lock:
                    errors.append(f"{type(exc).__name__}: {exc}"[:120])
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    return {"qps": round(len(lat) / wall, 2),
            "p50_s": round(statistics.median(lat), 3) if lat else None,
            "p90_s": round(lat[int(0.9 * (len(lat) - 1))], 3)
            if lat else None,
            "answered": len(lat), "errors": errors[:3]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--docs", type=int, default=30000)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--queries-per-client", type=int, default=12)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=25.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multi_model_vectorsearch_spark import get_spark, load_tables
    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    spark = get_spark("probe-qps-batching")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, args.sf_dir)["documents"].select(
        "doc_id", "text", F.lit("text").alias("modality")
    ).limit(args.docs)

    state = tempfile.mkdtemp(prefix="probe_qps_batch_")
    try:
        pipe = IngestPipeline(spark, state, k=10, maintain_ivf=True,
                              n_centroids=None, ivf_bootstrap=64)
        pipe.bulk_load(docs)
        pipe.warm()
        qtexts = [r.text for r in docs.limit(256).collect()]
        pipe.serve_search(qtexts[0], k=10, route="ivf")  # compile, untimed

        def text_for(cid: int, i: int) -> str:
            return qtexts[(cid * args.queries_per_client + i)
                          % len(qtexts)]

        a = ladder(args.clients, args.queries_per_client,
                   lambda cid, i: pipe.serve_search(
                       text_for(cid, i), k=10, route="ivf"))

        facade = CoalescingFacade(pipe, k=10, max_batch=args.max_batch,
                                  window_ms=args.window_ms)

        def batched_call(cid: int, i: int):
            ev, box = facade.submit(text_for(cid, i))
            ev.wait(timeout=120)
            rows = box.get("rows")
            if isinstance(rows, Exception):
                raise rows
            return rows

        b = ladder(args.clients, args.queries_per_client, batched_call)
        facade.close()

        # linearizability spot-check: batched answers == per-query
        # answers on a sample of texts, same warmed state
        sample = qtexts[:: max(1, len(qtexts) // 8)][:8]
        many = pipe.serve_search_many(sample, k=10, route="ivf")
        agree = all(
            [(r.id, r.score) for r in grp]
            == [(r.id, r.score) for r in
                pipe.serve_search(t, k=10, route="ivf")]
            for t, grp in zip(sample, many))

        speedup = (b["qps"] / a["qps"]) if a["qps"] else None
        lat_ratio = ((b["p50_s"] / a["p50_s"])
                     if a["p50_s"] and b["p50_s"] else None)
        ok = bool(speedup and speedup >= 2.0
                  and lat_ratio is not None and lat_ratio <= 2.0
                  and agree and not a["errors"] and not b["errors"])
        print(json.dumps({
            "metric": "qps_batching_ab", "docs": args.docs,
            "clients": args.clients, "per_query": a, "batched": b,
            "qps_speedup": round(speedup, 2) if speedup else None,
            "p50_ratio": round(lat_ratio, 2) if lat_ratio else None,
            "answers_agree": agree, "ok": ok}), flush=True)
        return 0 if ok else 1
    finally:
        spark.stop()
        shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
