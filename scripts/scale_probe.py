#!/usr/bin/env python3
"""Scale-proof probe: synthesize a 10× (sf1-equivalent) documents+embeddings
dataset from sf0.1 and time the flagship 100 TB-design chains on it.

Usage: python scripts/scale_probe.py [--factor 10] [--src /root/testdata/sf0.1]
                                     [--out /tmp/sf_scaled] [--keep]

Rationale (round-4 verdict, next-steps №6): the dedup funnel, PPJoin,
IVF-PQ, and e2e ingest all claim sub-quadratic scale behavior; this probe
verifies the claims hold one more order of magnitude beyond the driver's
sf0.1 bench before anyone trusts them at 1000×.

Synthesis preserves the workload's structure instead of just repeating rows:

- ``documents``: each replica re-keys doc_id into a disjoint band and
  salts every 4th word with a replica token, so replicas do NOT collide
  with the originals in shingle space — corpus size grows 10× while the
  per-doc duplicate rate stays roughly constant, which is the realistic
  growth regime (a first draft that only suffixed one trailing token made
  every doc a member of a 10-way near-dup clique — a quadratic worst case
  that measures clique explosion, not scaling). Replica 0 is the
  original corpus, so the in-corpus dup structure itself is preserved.
- ``embeddings``: each replica re-keys vec_id and adds a tiny deterministic
  per-replica rotation-free perturbation (±0.01·((vec_id·d) mod 7 − 3) per
  lane), growing every IVF cell ~linearly — the regime the coarse-probe +
  broadcast-ADC design must survive.

Output parquet is written with 32 files per table (repartition(32)) so the
scan stage actually splits — the single-file single-row-group testdata
fixtures serialize every scan's pre-shuffle work on one core and would
understate scan parallelism at exactly the scale this probe exists to test.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from multi_model_vectorsearch_spark import dq, get_spark, load_tables  # noqa: E402

FLAGSHIPS = [
    "dq135_curation_funnel",
    "dq183_prefix_filter_join",
    "dq228_ivfpq_search",
    "dq229_ivfpq_recall",
    "dq46_cosine_neardup_topk",
    "dq29_knn_topk",
]


def synthesize(spark, src: str, out: str, factor: int,
               pair_density: str = "growing") -> None:
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vecs = embs.agg(F.max("vec_id")).first()[0] + 1
    reps = spark.range(factor).withColumnRenamed("id", "rep")

    if pair_density == "growing":
        # every-4th-word replica salt: replicas of the SAME base share 1/4
        # of their 3-gram shingles (Jaccard ≈ 0.14) — so same-base pairs
        # are genuine moderate near-dups and their count grows ~n²/base.
        # Past ~100× this regime is degenerate (1000 replicas/base = a
        # 1000-clique per base text: the r8 probe measured e = 2.0 on the
        # candidate count and 1e9 real pairs at 1000×) — it measures
        # clique explosion, not engine scaling.
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    i % 4 == 0,
                    F.concat(w, F.lit("r"), F.col("rep").cast("string")),
                ).otherwise(w),
            ),
            " ",
        )
    else:
        # constant pair density (the production regime: per-doc duplicate
        # rate independent of corpus size). Replicas pair into groups of
        # two: a GROUP token on every 2nd word means no 3-gram survives
        # across groups (every 3-word window hits an even position), and
        # a REP token on i % 8 == 1 positions leaves group-mates sharing
        # 5/8 of their shingles (Jaccard ≈ 5/11 ≈ 0.45 — solid near-dups
        # above production thresholds). True near-dup pairs ∝ n/2:
        # LINEAR, so chain counts/wall past 100× measure the engine.
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    i % 2 == 0,
                    F.concat(w, F.lit("g"),
                             (F.col("rep") / 2).cast("int").cast("string")),
                ).when(
                    i % 8 == 1,
                    F.concat(w, F.lit("r"), F.col("rep").cast("string")),
                ).otherwise(w),
            ),
            " ",
        )
    # same single-task-fusion hazard as big_embs below: exchange first,
    # then the interpreted per-word salting transform runs 32-wide
    big_docs = (
        docs.crossJoin(reps)
        .repartition(32)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(salted).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    # the re-keyed id is computed in its OWN projection before the
    # perturbation references it: referencing F.col("vec_id") in a select
    # that also aliases vec_id resolves through lateral-column-alias
    # implicit resolution — correct under the default config, but with
    # spark.sql.lateralColumnAlias.enableImplicitResolution=false the
    # same code silently reads the INPUT vec_id and every replica gets
    # an identical perturbation (exact-duplicate cliques — the exact
    # degenerate regime this synthesis exists to avoid)
    perturbed = F.transform(
        "embedding",
        lambda x, i: x + 0.01 * (
            (F.col("new_vec_id") * (i + 1)) % 7 - 3).cast("double"),
    )
    # re-normalize after the perturbation: the engine convention is that
    # stored vectors are unit-norm (cosine == dot); an additive nudge
    # alone would leave replicas on a different score scale than the
    # originals for any prenormalized-dot consumer run over probe data
    # repartition BEFORE the heavy projection: the perturb+renormalize
    # chain is higher-order-function expressions (interpreted, no
    # codegen) and the source is a one-row-group file — without the
    # exchange the whole n_vecs×factor transform fuses onto the single
    # read task (measured: 13+ min on one core at factor 1000 while 31
    # cores idled; the exchange moves only the cheap pre-projection rows)
    # ... and each interpreted expression is evaluated ONCE per row: the
    # perturbed array and its norm are materialized as their own columns
    # before the per-lane division, because inlining l2_normalize(perturbed)
    # re-evaluates the norm aggregate (and inside it the whole perturb
    # transform) for every output lane — measured ~20 min for the 2M-row
    # factor-1000 leg vs seconds hoisted; values are bit-identical (the
    # norm recomputation yields the same float64 every time).
    from multi_model_vectorsearch_spark.functions.vector import l2_norm

    big_embs = (
        embs.crossJoin(reps)
        .withColumn("new_vec_id", F.col("vec_id") + F.col("rep") * n_vecs)
        .repartition(32)
        .withColumn("_p", perturbed)
        .withColumn("_nrm", F.greatest(l2_norm(F.col("_p")), F.lit(1e-12)))
        .select(
            F.col("new_vec_id").alias("vec_id"),
            F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
                F.transform(
                    F.col("_p"),
                    lambda x: (x.cast("double") / F.col("_nrm"))
                    .cast("float"),
                )
            ).alias("embedding"),
            *[c for c in embs.columns if c not in ("vec_id", "embedding")],
        )
    )
    big_docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))
    big_embs.write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))


def bench_flagships(spark, out_dir: str) -> dict[str, float]:
    tables = load_tables(spark, out_dir)
    by_name = {e.name: e for e in dq.registry()}
    timings: dict[str, float] = {}
    for name in FLAGSHIPS:
        entry = by_name.get(name)
        if entry is None:
            raise KeyError(f"unknown flagship {name!r} — fix FLAGSHIPS")
        t0 = time.perf_counter()
        entry.builder(tables).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]} s", flush=True)
    return timings


def bench_ingest(spark, out_dir: str, n_batches: int = 4) -> float:
    import tempfile

    from multi_model_vectorsearch_spark.streaming.ingest import IngestPipeline

    docs = load_tables(spark, out_dir)["documents"].select(
        "doc_id", "text",
        F.element_at(F.array(F.lit("text"), F.lit("image"), F.lit("audio")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
    ).localCheckpoint(eager=True)
    state = tempfile.mkdtemp(prefix="scale_probe_ingest_")
    try:
        pipe = IngestPipeline(spark, state)
        t0 = time.perf_counter()
        for b in range(n_batches):
            pipe.process_batch(docs.filter(F.col("doc_id") % n_batches == b), b)
        return round((time.perf_counter() - t0) / n_batches, 3)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def bench_dedup_chain(spark, out_dir: str,
                      n_centroids: int = 8) -> dict[str, float]:
    """Round-6 verdict item 6: measure the dedup funnel's CANDIDATE growth
    (not just wall time) so the sublinear claims carry measured exponents
    past where banded-LSH collision tails bite. Counts are the honest
    scale signal — wall time on a shared host is noisy, candidate
    cardinality is exact.
    """
    from multi_model_vectorsearch_spark.operators.ann import dq148_semdedup
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq61_dedup_clusters,
        dq183_prefix_filter_join,
        minhash_lsh_pairs_shared,
        prefix_filter_candidates,
    )

    tables = load_tables(spark, out_dir)
    out: dict[str, float] = {
        "n_docs": float(tables["documents"].count()),
        "n_vecs": float(tables["embeddings"].count()),
    }

    def timed(key, fn):
        t0 = time.perf_counter()
        v = fn()
        out[key + "_sec"] = round(time.perf_counter() - t0, 3)
        out[key] = float(v)
        print(f"# {key}: {v} ({out[key + '_sec']} s)", flush=True)

    timed("lsh_candidates", lambda: minhash_lsh_pairs_shared(tables).count())
    # the documented mitigation for the >=2-of-8 candidate growth: the
    # strict threshold (dq245, min_matches=3) over the SAME cached
    # signatures — its count growth is the evidence the mitigation works
    from multi_model_vectorsearch_spark.operators.textpipe import (
        dq245_lsh_pairs_strict,
    )

    timed("lsh_strict_candidates",
          lambda: dq245_lsh_pairs_strict(tables).count())
    timed("dq61_clusters", lambda: dq61_dedup_clusters(tables).count())
    timed("ppjoin_candidates",
          lambda: prefix_filter_candidates(tables, 0.6).count())
    timed("dq183_pairs", lambda: dq183_prefix_filter_join(tables).count())
    # SemDeDup clusters scale k ∝ corpus so cluster SIZE stays constant —
    # the standard IVF sizing story; at a fixed k=8 the per-cluster n²
    # kernel is quadratic in corpus size by construction (measured: fine
    # to 100×, hours at 1000×). ≤100× keeps k=8, identical to prior runs.
    timed("dq148_drops",
          lambda: dq148_semdedup(tables, n_centroids=n_centroids).count())
    out["dq148_n_centroids"] = float(n_centroids)
    return out


def bench_graph_chains(spark, out_dir: str, factor: int,
                       regimes: tuple = ("fixed", "scaled")) -> dict[str, float]:
    """Round-9 verdict item 4: measured exponents for the graph chains.

    Two regimes per factor:
    - ``*_fixed``: the registry semantics (n_queries=20 edge graph) — the
      graph is constant-size, so the expected exponent is ~1 from the
      similarity_scan edge build and ~0 for everything riding it;
    - ``*_scaled``: n_queries = 20·factor, so the edge graph grows with
      the corpus — this measures the graph ALGORITHMS (pagerank, BFS,
      expansion, beam search) on a growing graph, the regime that matters
      at 100 TB.
    The shared edge build is timed separately (``edges_*_sec``) and each
    chain is timed riding the session-cached edges, so chain exponents
    measure the algorithm, not a re-run of the scan.
    """
    from multi_model_vectorsearch_spark.operators.graph import (
        dq33_build_edges,
        dq34_expand,
        dq72_pagerank,
        dq121_bfs_layers,
        dq165_graph_ann,
    )

    tables = load_tables(spark, out_dir)
    out: dict[str, float] = {
        "n_docs": float(tables["documents"].count()),
        "n_vecs": float(tables["embeddings"].count()),
    }

    def timed(key, fn):
        t0 = time.perf_counter()
        v = fn()
        out[key + "_sec"] = round(time.perf_counter() - t0, 3)
        out[key] = float(v)
        print(f"# {key}: {v} ({out[key + '_sec']} s)", flush=True)

    for tag, nq in (("fixed", 20), ("scaled", 20 * factor)):
        if tag not in regimes:
            # past ~100x the scaled regime's exact edge build is n_q x n
            # pair work by construction (density math, BASELINE.md r9
            # graph table) — --regimes fixed measures the chains alone
            continue
        timed(f"edges_{tag}",
              lambda: dq33_build_edges(tables, n_queries=nq).count())
        timed(f"dq34_expand_{tag}",
              lambda: dq34_expand(tables, n_queries=nq).count())
        timed(f"dq72_pagerank_{tag}",
              lambda: dq72_pagerank(tables, n_queries=nq).count())
        timed(f"dq121_bfs_{tag}",
              lambda: dq121_bfs_layers(tables, n_queries=nq).count())
        timed(f"dq165_graph_ann_{tag}",
              lambda: dq165_graph_ann(tables, n_queries=nq).count())
    return out


GRAPH_METRICS = [
    "edges_fixed_sec", "dq34_expand_fixed_sec", "dq72_pagerank_fixed_sec",
    "dq121_bfs_fixed_sec", "dq165_graph_ann_fixed_sec",
    "edges_scaled", "edges_scaled_sec", "dq34_expand_scaled_sec",
    "dq72_pagerank_scaled_sec", "dq121_bfs_scaled_sec",
    "dq165_graph_ann_scaled_sec",
]


def _exponents(rows: list[dict],
               keys: tuple | None = None) -> dict[str, float]:
    """Fitted scaling exponent per metric between consecutive factors:
    e = log(v2/v1) / log(n2/n1) on doc count — e<1 is sublinear."""
    import math

    exps: dict[str, float] = {}
    for a, b in zip(rows, rows[1:]):
        ratio_n = b["n_docs"] / a["n_docs"]
        for k in keys or ("lsh_candidates", "lsh_strict_candidates",
                          "dq61_clusters", "ppjoin_candidates",
                          "dq183_pairs", "dq148_drops"):
            if a.get(k, 0) > 0 and b.get(k, 0) > 0:
                exps[f"{k}@{int(a['factor'])}x->{int(b['factor'])}x"] = round(
                    math.log(b[k] / a[k]) / math.log(ratio_n), 3)
    return exps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf_scaled")
    ap.add_argument("--regimes", default="fixed,scaled",
                    help="graph mode: comma list of fixed/scaled")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized dataset on disk")
    ap.add_argument("--mode", choices=("flagships", "dedup", "graph"),
                    default="flagships",
                    help="dedup: run the dedup-chain candidate-growth "
                         "probe at factors 1/10/.../--factor and report "
                         "fitted scaling exponents")
    ap.add_argument("--pair-density", choices=("growing", "constant"),
                    default="growing",
                    help="replica salting regime: growing = same-base "
                         "replicas are moderate near-dups (pair count "
                         "~n²/base; degenerate past 100×), constant = "
                         "paired replica groups (near-dup pairs ∝ n — "
                         "the production regime; use for 1000×)")
    args = ap.parse_args()

    spark = get_spark("scale-probe")
    if args.mode == "graph":
        from multi_model_vectorsearch_spark.operators.textpipe import (
            clear_session_caches,
        )

        factors = [f for f in (1, 10, 100, 1000) if f <= args.factor] or [1]
        rows = []
        for f in factors:
            out_dir = args.src if f == 1 else f"{args.out}_graph_f{f}"
            t0 = time.perf_counter()
            if f != 1 and not os.path.isdir(out_dir):
                synthesize(spark, args.src, out_dir, f,
                           pair_density="constant")
            print(f"## factor {f} (gen {time.perf_counter() - t0:.1f} s)",
                  flush=True)
            try:
                row = bench_graph_chains(
                    spark, out_dir, f,
                    regimes=tuple(args.regimes.split(",")))
                row["factor"] = float(f)
                rows.append(row)
            finally:
                clear_session_caches()
                if f != 1 and not args.keep:
                    shutil.rmtree(out_dir, ignore_errors=True)
        print(json.dumps({
            "mode": "graph", "src": args.src, "rows": rows,
            "exponents": _exponents(rows, keys=tuple(GRAPH_METRICS)),
        }, indent=1, sort_keys=True))
        return
    if args.mode == "dedup":
        factors = [f for f in (1, 10, 100, 1000) if f <= args.factor] or [1]
        rows = []
        for f in factors:
            out_dir = f"{args.out}_f{f}"
            t0 = time.perf_counter()
            if f == 1:
                out_dir = args.src  # factor 1 IS the source dataset
            else:
                synthesize(spark, args.src, out_dir, f,
                           pair_density=args.pair_density)
            gen_sec = round(time.perf_counter() - t0, 3)
            print(f"## factor {f} (gen {gen_sec} s)", flush=True)
            try:
                row = bench_dedup_chain(
                    spark, out_dir, n_centroids=max(8, 8 * f // 100))
                row["factor"] = float(f)
                rows.append(row)
            finally:
                # drop the per-corpus session caches (shingles, signatures,
                # pair tables) before the next factor: each factor's cached
                # tables stay pinned in executor storage otherwise, and the
                # accumulated factors OOM'd the 1000× PPJoin leg that runs
                # clean in isolation (r8 probe post-mortem)
                from multi_model_vectorsearch_spark.operators.textpipe import (
                    clear_session_caches,
                )

                clear_session_caches()
                if f != 1 and not args.keep:
                    shutil.rmtree(out_dir, ignore_errors=True)
        print(json.dumps({
            "mode": "dedup", "src": args.src,
            "pair_density": args.pair_density,
            "rows": rows, "exponents": _exponents(rows),
        }, indent=1, sort_keys=True))
        return
    t0 = time.perf_counter()
    synthesize(spark, args.src, args.out, args.factor)
    gen_sec = round(time.perf_counter() - t0, 3)
    try:
        timings = bench_flagships(spark, args.out)
        timings["e2e_submit_microbatch"] = bench_ingest(spark, args.out)
        print(json.dumps({
            "factor": args.factor, "src": args.src, "gen_sec": gen_sec,
            "queries": timings,
        }, indent=1, sort_keys=True))
    finally:
        if not args.keep:
            shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
