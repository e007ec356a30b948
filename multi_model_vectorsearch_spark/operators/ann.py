"""Similarity search over embeddings: exact near-dup pairs and IVF-style ANN.

The exact brute-force path (B47/B49) is the correctness baseline; the IVF
operator is the scale path: assign every vector to its nearest centroid once
(a linear pass over a broadcast centroid set), then answer queries by probing
only the query's cluster. On a 1000-executor cluster the assignment is a
map-only stage and the probe prunes the scan to ~1/n_centroids of the corpus
— the Spark-native equivalent of swapping the reference's FLAT Redis index
(db.py:35) for an IVF one, with no index service at all.

Centroids here are a deterministic subset of the corpus (lowest vec_ids) so
the DuckDB oracle reproduces results exactly; swap in k-means centers for
real workloads (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap
from multi_model_vectorsearch_spark.functions.vector import (
    cosine_similarity,
    l2_distance,
)

Tables = dict


def cosine_neardup_hof(t: Tables, k: int = 20) -> DataFrame:
    """All-pairs cosine via crossJoin + higher-order-function expression.

    Correct but O(N²) rows through an *interpreted* lambda — 27 s at sf0.1
    (2000 vecs). Kept as the pure-SQL reference; dq46 below is the blocked
    matmul that replaces it on the hot path.
    """
    e = t["embeddings"].select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"))
    b = e.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"))
    pairs = a.crossJoin(b).filter(F.col("v1") < F.col("v2"))
    sims = pairs.select(
        "v1", "v2",
        snap(cosine_similarity(F.col("e1"), F.col("e2"))).alias("s_micro"),
    )
    return sims.orderBy(
        F.desc("s_micro"), F.asc("v1"), F.asc("v2")).limit(k)


def dq46_cosine_neardup_topk(t: Tables, k: int = 20,
                             n_blocks: int = 8) -> DataFrame:
    """Embedding-cosine near-dup: top-k most-similar distinct pairs.

    Blocked all-pairs similarity: vectors are hashed to ``n_blocks`` blocks,
    every block-pair (bi <= bj) becomes one ``applyInPandas`` group whose
    kernel is a float64 numpy matmul — the O(N²·d) arithmetic runs vectorized
    in Arrow batches instead of row-at-a-time lambdas (~50× over the HOF
    form). Each group emits only its own top-k, so the tail is a tiny global
    TakeOrdered.

    Scale: replication factor is ``n_blocks + 1`` and a group holds 2·N/B
    vectors — size B so a group fits executor memory (B² groups keep every
    core busy). For 100 TB corpora, prune candidates first with LSH/IVF
    (dq47/dq51) and keep this as the scorer on the surviving pairs.
    """
    import numpy as np
    import pandas as pd

    e = t["embeddings"].select("vec_id", "embedding")
    spark = e.sparkSession
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(n_blocks) if i <= j],
        "bi int, bj int",
    )
    tagged = e.withColumn("blk", (F.col("vec_id") % n_blocks).cast("int"))
    left = tagged.join(F.broadcast(bp), F.col("blk") == F.col("bi")).select(
        "bi", "bj", F.lit(0).alias("side"), "vec_id", "embedding")
    right = tagged.join(F.broadcast(bp), F.col("blk") == F.col("bj")).select(
        "bi", "bj", F.lit(1).alias("side"), "vec_id", "embedding")
    both = left.unionAll(right)

    def block_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        def mat(rows):
            return np.stack([np.asarray(v, dtype=np.float64) for v in rows])

        L, R = pdf[pdf.side == 0], pdf[pdf.side == 1]
        if len(L) == 0 or len(R) == 0:
            return pd.DataFrame({"v1": [], "v2": [], "s_micro": []}).astype(
                {"v1": "int32", "v2": "int32", "s_micro": "int64"})
        ml, mr = mat(L.embedding.values), mat(R.embedding.values)
        nl = np.sqrt((ml * ml).sum(axis=1))
        nr = np.sqrt((mr * mr).sum(axis=1))
        # floor snap, not np.round: numpy rounds half-to-even on the
        # binary value — a third rounding convention; the snap is the
        # same IEEE multiply/add/floor as both engines
        sims = np.floor(
            (ml @ mr.T) / np.outer(nl, nr) * 1000000.0 + 0.5
        ).astype("int64")
        v1 = L.vec_id.values[:, None].repeat(len(R), axis=1)
        v2 = R.vec_id.values[None, :].repeat(len(L), axis=0)
        if pdf.bi.iloc[0] == pdf.bj.iloc[0]:
            # same-block square: both orders present; keep upper triangle
            keep = v1 < v2
            lo, hi = v1, v2
        else:
            # cross-block: each unordered pair appears once; canonicalize
            keep = np.ones_like(v1, dtype=bool)
            lo, hi = np.minimum(v1, v2), np.maximum(v1, v2)
        v1f, v2f, sf = lo[keep], hi[keep], sims[keep]
        top = np.lexsort((v2f, v1f, -sf))[:k]
        return pd.DataFrame(
            {"v1": v1f[top], "v2": v2f[top], "s_micro": sf[top]})

    out = both.groupBy("bi", "bj").applyInPandas(
        block_topk, "v1 int, v2 int, s_micro long")
    return out.orderBy(F.desc("s_micro"), F.asc("v1"), F.asc("v2")).limit(k)


_ASSIGN_CACHE: dict = {}


def assign_clusters(t: Tables, n_centroids: int = 8) -> DataFrame:
    """IVF assignment: nearest centroid per vector (broadcast centroid set).

    Session-cached — the assignment feeds the IVF probes, multi-probe,
    recall gauge, representatives, and SemDeDup entries, each standalone.
    """
    from multi_model_vectorsearch_spark.operators.textpipe import (
        _session_cached,
    )

    return _session_cached(
        _ASSIGN_CACHE, t, lambda tt: _assign_clusters_impl(tt, n_centroids),
        extra=(n_centroids,), table="embeddings")


def _assign_clusters_impl(t: Tables, n_centroids: int) -> DataFrame:
    e = t["embeddings"]
    cents = (
        e.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "cid",
        snap(cosine_similarity(F.col("embedding"), F.col("cv")))
        .alias("cs_micro"),
    )
    # argmax as a max_by AGGREGATE, not a row_number window (r14): the
    # window form shuffles n_centroids rows per vector — each carrying the
    # full embedding — then sorts them per partition; max_by gets map-side
    # partial aggregation (one surviving row per vector per map task) and
    # no sort. Tie rule identical to orderBy(cs desc, cid asc): the
    # ordering struct (cs_micro, -cid) is maximal exactly at the smallest
    # cid among equal scores.
    return (
        scored.groupBy("vec_id")
        .agg(F.max_by(F.struct("embedding", "cid"),
                      F.struct(F.col("cs_micro"), -F.col("cid"))).alias("b"))
        .select("vec_id", F.col("b.embedding").alias("embedding"),
                F.col("b.cid").alias("cid"))
    )


def dq51_lsh_ann(t: Tables, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """B54: MLlib random-projection LSH ANN (seeded → reproducible runs).

    The alternative scale path to dq47's IVF: hash buckets prune candidates,
    ``approxNearestNeighbors`` probes them. The neighbor set is
    LSH-seed-specific (no oracle can reproduce it — SURVEY.md §5.3 rule 5),
    so it stays OUT of the hash set: the hash-checked outputs are the
    structural invariants the oracle reproduces as constants — result
    count, the query finding itself at distance 0 (it is in the corpus),
    and recall vs the Spark-side exact L2 top-k clearing 0.5 (the seeded
    run measures 1.0 at sf0.01; bound left loose for other SFs). r5 fix:
    the old per-neighbor projection surfaced as ``err: no_oracle``.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = t["embeddings"].select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=2.0, numHashTables=3, seed=42,
    )
    model = lsh.fit(e)
    key = e.filter(F.col("vec_id") == query_vec_id).head().features
    nn = model.approxNearestNeighbors(e, key, k, distCol="dist")
    # exact L2 top-k over the corpus (brute force — the query is one row)
    q = t["embeddings"].filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"))
    exact = (
        t["embeddings"].crossJoin(F.broadcast(q))
        .select("vec_id", l2_distance(F.col("embedding"), F.col("qv"))
                .alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(k)
        .select(F.col("vec_id").alias("evid"))
    )
    hits = nn.join(exact, nn.vec_id == F.col("evid"), "left_semi")
    return (
        nn.agg(
            F.count("*").cast("bigint").alias("n_results"),
            F.max((F.col("vec_id") == query_vec_id)
                  & (F.col("dist") < 1e-9)).cast("int").alias("self_found"),
        )
        .crossJoin(F.broadcast(
            hits.agg(F.count("*").alias("n_hits"))))
        .select(
            "n_results", "self_found",
            (F.col("n_hits") >= 0.5 * k).cast("int").alias("recall_ok"),
        )
    )


def dq52_centroid_applyinpandas(t: Tables, dims: int = 4) -> DataFrame:
    """B57: grouped custom aggregation via applyInPandas — per-label centroid.

    The UDAF surface for logic SQL can't express (here it can, which is what
    makes it oracle-checkable — the same Arrow-batched path carries real
    custom aggregations). Rounding happens Spark-side so the Python kernel
    returns raw doubles.
    """
    import numpy as np
    import pandas as pd

    cols = [f"c{i+1}" for i in range(dims)]

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(
            pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64))
        )
        mean = mat.mean(axis=0)
        row = {"label": int(pdf["label"].iloc[0])}
        row.update({c: float(mean[i]) for i, c in enumerate(cols)})
        return pd.DataFrame([row])

    schema = "label int, " + ", ".join(f"{c} double" for c in cols)
    out = t["embeddings"].groupBy("label").applyInPandas(centroid, schema=schema)
    return out.select(
        "label", *[snap(F.col(c)).alias(f"{c}_micro") for c in cols])


def dq47_ivf_knn(t: Tables, query_vec_id: int = 0, k: int = 10,
                 n_centroids: int = 8) -> DataFrame:
    """IVF-style ANN: probe only the query's cluster, exact rank inside it.

    Returns (vec_id, s) like the exact KNN (dq29); recall loss vs exact is
    the IVF trade-off, bounded by probing more clusters.
    """
    assigned = assign_clusters(t, n_centroids)
    q = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("cid").alias("qcid")
    )
    cand = assigned.join(
        F.broadcast(q), assigned.cid == F.col("qcid")
    )
    sims = cand.select(
        "vec_id",
        snap(cosine_similarity(F.col("embedding"), F.col("qv")))
        .alias("s_micro"),
    )
    return sims.orderBy(F.desc("s_micro"), F.asc("vec_id")).limit(k)


def dq113_cluster_representatives(t: Tables, n_centroids: int = 8) -> DataFrame:
    """SemDeDup-style cluster-representative selection: per IVF cluster, the
    member closest to the centroid (excluding the centroid vector itself),
    plus cluster size and mean centroid-similarity.

    This is the keep-list side of semantic dedup: cluster the corpus (dq47's
    assignment pass), keep one representative per cluster, and the spread
    statistic (mean_s) tells you how aggressive dropping the rest would be.
    Plan shape: one broadcast-centroid scoring pass, one shuffle on cid for
    the window + rollup — cid cardinality is tiny so the final agg is cheap;
    the 100 TB side is touched exactly once.
    """
    assigned = assign_clusters(t, n_centroids)
    cents = (
        t["embeddings"].filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    scored = assigned.join(F.broadcast(cents), "cid").select(
        "cid", "vec_id",
        snap(cosine_similarity(
            F.col("embedding").cast("array<double>"),
            F.col("cv").cast("array<double>"))).alias("s_micro"),
    )
    members = scored.filter(F.col("vec_id") != F.col("cid"))
    # argmax via max_by (r14): tie rule = orderBy(s desc, vec_id asc)
    reps = (
        members.groupBy("cid")
        .agg(F.max_by(F.struct("vec_id", "s_micro"),
                      F.struct(F.col("s_micro"), -F.col("vec_id")))
             .alias("b"))
        .select("cid", F.col("b.vec_id").alias("rep_vec_id"),
                F.col("b.s_micro").alias("rep_s_micro"))
    )
    stats = members.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        # mean of exact micro ints: bigint sum / count, then half-up —
        # the same two IEEE ops in both engines
        F.floor(F.sum("s_micro") / F.count("*") + F.lit(0.5))
        .cast("bigint").alias("mean_s_micro"),
    )
    return reps.join(stats, "cid").orderBy("cid")


def dq114_pq_assign(t: Tables, m: int = 4, sub_dim: int = 16,
                    n_codes: int = 8) -> DataFrame:
    """Product quantization code assignment: split each vector into ``m``
    subvectors, assign each to its nearest codeword (L2) in a per-subspace
    codebook, reporting the residual distance.

    Completes the quantization cascade (dq108 int8, dq110 1-bit): PQ codes
    compress 64 float32 dims to m bytes (64×) while keeping asymmetric
    distance search possible. The codebook is a deterministic corpus subset
    (the first ``n_codes`` vectors' subvectors — swap in k-means codewords
    for real workloads, same plan shape). The codebook is broadcast, so
    assignment is a map-only pass over the corpus with a per-(vec, sub)
    argmin window on a corpus×m×n_codes intermediate that never leaves the
    executor-local shuffle for the tiny (vec_id, sub) key.
    """
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    subs = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "v",
    ).select(
        "vec_id", "sub",
        F.slice("v", F.col("sub") * sub_dim + 1, sub_dim).alias("sv"),
    )
    cb = subs.filter(F.col("vec_id") < n_codes).select(
        "sub", F.col("vec_id").alias("code"), F.col("sv").alias("cw")
    )
    scored = subs.join(F.broadcast(cb), "sub").select(
        "vec_id", "sub", "code",
        snap(l2_distance(F.col("sv"), F.col("cw"))).alias("d_micro"),
    )
    # argmin via min_by (r14): the window form shuffled n_codes rows per
    # (vec, sub) through the sort; min_by partially aggregates map-side
    return (
        scored.groupBy("vec_id", "sub")
        .agg(F.min_by(F.struct("code", "d_micro"),
                      F.struct("d_micro", "code")).alias("b"))
        .select("vec_id", "sub", F.col("b.code").alias("code"),
                F.col("b.d_micro").alias("d_micro"))
    )


def dq120_ivf_recall(t: Tables, k: int = 10) -> DataFrame:
    """Recall@k of the IVF probe (dq47) against the exact scan (dq29) —
    quality measurement as a first-class query.

    The operational gauge for every approximate path in the engine: run it
    per deployment (or per centroid refresh) to decide n_probes. Both arms
    are top-k plans over the same corpus scan lineage; the overlap join is
    on two k-row sets, so the whole check costs two scans regardless of
    corpus size.
    """
    from multi_model_vectorsearch_spark.operators.vector_ops import dq29_knn_topk

    exact = dq29_knn_topk(t, k=k).select("vec_id")
    approx = dq47_ivf_knn(t, k=k).select("vec_id")
    hits = exact.join(approx, "vec_id")
    return hits.agg(
        F.count("*").cast("int").alias("n_overlap"),
        snap(F.count("*") / F.lit(float(k))).alias("recall_micro"),
    )


def dq122_kmeans_lloyd(t: Tables, k: int = 4, iters: int = 2) -> DataFrame:
    """Distributed Lloyd's k-means, ``iters`` statically-unrolled rounds
    with deterministic init (centroids = first ``k`` vectors), reporting
    per-cluster size and centroid norm after the final assignment.

    The iterative-algorithm template on DataFrames (same family as dq72's
    PageRank): assignment is a broadcast-centroid crossJoin + min_by argmin
    (map-heavy, corpus scanned once per round); the update step posexplodes
    to (cid, dim) — a 64×N-row shuffle keyed on just k×64 groups, which
    partial aggregation collapses map-side, then rebuilds centroid arrays
    with an ordered collect. Distances are rounded before the argmin so
    assignment ties are engine-stable.
    """
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assigned = None
    for _ in range(iters):
        scored = e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cid",
            snap(l2_distance(F.col("v"), F.col("cv"))).alias("dist_micro"),
        )
        # argmin via min_by (r14, same move as assign_clusters): map-side
        # partial aggregation instead of a k-rows-per-vector window sort;
        # ordering struct (dist, cid) = orderBy(dist asc, cid asc)
        assigned = (
            scored.groupBy("vec_id")
            .agg(F.min_by(F.struct("v", "cid"),
                          F.struct("dist_micro", "cid")).alias("b"))
            .select("vec_id", F.col("b.v").alias("v"),
                    F.col("b.cid").alias("cid"))
        )
        dims = assigned.select(
            "cid", F.posexplode("v").alias("i", "x")
        )
        cents = (
            dims.groupBy("cid", "i").agg(F.avg("x").alias("x"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "x"))).alias("cs"))
            .select("cid",
                    F.transform("cs", lambda s: s.getField("x")).alias("cv"))
        )
    c_norm = snap(
        F.sqrt(F.aggregate("cv", F.lit(0.0), lambda a, x: a + x * x))
    )
    sizes = assigned.groupBy("cid").agg(F.count("*").alias("n"))
    return (
        sizes.join(cents, "cid")
        .select("cid", "n", c_norm.alias("c_norm_micro"))
        .orderBy("cid")
    )


def dq136_ivf_multiprobe(t: Tables, query_vec_id: int = 0, k: int = 10,
                         n_centroids: int = 8, n_probes: int = 2) -> DataFrame:
    """Multi-probe IVF ANN: score the query against all centroids, probe
    the ``n_probes`` nearest clusters, exact-rank inside them.

    The recall/cost dial for dq47's single-probe IVF (dq120 measures the
    gap): probing 2 of 8 clusters scans ~2/8 of the corpus instead of 1/8
    and recovers most boundary-loss recall. The probe list is a k-row
    broadcast, so the corpus-side plan is identical to dq47's — a pruned
    scan plus TakeOrderedAndProject.
    """
    e = t["embeddings"]
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    qsims = q.crossJoin(F.broadcast(cents)).select(
        "cid",
        snap(cosine_similarity(
            F.col("qv").cast("array<double>"),
            F.col("cv").cast("array<double>"))).alias("cs_micro"),
    )
    probes = qsims.orderBy(F.desc("cs_micro"), F.asc("cid")) \
        .limit(n_probes).select("cid")
    cand = assign_clusters(t, n_centroids).join(F.broadcast(probes), "cid")
    sims = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        snap(cosine_similarity(
            F.col("embedding").cast("array<double>"),
            F.col("qv").cast("array<double>"))).alias("s_micro"),
    )
    return sims.orderBy(F.desc("s_micro"), F.asc("vec_id")).limit(k)


def dq148_semdedup(t: Tables, n_centroids: int = 8,
                   tau: float = 0.30,
                   cluster_rows_cap: int = 200_000) -> DataFrame:
    """SemDeDup drop list: cluster the corpus (IVF assignment over broadcast
    centroids), then inside each cluster drop every vector that has a
    lower-id neighbor with cosine >= tau, recording which keeper it
    duplicates (highest-similarity lower-id neighbor, ties to the lowest
    vec_id).

    This is the apply side of dq113's representative selection: pairwise
    similarity is computed only within clusters (N²/k, not N², each
    cluster's square one task), so at 100 TB the cost is bounded by the
    largest cluster — skew handled by splitting hot clusters, not by
    widening the join. The square itself runs as a numpy matmul per
    cluster group (``applyInPandas``): the per-pair higher-order-function
    cosine is interpreted per element and measured 4× slower than the
    Arrow-batched kernel on the same pairs (dq46's lesson applied here).

    The matmul is BLOCKED inside the kernel (``block``² tiles, running
    per-column best): materializing the full n_cluster² sims matrix put a
    ~10 GB int64+double pair in one task at the 100× probe's 25k-row
    clusters and thrashed it to 694 s — the blocked form holds peak memory
    at O(block·(n_cluster·d + block)) with identical output (ties resolve
    to the lowest vec_id exactly as the full-matrix argmax did: in-block
    argmax takes the first max, and the cross-block update is strictly->,
    so the earliest block wins equal scores). When the cluster fits one
    block — every oracle-gated SF — the single tile IS the old full
    matmul, bit-for-bit.

    Skew bound (r9 verdict item 2): a cluster larger than
    ``cluster_rows_cap`` — a dominant near-dup blob is exactly the input
    dedup runs on — no longer puts its whole square in one task. It is
    hash-split into r = ceil(n/cap) row blocks scored as r² bounded
    tasks, each emitting every j's best in-task lower-id neighbor; a
    ``max_by(struct(s, -kept_by))`` reduce per vec_id then applies the
    global rule (highest s, ties to lowest keeper id) — value-identical
    to the single-task kernel (pinned by test) with ~2r·n shuffled rows
    as the decomposition cost.
    """
    import numpy as np
    import pandas as pd

    assigned = assign_clusters(t, n_centroids)
    tau_micro = int(tau * 1_000_000)
    block = 4096
    int_min = np.iinfo("int64").min

    def drops(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", kind="stable").reset_index(drop=True)
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["embedding"].values])
        u = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(pdf)
        out = {"vec_id": [], "cid": [], "kept_by": [], "s_micro": []}
        for j0 in range(0, n, block):
            j1 = min(j0 + block, n)
            best_s = np.full(j1 - j0, int_min, dtype="int64")
            best_i = np.zeros(j1 - j0, dtype="int64")
            for i0 in range(0, j1, block):
                i1 = min(i0 + block, j1)
                # floor snap (engine-identical), not np.round (half-to-even)
                sims = np.floor(u[i0:i1] @ u[j0:j1].T * 1000000.0
                                + 0.5).astype("int64")
                gi = np.arange(i0, i1)[:, None]
                gj = np.arange(j0, j1)[None, :]
                cand = (sims >= tau_micro) & (gi < gj)
                masked = np.where(cand, sims, int_min)
                bi = masked.argmax(axis=0)  # first max = lowest i in block
                bs = masked[bi, np.arange(j1 - j0)]
                upd = bs > best_s  # strict: earlier (lower-i) block keeps ties
                best_i = np.where(upd, i0 + bi, best_i)
                best_s = np.maximum(best_s, bs)
            idx = np.nonzero(best_s >= tau_micro)[0]
            out["vec_id"].append(pdf["vec_id"].values[j0 + idx])
            out["cid"].append(pdf["cid"].values[j0 + idx])
            out["kept_by"].append(pdf["vec_id"].values[best_i[idx]])
            out["s_micro"].append(best_s[idx])
        return pd.DataFrame({k: np.concatenate(v) if v else
                             np.array([], dtype="int64")
                             for k, v in out.items()})

    out_schema = "vec_id bigint, cid bigint, kept_by bigint, s_micro long"
    # cheap skew gate: when the WHOLE corpus fits under the cap no cluster
    # can exceed it — keep the original single-path plan (a parquet-footer
    # count, not an assignment pass; the per-cluster sizes aggregation +
    # isEmpty probe measured +0.35 s on the anchor at sf0.1)
    if t["embeddings"].count() <= cluster_rows_cap:
        return assigned.groupBy("cid").applyInPandas(drops,
                                                     schema=out_schema)
    sizes = assigned.groupBy("cid").agg(F.count("*").alias("cn"))
    sized = assigned.join(F.broadcast(sizes), "cid")
    small = sized.filter(F.col("cn") <= cluster_rows_cap).drop("cn")
    big = sized.filter(F.col("cn") > cluster_rows_cap)
    out = small.groupBy("cid").applyInPandas(drops, schema=out_schema)
    if not big.isEmpty():
        out = out.unionByName(
            _semdedup_blocked(big, cluster_rows_cap, tau_micro, block))
    return out


def _semdedup_blocked(big: DataFrame, cap: int, tau_micro: int,
                      block: int) -> DataFrame:
    """Block-pair decomposition of dq148's per-cluster square for clusters
    past ``cap`` rows: r² (i-block × j-block) tasks each emit per-j best
    lower-id neighbor ≥ tau within the task, then one per-vec_id
    ``max_by`` reduce applies the global (s desc, kept_by asc) rule. The
    i<j constraint uses GLOBAL vec_ids, so hash blocks need every ordered
    block pair, diagonal included."""
    import numpy as np
    import pandas as pd

    int_min = np.iinfo("int64").min
    big = big.withColumn(
        "r", F.ceil(F.col("cn") / F.lit(cap)).cast("int")
    ).withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.col("r")).cast("int"))
    rng = F.sequence(F.lit(0), F.col("r") - 1)
    jrep = big.select(
        "cid", F.explode(rng).alias("ib"), F.col("blk").alias("jb"),
        F.lit(True).alias("is_j"), "vec_id", "embedding")
    irep = big.select(
        "cid", F.col("blk").alias("ib"), F.explode(rng).alias("jb"),
        F.lit(False).alias("is_j"), "vec_id", "embedding")

    def best_in_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "vec_id": np.array([], dtype="int64"),
            "cid": np.array([], dtype="int64"),
            "kept_by": np.array([], dtype="int64"),
            "s_micro": np.array([], dtype="int64")})
        j = pdf[pdf["is_j"]].sort_values("vec_id", kind="stable")
        i = pdf[~pdf["is_j"]].sort_values("vec_id", kind="stable")
        if j.empty or i.empty:
            return empty
        jid = j["vec_id"].values.astype("int64")
        iid = i["vec_id"].values.astype("int64")
        jm = np.stack([np.asarray(v, dtype=np.float64)
                       for v in j["embedding"].values])
        im = np.stack([np.asarray(v, dtype=np.float64)
                       for v in i["embedding"].values])
        ju = jm / np.maximum(np.linalg.norm(jm, axis=1, keepdims=True),
                             1e-12)
        iu = im / np.maximum(np.linalg.norm(im, axis=1, keepdims=True),
                             1e-12)
        nj, ni = len(jid), len(iid)
        best_s = np.full(nj, int_min, dtype="int64")
        best_i = np.zeros(nj, dtype="int64")
        for j0 in range(0, nj, block):
            j1 = min(j0 + block, nj)
            for i0 in range(0, ni, block):
                i1 = min(i0 + block, ni)
                sims = np.floor(iu[i0:i1] @ ju[j0:j1].T * 1000000.0
                                + 0.5).astype("int64")
                cand = ((sims >= tau_micro)
                        & (iid[i0:i1, None] < jid[None, j0:j1]))
                masked = np.where(cand, sims, int_min)
                bi = masked.argmax(axis=0)
                bs = masked[bi, np.arange(j1 - j0)]
                # ties: prefer the LOWER keeper id — i-rows are vec_id
                # sorted, so within a tile argmax's first max is lowest,
                # and across tiles a tie keeps the earlier (lower) tile
                upd = bs > best_s[j0:j1]
                best_i[j0:j1] = np.where(upd, iid[i0 + bi], best_i[j0:j1])
                best_s[j0:j1] = np.maximum(best_s[j0:j1], bs)
        hit = np.nonzero(best_s >= tau_micro)[0]
        if not len(hit):
            return empty
        return pd.DataFrame({
            "vec_id": jid[hit],
            "cid": np.full(len(hit), int(pdf["cid"].iloc[0]),
                           dtype="int64"),
            "kept_by": best_i[hit], "s_micro": best_s[hit]})

    partials = jrep.unionByName(irep).groupBy("cid", "ib", "jb") \
        .applyInPandas(
            best_in_blocks,
            "vec_id bigint, cid bigint, kept_by bigint, s_micro long")
    # global rule across tasks: highest s, ties to the lowest keeper id
    return partials.groupBy("vec_id", "cid").agg(
        F.max(F.struct(F.col("s_micro"),
                       (-F.col("kept_by")).alias("nk"))).alias("b")
    ).select(
        "vec_id", "cid", (-F.col("b.nk")).alias("kept_by"),
        F.col("b.s_micro").alias("s_micro"))


def dq204_grid_dbscan(t: Tables, eps: float = 0.05,
                      min_pts: int = 5) -> DataFrame:
    """DBSCAN density labels (core / border / noise) over the first two
    embedding dimensions — the density-outlier triage a curation pipeline
    runs on a 2-D projection to spot low-density (likely junk or OOD)
    regions before expensive per-point review.

    Grid-blocked epsilon join, never the O(N²) product: each point lands
    in an eps-sized cell, probes replicate each point into its 3×3 cell
    neighborhood (a 9× map-side explode), and the equi-join on cell key
    finds all candidates that can possibly be within eps — the standard
    cell-list trick that turns DBSCAN's neighbor search into one
    shuffle-on-cell-key join, linear in points × local density at any
    scale. The exact distance filter keeps the semantics identical to
    brute force (the ORACLE IS brute force, proving the pruning lossless).
    Distance arithmetic is plain IEEE (two mults, one add, one compare,
    same expression both engines), so no rounding hazard exists.

    Core = ≥ min_pts neighbors within eps (self included); border =
    non-core with a core neighbor; else noise.
    """
    e = t["embeddings"]
    pts = e.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    ).select(
        "*",
        F.floor(F.col("x") / eps).cast("bigint").alias("cx"),
        F.floor(F.col("y") / eps).cast("bigint").alias("cy"),
    )
    off = F.explode(F.expr(
        "flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx, dy))))"))
    probes = pts.select(
        F.col("vec_id").alias("qid"), F.col("x").alias("qx"),
        F.col("y").alias("qy"), "cx", "cy", off.alias("o"),
    ).select(
        "qid", "qx", "qy",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))
        + (F.col("qy") - F.col("y")) * (F.col("qy") - F.col("y"))
    )
    nbrs = (
        probes.join(pts.select("vec_id", "x", "y", "cx", "cy"), ["cx", "cy"])
        .filter(d2 <= F.lit(eps * eps))
        .select("qid", F.col("vec_id").alias("nid"))
    )
    counts = nbrs.groupBy("qid").agg(F.count("*").alias("n_nbrs"))
    flags = counts.select(
        "qid", "n_nbrs", (F.col("n_nbrs") >= min_pts).alias("is_core"))
    core_nbr = (
        nbrs.join(
            flags.select(F.col("qid").alias("nid"),
                         F.col("is_core").alias("nbr_core")),
            "nid")
        .filter(F.col("qid") != F.col("nid"))
        .groupBy("qid")
        .agg(F.max("nbr_core").alias("has_core_nbr"))
    )
    return (
        flags.join(core_nbr, "qid", "left")
        .select(
            F.col("qid").alias("vec_id"), "n_nbrs",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.coalesce(F.col("has_core_nbr"), F.lit(False)),
                  F.lit("border"))
            .otherwise(F.lit("noise")).alias("label"),
        )
    )


def dq210_cluster_purity(t: Tables, n_centroids: int = 8) -> DataFrame:
    """Per-cluster label purity over the IVF assignment (dq47's cells):
    majority label share per cell — the unsupervised-vs-labels agreement
    check that tells you whether embedding clusters track the label
    taxonomy (purity ≈ 1) or cut across it (≈ 1/n_labels), gating
    whether cluster-based dedup/sampling can substitute for labels.

    Reuses the session-cached broadcast-centroid assignment (one pass
    over the corpus); everything after is cell×label-sized. Majority
    pick ties break to the smallest label; purity is an exact integer
    ratio with one shared IEEE division, emitted as a micro-unit BIGINT
    (floor snap — driver-red in CORRECTNESS_r05 as ``round(ratio, 6)``).
    """
    assigned = assign_clusters(t, n_centroids)
    labels = t["embeddings"].select("vec_id", "label")
    cl = (
        assigned.select("vec_id", "cid")
        .join(labels, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("cid").orderBy(F.desc("c"), F.asc("label"))
    top = (
        cl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("label").alias("top_label"),
                F.col("c").alias("n_top"))
    )
    sizes = cl.groupBy("cid").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_labels"))
    return (
        top.join(sizes, "cid")
        .select(
            "cid", "n", "n_labels", "top_label", "n_top",
            snap(F.col("n_top").cast("double") / F.col("n"))
            .alias("purity_micro"),
        )
    )


def dq220_ari(t: Tables, n_centroids: int = 8) -> DataFrame:
    """Adjusted Rand Index between the IVF cluster assignment and the
    label column — the chance-corrected partner of dq210's purity (purity
    rewards many tiny clusters; ARI does not), the standard score for
    'do embedding clusters recover the taxonomy'.

    Pure pair-counting combinatorics on the contingency table: pidx =
    Σ C(n_ij,2), A/B the row/column pair sums, and
    ARI = (pidx·C(n,2) − A·B) / (C(n,2)·(A+B)/2 − A·B) — pair counts are
    exact bigints (integer >>1, never IEEE `/`), the num/den cross-terms
    are DECIMAL(38,0) (pidx·C(n,2) ≤ n⁴/4 overflows int64 past ~10^4.7
    points in a degenerate single-cell clustering; decimal is exact
    through ~10^9 points), one IEEE division at the end. The corpus is
    touched once by the session-cached assignment; everything here is
    contingency-sized.
    """
    assigned = assign_clusters(t, n_centroids).select("vec_id", "cid")
    labels = t["embeddings"].select("vec_id", "label")
    ct = (
        assigned.join(labels, "vec_id")
        .groupBy("cid", "label").agg(F.count("*").alias("nij"))
    )

    def c2(col: F.Column) -> F.Column:
        # k(k-1) is always even: >>1 keeps the pair count an exact
        # bigint (dq236's integer-`div` standard) — `/` on bigints is
        # IEEE double division, which silently loses exactness once
        # k(k-1) exceeds 2^53 (~9.5e7 points in one contingency cell)
        return F.shiftright(col.cast("bigint") * (col.cast("bigint") - 1), 1)

    rows = ct.groupBy("cid").agg(F.sum("nij").alias("ai"))
    cols = ct.groupBy("label").agg(F.sum("nij").alias("bj"))
    parts = (
        ct.agg(F.sum(c2(F.col("nij"))).alias("pidx"),
               F.sum("nij").alias("n"))
        .crossJoin(F.broadcast(
            rows.agg(F.sum(c2(F.col("ai"))).alias("a"))))
        .crossJoin(F.broadcast(
            cols.agg(F.sum(c2(F.col("bj"))).alias("b"))))
    )
    dec = "decimal(38,0)"
    cn2 = c2(F.col("n")).cast(dec)
    a, b = F.col("a").cast(dec), F.col("b").cast(dec)
    num = F.col("pidx").cast(dec) * cn2 - a * b
    den = cn2 * (a + b) - 2 * a * b
    # envelope guard: past ~1e9 points the decimal(38,0) products
    # overflow, and under Spark's default non-ANSI mode that is a SILENT
    # NULL (the DuckDB oracle's HUGEINT raises instead) — fail loudly
    # rather than emit ari=NULL with no signal
    guarded = parts.where(
        F.when(
            F.col("n") > 2_000_000_000,
            F.raise_error(
                "dq220_ari: n exceeds the decimal(38,0) pair-count "
                "envelope (~1e9 points); products would overflow to "
                "NULL under non-ANSI mode"),
        ).otherwise(F.lit(True))
    )
    # num/den doubled consistently: (pidx*C - AB) / (C*(A+B)/2 - AB)
    # == 2*(pidx*C - AB) / (C*(A+B) - 2AB); micro-unit floor snap
    # (round() is not cross-engine-identical, SURVEY §5.3 rule 6)
    return guarded.select(
        "n", "pidx", "a", "b",
        snap(2.0 * num.cast("double") / den.cast("double"))
        .alias("ari_micro"),
    )


def dq228_ivfpq_search(t: Tables, query_vec_id: int = 0, k: int = 10,
                       n_centroids: int = 8, m: int = 4,
                       sub_dim: int = 16, n_codes: int = 8) -> DataFrame:
    """IVF-PQ search — the composed production ANN architecture: coarse
    IVF probe (dq47's cell assignment) prunes the corpus to one cell,
    then candidates are ranked by PQ asymmetric distance computation
    (ADC): the query builds a tiny (sub × code) distance table ONCE and
    every candidate's score is m table lookups summed — the candidate
    vectors themselves are never touched, only their m-byte codes.

    Plan shape at 100 TB: the code table (dq114's assignment — the
    stored index) and the cell semi-join shuffle on vec_id once; the ADC
    table is m·n_codes rows broadcast; scoring is a map-side lookup
    join + one partial-aggregating groupBy on vec_id; TakeOrdered
    finishes. Per-sub distances are rounded to the shared 6-decimal grid
    and summed as DECIMAL (order-independent, exact), so ranking is
    engine-identical; the additive per-sub L2 scoring (vs the classical
    summed squares) is chosen for that cross-engine exactness — the
    plan shape is identical either way.
    """
    assigned = assign_clusters(t, n_centroids)
    q = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").cast("array<double>").alias("qv"),
        F.col("cid").alias("qcid"),
    )
    cell = assigned.join(F.broadcast(q), assigned.cid == F.col("qcid")) \
        .select("vec_id")
    codes = dq114_pq_assign(t, m=m, sub_dim=sub_dim, n_codes=n_codes) \
        .select("vec_id", "sub", "code")
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cb = e.filter(F.col("vec_id") < n_codes).select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("vec_id").alias("code"), "v",
    ).select(
        "sub", "code",
        F.slice("v", F.col("sub") * sub_dim + 1, sub_dim).alias("cw"),
    )
    qsubs = q.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.slice("qv", F.col("sub") * sub_dim + 1, sub_dim).alias("qsv"),
    )
    dtab = qsubs.join(cb, "sub").select(
        "sub", "code",
        snap(l2_distance(F.col("qsv"), F.col("cw"))).alias("dd_micro"),
    )
    scored = (
        codes.join(cell, "vec_id", "left_semi")
        .join(F.broadcast(dtab), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("dd_micro").alias("adc_micro"))
    )
    return scored.orderBy(F.asc("adc_micro"), F.asc("vec_id")).limit(k)


def dq229_ivfpq_recall(t: Tables, k: int = 10) -> DataFrame:
    """Recall@k of the composed IVF-PQ path (dq228) against an exact
    full-scan arm — dq120's gauge pointed at the quantized index,
    closing the loop: every approximate path in the engine ships with
    its measured quality. Both arms are top-k plans; the overlap join is
    on two k-row sets, so the check costs two scans regardless of
    corpus size.

    The exact arm ranks by **L2 distance on the raw embeddings** — the
    same metric dq228's ADC approximates — so the gauge isolates
    quantization error instead of conflating it with a metric mismatch
    (dq29's cosine ordering differs from L2 unless vectors are
    unit-normalized, which the testdata's are not). One residual,
    deliberate divergence stays: ADC sums per-sub L2 *norms* (additive,
    for cross-engine decimal exactness — see dq228) rather than summing
    squares, so measured recall still includes that sub-additivity, not
    only codebook error. Expect materially lower recall than dq120's
    coarse-only probe: the 8-word toy codebook's quantization error is
    the PQ trade-off this pair of entries makes measurable.
    """
    e = t["embeddings"]
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv"))
    l2d = l2_distance(F.col("embedding").cast("array<double>"), F.col("qv"))
    # floor-grid, not round(d, 6): F.round rounds the double's SHORTEST
    # DECIMAL REPR (BigDecimal.valueOf(Double.toString)) while DuckDB
    # rounds the binary value, so bit-identical distances can still round
    # apart at half boundaries; floor(x·1e6 + 0.5) is the same three IEEE
    # ops in both engines — genuinely engine-identical ranking keys
    exact = (
        e.crossJoin(F.broadcast(qv))
        .select("vec_id",
                F.floor(l2d * 1000000.0 + 0.5).cast("bigint").alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(k)
        .select("vec_id")
    )
    approx = dq228_ivfpq_search(t, k=k).select("vec_id")
    hits = exact.join(approx, "vec_id")
    return hits.agg(
        F.count("*").cast("int").alias("n_overlap"),
        snap(F.count("*") / F.lit(float(k))).alias("recall_micro"),
    )
