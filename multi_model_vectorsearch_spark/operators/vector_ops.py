"""Vector search operators (SURVEY.md B47-B50, DQ-29..32).

Spark-native re-expression of the reference's KNN path:

- RediSearch FLAT index KNN (db.py:35-39, main.py:206-215) is an exact
  brute-force cosine scan — on Spark that is a corpus scan + top-k, planned by
  Catalyst as ``TakeOrderedAndProject`` (no global sort materialized).
- The reference over-fetches k*6 then re-ranks client-side (main.py:209);
  declarative top-k makes the over-fetch unnecessary.
- Self-match pinning ``sim = 1.0`` (main.py:223-224) is a CASE expression.
- Modality balancing (main.py:227-253): same/cross-modality quotas of k//2
  via per-partition window ranks, then a global top-k.

Scale notes (100 TB design point): the query set is always the broadcast side
of the cross join — the corpus is never shuffled, never collected, and each
partition emits only its local top-k candidates before the final take-ordered
merge on the driver. Similarities are rounded to 6 places *before* ranking so
rank order is reproducible across engines (ties break on vec_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap
from multi_model_vectorsearch_spark.functions.vector import cosine_similarity

Tables = dict


def similarity_scan(t: Tables, query_pred: str, pin_self: bool = True) -> DataFrame:
    """Corpus × queries similarity table: (qid, qm, vec_id, modality, s).

    ``query_pred`` is a SQL predicate selecting query rows from embeddings.
    The query side is broadcast; the corpus side streams. Norms are
    hoisted out of the pair expression (computed once per corpus row and
    once per query, not once per PAIR) — bit-identical to the inline
    cosine, ~3× less interpreted higher-order-function work in the join.
    """
    from multi_model_vectorsearch_spark.functions.vector import (
        cosine_with_norms,
        l2_norm,
    )

    e = t["embeddings"].withColumn("_ne", l2_norm(F.col("embedding")))
    q = (
        e.filter(query_pred)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("modality").alias("qm"),
            F.col("_ne").alias("_nq"),
        )
    )
    joined = e.crossJoin(F.broadcast(q))
    cos = cosine_with_norms(F.col("embedding"), F.col("qv"),
                            F.col("_ne"), F.col("_nq"))
    if pin_self:
        # self-match pinned to exactly 1.0 → 1_000_000 micro
        # (reference main.py:223-224)
        s = snap(
            F.when(F.col("vec_id") == F.col("qid"), F.lit(1.0)).otherwise(cos)
        )
    else:
        s = snap(cos)
    return joined.select("qid", "qm", "vec_id", "modality",
                         s.alias("s_micro"))


def dq29_knn_topk(t: Tables, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """B47/A9/A12: exact KNN for one query — scan + TakeOrderedAndProject."""
    sims = similarity_scan(t, f"vec_id = {query_vec_id}", pin_self=False)
    return (
        sims.select("vec_id", "s_micro")
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(k)
    )


def dq31_knn_join(t: Tables, n_queries: int = 20, k: int = 5) -> DataFrame:
    """B49: KNN similarity join — top-k corpus rows per query, self pinned."""
    sims = similarity_scan(t, f"vec_id < {n_queries}", pin_self=True)
    w = Window.partitionBy("qid").orderBy(F.desc("s_micro"), F.asc("vec_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "vec_id", "s_micro")
    )


def dq30_l2_normalize(t: Tables) -> DataFrame:
    """B48/A3: unit-normalization — the norm of the normalized vector is 1."""
    from multi_model_vectorsearch_spark.functions.vector import l2_norm, l2_normalize

    e = t["embeddings"]
    return e.select(
        "vec_id",
        snap(l2_norm(l2_normalize(F.col("embedding")))).alias("one_micro")
    )


def dq32_modality_balanced_topk(t: Tables, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """B50/A14-A17: modality-balanced top-k — k//2 same-modality, k//2 cross.

    Reference: split (main.py:227-242), per-split sort (245-246), quota k//2
    (248-249), union + global re-sort + truncate (251-253).
    """
    sims = similarity_scan(t, f"vec_id = {query_vec_id}", pin_self=True)
    flagged = sims.withColumn(
        "same_mod", (F.col("modality") == F.col("qm")).cast("int")
    )
    w = Window.partitionBy("same_mod").orderBy(
        F.desc("s_micro"), F.asc("vec_id"))
    return (
        flagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k // 2)
        .select("vec_id", "s_micro", "same_mod")
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(k)
    )


def dq108_int8_quantize(t: Tables) -> DataFrame:
    """Symmetric int8 embedding quantization with reconstruction error.

    The storage-scale path for a 100 TB vector corpus: per-vector absmax
    scale, q_i = clamp(floor(x_i/scale + 0.5), ±127), reporting the
    quantized checksum and L2 reconstruction error. floor(x+0.5) is used
    instead of round() because engines disagree on round-half behavior;
    the whole computation is per-row HOF folds — map-only, codegen'd,
    no Python.
    """
    v = F.col("v")
    scale = F.col("scale")

    def qi(x: Column) -> Column:
        return F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)))
        )

    e = (
        t["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn(
            "scale",
            F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
            / F.lit(127.0),
        )
    )
    qsum = F.aggregate(v, F.lit(0).cast("long"), lambda a, x: a + qi(x))
    err2 = F.aggregate(
        v, F.lit(0.0),
        lambda a, x: a + F.pow(x - qi(x).cast("double") * scale, F.lit(2.0)),
    )
    # Round in a second projection: aliasing the rounded value as "scale" in
    # the same select would lateral-alias-capture the `scale` reference inside
    # the err2 fold (Spark 3.4+ implicit lateral column alias resolution).
    return e.select(
        "vec_id",
        qsum.alias("qsum"),
        scale.alias("scale_raw"),
        F.sqrt(err2).alias("err_raw"),
    ).select(
        "vec_id",
        "qsum",
        snap(F.col("scale_raw")).alias("scale_micro"),
        snap(F.col("err_raw")).alias("l2_err_micro"),
    )


def dq110_hamming_knn(t: Tables, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Binary (sign-bit) quantization + Hamming-distance KNN.

    The 1-bit arm of the quantization cascade (dq108 is the 8-bit arm): each
    64-d vector collapses to two 32-bit sign masks, and search is
    ``bit_count(xor(...))`` — 32× less data scanned than float32 and the
    distance is 4 integer ops, no FP at all. Signatures are built with a
    per-row zip_with/aggregate fold (map-only, codegen'd); the query signature
    is broadcast so the corpus never shuffles, and Catalyst plans the top-k
    as TakeOrderedAndProject. At 100 TB the signature table is ~3 TB and
    this is the memory-resident coarse filter in front of dq29's exact rerank.

    Two 32-bit halves (not one 64-bit mask) keep every bit below the sign
    bit, so the sum-fold and the oracle's integer arithmetic never overflow.
    """
    v = F.col("v")

    def sig(start: int) -> Column:
        bits = F.zip_with(
            F.slice(v, start, 32),
            F.sequence(F.lit(0), F.lit(31)),
            lambda x, i: F.when(x > 0, F.pow(F.lit(2.0), i).cast("long"))
            .otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)

    sigs = (
        t["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .select("vec_id", sig(1).alias("lo"), sig(33).alias("hi"))
    )
    q = sigs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    hd = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
    ).cast("int")
    return (
        sigs.crossJoin(F.broadcast(q))
        .select("vec_id", hd.alias("hd"))
        .orderBy(F.asc("hd"), F.asc("vec_id"))
        .limit(k)
    )


def dq109_matryoshka_knn(t: Tables, query_vec_id: int = 0, k: int = 10,
                         dim: int = 16) -> DataFrame:
    """Matryoshka-style truncated-dimension KNN: cosine top-k using only the
    first ``dim`` components.

    The coarse-search arm of a two-stage retrieval cascade — scan cost drops
    by 1 - dim/D with the same plan shape as dq29 (broadcast query, corpus
    streams, TakeOrderedAndProject top-k); the full-dim rerank of survivors
    is exactly dq29 over the candidate set.
    """
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.slice("embedding", 1, dim).alias("qv")
    )
    c = e.select("vec_id", F.slice("embedding", 1, dim).alias("emb"))
    s = snap(cosine_similarity(F.col("emb"), F.col("qv")))
    return (
        c.crossJoin(F.broadcast(q))
        .select("vec_id", s.alias("s_micro"))
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(k)
    )


def dq138_prenorm_dot_knn(t: Tables, query_vec_id: int = 0,
                          k: int = 10) -> DataFrame:
    """Exact cosine KNN over PRE-normalized vectors: normalize once at
    write time, then every query is a pure dot product — the storage-side
    trade every serving system makes (the reference normalizes at embed
    time, app.py:14-15, for exactly this reason).

    Same answer as dq29 (cosine ≡ dot of unit vectors); the per-query
    saving is one norm computation per corpus row per query, which at
    100 TB × many QPS is the difference between one FMA pass and two.
    """
    nrm = F.sqrt(F.aggregate(
        "v", F.lit(0.0), lambda a, x: a + x * x
    ))
    unit = (
        t["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .select("vec_id", F.transform(
            "v", lambda x: x / nrm
        ).alias("nv"))
    )
    q = unit.filter(F.col("vec_id") == query_vec_id).select(
        F.col("nv").alias("qnv")
    )
    dot = F.aggregate(
        F.zip_with("nv", "qnv", lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    return (
        unit.crossJoin(F.broadcast(q))
        .select("vec_id", snap(dot).alias("s_micro"))
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(k)
    )


def dq145_filtered_knn(t: Tables, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Metadata-filtered exact KNN: top-k cosine among one modality only —
    the pre-filter form of filtered vector search.

    The predicate composes with the scan, so Catalyst pushes it below the
    similarity computation: non-matching vectors are skipped before any
    arithmetic (post-filtering a k-truncated result, the other common
    form, silently under-fills k). At 100 TB with modality-partitioned
    storage this prunes whole partitions, not just rows.
    """
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    cand = e.filter(F.col("label") % 3 == 1)
    s = snap(cosine_similarity(
        F.col("embedding").cast("array<double>"),
        F.col("qv").cast("array<double>")))
    return (
        cand.crossJoin(F.broadcast(q))
        .select("vec_id", s.alias("s_micro"))
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(k)
    )


def dq146_grouped_maxsim(t: Tables, query_vec_id: int = 0, k: int = 5) -> DataFrame:
    """Late-interaction-style grouped retrieval: score each label group by
    the MAX cosine of its member vectors to the query (MaxSim), return the
    top-k groups with their best-matching member.

    The multi-vector document shape (ColBERT-family scoring collapses to
    max-per-group for a single query vector): one broadcast-query scan,
    one window on the group key — the per-group argmax rides the same
    shuffle as the max itself.
    """
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    s = snap(cosine_similarity(
        F.col("embedding").cast("array<double>"),
        F.col("qv").cast("array<double>")))
    scored = e.crossJoin(F.broadcast(q)).select(
        "label", "vec_id", s.alias("s_micro")
    )
    # per-group argmax via max_by over (s, -vec_id) — same tie rule as
    # orderBy(s desc, vec_id asc), map-side combinable, no window sort.
    # max_by (not min_by of the negation): a NULL s_micro sorts SMALLEST
    # under max semantics and loses the group, matching the old
    # nulls-last-desc window behavior (r14 advice).
    best = (
        scored.groupBy("label")
        .agg(F.max_by(F.struct("vec_id", "s_micro"),
                      F.struct("s_micro", -F.col("vec_id")))
             .alias("b"))
        .select("label", F.col("b.vec_id").alias("best_vec"),
                F.col("b.s_micro").alias("s_micro"))
    )
    return best.orderBy(F.desc("s_micro"), F.asc("label")).limit(k)


def dq147_mutual_knn(t: Tables, n_queries: int = 100, k: int = 5) -> DataFrame:
    """Reciprocal nearest neighbors: pairs where EACH vector appears in the
    other's top-k — the stricter symmetric criterion semantic-dedup
    pipelines use to avoid hub-vector false positives.

    Built from the same ranked table as dq31 (one scan, one window);
    mutuality is a self-join of that k·|Q|-row result on the swapped key,
    which is negligible next to the scan. n_queries=100 (not dq31's 20)
    so the fixture corpora actually contain mutual pairs — at 20 the
    gate compared two empty results, which checks nothing.
    """
    ranked = dq31_knn_join(t, n_queries=n_queries, k=k)
    a = ranked.select(F.col("qid").alias("a"), F.col("vec_id").alias("b"),
                      F.col("rnk").alias("ra"))
    b = ranked.select(F.col("qid").alias("b2"), F.col("vec_id").alias("a2"),
                      F.col("rnk").alias("rb"))
    return (
        a.join(b, (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2")))
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ra", "rb")
    )


def dq182_hard_negatives(t: Tables, n_queries: int = 20,
                         k: int = 5) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the ``k`` highest-cosine corpus vectors with a DIFFERENT label — the
    negatives that actually move an embedding model (random negatives are
    trivially separable; the informative ones sit just across the
    decision boundary).

    Same physical shape as the KNN join (B49): bounded query set
    broadcast, corpus streams through one scan, label filter applied
    BEFORE the similarity evaluation so mismatched pairs never pay the
    dot product, per-query top-k via one window on qid. Norms hoisted to
    the per-row projections (bit-identical, one fold per pair).
    """
    from multi_model_vectorsearch_spark.functions.vector import (
        cosine_with_norms,
        l2_norm,
    )

    e = t["embeddings"].withColumn("_ne", l2_norm(F.col("embedding")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
        F.col("_ne").alias("_nq"),
    )
    sims = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid", "qlabel", "vec_id",
            F.col("label").alias("neg_label"),
            snap(cosine_with_norms(F.col("embedding"), F.col("qv"),
                                   F.col("_ne"), F.col("_nq")))
            .alias("s_micro"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("s_micro"), F.asc("vec_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("qid", "qlabel", "rnk", "vec_id", "neg_label", "s_micro")
    )


def dq149_diversity_filter(t: Tables, query_vec_id: int = 0, n_cand: int = 50,
                           tau: float = 0.25) -> DataFrame:
    """Leader-based diversity filter over a KNN candidate pool: fetch the
    top-n candidates for the query, then drop any candidate within cosine
    tau of a *higher-ranked* candidate — the one-pass (non-iterative)
    MMR-style re-rank that keeps result lists from collapsing onto one
    near-duplicate cluster.

    The candidate pool is <=n rows by construction (TakeOrderedAndProject
    on the corpus scan), so the pairwise stage is an n x n broadcast
    self-join on the driver-sized pool — corpus touched once, exactly as
    dq29.
    """
    cand = (
        similarity_scan(t, f"vec_id = {query_vec_id}", pin_self=False)
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "s_micro")
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(n_cand)
    )
    e = t["embeddings"].select("vec_id", "embedding")
    # r15: ranks over the ≤ n_cand pool come from one sorted-array
    # posexplode (identical to row_number over (s_micro desc, vec_id
    # asc); the negated score sorts the struct ascending) instead of a
    # partitionless window — which also stops the optimizer duplicating
    # the window+join subtree into each of the three consumers below.
    pool = cand.agg(F.sort_array(F.collect_list(F.struct(
        (-F.col("s_micro")).alias("ns"),
        F.col("vec_id").alias("vec_id"),
        F.col("s_micro").alias("s_micro")))).alias("a"))
    ranked_ids = pool.select(
        F.posexplode("a").alias("pos", "r")
    ).select("r.vec_id", "r.s_micro",
             (F.col("pos") + 1).cast("int").alias("rank"))
    ranked = (
        e.join(F.broadcast(ranked_ids), "vec_id")
        .select("vec_id", "s_micro", "embedding", "rank")
    )
    hi = ranked.select(F.col("rank").alias("hr"),
                       F.col("embedding").alias("hv"))
    lo = ranked.select("vec_id", "s_micro", "rank", "embedding")
    blocked = (
        lo.join(F.broadcast(hi), F.col("hr") < F.col("rank"))
        .filter(
            snap(cosine_similarity(
                F.col("embedding").cast("array<double>"),
                F.col("hv").cast("array<double>")))
            >= int(tau * 1_000_000))
        .select("vec_id").distinct()
    )
    return (
        lo.join(F.broadcast(blocked), "vec_id", "left_anti")
        .select("vec_id", "s_micro", "rank")
    )


def dq154_centroid_drift(t: Tables) -> DataFrame:
    """Per-label embedding drift between two corpus halves (vec_id parity as
    the batch surrogate): cosine between the half-0 and half-1 mean
    vectors — the monitoring query that catches encoder or distribution
    shift between ingest batches before it poisons retrieval.

    Never materializes a mean vector: posexplode fans out (label, half,
    dim) terms, one hash agg produces per-dim means for both halves via
    conditional averages, and a second tiny agg folds the 64-dim dot
    product and norms. Both shuffles key on (label, pos) — no skew, no
    collect, scales with dims x labels not rows.
    """
    e = t["embeddings"].select(
        "label", (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos", "v"),
    )
    dims = e.groupBy("label", "pos").agg(
        F.avg(F.when(F.col("half") == 0, F.col("v"))).alias("a"),
        F.avg(F.when(F.col("half") == 1, F.col("v"))).alias("b"),
    )
    counts = t["embeddings"].groupBy("label").agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("int")).cast("bigint").alias("n0"),
        F.sum((F.col("vec_id") % 2 == 1).cast("int")).cast("bigint").alias("n1"),
    )
    drift = dims.groupBy("label").agg(
        snap(
            F.sum(F.col("a") * F.col("b"))
            / F.sqrt(F.sum(F.col("a") * F.col("a")))
            / F.sqrt(F.sum(F.col("b") * F.col("b")))
        ).alias("drift_cos_micro"),
    )
    return counts.join(drift, "label").select(
        "label", "n0", "n1", "drift_cos_micro")


def dq170_knn_label_prop(t: Tables, seed_size: int = 100,
                         k: int = 5) -> DataFrame:
    """kNN label propagation (weak supervision): every out-of-seed vector
    takes the majority label of its ``k`` nearest members of a bounded
    annotated seed (vec_id < ``seed_size``) by cosine — the standard
    cheap labeler for bootstrapping training data from a small annotated
    sample. ``true_label`` is carried through for eval.

    Plan shape: MAP-ONLY. The seed (a fixed constant in corpus size — an
    earlier form broadcast a mod-selected 20% of the corpus, an executor
    OOM at 100 TB) collapses to a single broadcast array-of-structs row;
    every sim for a given query is then produced from its one corpus row,
    so top-k selection and majority voting run as in-array expressions
    with ZERO Exchange on the corpus (the window/groupBy form shuffled
    corpus × seed rows on qid for data that was already row-local).

    Two interpreter-cost rules shape the expression pipeline (HOFs are
    CodegenFallback, so nothing here is codegen'd):

    * each expensive step is staged through its own ``withColumn`` —
      referenced-more-than-once aliases stop CollapseProject from inlining
      (and hence re-evaluating) the whole upstream tree per consumer;
      the single-Project form re-computed the 100-dot pipeline ~4×;
    * both sorts use NATURAL struct ordering over exact negated integer
      sort keys instead of lambda comparators (a JVM compare per element
      vs an interpreted when-chain per comparison): sims order by
      ``(-round(s·1e6), sid)`` ≡ (s desc, sid asc); votes order by
      ``(-n, -ssum·(60/n), label)`` ≡ (votes desc, mean desc, label asc),
      exact because 60 = lcm(1..5) makes ssum·(60/n) an integer.
      Together: 10.7 s → 2.4 s warm at sf0.1 (honest noop-sink timing).

    Cross-engine determinism: the oracle mirrors this fold BIT-identically
    (sequential left fold via ``list_reduce(list_prepend(0.0, ...))``, the
    same 1e-12 norm floor), so the similarity doubles agree to the last
    bit — no reliance on rounding-boundary distance (the r4 hazard:
    different IEEE fold orders left a ~1e-13 spread that a coarse
    3-decimal grid merely made unlikely to flip, not impossible). The
    grid snap is ``floor(s·1e6 + 0.5)`` — three IEEE ops, identical in
    both engines — NOT ``round(s, 6)``: Spark's round rounds the double's
    shortest decimal repr (``BigDecimal.valueOf(Double.toString)``) while
    DuckDB rounds the binary value, so even bit-identical doubles can
    round apart at half boundaries. Everything after the snap is exact
    integer arithmetic, including the mean (``ssum·60/n`` is an integer
    because 60 = lcm(1..5); mean_sim = that integer / 6e7, the same
    bigint→double divide in both engines). Ties break on (votes desc,
    mean desc, label asc) over exact integers — fully deterministic.
    """
    from multi_model_vectorsearch_spark.functions.vector import l2_normalize

    e = t["embeddings"]
    # pre-normalize each side ONCE (map-only), so the pair expression is a
    # single dot fold instead of dot + two norms — 3× fewer HOF folds over
    # the corpus × seed product
    seed = e.filter(F.col("vec_id") < seed_size).select(
        F.col("vec_id").alias("sid"), "label",
        l2_normalize(F.col("embedding")).alias("sv"),
    )
    seed_arr = seed.agg(
        F.collect_list(F.struct("sid", "label", "sv")).alias("sarr"))
    corpus = (
        e.filter(F.col("vec_id") >= seed_size)
        .select(
            F.col("vec_id").alias("qid"),
            l2_normalize(F.col("embedding")).alias("qv"),
            F.col("label").alias("true_label"),
        )
    )
    j = corpus.crossJoin(F.broadcast(seed_arr))

    def pair_dot(qv, m):
        return F.aggregate(
            F.zip_with(qv, m["sv"], lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)

    # 6-decimal similarity grid: the oracle computes the bit-identical
    # dot (same sequential fold, same norm floor), and floor(s·1e6 + 0.5)
    # is the same three IEEE ops in both engines (see docstring for why
    # round(s, 6) is NOT engine-identical).
    sims = F.transform(F.col("sarr"), lambda m: F.struct(
        (-F.floor(pair_dot(F.col("qv"), m) * 1000000.0 + 0.5))
        .cast("bigint").alias("negs"),
        m["sid"].alias("sid"), m["label"].alias("label")))
    staged = (
        j.withColumn("sims", sims)
        .withColumn("top", F.slice(F.array_sort(F.col("sims")), 1, k))
        .withColumn("labels", F.array_distinct(
            F.transform(F.col("top"), lambda x: x["label"])))
    )

    def nvotes(l):
        return F.size(F.filter(F.col("top"), lambda x: x["label"] == l))

    votes = F.transform(F.col("labels"), lambda l: F.struct(
        (-nvotes(l)).cast("int").alias("negn"),
        (F.aggregate(F.filter(F.col("top"), lambda x: x["label"] == l),
                     F.lit(0).cast("bigint"),
                     lambda acc, x: acc + x["negs"])
         * (60 / nvotes(l)).cast("bigint")).alias("negmean"),
        l.alias("label")))
    staged = staged.withColumn("best", F.element_at(F.array_sort(votes), 1))
    best = F.col("best")
    # mean_sim = ssum/(n·1e6) = (-negmean·n/60)/(n·1e6) = -negmean/6e7 —
    # an exact bigint divided by an exact power-of-two-free constant: both
    # engines perform the identical IEEE divide, so no output rounding.
    return staged.select(
        "qid", best["label"].alias("pred_label"), "true_label",
        (-best["negn"]).alias("n_votes"),
        # exact bigint / 60.0 then floor snap: identical IEEE sequence in
        # both engines; emits the mean similarity in micro units
        snap(-best["negmean"] / F.lit(60000000.0)).alias("mean_sim_micro"),
    )


def dq194_training_triplets(t: Tables, n_queries: int = 20) -> DataFrame:
    """Contrastive training-pair emitter: for each anchor vector, the
    hardest POSITIVE (nearest same-label neighbor, self excluded) and the
    hardest NEGATIVE (nearest different-label vector — dq182's top-1),
    plus the margin between them — the (anchor, positive, negative)
    triplet table an embedding-model fine-tune consumes, with margin the
    curriculum key (small margin = hard triplet).

    One corpus scan scores both arms: the anchor set broadcasts, a single
    similarity projection feeds TWO rank windows split by the label
    predicate — no second scan, no join between the arms until the final
    one-row-per-anchor assembly. At 100 TB: corpus never shuffles;
    windows partition on the bounded anchor id.
    """
    from multi_model_vectorsearch_spark.functions.vector import (
        cosine_with_norms,
        l2_norm,
    )

    e = t["embeddings"].withColumn("_ne", l2_norm(F.col("embedding")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
        F.col("_ne").alias("_nq"),
    )
    sims = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "qlabel", "vec_id", "label",
            (F.col("label") == F.col("qlabel")).alias("same"),
            snap(cosine_with_norms(F.col("embedding"), F.col("qv"),
                                   F.col("_ne"), F.col("_nq")))
            .alias("s_micro"),
        )
    )
    w = Window.partitionBy("qid", "same").orderBy(
        F.desc("s_micro"), F.asc("vec_id"))
    best = sims.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    pos = best.filter("same").select(
        "qid", "qlabel",
        F.col("vec_id").alias("pos_id"), F.col("s_micro").alias("pos_s_micro"))
    neg = best.filter("NOT same").select(
        "qid",
        F.col("vec_id").alias("neg_id"), F.col("s_micro").alias("neg_s_micro"))
    return pos.join(neg, "qid").select(
        "qid", "qlabel", "pos_id", "pos_s_micro", "neg_id", "neg_s_micro",
        (F.col("pos_s_micro") - F.col("neg_s_micro")).alias("margin_micro"),
    )
