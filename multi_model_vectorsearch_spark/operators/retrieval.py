"""Lexical + hybrid retrieval: BM25 scoring and reciprocal-rank fusion.

The reference searches purely by embedding similarity (main.py:206-254). A
production corpus engine pairs that with lexical scoring — exact-term recall
that embeddings miss — and fuses the two rankings. Both operators are pure
DataFrame plans:

- BM25: tf / df / doc-length statistics are three hash aggregations over the
  token stream; the per-(doc, term) score is one expression; final top-k is
  `TakeOrderedAndProject`. The df and corpus-stats sides are tiny (one row
  per query term / one row total) and broadcast.
- RRF: rank-based fusion `Σ 1/(k0 + rank)` — integer ranks make it exactly
  reproducible across engines, unlike score-scale-sensitive linear blends.

At 100 TB the token stream is the big object; it shuffles once per
aggregation on (doc_id[, tok]) keys. A real deployment materializes the tf
table (an inverted index) with `write_bucketed` on tok.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multi_model_vectorsearch_spark.functions.fixedpoint import snap
from multi_model_vectorsearch_spark.operators.vector_ops import similarity_scan

Tables = dict

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K0 = 60  # standard reciprocal-rank-fusion constant
QUERY_TERMS = ("vector", "merge", "stream")


def _bm25_scores(t: Tables, terms: tuple[str, ...]) -> DataFrame:
    d = t["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * (BM25_K1 + 1.0) / norm
    return (
        tf.join(F.broadcast(dfs), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("raw"))
    )


def dq63_bm25_topk(t: Tables, k: int = 20,
                   terms: tuple[str, ...] = QUERY_TERMS) -> DataFrame:
    """Lexical top-k for a fixed keyword query under BM25."""
    scored = _bm25_scores(t, terms)
    return (
        scored.select("doc_id", snap(F.col("raw")).alias("s_micro"))
        .orderBy(F.desc("s_micro"), F.asc("doc_id"))
        .limit(k)
    )


def dq64_hybrid_rrf(t: Tables, query_vec_id: int = 0, k: int = 10,
                    arm_k: int = 50,
                    terms: tuple[str, ...] = QUERY_TERMS) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion of cosine KNN and BM25 arms.

    Both arms produce their top-`arm_k` ranks independently (doc_id and
    vec_id share the id domain in the fixtures); fusion is a full outer
    join — a doc found by only one arm still scores. Ranks, not raw scores,
    cross the fusion boundary, so the two arms' score scales never need
    calibration.
    """
    # Each arm's top-k is orderBy().limit() — TakeOrderedAndProject, a
    # per-partition heap + driver merge — NOT a global row_number() window,
    # which would funnel every scored corpus row through one task. Ranks
    # over the ≤ arm_k-row result come from one sorted-array posexplode
    # (r15): identical to row_number over (s_micro desc, id asc) — the
    # negated score makes the struct sort ascending — with no partitionless
    # WindowExec left anywhere in the plan.
    def ranked_arm(pool, id_col: str, rank_name: str):
        arr = pool.agg(F.sort_array(F.collect_list(F.struct(
            (-F.col("s_micro")).alias("ns"),
            F.col(id_col).alias("id")))).alias("a"))
        return arr.select(
            F.posexplode("a").alias("pos", "r")
        ).select(F.col("r.id").alias("id"),
                 (F.col("pos") + 1).cast("int").alias(rank_name))

    vec_arm = ranked_arm(
        similarity_scan(t, f"vec_id = {query_vec_id}", pin_self=False)
        .select("vec_id", "s_micro")
        .orderBy(F.desc("s_micro"), F.asc("vec_id"))
        .limit(arm_k), "vec_id", "rv")
    lex_arm = ranked_arm(
        _bm25_scores(t, terms)
        .select("doc_id", snap(F.col("raw")).alias("s_micro"))
        .orderBy(F.desc("s_micro"), F.asc("doc_id"))
        .limit(arm_k), "doc_id", "rl")
    fused = vec_arm.join(lex_arm, "id", "full_outer").select(
        "id",
        snap(
            F.coalesce(1.0 / (RRF_K0 + F.col("rv")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K0 + F.col("rl")), F.lit(0.0)),
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("id")).limit(k)


def dq123_tfidf_keywords(t: Tables, top: int = 3, max_doc: int = 100) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf·idf.

    The classic complement to dq63's BM25 ranking: idf comes from the FULL
    corpus (document frequency is a global statistic — one groupBy on term,
    broadcast back), while the keyword windowing is restricted to a doc
    subset only to bound declared-query output. tf·ln(N/df) per (doc, term)
    is map-side after the broadcast; the per-doc top-k is a window on the
    (doc, term) aggregate, partitioned exactly like the tf groupBy so the
    two stages share one shuffle.
    """
    toks = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    df_ = (
        toks.distinct().groupBy("tok").agg(F.count("*").alias("df"))
    )
    n_docs = t["documents"].agg(F.count("*").alias("n_docs"))
    tf = (
        toks.filter(F.col("doc_id") < max_doc)
        .groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "tok",
            snap(F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .select("doc_id", "tok", "score_micro", "rn")
        .orderBy("doc_id", "rn")
    )


def dq185_inverted_index(t: Tables, min_df: int = 5,
                         max_postings: int = 8) -> DataFrame:
    """Inverted-index build: per term, document frequency, total term
    frequency, and the first ``max_postings`` doc_ids of the (sorted)
    posting list — the materialization BM25 (dq63) notes a deployment
    would persist via ``write_bucketed(tok)``.

    One tf aggregation on (doc_id, tok), then df/total_tf/rank in a single
    window pass over the tok partitioning, and a final collect of ONLY the
    ``rn <= max_postings`` survivors — the collect is bounded per term, so
    a stop-word's million-doc posting list can't blow up a reducer (the
    naive ``slice(sort_array(collect_list()))`` form buffers the full list
    before slicing). The groupBy after the window reuses the same tok
    hash partitioning, so the whole build is two exchanges of the token
    stream. ``min_df`` prunes the hapax tail, which at 100 TB is most of
    the vocabulary.
    """
    d = t["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("tok")
    ranked = tf.select(
        "tok", "doc_id",
        F.count("*").over(w).alias("df"),
        F.sum("tf").over(w).alias("total_tf"),
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
    ).filter((F.col("df") >= min_df) & (F.col("rn") <= max_postings))
    return (
        ranked.groupBy("tok")
        .agg(
            F.first("df").alias("df"),
            F.first("total_tf").alias("total_tf"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
            .alias("postings_head"),
        )
    )


def dq218_phrase_search(t: Tables) -> DataFrame:
    """Positional phrase search: find every occurrence of the corpus's
    most frequent word bigram as an EXACT adjacent-position phrase — the
    positional-postings operation (dq185's inverted index carries only
    doc-level postings) that backs quoted-phrase queries and exact-span
    contamination checks.

    The target phrase is derived from the data (top count, lexicographic
    tie-break), so the query is self-contained and deterministic. Postings
    are (doc_id, position) pairs; the phrase match is a join of the
    target's two words on adjacent positions — at scale the bigram-count
    side is a tiny aggregate joined broadcast, and the positional join
    shuffles once on (doc_id). Counts and positions are exact integers.
    """
    d = t["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    bg = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(F.expr(
                "transform(slice(w, 1, size(w) - 1), "
                "(x, i) -> concat(x, ' ', w[i + 1]))")).alias("bg"),
        )
    )
    counts = bg.groupBy("bg").agg(F.count("*").alias("c"))
    top = (
        counts.orderBy(F.desc("c"), F.asc("bg")).limit(1)
        .select(F.col("bg").alias("phrase"))
    )
    tgt = top.select(
        "phrase",
        F.split_part(F.col("phrase"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("phrase"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    p1 = toks.crossJoin(F.broadcast(tgt)).filter(
        F.col("tok") == F.col("w1")).select("doc_id", "pos", "phrase")
    p2 = toks.crossJoin(F.broadcast(tgt.select("w2"))).filter(
        F.col("tok") == F.col("w2")).select(
            F.col("doc_id").alias("d2"), F.col("pos").alias("pos2"))
    hits = p1.join(
        p2,
        (F.col("doc_id") == F.col("d2"))
        & (F.col("pos2") == F.col("pos") + 1),
    )
    return hits.groupBy("doc_id", "phrase").agg(
        F.count("*").alias("n_occ"),
        F.min("pos").alias("first_pos"),
    )
