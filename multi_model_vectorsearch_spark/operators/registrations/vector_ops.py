"""Declared-query registrations for operators/vector_ops.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import vector_ops as V
from multi_model_vectorsearch_spark.operators.registrations.base import DQ
from multi_model_vectorsearch_spark.operators.registrations.fragments import (
    _cos,
)

DQS: list[DQ] = [
    DQ("dq29_knn_topk", V.dq29_knn_topk,
       "WITH qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
       "SELECT e.vec_id, CAST(floor((" + _cos("e", "qq")
       + ") * 1000000.0 + 0.5) AS BIGINT) AS s_micro "
       "FROM embeddings e CROSS JOIN qq "
       "ORDER BY s_micro DESC, vec_id LIMIT 10"),
    DQ("dq30_l2_normalize", V.dq30_l2_normalize,
       "SELECT vec_id, CAST(floor(sqrt(list_sum(list_transform("
       "list_transform(CAST(embedding AS DOUBLE[]), "
       "x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), y -> y*y)))), "
       "x -> x*x))) * 1000000.0 + 0.5) AS BIGINT) AS one_micro FROM embeddings"),
    DQ("dq31_knn_join", V.dq31_knn_join,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings "
       "WHERE vec_id < 20), "
       "sims AS (SELECT q.qid, e.vec_id, "
       "CAST(floor((CASE WHEN e.vec_id = q.qid THEN 1.0 "
       "ELSE " + _cos("e", "q") + " END) * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro FROM embeddings e CROSS JOIN q), "
       "ranked AS (SELECT qid, vec_id, s_micro, CAST(row_number() OVER "
       "(PARTITION BY qid ORDER BY s_micro DESC, vec_id) AS INT) AS rnk "
       "FROM sims) "
       "SELECT qid, rnk, vec_id, s_micro FROM ranked WHERE rnk <= 5"),
    DQ("dq32_modality_balanced_topk", V.dq32_modality_balanced_topk,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv, label % 3 AS qm "
       "FROM embeddings WHERE vec_id = 0), "
       "sims AS (SELECT e.vec_id, "
       "CAST(floor((CASE WHEN e.vec_id = q.qid THEN 1.0 "
       "ELSE " + _cos("e", "q") + " END) * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro, "
       "CAST((e.label % 3) = q.qm AS INT) AS same_mod "
       "FROM embeddings e CROSS JOIN q), "
       "ranked AS (SELECT *, row_number() OVER (PARTITION BY same_mod "
       "ORDER BY s_micro DESC, vec_id) AS rn FROM sims) "
       "SELECT vec_id, s_micro, same_mod FROM ranked WHERE rn <= 5 "
       "ORDER BY s_micro DESC, vec_id LIMIT 10"),
    DQ("dq108_int8_quantize", V.dq108_int8_quantize,
       "WITH u AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x "
       "FROM embeddings), "
       "s AS (SELECT vec_id, max(abs(x)) / 127.0 AS scale FROM u "
       "GROUP BY vec_id), "
       "q AS (SELECT u.vec_id, x, scale, "
       "greatest(-127, least(127, floor(x / scale + 0.5))) AS qi "
       "FROM u JOIN s USING (vec_id)) "
       "SELECT vec_id, CAST(sum(qi) AS BIGINT) AS qsum, "
       "CAST(floor(max(scale) * 1000000.0 + 0.5) AS BIGINT) AS scale_micro, "
       "CAST(floor(sqrt(sum(pow(x - qi * scale, 2))) * 1000000.0 + 0.5) "
       "AS BIGINT) AS l2_err_micro "
       "FROM q GROUP BY vec_id"),
    DQ("dq109_matryoshka_knn", V.dq109_matryoshka_knn,
       "WITH q AS (SELECT CAST(embedding[1:16] AS DOUBLE[]) AS qv "
       "FROM embeddings WHERE vec_id = 0) "
       "SELECT e.vec_id, CAST(floor(list_cosine_similarity("
       "CAST(e.embedding[1:16] AS DOUBLE[]), q.qv) * 1000000.0 + 0.5) "
       "AS BIGINT) AS s_micro "
       "FROM embeddings e CROSS JOIN q "
       "ORDER BY s_micro DESC, vec_id LIMIT 10"),
    DQ("dq110_hamming_knn", V.dq110_hamming_knn,
       "WITH u AS (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS x "
       "FROM embeddings, range(64) r(i)), "
       "sigs AS (SELECT vec_id, "
       "CAST(sum(CASE WHEN i < 32 AND x > 0 THEN CAST(pow(2, i) AS BIGINT) "
       "ELSE 0 END) AS BIGINT) AS lo, "
       "CAST(sum(CASE WHEN i >= 32 AND x > 0 THEN CAST(pow(2, i - 32) "
       "AS BIGINT) ELSE 0 END) AS BIGINT) AS hi "
       "FROM u GROUP BY vec_id), "
       "q AS (SELECT lo AS qlo, hi AS qhi FROM sigs WHERE vec_id = 0) "
       "SELECT s.vec_id, CAST(bit_count(xor(s.lo, qlo)) "
       "+ bit_count(xor(s.hi, qhi)) AS INT) AS hd "
       "FROM sigs s CROSS JOIN q ORDER BY hd, vec_id LIMIT 10"),
    DQ("dq138_prenorm_dot_knn", V.dq138_prenorm_dot_knn,
       "WITH unit AS (SELECT vec_id, list_transform("
       "CAST(embedding AS DOUBLE[]), x -> x / sqrt(list_sum(list_transform("
       "CAST(embedding AS DOUBLE[]), y -> y * y)))) AS nv FROM embeddings), "
       "q AS (SELECT nv AS qnv FROM unit WHERE vec_id = 0) "
       "SELECT u.vec_id, CAST(floor(list_inner_product(u.nv, q.qnv) "
       "* 1000000.0 + 0.5) AS BIGINT) AS s_micro "
       "FROM unit u CROSS JOIN q ORDER BY s_micro DESC, vec_id LIMIT 10"),
    DQ("dq145_filtered_knn", V.dq145_filtered_knn,
       "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
       "SELECT e.vec_id, CAST(floor((" + _cos("e", "q")
       + ") * 1000000.0 + 0.5) AS BIGINT) AS s_micro "
       "FROM embeddings e CROSS JOIN q WHERE e.label % 3 = 1 "
       "ORDER BY s_micro DESC, vec_id LIMIT 10"),
    DQ("dq146_grouped_maxsim", V.dq146_grouped_maxsim,
       "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
       "scored AS (SELECT label, vec_id, CAST(floor((" + _cos("e", "q")
       + ") * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro FROM embeddings e CROSS JOIN q), "
       "best AS (SELECT label, vec_id AS best_vec, s_micro FROM "
       "(SELECT *, row_number() OVER (PARTITION BY label "
       "ORDER BY s_micro DESC, vec_id) AS rn FROM scored) r WHERE rn = 1) "
       "SELECT label, best_vec, s_micro FROM best "
       "ORDER BY s_micro DESC, label LIMIT 5"),
    DQ("dq147_mutual_knn", V.dq147_mutual_knn,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings "
       "WHERE vec_id < 100), "
       "sims AS (SELECT q.qid, e.vec_id, round(CASE WHEN e.vec_id = q.qid "
       "THEN 1.0 ELSE " + _cos("e", "q") + " END, 6) AS s "
       "FROM embeddings e CROSS JOIN q), "
       "ranked AS (SELECT qid, vec_id, s, CAST(row_number() OVER "
       "(PARTITION BY qid ORDER BY s DESC, vec_id) AS INT) AS rnk "
       "FROM sims), "
       "topk AS (SELECT qid, vec_id, rnk FROM ranked WHERE rnk <= 5) "
       "SELECT x.qid AS a, x.vec_id AS b, x.rnk AS ra, y.rnk AS rb "
       "FROM topk x JOIN topk y ON x.qid = y.vec_id AND x.vec_id = y.qid "
       "WHERE x.qid < x.vec_id"),
    DQ("dq149_diversity_filter", V.dq149_diversity_filter,
       "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
       "cand AS (SELECT e.vec_id, "
       "CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
       "CAST(q.qv AS DOUBLE[])) * 1000000.0 + 0.5) AS BIGINT) AS s_micro, "
       "e.embedding "
       "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0 "
       "ORDER BY s_micro DESC, e.vec_id LIMIT 50), "
       "ranked AS (SELECT vec_id, s_micro, embedding, "
       "CAST(row_number() OVER (ORDER BY s_micro DESC, vec_id) AS INT) "
       "AS rank FROM cand), "
       "blocked AS (SELECT DISTINCT lo.vec_id FROM ranked lo JOIN ranked hi "
       "ON hi.rank < lo.rank "
       "AND CAST(floor(list_cosine_similarity(CAST(lo.embedding AS DOUBLE[]), "
       "CAST(hi.embedding AS DOUBLE[])) * 1000000.0 + 0.5) AS BIGINT) "
       ">= 250000) "
       "SELECT vec_id, s_micro, rank FROM ranked "
       "WHERE vec_id NOT IN (SELECT vec_id FROM blocked)"),
    DQ("dq154_centroid_drift", V.dq154_centroid_drift,
       "WITH e AS (SELECT label, vec_id % 2 AS half, p AS pos, "
       "CAST(embedding[p + 1] AS DOUBLE) AS v FROM embeddings "
       "CROSS JOIN (SELECT CAST(range AS INT) AS p FROM range(0, 64)) r), "
       "dims AS (SELECT label, pos, "
       "avg(CASE WHEN half = 0 THEN v END) AS a, "
       "avg(CASE WHEN half = 1 THEN v END) AS b FROM e GROUP BY label, pos), "
       "counts AS (SELECT label, "
       "CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, "
       "CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 "
       "FROM embeddings GROUP BY label), "
       "drift AS (SELECT label, CAST(floor((sum(a * b) / sqrt(sum(a * a)) "
       "/ sqrt(sum(b * b))) * 1000000.0 + 0.5) AS BIGINT) "
       "AS drift_cos_micro FROM dims GROUP BY label) "
       "SELECT label, n0, n1, drift_cos_micro "
       "FROM counts JOIN drift USING (label)"),
    DQ("dq170_knn_label_prop", V.dq170_knn_label_prop,
       # BIT-identical fold to the engine: sequential left fold with 0.0
       # init (list_reduce over list_prepend ≡ Spark's aggregate), the
       # same 1e-12 norm floor — so the doubles match to the last bit;
       # the grid snap is floor(s·1e6 + 0.5) (engine-identical IEEE ops,
       # unlike round() — Spark rounds the shortest decimal repr, DuckDB
       # the binary value); everything after the snap is exact integer
       # arithmetic (·60/n is an integer since 60 = lcm(1..5))
       "WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev "
       "FROM embeddings), "
       "unit AS (SELECT vec_id, label, list_transform(ev, x -> x / "
       "greatest(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
       "list_transform(ev, y -> y * y)), (acc, x2) -> acc + x2)), "
       "CAST(1e-12 AS DOUBLE))) AS nv FROM v), "
       "s AS (SELECT vec_id AS sid, label, nv AS sv FROM unit "
       "WHERE vec_id < 100), "
       "c AS (SELECT vec_id AS qid, label AS tl, nv AS qv FROM unit "
       "WHERE vec_id >= 100), "
       "sims AS (SELECT c.qid, c.tl, s.sid, s.label, "
       "CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
       "list_transform(generate_series(1, len(c.qv)), "
       "i -> c.qv[i] * s.sv[i])), (acc, x2) -> acc + x2) "
       "* 1000000 + 0.5) AS BIGINT) AS se6 FROM c CROSS JOIN s), "
       "top AS (SELECT * FROM (SELECT qid, tl, sid, label, se6, "
       "row_number() OVER (PARTITION BY qid ORDER BY se6 DESC, sid) AS rn "
       "FROM sims) t WHERE rn <= 5), "
       "votes AS (SELECT qid, tl, label, CAST(count(*) AS INT) AS n_votes, "
       "(sum(se6) * 60) // count(*) AS m60 "
       "FROM top GROUP BY qid, tl, label) "
       "SELECT qid, label AS pred_label, tl AS true_label, n_votes, "
       "CAST(floor(m60 / 60000000.0 * 1000000.0 + 0.5) AS BIGINT) "
       "AS mean_sim_micro "
       "FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY "
       "n_votes DESC, m60 DESC, label) AS vr FROM votes) v2 "
       "WHERE vr = 1"),
    DQ("dq182_hard_negatives", V.dq182_hard_negatives,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel "
       "FROM embeddings WHERE vec_id < 20), "
       "sims AS (SELECT q.qid, q.qlabel, e.vec_id, e.label AS neg_label, "
       "CAST(floor((" + _cos("e", "q") + ") * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro "
       "FROM embeddings e CROSS JOIN q WHERE e.label != q.qlabel), "
       "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid "
       "ORDER BY s_micro DESC, vec_id) AS INT) AS rnk FROM sims) "
       "SELECT qid, qlabel, rnk, vec_id, neg_label, s_micro FROM ranked "
       "WHERE rnk <= 5"),
    DQ("dq194_training_triplets", V.dq194_training_triplets,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel "
       "FROM embeddings WHERE vec_id < 20), "
       "sims AS (SELECT q.qid, q.qlabel, e.vec_id, e.label, "
       "e.label = q.qlabel AS same, "
       "CAST(floor((" + _cos("e", "q") + ") * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro "
       "FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid), "
       "best AS (SELECT * FROM (SELECT *, row_number() OVER "
       "(PARTITION BY qid, same ORDER BY s_micro DESC, vec_id) AS rn "
       "FROM sims) r WHERE rn = 1) "
       "SELECT p.qid, p.qlabel, p.vec_id AS pos_id, "
       "p.s_micro AS pos_s_micro, "
       "n.vec_id AS neg_id, n.s_micro AS neg_s_micro, "
       "p.s_micro - n.s_micro AS margin_micro "
       "FROM (SELECT * FROM best WHERE same) p "
       "JOIN (SELECT * FROM best WHERE NOT same) n ON p.qid = n.qid"),
]
