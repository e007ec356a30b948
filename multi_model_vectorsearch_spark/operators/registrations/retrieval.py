"""Declared-query registrations for operators/retrieval.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import retrieval as RT
from multi_model_vectorsearch_spark.operators.registrations.base import DQ
from multi_model_vectorsearch_spark.operators.registrations.fragments import (
    _BM25_CTE,
    _cos,
)

DQS: list[DQ] = [
    DQ("dq63_bm25_topk", RT.dq63_bm25_topk,
       "WITH " + _BM25_CTE + " "
       "SELECT doc_id, CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro FROM bm25 "
       "ORDER BY s_micro DESC, doc_id LIMIT 20"),
    DQ("dq64_hybrid_rrf", RT.dq64_hybrid_rrf,
       "WITH " + _BM25_CTE + ", "
       "qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
       "sims AS (SELECT e.vec_id, CAST(floor((" + _cos("e", "qq")
       + ") * 1000000.0 + 0.5) AS BIGINT) AS s_micro "
       "FROM embeddings e CROSS JOIN qq), "
       "varm AS (SELECT vec_id AS id, rv FROM (SELECT vec_id, "
       "row_number() OVER (ORDER BY s_micro DESC, vec_id) AS rv FROM sims) v "
       "WHERE rv <= 50), "
       "ls AS (SELECT doc_id, CAST(floor(raw * 1000000.0 + 0.5) AS BIGINT) "
       "AS s_micro FROM bm25), "
       "larm AS (SELECT doc_id AS id, rl FROM (SELECT doc_id, "
       "row_number() OVER (ORDER BY s_micro DESC, doc_id) AS rl FROM ls) l "
       "WHERE rl <= 50), "
       "fused AS (SELECT coalesce(v.id, l.id) AS id, "
       "CAST(floor((coalesce(1.0 / (60 + v.rv), 0) "
       "+ coalesce(1.0 / (60 + l.rl), 0)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS rrf_micro FROM varm v FULL OUTER JOIN larm l ON v.id = l.id) "
       "SELECT id, rrf_micro FROM fused ORDER BY rrf_micro DESC, id LIMIT 10"),
    DQ("dq123_tfidf_keywords", RT.dq123_tfidf_keywords,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "dfq AS (SELECT tok, count(*) AS df FROM "
       "(SELECT DISTINCT doc_id, tok FROM toks) x GROUP BY tok), "
       "nd AS (SELECT count(*) AS n_docs FROM documents), "
       "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks "
       "WHERE doc_id < 100 GROUP BY doc_id, tok), "
       "sc AS (SELECT doc_id, tf.tok, "
       "CAST(floor((tf * ln(n_docs / df)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS score_micro "
       "FROM tf JOIN dfq ON tf.tok = dfq.tok CROSS JOIN nd), "
       "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
       "ORDER BY score_micro DESC, tok) AS rn FROM sc) "
       "SELECT doc_id, tok, score_micro, CAST(rn AS INT) AS rn FROM r "
       "WHERE rn <= 3 ORDER BY doc_id, rn"),
    DQ("dq185_inverted_index", RT.dq185_inverted_index,
       "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
       "FROM documents), "
       "tf AS (SELECT tok, doc_id, count(*) AS tf FROM toks "
       "GROUP BY tok, doc_id), "
       "r AS (SELECT tok, doc_id, "
       "count(*) OVER (PARTITION BY tok) AS df, "
       "CAST(sum(tf) OVER (PARTITION BY tok) AS BIGINT) AS total_tf, "
       "row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn FROM tf) "
       "SELECT tok, max(df) AS df, max(total_tf) AS total_tf, "
       "array_to_string(list_sort(list(doc_id)), ',') AS postings_head "
       "FROM r WHERE df >= 5 AND rn <= 8 GROUP BY tok"),
    DQ("dq218_phrase_search", RT.dq218_phrase_search,
       # 1-based generate_subscripts vs Spark's 0-based posexplode: the
       # oracle subtracts 1 from its positions
       "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
       "generate_subscripts(string_split(text, ' '), 1) AS idx "
       "FROM documents), "
       "bgc AS (SELECT a.tok || ' ' || b.tok AS bg, count(*) AS c "
       "FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1 "
       "GROUP BY bg), "
       "top AS (SELECT bg AS phrase, "
       "string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2 "
       "FROM bgc ORDER BY c DESC, bg LIMIT 1), "
       "hits AS (SELECT a.doc_id, top.phrase, a.idx - 1 AS pos "
       "FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1 "
       "CROSS JOIN top WHERE a.tok = top.w1 AND b.tok = top.w2) "
       "SELECT doc_id, phrase, count(*) AS n_occ, "
       "CAST(min(pos) AS INT) AS first_pos FROM hits "
       "GROUP BY doc_id, phrase"),
]
