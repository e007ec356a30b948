"""Declared-query registrations for operators/embed.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import embed as E
from multi_model_vectorsearch_spark.operators.registrations.base import DQ
from multi_model_vectorsearch_spark.operators.registrations.fragments import (
    _EMB_CTE,
)

DQS: list[DQ] = [
    DQ("dq48_embed_stub", E.dq48_embed_stub,
       "WITH " + _EMB_CTE + ", "
       "e1s AS (SELECT doc_id, CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) "
       "AS e1_micro FROM nv WHERE p = 0), "
       "ones AS (SELECT doc_id, CAST(floor(sqrt(sum(x*x)) * 1000000.0 + 0.5) "
       "AS BIGINT) AS one_micro FROM nv "
       "GROUP BY doc_id) "
       "SELECT e1s.doc_id, CAST(16 AS INT) AS dim, e1s.e1_micro, "
       "ones.one_micro "
       "FROM e1s JOIN ones ON e1s.doc_id = ones.doc_id"),
    DQ("dq49_embed_knn", E.dq49_embed_knn,
       "WITH " + _EMB_CTE + ", "
       "q AS (SELECT p, x AS qx FROM nv WHERE doc_id = 0), "
       "cos AS (SELECT nv.doc_id, "
       "CAST(floor(sum(nv.x * q.qx) * 1000000.0 + 0.5) AS BIGINT) AS s_micro "
       "FROM nv JOIN q ON nv.p = q.p GROUP BY nv.doc_id) "
       "SELECT doc_id, s_micro FROM cos "
       "ORDER BY s_micro DESC, doc_id LIMIT 10"),
]
