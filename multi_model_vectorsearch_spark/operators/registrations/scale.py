"""Declared-query registrations for operators/scale.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import scale as S
from multi_model_vectorsearch_spark.operators.registrations.base import DQ
from multi_model_vectorsearch_spark.operators.registrations.fragments import (
    _spread_sql,
)

DQS: list[DQ] = [
    DQ("dq116_salted_agg", S.dq116_salted_agg,
       "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
       "CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) "
       "AS sum_value_cents, "
       "CAST(floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) "
       "/ count(*)) * 1000000.0 + 0.5) AS BIGINT) AS avg_value_micro "
       "FROM events GROUP BY event_type ORDER BY event_type"),
    DQ("dq171_global_ntile_scalable", S.dq171_global_ntile_scalable,
       "SELECT c_custkey, CAST(ntile(4) OVER "
       "(ORDER BY c_acctbal, c_custkey) AS INT) AS q FROM customer"),
    DQ("dq189_zorder_layout", S.dq189_zorder_layout,
       "WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS pk, "
       "CAST(l_suppkey AS BIGINT) AS sk FROM lineitem), "
       "bounds AS (SELECT min(pk) AS pk_lo, max(pk) AS pk_hi, "
       "min(sk) AS sk_lo, max(sk) AS sk_hi FROM li), "
       "binned AS (SELECT pk, sk, "
       "CAST(floor((pk - pk_lo) * 1024 / (pk_hi - pk_lo + 1)) AS BIGINT) "
       "AS px, "
       "CAST(floor((sk - sk_lo) * 1024 / (sk_hi - sk_lo + 1)) AS BIGINT) "
       "AS sx FROM li CROSS JOIN bounds), "
       "zed AS (SELECT pk, sk, "
       "((" + _spread_sql("px") + ") | ((" + _spread_sql("sx") + ") << 1)) "
       ">> 16 AS zb FROM binned) "
       "SELECT CAST(zb AS INT) AS zbucket, count(*) AS n_rows, "
       "min(pk) AS pk_min, max(pk) AS pk_max, "
       "min(sk) AS sk_min, max(sk) AS sk_max FROM zed GROUP BY zb"),
    DQ("dq201_compaction_plan", S.dq201_compaction_plan,
       "WITH s AS (SELECT o_orderdate AS d, count(*) AS n FROM orders "
       "GROUP BY o_orderdate), "
       "b AS (SELECT d, n, CAST(floor(COALESCE(SUM(n) OVER "
       "(ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
       "/ 500) AS BIGINT) AS bin FROM s) "
       # CAST: DuckDB types bare SUM as HUGEINT -> pandas float64 (r6 red)
       "SELECT bin, count(*) AS n_partitions, "
       "CAST(SUM(n) AS BIGINT) AS total_rows, "
       "CAST(min(d) AS DATE) AS d_min, CAST(max(d) AS DATE) AS d_max "
       "FROM b GROUP BY bin"),
]
