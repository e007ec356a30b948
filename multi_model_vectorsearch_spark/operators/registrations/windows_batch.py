"""Declared-query registrations for operators/windows_batch.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import windows_batch as W
from multi_model_vectorsearch_spark.operators.registrations.base import DQ

DQS: list[DQ] = [
    DQ("dq36_tumbling", W.dq36_tumbling,
       "SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws, event_type, "
       "count(*) AS c, "
       "CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sv_cents "
       "FROM events GROUP BY ws, event_type"),
    DQ("dq37_sliding", W.dq37_sliding,
       "WITH ev AS (SELECT (epoch_us(ts) // 1800000000) * 1800 AS s1, event_type, value "
       "FROM events), "
       "exploded AS (SELECT s1 AS ws, event_type, value FROM ev "
       "UNION ALL SELECT s1 - 1800 AS ws, event_type, value FROM ev) "
       "SELECT ws, event_type, count(*) AS c, "
       "CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sv_cents "
       "FROM exploded GROUP BY ws, event_type"),
    DQ("dq38_session", W.dq38_session,
       "WITH ev AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events), "
       "flagged AS (SELECT user_id, tus, value, "
       "CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL "
       "OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) >= 1800000000 "
       "THEN 1 ELSE 0 END AS new_s FROM ev), "
       "sess AS (SELECT user_id, tus, value, sum(new_s) OVER (PARTITION BY user_id "
       "ORDER BY tus ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) "
       "SELECT user_id, min(tus) AS ss, count(*) AS c, "
       "CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sv_cents "
       "FROM sess GROUP BY user_id, sid"),
]
