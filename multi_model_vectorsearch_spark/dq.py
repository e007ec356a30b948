"""Declared-query registry: name → (Spark builder, DuckDB oracle SQL).

This is the engine's correctness contract (SURVEY.md §2.3): every operator
claimed in the inventory has a declared query over the driver testdata whose
result must hash-match the DuckDB oracle at sf0.01. Builders return
DataFrames; oracles are ANSI-ish SQL in DuckDB dialect over the same parquet
tables (pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings).

Column names and types are aligned on both sides (the comparison sorts
columns by name and hashes values order-insensitively).

DuckDB dialect shims used in oracles (SURVEY.md §5.3 rule 4):
``len``/``size``, ``[i]``/``element_at``, ``sha256``/``sha2``,
``json_extract_string``/``get_json_object``, ``string_split+unnest``/
``split+explode``, ``list_sort(list())``/``sort_array(collect_list())``,
``epoch_us``/``unix_micros``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from multi_model_vectorsearch_spark.operators import graph as G
from multi_model_vectorsearch_spark.operators import relational as R
from multi_model_vectorsearch_spark.operators import vector_ops as V
from multi_model_vectorsearch_spark.operators import windows_batch as W
from multi_model_vectorsearch_spark.sources.registry import load_tables


@dataclass(frozen=True)
class DQ:
    name: str
    builder: Callable[[dict], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    note: str = ""


def _run(builder: Callable[[dict], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return builder(load_tables(spark, sf_dir))
    return runner


# --- DuckDB oracle SQL fragments for the vector/graph suite -----------------

def _cos(e: str, q: str) -> str:
    return f"list_cosine_similarity(CAST({e}.embedding AS DOUBLE[]), CAST({q}.qv AS DOUBLE[]))"


_SEEDS_CTE = (
    "qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "seeds AS (SELECT e.vec_id, round("
    + _cos("e", "qq")
    + ", 6) AS s FROM embeddings e CROSS JOIN qq ORDER BY s DESC, vec_id LIMIT 10)"
)

_EDGES_CTE = (
    "q AS (SELECT vec_id AS qid, embedding AS qv, label % 3 AS qm FROM embeddings "
    "WHERE vec_id < 20), "
    "sims AS (SELECT q.qid, q.qm, e.vec_id, e.label % 3 AS em, "
    "round(CASE WHEN e.vec_id = q.qid THEN 1.0 ELSE " + _cos("e", "q") + " END, 6) AS s "
    "FROM embeddings e CROSS JOIN q), "
    "ranked AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) "
    "AS rnk FROM sims), "
    "pairs AS (SELECT * FROM ranked WHERE rnk <= 5 AND vec_id <> qid), "
    "edges AS (SELECT least(qid, vec_id) AS src, greatest(qid, vec_id) AS dst, "
    "round(max(CASE WHEN qm <> em THEN greatest(s, 0.8) ELSE s END), 6) AS score "
    "FROM pairs GROUP BY src, dst)"
)


_REGISTRY: list[DQ] = [
    DQ("dq01_scan_project", R.dq01_scan_project,
       "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"),
    DQ("dq02_filter_battery", R.dq02_filter_battery,
       "SELECT o_orderkey FROM orders "
       "WHERE o_totalprice BETWEEN 1000 AND 5000 AND o_orderstatus IN ('O','F') "
       "AND o_orderpriority LIKE '%URGENT%'"),
    DQ("dq03_case_expr", R.dq03_case_expr,
       "SELECT l_orderkey, l_linenumber, "
       "CASE WHEN l_discount > 0.05 THEN 'HI' WHEN l_discount > 0.02 THEN 'MID' "
       "ELSE 'LO' END AS band FROM lineitem"),
    DQ("dq04_join_broadcast", R.dq04_join_broadcast,
       "SELECT c_custkey, n_name, r_name FROM customer "
       "JOIN nation ON c_nationkey = n_nationkey "
       "JOIN region ON n_regionkey = r_regionkey"),
    DQ("dq05_left_outer", R.dq05_left_outer,
       "SELECT c_custkey, o_orderkey FROM customer "
       "LEFT JOIN orders ON c_custkey = o_custkey"),
    DQ("dq06_left_semi", R.dq06_left_semi,
       "SELECT c_custkey FROM customer c "
       "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    DQ("dq07_left_anti", R.dq07_left_anti,
       "SELECT c_custkey FROM customer c "
       "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
    DQ("dq08_range_join", R.dq08_range_join,
       "SELECT s_suppkey, c_custkey FROM supplier JOIN customer "
       "ON c_acctbal BETWEEN s_acctbal - 10 AND s_acctbal + 10"),
    DQ("dq09_asof_join", R.dq09_asof_join,
       "SELECT e.event_id, max(o.o_orderkey) AS ok FROM events e JOIN orders o "
       "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts GROUP BY e.event_id"),
    DQ("dq10_hash_agg", R.dq10_hash_agg,
       "SELECT l_returnflag, l_linestatus, "
       "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sq, "
       "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sp, "
       "count(*) AS c FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    DQ("dq11_count_distinct", R.dq11_count_distinct,
       "SELECT o_orderstatus, count(DISTINCT o_custkey) AS u FROM orders "
       "GROUP BY o_orderstatus"),
    DQ("dq12_rollup", R.dq12_rollup,
       "SELECT n_name, o_orderstatus, count(*) AS c, "
       "CAST(grouping(n_name) AS INT) AS g1, "
       "CAST(grouping(o_orderstatus) AS INT) AS g2 "
       "FROM orders JOIN customer ON o_custkey = c_custkey "
       "JOIN nation ON c_nationkey = n_nationkey "
       "GROUP BY ROLLUP(n_name, o_orderstatus)"),
    DQ("dq13_ordered_collect", R.dq13_ordered_collect,
       "SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') "
       "AS orderkeys FROM orders GROUP BY o_custkey"),
    DQ("dq14_conditional_agg", R.dq14_conditional_agg,
       "SELECT user_id, "
       "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases, "
       "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors "
       "FROM events GROUP BY user_id"),
    DQ("dq15_topk_per_group", R.dq15_topk_per_group,
       "SELECT * FROM (SELECT o_custkey, o_orderkey, "
       "CAST(row_number() OVER (PARTITION BY o_custkey "
       "ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn FROM orders) t "
       "WHERE rn <= 3"),
    DQ("dq16_lag", R.dq16_lag,
       "SELECT event_id, lag(event_type) OVER "
       "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events"),
    DQ("dq17_running_sum", R.dq17_running_sum,
       "SELECT event_id, round(sum(value) OVER (PARTITION BY user_id "
       "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) "
       "AS rs FROM events"),
    DQ("dq18_ntile", R.dq18_ntile,
       "SELECT c_custkey, CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) "
       "AS q FROM customer"),
    DQ("dq19_union", R.dq19_union,
       "SELECT o_custkey AS x FROM orders UNION SELECT user_id FROM events"),
    DQ("dq20_intersect_except", R.dq20_intersect_except,
       "SELECT x, 'intersect' AS op FROM "
       "(SELECT o_custkey AS x FROM orders INTERSECT SELECT user_id FROM events) "
       "UNION ALL "
       "SELECT x, 'except' AS op FROM "
       "(SELECT o_custkey AS x FROM orders EXCEPT SELECT user_id FROM events)"),
    DQ("dq21_string_battery", R.dq21_string_battery,
       "SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt, "
       "CAST(length(p_name) AS INT) AS ln, substr(p_name, 1, 5) AS s5, "
       "replace(p_type, ' ', '_') AS rp, p_brand || ':' || p_name AS cc FROM part"),
    DQ("dq22_datetime_battery", R.dq22_datetime_battery,
       "SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y, "
       "CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m, "
       "CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d FROM orders"),
    DQ("dq23_math_battery", R.dq23_math_battery,
       "SELECT l_orderkey, l_linenumber, round(sqrt(l_quantity), 6) AS sq, "
       "round(ln(l_extendedprice), 6) AS lp, "
       "round(abs(l_discount - 0.05), 6) AS ad, "
       "l_orderkey % 7 AS md FROM lineitem"),
    DQ("dq24_array_battery", R.dq24_array_battery,
       "SELECT vec_id, CAST(len(embedding) AS INT) AS n, "
       "round(CAST(embedding[1] AS DOUBLE), 6) AS e1, "
       "round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS s FROM embeddings"),
    DQ("dq25_json_extract", R.dq25_json_extract,
       "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k "
       "FROM events"),
    DQ("dq26_tokenize_explode", R.dq26_tokenize_explode,
       "SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq FROM "
       "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t "
       "GROUP BY doc_id"),
    DQ("dq27_sha256", R.dq27_sha256,
       "SELECT doc_id, sha256(text) AS h FROM documents"),
    DQ("dq28_dedup_by_hash", R.dq28_dedup_by_hash,
       "SELECT h, min(doc_id) AS keeper, count(*) AS dups FROM "
       "(SELECT doc_id, sha256(text) AS h FROM documents) t GROUP BY h"),
    # --- vector suite (B47-B50) ---------------------------------------------
    DQ("dq29_knn_topk", V.dq29_knn_topk,
       "WITH qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
       "SELECT e.vec_id, round(" + _cos("e", "qq") + ", 6) AS s "
       "FROM embeddings e CROSS JOIN qq ORDER BY s DESC, vec_id LIMIT 10"),
    DQ("dq30_l2_normalize", V.dq30_l2_normalize,
       "SELECT vec_id, round(sqrt(list_sum(list_transform("
       "list_transform(CAST(embedding AS DOUBLE[]), "
       "x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), y -> y*y)))), "
       "x -> x*x))), 6) AS one FROM embeddings"),
    DQ("dq31_knn_join", V.dq31_knn_join,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings "
       "WHERE vec_id < 20), "
       "sims AS (SELECT q.qid, e.vec_id, round(CASE WHEN e.vec_id = q.qid THEN 1.0 "
       "ELSE " + _cos("e", "q") + " END, 6) AS s FROM embeddings e CROSS JOIN q), "
       "ranked AS (SELECT qid, vec_id, s, CAST(row_number() OVER "
       "(PARTITION BY qid ORDER BY s DESC, vec_id) AS INT) AS rnk FROM sims) "
       "SELECT qid, rnk, vec_id, s FROM ranked WHERE rnk <= 5"),
    DQ("dq32_modality_balanced_topk", V.dq32_modality_balanced_topk,
       "WITH q AS (SELECT vec_id AS qid, embedding AS qv, label % 3 AS qm "
       "FROM embeddings WHERE vec_id = 0), "
       "sims AS (SELECT e.vec_id, round(CASE WHEN e.vec_id = q.qid THEN 1.0 "
       "ELSE " + _cos("e", "q") + " END, 6) AS s, "
       "CAST((e.label % 3) = q.qm AS INT) AS same_mod "
       "FROM embeddings e CROSS JOIN q), "
       "ranked AS (SELECT *, row_number() OVER (PARTITION BY same_mod "
       "ORDER BY s DESC, vec_id) AS rn FROM sims) "
       "SELECT vec_id, s, same_mod FROM ranked WHERE rn <= 5 "
       "ORDER BY s DESC, vec_id LIMIT 10"),
    # --- graph suite (B51-B52, A18-A22) -------------------------------------
    DQ("dq33_build_edges", G.dq33_build_edges,
       "WITH " + _EDGES_CTE + " SELECT src, dst, score FROM edges"),
    DQ("dq34_expand", G.dq34_expand,
       "WITH " + _EDGES_CTE + ", " + _SEEDS_CTE + ", "
       "neigh AS ("
       "SELECT e.dst AS id, round(s.s * e.score * 0.9, 6) AS score "
       "FROM seeds s JOIN edges e ON s.vec_id = e.src "
       "UNION ALL "
       "SELECT e.src AS id, round(s.s * e.score * 0.9, 6) AS score "
       "FROM seeds s JOIN edges e ON s.vec_id = e.dst "
       "UNION ALL SELECT vec_id AS id, s AS score FROM seeds) "
       "SELECT id, max(score) AS score FROM neigh GROUP BY id "
       "ORDER BY score DESC, id LIMIT 10"),
    DQ("dq35_hydrate_filter", G.dq35_hydrate_filter,
       "WITH " + _EDGES_CTE + ", "
       "valid AS (SELECT vec_id FROM embeddings WHERE label <> 9) "
       "SELECT src, dst, score FROM edges e "
       "WHERE EXISTS (SELECT 1 FROM valid v WHERE v.vec_id = e.src) "
       "AND EXISTS (SELECT 1 FROM valid v WHERE v.vec_id = e.dst)"),
    # --- streaming batch-equivalents (B41-B43) ------------------------------
    DQ("dq36_tumbling", W.dq36_tumbling,
       "SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws, event_type, "
       "count(*) AS c, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sv "
       "FROM events GROUP BY ws, event_type"),
    DQ("dq37_sliding", W.dq37_sliding,
       "WITH ev AS (SELECT (epoch_us(ts) // 1800000000) * 1800 AS s1, event_type, value "
       "FROM events), "
       "exploded AS (SELECT s1 AS ws, event_type, value FROM ev "
       "UNION ALL SELECT s1 - 1800 AS ws, event_type, value FROM ev) "
       "SELECT ws, event_type, count(*) AS c, "
       "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sv "
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
       "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sv "
       "FROM sess GROUP BY user_id, sid"),
]


def registry() -> list[DQ]:
    return list(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {dq.name: _run(dq.builder) for dq in _REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {dq.name: dq.oracle for dq in _REGISTRY if dq.oracle is not None}
