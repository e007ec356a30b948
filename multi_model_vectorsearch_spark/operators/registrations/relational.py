"""Declared-query registrations for operators/relational.py (split from dq.py)."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators import relational as R
from multi_model_vectorsearch_spark.operators.registrations.base import DQ

DQS: list[DQ] = [
    DQ("dq01_scan_project", R.dq01_scan_project,
       "SELECT l_orderkey, l_linenumber, CAST(floor((l_quantity) * 100.0 + 0.5) AS BIGINT) AS l_quantity_cents FROM lineitem"),
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
       "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sq_cents, "
       "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sp_cents, "
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
       "SELECT event_id, CAST(floor((sum(value) OVER (PARTITION BY user_id "
       "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
       "ROW)) * 100.0 + 0.5) AS BIGINT) AS rs_cents FROM events"),
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
       "SELECT l_orderkey, l_linenumber, CAST(floor((sqrt(l_quantity)) * 1000000.0 + 0.5) AS BIGINT) AS sq_micro, "
       "CAST(floor((ln(l_extendedprice)) * 1000000.0 + 0.5) AS BIGINT) AS lp_micro, "
       "CAST(floor((abs(l_discount - 0.05)) * 1000000.0 + 0.5) AS BIGINT) AS ad_micro, "
       "l_orderkey % 7 AS md FROM lineitem"),
    DQ("dq24_array_battery", R.dq24_array_battery,
       "SELECT vec_id, CAST(len(embedding) AS INT) AS n, "
       "CAST(floor((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS e1_micro, "
       "CAST(floor((list_sum(CAST(embedding AS DOUBLE[]))) * 1000000.0 + 0.5) AS BIGINT) AS s_micro FROM embeddings"),
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
    DQ("dq65_unpivot", R.dq65_unpivot,
       "SELECT o_orderkey, 'totalprice' AS metric, "
       "CAST(floor((CAST(o_totalprice AS DOUBLE)) * 100.0 + 0.5) AS BIGINT) AS val_cents FROM orders "
       "UNION ALL SELECT o_orderkey, 'custkey', "
       "CAST(floor((CAST(o_custkey AS DOUBLE)) * 100.0 + 0.5) AS BIGINT) FROM orders"),
    DQ("dq66_regex_battery", R.dq66_regex_battery,
       "SELECT p_partkey, "
       "regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS w1, "
       "CAST(len(regexp_extract_all(p_name, 'a')) AS INT) AS n_a, "
       "CAST(regexp_matches(p_name, '^b') AS INT) AS starts_b, "
       "regexp_replace(p_type, '[aeiou]', '', 'g') AS novowel FROM part"),
    DQ("dq67_null_battery", R.dq67_null_battery,
       "SELECT c_custkey, o_orderkey, "
       "coalesce(o_orderkey, -1) AS ok_filled, "
       "nullif(c_nationkey, 0) AS nk_nz, "
       "CAST(floor((greatest(c_acctbal, coalesce(o_totalprice, 0.0))) * 100.0 + 0.5) AS BIGINT) AS hi_cents, "
       "CAST(floor((least(c_acctbal, coalesce(o_totalprice, 1e18))) * 100.0 + 0.5) AS BIGINT) AS lo_cents, "
       "CAST(o_orderkey IS NULL AS INT) AS no_orders "
       "FROM customer LEFT JOIN orders ON c_custkey = o_custkey"),
    DQ("dq68_date_arith", R.dq68_date_arith,
       "SELECT o_orderkey, "
       "CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30, "
       "CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) "
       "AS days_since, "
       "last_day(o_orderdate) AS eom, "
       "CAST(date_trunc('month', o_orderdate) AS DATE) AS som, "
       "CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow, "
       "CAST(quarter(o_orderdate) AS INT) AS qtr FROM orders"),
    DQ("dq69_array_ops", R.dq69_array_ops,
       "SELECT doc_id, "
       "coalesce(array_to_string(list_sort(list_intersect("
       "string_split(text, ' '), ['the','data','spark'])), ','), '') AS hit, "
       "CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq, "
       "coalesce(array_to_string(list_sort(list_distinct("
       "string_split(text, ' ')))[1:3], ','), '') AS first3, "
       "CAST(list_contains(string_split(text, ' '), 'vector') AS INT) "
       "AS has_vector FROM documents"),
    DQ("dq57_approx_distinct", R.dq57_approx_distinct,
       # engine-specific HLL estimate stays out of the hash set; the
       # oracle checks the exact distinct + the est_ok bound as constant 1
       "SELECT o_orderstatus, "
       "CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_u, "
       "CAST(1 AS INT) AS est_ok FROM orders GROUP BY o_orderstatus",
       note="B20 HyperLogLog sketch — estimate is engine-specific "
            "(SURVEY.md §5.3 rule 5); hash checks exact_u + est_ok"),
    DQ("dq58_pivot", R.dq58_pivot,
       "SELECT o_orderstatus, "
       + ", ".join(
           f"CAST(count(*) FILTER (WHERE o_orderpriority = '{p}') AS BIGINT) "
           f"AS p{i + 1}"
           for i, p in enumerate(
               ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]))
       + " FROM orders GROUP BY o_orderstatus"),
    DQ("dq59_percentiles", R.dq59_percentiles,
       "SELECT l_returnflag, "
       "CAST(floor((quantile_cont(l_quantity, 0.25)) * 1000000.0 + 0.5) AS BIGINT) AS q25_micro, "
       "CAST(floor((quantile_cont(l_quantity, 0.5)) * 1000000.0 + 0.5) AS BIGINT) AS q50_micro, "
       "CAST(floor((quantile_cont(l_quantity, 0.75)) * 1000000.0 + 0.5) AS BIGINT) AS q75_micro "
       "FROM lineitem GROUP BY l_returnflag"),
    DQ("dq60_stats_agg", R.dq60_stats_agg,
       "SELECT l_returnflag, "
       "CAST(floor((stddev_samp(l_quantity)) * 1000000.0 + 0.5) AS BIGINT) AS sd_qty_micro, "
       "CAST(floor((var_samp(l_discount)) * 1000000.0 + 0.5) AS BIGINT) AS var_disc_micro, "
       "CAST(floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) AS BIGINT) AS corr_qp_micro, "
       "CAST(floor((covar_samp(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) AS BIGINT) AS cov_qp_micro "
       "FROM lineitem GROUP BY l_returnflag"),
    DQ("dq75_window_battery", R.dq75_window_battery,
       "SELECT o_orderkey, "
       "first_value(o_orderkey) OVER w AS best, "
       "nth_value(o_orderkey, 2) OVER w AS second, "
       "CAST(floor((cume_dist() OVER w) * 1000000.0 + 0.5) AS BIGINT) AS cd_micro, "
       "CAST(floor((percent_rank() OVER w) * 1000000.0 + 0.5) AS BIGINT) AS pr_micro "
       "FROM orders WINDOW w AS (PARTITION BY o_custkey "
       "ORDER BY o_totalprice DESC, o_orderkey)"),
    DQ("dq76_nullsafe_join", R.dq76_nullsafe_join,
       "WITH keyed AS (SELECT o_orderkey, "
       "CASE WHEN o_orderkey % 50 != 0 THEN o_custkey END AS pk FROM orders) "
       "SELECT a.pk AS p1, count(*) AS pairs, "
       "count(DISTINCT a.o_orderkey) AS lhs "
       "FROM keyed a JOIN keyed b "
       "ON a.pk IS NOT DISTINCT FROM b.pk AND a.o_orderkey < b.o_orderkey "
       "GROUP BY a.pk"),
    DQ("dq73_cube", R.dq73_cube,
       "SELECT o_orderstatus, o_orderpriority, count(*) AS c, "
       "CAST(grouping(o_orderstatus) AS INT) AS g1, "
       "CAST(grouping(o_orderpriority) AS INT) AS g2 "
       "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"),
    DQ("dq74_histogram", R.dq74_histogram,
       "WITH stats AS (SELECT min(l_extendedprice) AS lo, "
       "max(l_extendedprice) AS hi FROM lineitem) "
       "SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE "
       "least(9, floor((l_extendedprice - lo) / ((hi - lo) / 10))) END "
       "AS INT) AS bucket, count(*) AS c "
       "FROM lineitem CROSS JOIN stats GROUP BY bucket"),
    DQ("dq82_correlated_subquery", R.dq82_correlated_subquery,
       "SELECT c_custkey, (SELECT CAST(floor(max(o_totalprice) * 100.0 + 0.5) "
       "AS BIGINT) FROM orders "
       "WHERE o_custkey = c_custkey) AS mx_cents FROM customer"),
    DQ("dq83_map_ops", R.dq83_map_ops,
       "SELECT event_id, "
       "CAST(json_extract_string(props, '$.k') AS INT) AS k, "
       "CAST(len(json_keys(props)) AS INT) AS n_keys, "
       "array_to_string(list_sort(json_keys(props)), ',') AS keys "
       "FROM events"),
    DQ("dq81_sql_text", R.dq81_sql_text,
       "SELECT n_name, "
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) "
       "AS total_cents, count(*) AS n_orders "
       "FROM orders JOIN customer ON o_custkey = c_custkey "
       "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
    DQ("dq124_lateral_topn", R.dq124_lateral_topn,
       "SELECT c.c_custkey, o.o_orderkey, "
       "CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) "
       "AS o_totalprice_cents "
       "FROM customer c, "
       "LATERAL (SELECT o_orderkey, o_totalprice FROM orders "
       "WHERE o_custkey = c.c_custkey "
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o "
       "WHERE c.c_custkey < 50 "
       "ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"),
    DQ("dq125_column_profile", R.dq125_column_profile,
       " UNION ALL ".join(
           "SELECT '{c}' AS col_name, count(*) AS n_rows, "
           "CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
           "AS n_null, count(DISTINCT {c}) AS n_distinct, "
           "CAST(min({e}) AS VARCHAR) AS min_s, "
           "CAST(max({e}) AS VARCHAR) AS max_s FROM orders"
           .format(c=c, e=e)
           for c, e in [
               ("o_orderkey", "o_orderkey"),
               ("o_custkey", "o_custkey"),
               ("o_orderstatus", "o_orderstatus"),
               ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
               ("o_orderdate", "CAST(o_orderdate AS DATE)"),
               ("o_orderpriority", "o_orderpriority"),
           ]
       ) + " ORDER BY col_name"),
    DQ("dq126_integrity_audit", R.dq126_integrity_audit,
       "SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) "
       "AS n_customers, "
       "(SELECT CAST(count(*) AS BIGINT) FROM customer c WHERE EXISTS "
       "(SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)) "
       "AS n_with_events, "
       "(SELECT CAST(count(*) AS BIGINT) FROM customer c WHERE NOT EXISTS "
       "(SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)) "
       "AS n_without_events, "
       "(SELECT CAST(count(*) AS BIGINT) FROM events e WHERE NOT EXISTS "
       "(SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) "
       "AS n_orphan_events"),
    DQ("dq134_heavy_hitters", R.dq134_heavy_hitters,
       "WITH c AS (SELECT user_id, count(*) AS c FROM events "
       "GROUP BY user_id), "
       "tot AS (SELECT count(*) AS n_tot FROM events) "
       "SELECT user_id, CAST(c AS BIGINT) AS c, "
       "CAST(floor((c / n_tot) * 1000000.0 + 0.5) AS BIGINT) AS share_micro FROM c CROSS JOIN tot "
       "ORDER BY c DESC, user_id LIMIT 20"),
    DQ("dq140_approx_quantiles", R.dq140_approx_quantiles,
       # sketch values stay out of the hash set; the oracle checks the
       # group counts + the ±1-unit-vs-exact bounds as constant 1
       "SELECT l_returnflag, count(*) AS n, CAST(1 AS INT) AS p50_ok, "
       "CAST(1 AS INT) AS p95_ok FROM lineitem GROUP BY l_returnflag",
       note="B20-family approx_percentile sketch — engine internals "
            "differ; hash checks counts + sketch-vs-exact bounds"),
    DQ("dq186_basket_lift", R.dq186_basket_lift,
       "WITH items AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand "
       "FROM lineitem JOIN part ON l_partkey = p_partkey), "
       "no AS (SELECT count(DISTINCT o_orderkey) AS n FROM orders), "
       "marg AS (SELECT brand, count(*) AS nb FROM items GROUP BY brand), "
       "pairs AS (SELECT a.brand AS b1, b.brand AS b2, count(*) AS pair_n "
       "FROM items a JOIN items b ON a.okey = b.okey AND a.brand < b.brand "
       "GROUP BY b1, b2 HAVING count(*) >= 5) "
       "SELECT b1, b2, pair_n, CAST(floor((pair_n / n) * 1000000.0 + 0.5) AS BIGINT) AS support_micro, "
       "CAST(floor((pair_n * n / (m1.nb * m2.nb)) * 1000000.0 + 0.5) AS BIGINT) AS lift_micro "
       "FROM pairs JOIN marg m1 ON m1.brand = b1 "
       "JOIN marg m2 ON m2.brand = b2 CROSS JOIN no "
       "ORDER BY lift_micro DESC, b1, b2 LIMIT 30"),
    DQ("dq195_winsorized_stats", R.dq195_winsorized_stats,
       "WITH b AS (SELECT l_returnflag, "
       "quantile_cont(l_extendedprice, 0.05) AS p05, "
       "quantile_cont(l_extendedprice, 0.95) AS p95 FROM lineitem "
       "GROUP BY l_returnflag), "
       "c AS (SELECT l.l_returnflag, p05, p95, "
       "least(greatest(l_extendedprice, p05), p95) AS cv, "
       "CAST(l_extendedprice < p05 AS INT) AS lo, "
       "CAST(l_extendedprice > p95 AS INT) AS hi "
       "FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag) "
       "SELECT l_returnflag, CAST(floor((max(p05)) * 1000000.0 + 0.5) AS BIGINT) AS p05_micro, "
       "CAST(floor((max(p95)) * 1000000.0 + 0.5) AS BIGINT) AS p95_micro, "
       "CAST(floor((CAST(sum(CAST(cv AS DECIMAL(28,10))) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) AS BIGINT) "
       "AS wins_mean_micro, "
       "CAST(sum(lo) AS BIGINT) AS n_clipped_lo, "
       "CAST(sum(hi) AS BIGINT) AS n_clipped_hi, count(*) AS n "
       "FROM c GROUP BY l_returnflag"),
    DQ("dq196_hll_rollup", R.dq196_hll_rollup,
       # DataSketches estimate stays out of the hash set; exact audit
       # columns + the est_ok bound (oracle: constant 1) are hashed
       "WITH d AS (SELECT date_trunc('day', ts) AS day, user_id "
       "FROM events), "
       "daily AS (SELECT day, count(DISTINCT user_id) AS ed FROM d "
       "GROUP BY day) "
       "SELECT CAST(count(*) AS BIGINT) AS n_days, "
       "CAST(SUM(ed) AS BIGINT) AS sum_daily_distinct, "
       "(SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) "
       "AS exact_distinct, CAST(1 AS INT) AS est_ok FROM daily",
       note="mergeable-sketch distinct rollup — DataSketches HLL bits "
            "are engine-specific (SURVEY.md §5.3 rule 5); hash checks "
            "exact audit columns + est_ok"),
    DQ("dq197_skyline", R.dq197_skyline,
       # brute-force NOT EXISTS dominance: equality proves the sort-based
       # rewrite in the engine
       "SELECT a.p_partkey, CAST(floor((a.p_retailprice) * 100.0 + 0.5) AS BIGINT) AS price_cents, a.p_size AS size "
       "FROM part a WHERE NOT EXISTS (SELECT 1 FROM part b "
       "WHERE b.p_retailprice <= a.p_retailprice "
       "AND b.p_size <= a.p_size "
       "AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))"),
    DQ("dq199_weighted_median", R.dq199_weighted_median,
       "WITH g AS (SELECT l_returnflag, l_extendedprice AS price, "
       "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w "
       "FROM lineitem GROUP BY l_returnflag, price), "
       "c AS (SELECT l_returnflag, price, "
       "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw, "
       "SUM(w) OVER (PARTITION BY l_returnflag) AS tw FROM g) "
       "SELECT l_returnflag, CAST(floor((min(price)) * 100.0 + 0.5) AS BIGINT) AS wmedian_cents "
       "FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag"),
    DQ("dq212_grouping_sets", R.dq212_grouping_sets,
       "SELECT l_returnflag, l_linestatus, "
       "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, "
       "count(*) AS n, "
       "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) "
       "AS sum_qty_cents FROM lineitem GROUP BY GROUPING SETS "
       "((l_returnflag, l_linestatus), (l_returnflag), ())"),
    DQ("dq225_mad_outliers", R.dq225_mad_outliers,
       "WITH li AS (SELECT l_returnflag, "
       "CAST(round(l_extendedprice * 100) AS BIGINT) AS x "
       "FROM lineitem), "
       "r1 AS (SELECT l_returnflag, x, "
       "row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn, "
       "count(*) OVER (PARTITION BY l_returnflag) AS n FROM li), "
       "med AS (SELECT l_returnflag, max(x) AS med FROM r1 "
       "WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT) "
       "GROUP BY l_returnflag), "
       "dev AS (SELECT li.l_returnflag, li.x, med.med, "
       "abs(li.x - med.med) AS d FROM li JOIN med USING (l_returnflag)), "
       "r2 AS (SELECT l_returnflag, d, "
       "row_number() OVER (PARTITION BY l_returnflag ORDER BY d) AS rn, "
       "count(*) OVER (PARTITION BY l_returnflag) AS n FROM dev), "
       "mad AS (SELECT l_returnflag, max(d) AS mad FROM r2 "
       "WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT) "
       "GROUP BY l_returnflag) "
       "SELECT dev.l_returnflag, count(*) AS n, "
       "CAST(max(dev.med) AS BIGINT) AS med_cents, "
       "CAST(max(mad.mad) AS BIGINT) AS mad_cents, "
       "CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) "
       "AS BIGINT) AS n_outliers "
       "FROM dev JOIN mad USING (l_returnflag) GROUP BY dev.l_returnflag"),
    DQ("dq233_benford_audit", R.dq233_benford_audit,
       "WITH o AS (SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) "
       "AS VARCHAR), 1, 1) AS digit FROM orders), "
       "f AS (SELECT digit FROM o WHERE digit BETWEEN '1' AND '9'), "
       "counts AS (SELECT digit, count(*) AS n_obs FROM f GROUP BY digit), "
       "tot AS (SELECT SUM(n_obs) AS n_total FROM counts), "
       "st AS (SELECT digit, n_obs, "
       "CAST(n_obs AS DOUBLE) / n_total AS p_obs, "
       "log10(1.0 + 1.0 / CAST(CAST(digit AS INT) AS DOUBLE)) AS p_exp "
       "FROM counts CROSS JOIN tot), "
       "st2 AS (SELECT *, CAST(floor(((p_obs - p_exp) * (p_obs - p_exp) "
       "/ p_exp) * 1000000000000.0 + 0.5) AS BIGINT) AS chi FROM st) "
       "SELECT digit, n_obs, CAST(floor((p_obs) * 1000000.0 + 0.5) AS BIGINT) AS p_obs_micro, "
       "CAST(floor((p_exp) * 1000000.0 + 0.5) AS BIGINT) AS p_exp_micro, "
       "CAST(SUM(chi) OVER () AS BIGINT) AS chi_sq_pico FROM st2"),
    DQ("dq234_equiheight_histogram", R.dq234_equiheight_histogram,
       "WITH li AS (SELECT l_returnflag, "
       "CAST(round(l_extendedprice * 100) AS BIGINT) AS x FROM lineitem), "
       "per_v AS (SELECT l_returnflag, x, count(*) AS c FROM li "
       "GROUP BY l_returnflag, x), "
       "cum AS (SELECT l_returnflag, x, c, "
       "COALESCE(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY x "
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl, "
       "SUM(c) OVER (PARTITION BY l_returnflag) AS n_tot FROM per_v) "
       "SELECT l_returnflag, "
       "CAST(floor(cum_excl * 8 / n_tot) AS INT) AS b, "
       "CAST(SUM(c) AS BIGINT) AS n_rows, "
       "min(x) AS lo_cents, max(x) AS hi_cents "
       "FROM cum GROUP BY l_returnflag, b"),
    DQ("dq236_gini", R.dq236_gini,
       "WITH spend AS (SELECT user_id, "
       "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x "
       "FROM events GROUP BY user_id), "
       "per_v AS (SELECT x, count(*) AS c FROM spend GROUP BY x), "
       "cum AS (SELECT x, c, COALESCE(SUM(c) OVER (ORDER BY x "
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl "
       "FROM per_v), "
       "agg AS (SELECT "
       "CAST(SUM(x * (c * cum_excl + (c * (c + 1)) // 2)) AS BIGINT) "
       "AS srx, CAST(SUM(x * c) AS BIGINT) AS sx, "
       "CAST(SUM(c) AS BIGINT) AS n FROM cum) "
       "SELECT n, CAST(floor((2.0 * srx / (n * sx) "
       "- CAST(n + 1 AS DOUBLE) / n) * 1000000.0 + 0.5) AS BIGINT) "
       "AS gini_micro FROM agg"),
]
