package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §C.
  *
  * `queries` maps operator names → DataFrame programs over a testdata dir;
  * `oracleSql` holds the DuckDB-dialect SQL the driver executes over the
  * same parquet tables for the hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per region — the 5-way star join (SURVEY §2B E6). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q08(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (Relational.q01 _),
    "q02_filter" -> (Relational.q02 _),
    "q03_like_between" -> (Relational.q03 _),
    "q04_agg_tpch1" -> (Relational.q04 _),
    "q05_count_distinct" -> (Relational.q05 _),
    "q06_join_inner" -> (Relational.q06 _),
    "q07_join_left" -> (Relational.q07 _),
    "q08_join_star" -> (Relational.q08 _),
    "q09_join_semi" -> (Relational.q09 _),
    "q10_join_anti" -> (Relational.q10 _),
    "q11_join_theta" -> (Relational.q11 _),
    "q12_rollup" -> (Relational.q12 _),
    "q13_topk_group" -> (Relational.q13 _),
    "q14_window_lag" -> (Relational.q14 _),
    "q15_window_frame" -> (Relational.q15 _),
    "q16_sort_limit" -> (Relational.q16 _),
    "q17_intersect" -> (Relational.q17 _),
    "q17b_except" -> (Relational.q17b _),
    "q18_string_date" -> (Relational.q18 _),
    "q19_case_math" -> (Relational.q19 _),
    "q20_explode_tokens" -> (Relational.q20 _),
    "q21_json" -> (Relational.q21 _),
    "q22_dedup_exact" -> (Relational.q22 _),
    "q22b_dedup_keepfirst" -> (Relational.q22b _),
    "q23_approx_distinct" -> (Relational.q23 _),
    "q26_window_tumbling" -> (Relational.q26 _),
  )

  /** DuckDB-dialect oracle SQL; same column names/types as the Spark side. */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY 1, 2",
    "q02_filter" ->
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R' ORDER BY 1, 2",
    "q03_like_between" ->
      "SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '1-%' AND o_totalprice BETWEEN 1000 AND 5000 ORDER BY 1",
    "q04_agg_tpch1" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | ROUND(SUM(CAST(l_quantity AS DECIMAL(38,4))), 4) AS s_qty,
        | ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS DECIMAL(38,4)), 4) AS a_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q05_count_distinct" ->
      "SELECT COUNT(DISTINCT l_suppkey) AS d FROM lineitem",
    "q06_join_inner" ->
      "SELECT n_name, COUNT(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1",
    "q07_join_left" ->
      """SELECT c_custkey, COALESCE(o.cnt, 0) AS cnt FROM customer
        |LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) o
        |ON c_custkey = o_custkey ORDER BY 1""".stripMargin,
    "q08_join_star" ->
      """SELECT r_name, ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_join_semi" ->
      "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') ORDER BY 1",
    "q10_join_anti" ->
      "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY 1",
    "q11_join_theta" ->
      "SELECT DISTINCT p_partkey, p_size FROM part JOIN region ON p_size > r_regionkey + 45 ORDER BY 1, 2",
    "q12_rollup" ->
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3",
    "q13_topk_group" ->
      """SELECT c_mktsegment, c_custkey, CAST(rn AS BIGINT) AS rn FROM (
        | SELECT c_mktsegment, c_custkey,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        | FROM customer) t WHERE rn <= 3 ORDER BY 1, 3""".stripMargin,
    "q14_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        | LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |FROM orders ORDER BY 1, 2""".stripMargin,
    "q15_window_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | ROUND(SUM(CAST(l_quantity AS DECIMAL(38,4))) OVER (
        |  PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_quantity
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS roll
        |FROM lineitem ORDER BY 1, 2, 3, 4""".stripMargin,
    "q16_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "q17_intersect" ->
      "SELECT x FROM (SELECT c_nationkey AS x FROM customer INTERSECT SELECT s_nationkey AS x FROM supplier) t ORDER BY 1",
    "q17b_except" ->
      "SELECT x FROM (SELECT c_nationkey AS x FROM customer EXCEPT SELECT s_nationkey AS x FROM supplier) t ORDER BY 1",
    "q18_string_date" ->
      """SELECT o_orderkey, UPPER(SUBSTRING(o_orderpriority, 3)) AS u,
        | CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        | CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m
        |FROM orders ORDER BY 1""".stripMargin,
    "q19_case_math" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS b,
        | ROUND(CAST(l_extendedprice * (1.0 + l_tax) AS DECIMAL(38,4)), 4) AS g
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q20_explode_tokens" ->
      """SELECT lang, tok, COUNT(*) AS c FROM (
        | SELECT lang, unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
        |WHERE LENGTH(tok) >= 8 GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2 LIMIT 50""".stripMargin,
    "q21_json" ->
      """SELECT event_type,
        | ROUND(CAST(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DECIMAL(38,4)), 4) AS avg_k,
        | COUNT(*) AS c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_dedup_exact" ->
      "SELECT COUNT(*) AS c FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) t",
    "q22b_dedup_keepfirst" ->
      """SELECT o_custkey, o_orderkey AS first_order FROM (
        | SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        | FROM orders) t WHERE rn = 1 ORDER BY 1""".stripMargin,
    "q23_approx_distinct" ->
      "SELECT CAST(1 AS INT) AS ok",
    "q26_window_tumbling" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws, event_type,
        | COUNT(*) AS c, ROUND(SUM(CAST(value AS DECIMAL(38,4))), 4) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
