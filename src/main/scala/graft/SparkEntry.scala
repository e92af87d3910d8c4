package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.operators.{Dedup, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §C.
  *
  * `queries` maps operator names → DataFrame programs over a testdata dir;
  * `oracleSql` holds the DuckDB-dialect SQL the driver executes over the
  * same parquet tables for the hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed end-to-end training-data pipeline (p01) — every major
    * operator family in one program. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Pipeline.trainingPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (Relational.q01 _),
    "q02_filter" -> (Relational.q02 _),
    "q03_like_between" -> (Relational.q03 _),
    "q04_agg_tpch1" -> (Relational.q04 _),
    "q04b_agg_fastexact" -> (Relational.q04b _),
    "q05_count_distinct" -> (Relational.q05 _),
    "q06_join_inner" -> (Relational.q06 _),
    "q07_join_left" -> (Relational.q07 _),
    "q07b_join_right" -> (Relational.q07b _),
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
    "q24_union_all" -> (Relational.q24 _),
    "q24b_union_distinct" -> (Relational.q24b _),
    "q25_ranking" -> (Relational.q25 _),
    "q26_window_tumbling" -> (Relational.q26 _),
    "q27_window_analytic" -> (Relational.q27 _),
    "q27b_range_frame" -> (Relational.q27b _),
    "q28_cube" -> (Relational.q28 _),
    "q29_scalar_zoo" -> (Relational.q29 _),
    "q30_collect" -> (Relational.q30 _),
    "q31_window_sliding" -> (Relational.q31 _),
    "q32_session_window" -> (Relational.q32 _),
    "q33_asof_join" -> (graft.operators.AsOf.clickToLastView _),
    "q34_pivot" -> (Relational.q34 _),
    "q35_stats" -> (Relational.q35 _),
    "q36_udaf_wavg" -> (Relational.q36 _),
    "q37_percentile" -> (Relational.q37 _),
    "q38_scalar_subquery" -> (Relational.q38 _),
    "q39_nullsafe_join" -> (Relational.q39 _),
    "q40_date_math" -> (Relational.q40 _),
    "q41_string_extra" -> (Relational.q41 _),
    "q42_bitwise" -> (Relational.q42 _),
    "q43_array_ops" -> (Relational.q43 _),
    "q44_map_json" -> (Relational.q44 _),
    "q45_tpch3" -> (Relational.q45 _),
    "q46_tpch10" -> (Relational.q46 _),
    "q47_minmax_by" -> (Relational.q47 _),
    "q48_corr" -> (Relational.q48 _),
    "q49_grouping_sets" -> (Relational.q49 _),
    "q50_window_extra" -> (Relational.q50 _),
    "q51_tpch5" -> (Relational.q51 _),
    "q52_tpch12" -> (Relational.q52 _),
    "q53_tpch14" -> (Relational.q53 _),
    "q54_lateral" -> (Relational.q54 _),
    "q55_join_full" -> (Relational.q55 _),
    "q56_unpivot" -> (Relational.q56 _),
    "q57_exists_agg" -> (Relational.q57 _),
    "q58_scalar_pred" -> (Relational.q58 _),
    "q59_tpch2" -> (Relational.q59 _),
    "q60_tpch4" -> (Relational.q60 _),
    "q61_tpch6" -> (Relational.q61 _),
    "q62_tpch7" -> (Relational.q62 _),
    "q63_tpch8" -> (Relational.q63 _),
    "q64_tpch9" -> (Relational.q64 _),
    "q65_tpch11" -> (Relational.q65 _),
    "q66_tpch13" -> (Relational.q66 _),
    "q67_tpch15" -> (Relational.q67 _),
    "q68_tpch16" -> (Relational.q68 _),
    "q69_tpch17" -> (Relational.q69 _),
    "q70_tpch18" -> (Relational.q70 _),
    "q71_tpch19" -> (Relational.q71 _),
    "q72_tpch20" -> (Relational.q72 _),
    "d01_dedup_jaccard" -> (Dedup.ngramJaccard _),
    "d02_dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "d03_dedup_simhash" -> (Dedup.simhash _),
    "d04_dedup_embed" -> (Similarity.embedNearDup _),
    "d06_dedup_canonical" -> (Dedup.canonical _),
    "d07_decontaminate" -> (Dedup.decontaminate _),
    "d08_dedup_substrings" -> (Dedup.substringDedup _),
    "d09_decontaminate_fuzzy" -> (Dedup.fuzzyDecontaminate _),
    "d05_dedup_embed_lsh" -> (Similarity.srpNearDup _),
    "m01_image_decode" -> (graft.operators.Multimodal.imageStats _),
    "m02_audio_decode" -> (graft.operators.Multimodal.audioStats _),
    "m03_crossmodal_dedup" -> (graft.operators.Multimodal.crossModalDedup _),
    "m04_video_decode" -> (graft.operators.Multimodal.videoStats _),
    "s01_cosine_topk" -> (Similarity.cosineTopK _),
    "s02_ann_ivf" -> (Similarity.annIvfGate _),
    "s03_knn_join" -> (Similarity.knnJoin _),
    "t01_langid" -> (TextOps.langId _),
    "t02_quality" -> (TextOps.quality _),
    "t03_tokens" -> (TextOps.tokenCount _),
    "t04_fingerprint" -> (TextOps.fingerprint _),
    "t05_stratified_sample" -> (TextOps.stratifiedSample _),
    "t06_pack_sequences" -> (TextOps.packSequences _),
    "t07_repetition" -> (TextOps.repetition _),
    "t08_vocab" -> (TextOps.vocab _),
    "t09_lm_score" -> (TextOps.lmScore _),
    "w01_sql_write_surface" -> (graft.queries.WriteQueries.w01 _),
    "w02_merge_on_read" -> (graft.queries.WriteQueries.w02 _),
    "w03_stream_ingest" -> (graft.queries.WriteQueries.w03 _),
    "w04_nessie_publish" -> (graft.queries.WriteQueries.w04 _),
    "w05_incremental_read" -> (graft.queries.WriteQueries.w05 _),
    "w06_table_stream" -> (graft.queries.WriteQueries.w06 _),
    "w07_positional_mor" -> (graft.queries.WriteQueries.w07 _),
    "w08_skip_rewrites" -> (graft.queries.WriteQueries.w08 _),
    "w09_iceberg_roundtrip" -> (graft.queries.WriteQueries.w09 _),
    "w10_type_widening" -> (graft.queries.WriteQueries.w10 _),
    "w11_hidden_partitioning" -> (graft.queries.WriteQueries.w11 _),
    "w12_deletion_vectors" -> (graft.queries.WriteQueries.w12 _),
    "w13_iceberg_orc" -> (graft.queries.WriteQueries.w13 _),
    "w14_iceberg_avro" -> (graft.queries.WriteQueries.w14 _),
    "w15_iceberg_mixed" -> (graft.queries.WriteQueries.w15 _),
    "w16_iceberg_stream" -> (graft.queries.WriteQueries.w16 _),
    "w17_iceberg_ride_admission" -> (graft.queries.WriteQueries.w17 _),
    "w18_row_lineage_sql" -> (graft.queries.WriteQueries.w18 _),
    "w19_mixed_insert" -> (graft.queries.WriteQueries.w19 _),
    "w20_nested_export" -> (graft.queries.WriteQueries.w20 _),
    "w21_orc_mor" -> (graft.queries.WriteQueries.w21 _),
    "w22_variant" -> (graft.queries.WriteQueries.w22 _),
    "w23_hive_import" -> (graft.queries.WriteQueries.w23 _),
    "w24_partitioned_append" -> (graft.queries.WriteQueries.w24 _),
    "w25_partitioned_mor" -> (graft.queries.WriteQueries.w25 _),
    "w26_hive_adopt" -> (graft.queries.WriteQueries.w26 _),
    "w27_scoped_eq_delete" -> (graft.queries.WriteQueries.w27 _),
    "w28_nested_default" -> (graft.queries.WriteQueries.w28 _),
    "w29_iceberg_sink" -> (graft.queries.WriteQueries.w29 _),
    "w30_relocated" -> (graft.queries.WriteQueries.w30 _),
    "w31_mixed_upsert" -> (graft.queries.WriteQueries.w31 _),
    "w32_relocated_adopt" -> (graft.queries.WriteQueries.w32 _),
    "w33_avro_mor" -> (graft.queries.WriteQueries.w33 _),
    "w34_uuid_adopt" -> (graft.queries.WriteQueries.w34 _),
    "p01_training_pipeline" -> (graft.operators.Pipeline.trainingPipeline _),
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
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,4))), 4) AS DOUBLE) AS s_qty,
        | CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS DECIMAL(38,4)), 4) AS DOUBLE) AS a_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // scaled-fixed-point exact aggregation: sums are integers in both
    // engines (DuckDB's HUGEINT sum cast back to BIGINT), so the only
    // float arithmetic is the identical final division
    "q04b_agg_fastexact" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | CAST(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS s_qty10k,
        | ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*), 4) AS a_price_f
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q05_count_distinct" ->
      "SELECT COUNT(DISTINCT l_suppkey) AS d FROM lineitem",
    "q06_join_inner" ->
      "SELECT n_name, COUNT(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1",
    "q07_join_left" ->
      """SELECT c_custkey, COALESCE(o.cnt, 0) AS cnt FROM customer
        |LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) o
        |ON c_custkey = o_custkey ORDER BY 1""".stripMargin,
    "q07b_join_right" ->
      """SELECT c_custkey, COALESCE(o.cnt, 0) AS cnt
        |FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) o
        |RIGHT JOIN customer ON o_custkey = c_custkey ORDER BY 1""".stripMargin,
    "q55_join_full" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS k,
        | CAST(c.c_custkey IS NULL AS INT) AS no_cust,
        | COALESCE(o.cnt, 0) AS cnt
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 500) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) o
        | ON c.c_custkey = o.o_custkey
        |ORDER BY 1""".stripMargin,
    "q08_join_star" ->
      """SELECT r_name, CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE) AS rev
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
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,4))) OVER (
        |  PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_quantity
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS roll
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
        | CAST(ROUND(CAST(l_extendedprice * (1.0 + l_tax) AS DECIMAL(38,4)), 4) AS DOUBLE) AS g
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q20_explode_tokens" ->
      """SELECT lang, tok, COUNT(*) AS c FROM (
        | SELECT lang, unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
        |WHERE LENGTH(tok) >= 8 GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2 LIMIT 50""".stripMargin,
    "q21_json" ->
      """SELECT event_type,
        | CAST(ROUND(CAST(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DECIMAL(38,4)), 4) AS DOUBLE) AS avg_k,
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
    "q24_union_all" ->
      """SELECT x, COUNT(*) AS c FROM (
        | SELECT c_nationkey AS x FROM customer UNION ALL SELECT s_nationkey FROM supplier) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24b_union_distinct" ->
      "SELECT x FROM (SELECT c_nationkey AS x FROM customer UNION SELECT s_nationkey FROM supplier) t ORDER BY 1",
    "q25_ranking" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(RANK() OVER w AS BIGINT) AS rk,
        | CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
        | CAST(NTILE(4) OVER w AS BIGINT) AS nt,
        | ROUND(PERCENT_RANK() OVER w, 4) AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY 1, 2""".stripMargin,
    "q27_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        | LEAD(o_totalprice, 1) OVER w AS nxt,
        | FIRST_VALUE(o_totalprice) OVER w AS fst,
        | LAST_VALUE(o_totalprice) OVER
        |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lst
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY 1, 2""".stripMargin,
    "q27b_range_frame" ->
      """SELECT o_custkey, o_orderkey, d,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
        |  PARTITION BY o_custkey ORDER BY d
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS rsum
        |FROM (SELECT *, CAST(date_diff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |      FROM orders) t
        |ORDER BY 1, 2""".stripMargin,
    "q28_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3""".stripMargin,
    "q29_scalar_zoo" ->
      """SELECT p_partkey,
        | ROUND(SQRT(p_retailprice), 4) AS sq,
        | p_partkey % 7 AS md,
        | CAST(COALESCE(NULLIF(p_size, 25), -1) AS BIGINT) AS nz,
        | CONCAT_WS('|', p_brand, UPPER(p_type)) AS cw,
        | LPAD(p_brand, 12, '*') AS lp,
        | REVERSE(p_brand) AS rv,
        | REGEXP_REPLACE(p_type, '[AEIOU]', '', 'g') AS rr,
        | SUBSTRING(p_name, 1, 5) AS sb,
        | CAST(LENGTH(p_name) AS BIGINT) AS ln
        |FROM part ORDER BY 1""".stripMargin,
    "q30_collect" ->
      """SELECT n_name, array_to_string(list_sort(list(s_name)), ',') AS names, COUNT(*) AS c
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_window_sliding" ->
      """SELECT CAST(epoch(ws) AS BIGINT) AS ws, event_type, COUNT(*) AS c FROM (
        | SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
        |        event_type
        | FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q32_session_window" ->
      """WITH e AS (
        | SELECT event_type, ts, value,
        |  CASE WHEN LAG(ts) OVER w IS NULL
        |        OR ts - LAG(ts) OVER w >= INTERVAL '15 minutes' THEN 1 ELSE 0 END AS brk
        | FROM events
        | WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
        |g AS (
        | SELECT *, SUM(brk) OVER (PARTITION BY event_type ORDER BY ts
        |   ROWS UNBOUNDED PRECEDING) AS sid
        | FROM e)
        |SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS ss,
        | CAST(epoch_us(MAX(ts) + INTERVAL '15 minutes') AS BIGINT) AS se,
        | event_type, COUNT(*) AS c,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE) AS sv
        |FROM g GROUP BY event_type, sid ORDER BY 1, 3""".stripMargin,
    "q33_asof_join" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS cts, epoch_us(v.ts) AS vts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        | ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY 1""".stripMargin,
    "q34_pivot" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (o_orderstatus = 'F') AS f,
        | COUNT(*) FILTER (o_orderstatus = 'O') AS o,
        | COUNT(*) FILTER (o_orderstatus = 'P') AS p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_percentile" ->
      """SELECT l_returnflag,
        | ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        | ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        | ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_scalar_subquery" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice > (
        | SELECT CAST(ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
        |  / COUNT(*) AS DECIMAL(38,4)), 4) AS DOUBLE)
        | FROM orders)
        |ORDER BY 1""".stripMargin,
    "q39_nullsafe_join" ->
      """SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS c
        |FROM (SELECT NULLIF(c_nationkey, 3) AS k FROM customer) c
        |JOIN (SELECT NULLIF(s_nationkey, 3) AS k2 FROM supplier) s
        | ON k IS NOT DISTINCT FROM k2
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "q40_date_math" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS m3,
        | CAST(CAST(o_orderdate AS DATE) + 45 AS DATE) AS d45,
        | last_day(CAST(o_orderdate AS DATE)) AS eom,
        | CAST(quarter(o_orderdate) AS BIGINT) AS q,
        | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS BIGINT) AS dd
        |FROM orders ORDER BY 1""".stripMargin,
    "q41_string_extra" ->
      """SELECT p_partkey,
        | split_part(p_name, ' ', 2) AS w2,
        | CAST(strpos(p_name, 'e') AS BIGINT) AS ix,
        | translate(p_brand, 'Brand#', 'brnd-') AS tr,
        | repeat(p_brand, 2) AS rp,
        | CAST(ascii(p_name) AS BIGINT) AS ac,
        | chr(65 + p_size % 26) AS ch
        |FROM part ORDER BY 1""".stripMargin,
    "q42_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        | l_orderkey & 255 AS ba,
        | l_orderkey | l_linenumber AS bo,
        | xor(l_orderkey, l_suppkey) AS bx,
        | CAST(l_linenumber << 3 AS BIGINT) AS sl,
        | l_orderkey >> 2 AS sr
        |FROM lineitem ORDER BY 1, 2, bx""".stripMargin,
    "q43_array_ops" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
        |SELECT doc_id,
        | CAST(len(t) AS BIGINT) AS n,
        | CAST(list_contains(t, 'the') AS INT) AS has_the,
        | t[1] AS first_tok,
        | array_to_string(t[1:3], ' ') AS head3
        |FROM t ORDER BY 1""".stripMargin,
    "q44_map_json" ->
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS BIGINT) AS nk,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
        |FROM events ORDER BY 1""".stripMargin,
    "q45_tpch3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate, o_orderpriority,
        | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q46_tpch10" ->
      """SELECT c_custkey, n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q47_minmax_by" ->
      """SELECT o_orderpriority,
        | arg_max(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS top_order,
        | arg_min(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS bottom_order
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q48_corr" ->
      """WITH a AS (
        | SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        | ROUND((n * sxy - sx * sy) /
        |  SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS corr
        |FROM a ORDER BY 1""".stripMargin,
    "q49_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS c
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, c""".stripMargin,
    "q50_window_extra" ->
      """SELECT p_partkey, p_brand,
        | NTH_VALUE(p_partkey, 2) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_part,
        | ROUND(CUME_DIST() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey), 4) AS cd,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
        |FROM part ORDER BY 1""".stripMargin,
    "q51_tpch5" ->
      """SELECT n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q52_tpch12" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q53_tpch14" ->
      """WITH a AS (
        | SELECT
        |  CAST(ROUND(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(38,4))), 4) AS DOUBLE) AS promo_rev,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE) AS total_rev
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-06-01')
        |SELECT promo_rev, total_rev, ROUND(100.0 * promo_rev / total_rev, 4) AS promo_pct
        |FROM a""".stripMargin,
    "q56_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        | SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
        | UNION ALL
        | SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part)
        |ORDER BY 1, 2""".stripMargin,
    "q54_lateral" ->
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation,
        | LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |          WHERE c_nationkey = n_nationkey
        |          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c.c_custkey""".stripMargin,
    "q57_exists_agg" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey
        |                AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q58_scalar_pred" ->
      """SELECT c_mktsegment, COUNT(*) AS numcust,
        | CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,4))), 4) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(ROUND(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE)
        |                            / COUNT(*) AS DECIMAL(38,4)), 4) AS DOUBLE)
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q59_tpch2" ->
      """WITH supply AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    CAST(ROUND(MIN(CAST(l_extendedprice / l_quantity AS DECIMAL(38,4))), 4) AS DOUBLE)
        |      AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supply, supplier, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size = 15
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT MIN(ps2.ps_supplycost)
        |    FROM supply ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,
    "q60_tpch4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q61_tpch6" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,4))), 4) AS DOUBLE)
        |  AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q62_tpch7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE)
        |    AS revenue
        |FROM lineitem, supplier, orders, customer, nation n1, nation n2
        |WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q63_tpch8" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_5'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))
        |    ELSE CAST(0.0 AS DECIMAL(38,4)) END), 4) AS DOUBLE) AS nation_rev,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE)
        |    AS total_rev,
        |  ROUND(CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_5'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))
        |      ELSE CAST(0.0 AS DECIMAL(38,4)) END), 4) AS DOUBLE)
        |    / CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE),
        |    4) AS mkt_share
        |FROM lineitem, part, supplier, orders, customer,
        |  nation n1, nation n2, region
        |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |  AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
        |  AND o_custkey = c_custkey
        |  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND s_nationkey = n1.n_nationkey
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,
    "q64_tpch9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    - p_retailprice * l_quantity * 0.1 AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_profit
        |FROM lineitem, part, supplier, orders, nation
        |WHERE l_partkey = p_partkey AND p_name LIKE '%widget%'
        |  AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        |  AND s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q65_tpch11" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,4))), 4) AS DOUBLE) AS value
        |  FROM lineitem, supplier, nation, region
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value FROM val
        |WHERE value > (
        |  SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) * 0.001, 4)
        |  FROM lineitem, supplier, nation, region
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q66_tpch13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q67_tpch15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q68_tpch16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q69_tpch17" ->
      """SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0, 4) AS DOUBLE)
        |  AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
        |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q70_tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q71_tpch19" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))), 4) AS DOUBLE)
        |  AS revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |      AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
        |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q72_tpch20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part
        |                        WHERE p_name LIKE 'small%')
        |      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |    GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |ORDER BY s_name""".stripMargin,
    "q36_udaf_wavg" ->
      """SELECT l_returnflag,
        | ROUND(CAST(SUM(CAST(l_discount * l_quantity AS DECIMAL(38,4))) AS DOUBLE)
        |  / CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4) AS wd
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_stats" ->
      """WITH a AS (
        | SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s2
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        | ROUND((s2 - s1 * s1 / n) / (n - 1), 4) AS vr,
        | ROUND(SQRT((s2 - s1 * s1 / n) / (n - 1)), 4) AS sd
        |FROM a ORDER BY 1""".stripMargin,
    "q26_window_tumbling" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws, event_type,
        | COUNT(*) AS c, CAST(ROUND(SUM(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d01_dedup_jaccard" -> JaccardOracle,
    "d02_dedup_minhash_lsh" -> JaccardOracle,
    "d03_dedup_simhash" -> JaccardOracle,
    "d04_dedup_embed" -> EmbedDedupOracle,
    // connected components via recursive-CTE closure over the Jaccard
    // pairs; representative = argmax quality score (t02 formula),
    // tie-broken by min doc_id — mirrors Dedup.canonical exactly
    "d06_dedup_canonical" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 3
        |   THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
        |   ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS sg FROM sh),
        |co AS (SELECT a.doc_id AS a, b.doc_id AS b, a.n AS na, b.n AS nb, COUNT(*) AS c
        |       FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2, 3, 4),
        |pr AS (SELECT a, b FROM co WHERE c * 1.0 / (na + nb - c) >= 0.8),
        |e AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
        |reach(id, r) AS (
        | SELECT a, a FROM e
        | UNION
        | SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
        |cmp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, ROUND(LEAST(1.0, len(t) / 100.0) *
        |        (1.0 - len(list_filter(t, x -> x IN ('the','a','of','and','to'))) * 1.0 / len(t)), 4) AS score
        |      FROM tk),
        |ranked AS (SELECT cmp.comp, cmp.id,
        |  ROW_NUMBER() OVER (PARTITION BY cmp.comp ORDER BY q.score DESC, cmp.id) AS rn
        | FROM cmp JOIN q ON cmp.id = q.doc_id)
        |SELECT comp, MAX(CASE WHEN rn = 1 THEN id END) AS keep_doc, COUNT(*) AS n_members
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    // d05 is the LSH-candidates + exact-verify path for the SAME pairs —
    // recall-guaranteed banding (see Similarity.srpNearDup) makes it
    // exactly reproduce the brute-force oracle.
    "d05_dedup_embed_lsh" -> EmbedDedupOracle,
    // d07: train/eval 5-gram overlap — benchmark split doc_id % 10 == 7,
    // n_shared = count of distinct 5-word shingles a training doc shares
    // with ANY benchmark doc (shingles are distinct per doc, so the
    // post-join count is already distinct; see Dedup.decontaminate)
    "d07_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 5
        |    THEN list_distinct([list_aggregate(t[i:i+4], 'string_agg', ' ') for i in range(1, len(t) - 3)])
        |    ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % 10 = 7)
        |SELECT ex.doc_id, COUNT(*) AS n_shared
        |FROM ex JOIN bench USING (g)
        |WHERE ex.doc_id % 10 <> 7
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // d08: exact substring dedup — every token position covered by a
    // 5-gram occurring in >1 document is removed; the oracle recomputes
    // d09: fuzzy decontamination = exact cross-corpus Jaccard above τ
    // (the engine's LSH is candidates-only; verified pairs are exact,
    // so the oracle is the brute-force cross join over the small
    // benchmark split — same exactness contract as d01/d02)
    "d09_decontaminate_fuzzy" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |   THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
        |   ELSE [] END AS s FROM tk),
        |tr AS (SELECT * FROM sh WHERE doc_id % 10 <> 7),
        |be AS (SELECT * FROM sh WHERE doc_id % 10 = 7),
        |ext AS (SELECT doc_id, len(s) AS n, unnest(s) AS sg FROM tr),
        |exb AS (SELECT doc_id, len(s) AS n, unnest(s) AS sg FROM be),
        |co AS (SELECT t.doc_id AS a, b.doc_id AS bench_id, t.n AS na, b.n AS nb, COUNT(*) AS c
        |       FROM ext t JOIN exb b ON t.sg = b.sg GROUP BY 1, 2, 3, 4)
        |SELECT a AS doc_id, bench_id, ROUND(c * 1.0 / (na + nb - c), 4) AS j
        |FROM co WHERE c * 1.0 / (na + nb - c) >= 0.8
        |ORDER BY 1, 2""".stripMargin,
    // coverage over string grams (the engine joins on xxhash64 images,
    // value-identical absent a 64-bit collision, same caveat as d01)
    "d08_dedup_substrings" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |g0 AS (SELECT doc_id, CASE WHEN len(t) >= 5
        |    THEN [struct_pack(i := i, gram := list_aggregate(t[i:i+4], 'string_agg', ' ')) for i in range(1, len(t) - 3)]
        |    ELSE [] END AS gs FROM tk),
        |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM g0),
        |hot AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g) GROUP BY gram HAVING COUNT(*) > 1),
        |cov AS (SELECT DISTINCT doc_id, unnest([p for p in range(g.i, g.i + 5)]) AS pos
        |        FROM g JOIN hot USING (gram)),
        |toks AS (SELECT doc_id, len(t) AS n_tok,
        |         unnest([struct_pack(i := i, tok := t[i]) for i in range(1, len(t) + 1)], recursive := true) FROM tk),
        |kept AS (SELECT toks.doc_id, toks.n_tok, toks.i, toks.tok
        |         FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.i = cov.pos
        |         WHERE cov.pos IS NULL)
        |SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
        |       COUNT(*) AS n_kept, CAST(MAX(n_tok) - COUNT(*) AS BIGINT) AS n_removed
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // w01: the SQL write surface as relational algebra — CTAS ∪ append,
    // minus the overwritten partition plus its replacement, schema
    // evolution as a NULL-filled column the later append populates, the
    // DELETE as the null-safe survivor filter, MERGE as left-join update
    // ∪ anti-join insert, UPDATE as a CASE projection, and the dynamic
    // partition overwrite as partition-minus ∪ replacement. The engine
    // runs real versioned commits (WriteQueries.w01); the oracle replays
    // the same end state purely declaratively.
    "w01_sql_write_surface" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_acctbal AS bal, CAST(c_nationkey AS VARCHAR) AS n FROM customer
        |  UNION ALL
        |  SELECT s_suppkey + 1000000, s_acctbal, CAST(s_nationkey AS VARCHAR) FROM supplier
        |), po AS (
        |  SELECT * FROM base WHERE n <> '7'
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal, '7' FROM customer WHERE c_custkey <= 5
        |), ev AS (
        |  SELECT k, bal, n, CAST(NULL AS VARCHAR) AS seg FROM po
        |  UNION ALL
        |  SELECT o_orderkey + 2000000, o_totalprice, CAST(o_orderkey % 3 AS VARCHAR), o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0
        |), fin AS (
        |  SELECT * FROM ev WHERE NOT COALESCE(bal < 0 AND seg IS NULL, FALSE)
        |), src AS (
        |  SELECT s_suppkey AS k, s_acctbal AS bal, CAST(s_nationkey AS VARCHAR) AS n, 'M' AS seg
        |  FROM supplier WHERE s_suppkey <= 20
        |), mg AS (
        |  SELECT f.k,
        |         CASE WHEN s.k IS NOT NULL THEN f.bal + s.bal ELSE f.bal END AS bal,
        |         f.n,
        |         CASE WHEN s.k IS NOT NULL THEN 'M' ELSE f.seg END AS seg
        |  FROM fin f LEFT JOIN src s ON f.k = s.k
        |  UNION ALL
        |  SELECT s.k, s.bal, s.n, s.seg FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM fin f WHERE f.k = s.k)
        |), up AS (
        |  SELECT k, bal, n, CASE WHEN bal < 0 THEN 'NEG' ELSE seg END AS seg FROM mg
        |), dyn AS (
        |  SELECT * FROM up WHERE n <> '11'
        |  UNION ALL
        |  SELECT c_custkey + 3000000, c_acctbal, '11', 'D' FROM customer WHERE c_custkey <= 3
        |)
        |SELECT n, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(seg) AS n_seg
        |FROM dyn GROUP BY n ORDER BY n""".stripMargin,
    // w02: the merge-on-read surface as pure set algebra. The engine
    // commits an equality-delete file (takedown), a MOR upsert, and a
    // post-delete re-insert, reads through the delete-applying DSv2
    // scan, then compacts (materializing deletes) and reads again; the
    // oracle replays final = (base ∖ deleted ∖ upserted) ∪ upserts ∪
    // re-inserts, emitted once per phase (the two phases must agree —
    // THAT equality is what puts compaction under the oracle).
    "w02_merge_on_read" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, CAST(c_nationkey AS VARCHAR) AS n FROM customer
        |), kdel AS (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |), ups AS (
        |  SELECT s_suppkey * 5 AS k, CAST(s_nationkey AS VARCHAR) AS n FROM supplier
        |), reins AS (
        |  SELECT c_custkey AS k, '99' AS n FROM customer
        |  WHERE c_acctbal < 0 AND c_custkey % 2 = 0
        |), fin AS (
        |  SELECT k, n FROM base
        |  WHERE k NOT IN (SELECT k FROM kdel) AND k NOT IN (SELECT k FROM ups)
        |  UNION ALL SELECT k, n FROM ups
        |  UNION ALL SELECT k, n FROM reins
        |), agg AS (
        |  SELECT n, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k,
        |         CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
        |  FROM fin GROUP BY n
        |)
        |SELECT 'mor' AS phase, * FROM agg
        |UNION ALL SELECT 'compacted' AS phase, * FROM agg
        |ORDER BY phase, n""".stripMargin,
    // w03: streaming ingest is exactly-once under crash replay, so the
    // oracle is simply orders-once ∪ the interleaved supplier append —
    // a double-appended batch (fence failure) breaks the hash
    "w03_stream_ingest" ->
      """WITH fin AS (
        |  SELECT o_orderkey AS k, CAST(o_orderkey % 5 AS VARCHAR) AS b FROM orders
        |  UNION ALL
        |  SELECT s_suppkey + 9000000 AS k, 'S' AS b FROM supplier
        |)
        |SELECT b, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k,
        |       CAST(MAX(k) AS BIGINT) AS max_k
        |FROM fin GROUP BY b ORDER BY b""".stripMargin,
    // w04: atomic cross-table publish on the Nessie commit-log catalog.
    // The engine stages v2 of two tables in the warehouse, reads the
    // branch before the publish (must still be the consistent v1 pair),
    // publishes both pointers in ONE commit, and reads a v1 tag after;
    // the oracle replays the three phases as pure projections — an
    // isolation failure changes a phase's aggregate and breaks the hash
    "w04_nessie_publish" ->
      """WITH v1c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |v1s AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
        |v2c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey % 2 = 0),
        |v2s AS (SELECT CAST(s_suppkey + 1000000 AS BIGINT) AS k FROM supplier WHERE s_suppkey % 3 = 0)
        |SELECT 'staged' AS phase, 'cust' AS src, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k FROM v1c
        |UNION ALL SELECT 'staged', 'sup', COUNT(*), CAST(SUM(k) AS BIGINT), CAST(MAX(k) AS BIGINT) FROM v1s
        |UNION ALL SELECT 'published', 'cust', COUNT(*), CAST(SUM(k) AS BIGINT), CAST(MAX(k) AS BIGINT) FROM v2c
        |UNION ALL SELECT 'published', 'sup', COUNT(*), CAST(SUM(k) AS BIGINT), CAST(MAX(k) AS BIGINT) FROM v2s
        |UNION ALL SELECT 'tag', 'cust', COUNT(*), CAST(SUM(k) AS BIGINT), CAST(MAX(k) AS BIGINT) FROM v1c
        |UNION ALL SELECT 'tag', 'sup', COUNT(*), CAST(SUM(k) AS BIGINT), CAST(MAX(k) AS BIGINT) FROM v1s
        |ORDER BY phase, src""".stripMargin,
    // w06: the table stream source is exactly the manifest diffs of
    // its version offsets, so each phase of the streamed sink is
    // relationally a filter of the source (WriteQueries.w06 runs a
    // real stream with appends landing mid-flight)
    "w06_table_stream" ->
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag AS rf,
        |                  (l_orderkey % 3) AS m FROM lineitem)
        |SELECT 'boot' AS phase, rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM b WHERE m = 0 GROUP BY rf
        |UNION ALL SELECT 'incr', rf, COUNT(*), CAST(SUM(k) AS BIGINT)
        |FROM b GROUP BY rf
        |ORDER BY phase, rf""".stripMargin,
    // w07: positional merge-on-read as pure set algebra. The engine
    // commits a predicate DELETE (address file), a positional UPDATE
    // (addresses + rewritten copies), an equality takedown (hides base
    // and update copies alike), and a post-delete re-insert; it reads
    // through the address-applying scan, compacts, and reads again. The
    // oracle replays the sequence: survivors ∪ updated ∪ re-inserts,
    // emitted once per phase (their equality puts compaction of
    // positional deletes under the oracle).
    "w07_positional_mor" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_acctbal AS bal,
        |         CAST(c_nationkey AS VARCHAR) AS n FROM customer
        |), fin AS (
        |  SELECT k, n FROM base
        |  WHERE bal >= 0 AND k % 100 <> 0 AND k % 97 <> 0
        |  UNION ALL
        |  SELECT k, 'U' AS n FROM base
        |  WHERE bal >= 0 AND k % 100 = 0 AND k % 97 <> 0
        |  UNION ALL
        |  SELECT k, '99' AS n FROM base WHERE bal < 0 AND k % 2 = 0
        |), agg AS (
        |  SELECT n, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k,
        |         CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
        |  FROM fin GROUP BY n
        |)
        |SELECT 'mor' AS phase, * FROM agg
        |UNION ALL SELECT 'compacted' AS phase, * FROM agg
        |ORDER BY phase, n""".stripMargin,
    // w08: rewrite-skipping change capture — the captured phase is
    // relationally just the three appended slices (base rows appear
    // ONLY in the final phase; a compaction double-serve or a lost
    // append breaks the captured phase's hash; compaction equivalence
    // breaks the final phase's)
    "w08_skip_rewrites" ->
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag AS rf,
        |                  (l_orderkey % 4) AS m FROM lineitem)
        |SELECT 'captured' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM b WHERE m IN (1, 2, 3) GROUP BY rf
        |UNION ALL
        |SELECT 'final', rf, COUNT(*), CAST(SUM(k) AS BIGINT)
        |FROM b GROUP BY rf
        |ORDER BY phase, rf""".stripMargin,
    // w09: native Iceberg interop — the engine writes a REAL Iceberg v2
    // table (public spec: metadata.json + avro manifest chain), registers
    // the pointer, and reads it back through the DSv2 face with the
    // manifest bounds driving file pruning; relationally it is just a
    // projection + filter + aggregate over lineitem
    // round 13: the gate now spans snapshot lineage + merge-on-read —
    // snapshot 1 = even keys, snapshot 2 = odd keys (one totally
    // (k, ln)-ordered file), snapshot 3 = positional deletes of the 3
    // smallest odd (k, ln) rows + equality deletes of every key with a
    // qty>=49 line; relationally two anti-joins over lineitem
    // positional deletes replay as a RANK filter over the same total
    // order the Spark side sorts the file by (the full projected row —
    // (k, ln) alone has duplicate pairs in the synthetic data, so a
    // key-match delete would over-delete and a partial-order rank would
    // tie-break differently; round 15, caught at sf0.1)
    "w09_iceberg_roundtrip" ->
      """WITH base AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |odd_ranked AS (
        |  SELECT k, ln, qty, rf,
        |         ROW_NUMBER() OVER (ORDER BY k, ln, qty, rf) - 1 AS p
        |  FROM base WHERE k % 2 = 1),
        |survivors AS (
        |  SELECT k, ln, qty, rf FROM base WHERE k % 2 = 0
        |  UNION ALL
        |  SELECT k, ln, qty, rf FROM odd_ranked WHERE p > 2),
        |eq_del AS (SELECT DISTINCT k FROM base WHERE qty >= 49)
        |SELECT rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM survivors b
        |WHERE k <= 30000
        |  AND NOT EXISTS (SELECT 1 FROM eq_del e WHERE e.k = b.k)
        |GROUP BY rf""".stripMargin,
    // w10: type widening — the engine runs metadata-only ALTER COLUMN
    // TYPE commits and reads narrow-typed files through the widened
    // schema; relationally it is the union of the two slices with the
    // widening casts applied up front (float quantities are integral
    // ≤ 50, so the BIGINT cast is exact in both engines; the decimal
    // sum is exact and its DOUBLE rendering well within 53 bits)
    "w10_type_widening" ->
      """WITH w AS (
        |  SELECT CAST(CAST(l_orderkey AS INT) AS BIGINT) AS k,
        |         CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) AS qty,
        |         CAST(CAST(l_extendedprice AS DECIMAL(9,2)) AS DECIMAL(14,2)) AS price
        |  FROM lineitem WHERE l_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT CAST(l_orderkey AS BIGINT) + 5000000,
        |         CAST(l_quantity AS DOUBLE),
        |         CAST(l_extendedprice AS DECIMAL(14,2))
        |  FROM lineitem WHERE l_orderkey % 3 = 1)
        |SELECT COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(CAST(qty AS BIGINT)) AS BIGINT) AS qty_sum,
        |       CAST(SUM(price) AS DOUBLE) AS price_sum
        |FROM w""".stripMargin,
    // w11: hidden partitioning — days(ts) shapes the files and prunes
    // the week-range scan; relationally it is a filter + aggregate
    "w11_hidden_partitioning" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |       CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type""".stripMargin,
    // w12: v3 deletion vectors — two one-file snapshots totally ordered
    // by (k, ln), so a file's row POSITIONS are its per-parity (k, ln)
    // ranks; the two DV commits delete even ranks 100..4999 (dense,
    // bitmap-container scale) and odd ranks 0,1,2 and 5 (the second
    // commit's REPLACE merge); relationally a ROW_NUMBER filter
    "w12_deletion_vectors" ->
      """WITH base AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k % 2
        |                               ORDER BY k, ln, qty, rf) - 1 AS p
        |  FROM base)
        |SELECT rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM ranked
        |WHERE k <= 30000
        |  AND NOT (k % 2 = 0 AND p BETWEEN 100 AND 4999)
        |  AND NOT (k % 2 = 1 AND (p <= 2 OR p = 5))
        |GROUP BY rf""".stripMargin,
    // w13: ORC data files — the engine writes and reads back an Iceberg
    // table whose data files are ORC; relationally a projection +
    // filter + aggregate over lineitem
    "w13_iceberg_orc" ->
      """SELECT l_returnflag AS rf, COUNT(*) AS cnt,
        |       CAST(SUM(l_orderkey) AS BIGINT) AS k_sum,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM lineitem
        |WHERE l_orderkey <= 30000
        |GROUP BY rf""".stripMargin,
    // w14: AVRO data files — the engine writes (native avro writer,
    // stats in the write pass) and reads back an Iceberg table with
    // avro data files through both faces under sync-marker multi-slice
    // splits; relationally the same projection + filter + aggregate
    // replayed once per face. The DOUBLE p_sum is exact: cents sums are
    // integers < 2^53 in both engines.
    "w14_iceberg_avro" ->
      """WITH a AS (
        |  SELECT l_returnflag AS rf, COUNT(*) AS cnt,
        |         CAST(SUM(l_orderkey) AS BIGINT) AS k_sum,
        |         MIN(CAST(l_shipdate AS DATE)) AS d_min,
        |         CAST(epoch_us(MAX(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) AS ts_max,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS p_sum
        |  FROM lineitem
        |  WHERE l_orderkey <= 30000
        |  GROUP BY rf)
        |SELECT 'sql' AS face, * FROM a
        |UNION ALL
        |SELECT 'df' AS face, * FROM a""".stripMargin,
    // w15: MIXED-format Iceberg table (ORC base + parquet append) —
    // phase 'low' filters k <= 30000 (the appended keys sit at +10M, so
    // only ORC rows contribute); phase 'all' aggregates both format
    // groups: lineitem plus the shifted head re-projection
    "w15_iceberg_mixed" ->
      """WITH t AS (
        |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS qty,
        |         l_returnflag AS rf
        |  FROM lineitem
        |), appended AS (
        |  SELECT k + 10000000 AS k, qty, rf FROM t WHERE k <= 1000
        |), full_t AS (
        |  SELECT * FROM t UNION ALL SELECT * FROM appended)
        |SELECT 'low' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM full_t WHERE k <= 30000 GROUP BY rf
        |UNION ALL
        |SELECT 'all' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM full_t GROUP BY rf""".stripMargin,
    // w16: streaming from a registered Iceberg pointer — the bootstrap
    // phase is snapshot 1 (the %3=0 slice), the incremental phase is
    // cumulative after two upstream append commits advanced the pointer
    "w16_iceberg_stream" ->
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag AS rf,
        |                  (l_orderkey % 3) AS m FROM lineitem)
        |SELECT 'boot' AS phase, rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM b WHERE m = 0 GROUP BY rf
        |UNION ALL SELECT 'incr', rf, COUNT(*), CAST(SUM(k) AS BIGINT)
        |FROM b GROUP BY rf
        |ORDER BY phase, rf""".stripMargin,
    // w17: Iceberg ride-through + stream admission control (round 16).
    // The table is built from %4 slices: append(0), append(1), a
    // row-preserving REWRITE ("replace"), append(2). Phase 'ride' is
    // the skipRewrites incremental read (exactly the two appends —
    // rewritten base copies must not double-serve); phase 'stream' is
    // the bounded earliest bootstrap (maxFilesPerTrigger=1, exactly-
    // once across 3 snapshot-aligned batches) = all three slices.
    "w17_iceberg_ride_admission" ->
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag AS rf,
        |                  (l_orderkey % 4) AS m FROM lineitem)
        |SELECT 'ride' AS phase, rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM b WHERE m IN (1, 2) GROUP BY rf
        |UNION ALL SELECT 'stream', rf, COUNT(*), CAST(SUM(k) AS BIGINT)
        |FROM b WHERE m IN (0, 1, 2) GROUP BY rf
        |ORDER BY phase, rf""".stripMargin,
    // w18: v3 row lineage through the SQL metadata-column face
    // (round 16). The appended file is written in (k, rf) order, so
    // _row_id = ROW_NUMBER() - 1 over that order; ties are identical
    // rows whose interchangeable ids cancel in SUM/COUNT. DV deletes
    // kill k%10=3 of the appended file; the pre-upgrade base file
    // serves NULL _row_id (phase 'base').
    "w18_row_lineage_sql" ->
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag AS rf,
        |                  (l_orderkey % 4) AS m FROM lineitem),
        |app AS (SELECT k, rf, ROW_NUMBER() OVER (ORDER BY k, rf) - 1 AS rid
        |        FROM b WHERE m = 1)
        |SELECT 'base' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(NULL AS BIGINT) AS rid_sum, CAST(SUM(k) AS BIGINT) AS k_sum
        |FROM b WHERE m = 0 GROUP BY rf
        |UNION ALL
        |SELECT 'app', rf, COUNT(*), CAST(SUM(rid) AS BIGINT),
        |       CAST(SUM(k) AS BIGINT)
        |FROM app WHERE k % 10 <> 3 GROUP BY rf
        |ORDER BY phase, rf""".stripMargin,
    // w19: the Hive-migration WRITE life cycle (round 16) — an adopted
    // ORC table takes a parquet INSERT INTO (mixed layout through the
    // engine's own metadata); same relational shape as w15, now with
    // the ENGINE owning the commit
    "w19_mixed_insert" ->
      """WITH t AS (
        |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS qty,
        |         l_returnflag AS rf
        |  FROM lineitem
        |), appended AS (
        |  SELECT k + 10000000 AS k, qty, rf FROM t WHERE k <= 1000
        |), full_t AS (
        |  SELECT * FROM t UNION ALL SELECT * FROM appended)
        |SELECT 'low' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM full_t WHERE k <= 30000 GROUP BY rf
        |UNION ALL
        |SELECT 'all' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM full_t GROUP BY rf""".stripMargin,
    // w29: the streaming Iceberg sink (round 17) — three micro-batch
    // append snapshots with a crash-replayed batch fenced; the final
    // pointer holds exactly one copy of lineitem.
    "w29_iceberg_sink" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM t GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w30: relocated layouts (round 18) — an exported table with
    // global equality deletes re-homed at a sibling location (data and
    // manifests outside it, absolute spellings); live rows are the
    // 90% base minus the deleted keys.
    "w30_relocated" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM t WHERE k % 10 < 9 AND NOT (k % 13 = 0)),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM live GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM live WHERE k <= 30000 GROUP BY rf
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w34: the uuid-ADOPTION lifecycle (round 20) — a real Iceberg
    // table with an annotated fixed[16] uuid column (u = md5(k) with
    // dashes, NULL every k%50==0; 75% of customer keys) is adopted,
    // takes a SQL INSERT of the rest, eq-MOR deletes keyed on the uuid
    // AND a data column, and a compaction that materializes the
    // canonical strings. The oracle replays the uuid text with
    // DuckDB's own md5.
    "w34_uuid_adopt" ->
      """WITH t AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
        |u0 AS (
        |  SELECT k, CASE WHEN k % 50 = 0 THEN NULL ELSE
        |    concat(substr(md5(CAST(k AS VARCHAR)), 1, 8), '-',
        |           substr(md5(CAST(k AS VARCHAR)), 9, 4), '-',
        |           substr(md5(CAST(k AS VARCHAR)), 13, 4), '-',
        |           substr(md5(CAST(k AS VARCHAR)), 17, 4), '-',
        |           substr(md5(CAST(k AS VARCHAR)), 21, 12)) END AS u
        |  FROM t),
        |live AS (
        |  SELECT * FROM u0 WHERE NOT (k % 10 = 7) AND NOT (k % 23 = 0)),
        |g AS (
        |  SELECT COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         MIN(u) AS u_min, COUNT(DISTINCT u) AS du
        |  FROM live)
        |SELECT 'mor' AS phase, * FROM g
        |UNION ALL
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum, MIN(u) AS u_min,
        |       COUNT(DISTINCT u) AS du
        |FROM live WHERE u = (SELECT u FROM u0 WHERE k = 1)
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w32: the relocated-ADOPTION lifecycle (round 19) — a relocated
    // table with live eq deletes (80% base minus k%13 keys) is adopted
    // zero-copy, takes a SQL INSERT (the remaining 20%), an eq-MOR
    // delete (k%17 keys, applying to carried and inserted rows alike),
    // and a compaction that re-homes everything engine-owned.
    "w32_relocated_adopt" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM t
        |  WHERE ((k % 10 < 8 AND NOT (k % 13 = 0)) OR k % 10 >= 8)
        |    AND NOT (k % 17 = 0)),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM live GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM live WHERE k <= 30000 GROUP BY rf
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w31: the one-commit mixed-format upsert (round 18) — an ORC base
    // takes parquet inserts + equality delete keys in ONE snapshot;
    // the deletes hit only the strictly-older base files, so the
    // same-commit inserts survive their own keys.
    "w31_mixed_upsert" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM t WHERE k % 10 < 8 AND NOT (k % 16 = 0)
        |  UNION ALL
        |  SELECT * FROM t WHERE k % 10 = 8),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM live GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM live WHERE k <= 30000 GROUP BY rf
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w28: nested initial-defaults (round 17) — pre-addition rows
    // serve the struct-member constant w=5; an appended subset carries
    // its own w values; the oracle replays the union.
    "w28_nested_default" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |rows_u AS (
        |  SELECT k, qty, rf, CAST(5 AS BIGINT) AS w FROM t
        |  UNION ALL
        |  SELECT k, qty, rf, k % 7 AS w FROM t WHERE k % 10 >= 8),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS qty_sum,
        |         CAST(SUM(w) AS BIGINT) AS w_sum
        |  FROM rows_u GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, rf, COUNT(*) AS cnt,
        |       CAST(SUM(qty) AS BIGINT) AS qty_sum,
        |       CAST(SUM(w) AS BIGINT) AS w_sum
        |FROM rows_u WHERE w = 5 GROUP BY rf
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w27: partition-SCOPED equality deletes (round 17) — the Flink
    // upsert/CDC shape: two deletes keyed on the shared data column k,
    // each confined to ONE rf partition; the oracle replays the scopes
    // relationally (keys survive in every other partition).
    "w27_scoped_eq_delete" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM t WHERE NOT (rf = 'N' AND k % 7 = 0)
        |                    AND NOT (rf = 'A' AND k % 11 = 0)),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM live GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, * FROM g WHERE rf = 'N'
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w26: the ADOPTED hive-import lifecycle (round 16) — import 80% of
    // lineitem as a hive tree, adopt, SQL-INSERT the rest, eq-MOR
    // delete rf='N', compact. Final state = lineitem minus rf='N'.
    "w26_hive_adopt" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM t WHERE rf <> 'N'),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM live GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, * FROM g WHERE rf = 'R'
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w25: merge-on-read over an identity-partitioned table (round 16)
    // — global equality deletes keyed on a data column AND on the fill
    // column itself; the oracle replays the deletes relationally.
    "w25_partitioned_mor" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |live AS (
        |  SELECT * FROM t WHERE rf <> 'N' AND k % 997 <> 0),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM live GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, * FROM g WHERE rf = 'R'
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w24: the partitioned-append lifecycle (round 16) — an identity-
    // partitioned export takes a parquet and an ORC append (the table
    // goes mixed with fills); base+appends = ALL of lineitem, so the
    // oracle is the same replay as w23's.
    "w24_partitioned_append" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM t GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, * FROM g WHERE rf = 'R'
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w23: the add_files / Hive-import shape (round 16) — data files
    // LACK the partition column; every rf value is a manifest
    // partition record served as a per-file constant fill, with
    // synthesized lower=upper bounds driving the filtered phase's
    // pruning. Oracle replays the aggregates from raw lineitem.
    "w23_hive_import" ->
      """WITH t AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS k,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM t GROUP BY rf)
        |SELECT 'all' AS phase, * FROM g
        |UNION ALL
        |SELECT 'flt' AS phase, * FROM g WHERE rf = 'R'
        |UNION ALL
        |SELECT 'df' AS phase, * FROM g""".stripMargin,
    // w20: nested-type Iceberg export (round 16). The struct gate is
    // k%7<>0 (NULL structs drop via WHERE st IS NOT NULL); the single-
    // entry maps make element_at(sm, rf) = qty and the im probe always
    // hit, so m_sum = qty_sum and im_hits = cnt — plumbing checks, the
    // oracle replays all of it as flat scalars
    "w20_nested_export" ->
      """WITH b AS (
        |  SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(l_linenumber AS BIGINT) AS ln
        |  FROM lineitem WHERE l_orderkey % 7 <> 0),
        |g AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS qty_sum,
        |         CAST(SUM(ln) AS BIGINT) AS ln_sum,
        |         CAST(SUM(qty) AS BIGINT) AS m_sum,
        |         COUNT(*) AS im_hits
        |  FROM b GROUP BY rf)
        |SELECT 'sql' AS face, * FROM g
        |UNION ALL
        |SELECT 'df' AS face, * FROM g""".stripMargin,
    // w21: ORC merge-on-read — two one-parity ORC files, each totally
    // ordered by the full projected row, so row positions are the
    // per-parity ranks; one delete snapshot removes even ranks 10..99,
    // odd ranks 0..2 (positional) and k ∈ {2,3,5} (equality);
    // relationally a ROW_NUMBER filter + NOT IN, replayed per face
    "w21_orc_mor" ->
      """WITH base AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k % 2
        |                               ORDER BY k, ln, qty, rf) - 1 AS p
        |  FROM base),
        |kept AS (
        |  SELECT * FROM ranked
        |  WHERE NOT (k % 2 = 0 AND p BETWEEN 10 AND 99)
        |    AND NOT (k % 2 = 1 AND p <= 2)
        |    AND k NOT IN (2, 3, 5)),
        |a AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM kept WHERE k <= 30000 GROUP BY rf)
        |SELECT 'sql' AS face, * FROM a
        |UNION ALL
        |SELECT 'df' AS face, * FROM a""".stripMargin,
    // w33: w21's ROW_NUMBER replay on the avro base — positions are
    // per-parity sorted ranks (each parity is ONE totally-ordered avro
    // file), the counting read recovers them over the sync-split
    // decoder, and the equality keys drop whole orderkeys
    "w33_avro_mor" ->
      """WITH base AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln,
        |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS rf
        |  FROM lineitem),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k % 2
        |                               ORDER BY k, ln, qty, rf) - 1 AS p
        |  FROM base),
        |kept AS (
        |  SELECT * FROM ranked
        |  WHERE NOT (k % 2 = 0 AND p BETWEEN 10 AND 99)
        |    AND NOT (k % 2 = 1 AND p <= 2)
        |    AND k NOT IN (2, 3, 5)),
        |a AS (
        |  SELECT rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS k_sum,
        |         CAST(SUM(qty) AS BIGINT) AS qty_sum
        |  FROM kept WHERE k <= 30000 GROUP BY rf)
        |SELECT 'sql' AS face, * FROM a
        |UNION ALL
        |SELECT 'df' AS face, * FROM a""".stripMargin,
    // w22: the variant column was BUILT from (qty, rf), so extracting
    // typed values back out and aggregating is relationally the same
    // aggregate over the raw columns, replayed per face
    "w22_variant" ->
      """WITH a AS (
        |  SELECT l_returnflag AS rf, COUNT(*) AS cnt,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
        |         CAST(SUM(l_orderkey) AS BIGINT) AS k_sum
        |  FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 10
        |  GROUP BY rf)
        |SELECT 'sql' AS face, * FROM a
        |UNION ALL
        |SELECT 'df' AS face, * FROM a""".stripMargin,
    // w05: incremental append reads are manifest set-differences, so
    // each phase's change set is relationally just the slice that
    // commit appended (WriteQueries.w05 runs the real version-diff
    // reads; the oracle replays the slices as filters)
    "w05_incremental_read" ->
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag AS rf,
        |                  (l_orderkey % 3) AS m FROM lineitem)
        |SELECT 'v2' AS phase, rf, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM b WHERE m = 1 GROUP BY rf
        |UNION ALL SELECT 'v3', rf, COUNT(*), CAST(SUM(k) AS BIGINT)
        |FROM b WHERE m = 2 GROUP BY rf
        |UNION ALL SELECT 'since', rf, COUNT(*), CAST(SUM(k) AS BIGINT)
        |FROM b WHERE m <> 0 GROUP BY rf
        |ORDER BY phase, rf""".stripMargin,
    // p01: the composed pipeline — each CTE block is the already-proven
    // per-stage oracle (t07 repetition → d07 decontamination → d01
    // pairs → d06 recursive-CTE canonical → t05 sample → t06 pack),
    // chained on the shrinking survivor set; one hash checks the whole
    // pipeline end-to-end (operators/Pipeline.trainingPipelineOf)
    "p01_training_pipeline" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |rep AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 2 THEN
        |    CAST(len(t) - 1 - len(list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])) AS DOUBLE)
        |      / CAST(len(t) - 1 AS DOUBLE) ELSE 0.0 END AS rep2_raw,
        |  CASE WHEN len(t) >= 3 THEN
        |    CAST(len(t) - 2 - len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])) AS DOUBLE)
        |      / CAST(len(t) - 2 AS DOUBLE) ELSE 0.0 END AS rep3_raw
        | FROM tk WHERE doc_id % 10 <> 7),
        |clean AS (SELECT doc_id FROM rep WHERE rep2_raw <= 0.2 AND rep3_raw <= 0.1),
        |sh5 AS (SELECT doc_id, CASE WHEN len(t) >= 5
        |    THEN list_distinct([list_aggregate(t[i:i+4], 'string_agg', ' ') for i in range(1, len(t) - 3)])
        |    ELSE [] END AS s FROM tk),
        |ex5 AS (SELECT doc_id, unnest(s) AS g FROM sh5),
        |bench AS (SELECT DISTINCT g FROM ex5 WHERE doc_id % 10 = 7),
        |contam AS (SELECT DISTINCT ex5.doc_id FROM ex5 JOIN bench USING (g)
        |           WHERE ex5.doc_id IN (SELECT doc_id FROM clean)),
        |decon AS (SELECT doc_id FROM clean
        |          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |sh3 AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |    THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
        |    ELSE [] END AS s FROM tk WHERE doc_id IN (SELECT doc_id FROM decon)),
        |ex3 AS (SELECT doc_id, len(s) AS n, unnest(s) AS sg FROM sh3),
        |co AS (SELECT a.doc_id AS a, b.doc_id AS b, a.n AS na, b.n AS nb, COUNT(*) AS c
        |       FROM ex3 a JOIN ex3 b ON a.sg = b.sg AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2, 3, 4),
        |pr AS (SELECT a, b FROM co WHERE c * 1.0 / (na + nb - c) >= 0.8),
        |e AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
        |reach(id, r) AS (
        | SELECT a, a FROM e
        | UNION
        | SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
        |cmp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, ROUND(LEAST(1.0, len(t) / 100.0) *
        |        (1.0 - len(list_filter(t, x -> x IN ('the','a','of','and','to'))) * 1.0 / len(t)), 4) AS score
        |      FROM tk),
        |ranked AS (SELECT cmp.comp, cmp.id,
        |  ROW_NUMBER() OVER (PARTITION BY cmp.comp ORDER BY q.score DESC, cmp.id) AS rn
        | FROM cmp JOIN q ON cmp.id = q.doc_id),
        |losers AS (SELECT id AS doc_id FROM ranked WHERE rn > 1),
        |deduped AS (SELECT doc_id FROM decon
        |            WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |samp AS (SELECT d.doc_id FROM deduped d JOIN documents USING (doc_id)
        |         WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 <
        |               CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 75 ELSE 50 END),
        |toks AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tok,
        |  ((doc_id % 2147483648) * 2654435761) % 4294967296 % 8 AS shard
        | FROM documents WHERE doc_id IN (SELECT doc_id FROM samp)),
        |c AS (SELECT doc_id, shard, n_tok,
        |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        | FROM toks)
        |SELECT doc_id, shard, n_tok, start_tok,
        | start_tok // 512 AS bin, start_tok % 512 AS off
        |FROM c ORDER BY doc_id""".stripMargin,
    // m01's oracle recomputes the decoded-image statistics analytically
    // from the seed pixel formula — hash match proves the real
    // ImageIO decode + area-average resize path is exact (see
    // operators/Multimodal.imageStats).
    "m01_image_decode" ->
      """WITH m AS (SELECT p_partkey AS media_id, 8 + 4*(p_partkey % 3) AS w, 8 + 4*(p_partkey % 2) AS h
        |           FROM part WHERE p_partkey <= 2000),
        |mx AS (SELECT *, unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x FROM m),
        |px AS (SELECT *, unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y FROM mx)
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        | ROUND(AVG(CAST((media_id*31 + x*7 + y*13) % 256 AS DOUBLE)), 4) AS mean_px,
        | ROUND(AVG(CASE WHEN x < w//4 AND y < h//4
        |   THEN CAST((media_id*31 + x*7 + y*13) % 256 AS DOUBLE) END), 4) AS p00
        |FROM px GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // Analytic recompute of the WAV seed formula — a hash match proves the
    // javax.sound.sampled PCM16 encode → decode path is exact (see
    // operators/Multimodal.audioStats).
    "m02_audio_decode" ->
      """WITH m AS (SELECT p_partkey AS media_id, 2000 + 500*(p_partkey % 4) AS n
        |           FROM part WHERE p_partkey <= 500),
        |sx AS (SELECT media_id, n, unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i FROM m),
        |s AS (SELECT media_id, n, i, (media_id*31 + i*7) % 2001 - 1000 AS v FROM sx)
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        | CAST(n AS DOUBLE) * 1000.0 / 8000.0 AS duration_ms,
        | ROUND(sqrt(CAST(SUM(v*v) AS DOUBLE) / n), 4) AS rms,
        | CAST(SUM(CASE WHEN i > 0 AND v * ((media_id*31 + (i-1)*7) % 2001 - 1000) < 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        | CAST(MAX(abs(v)) AS INT) AS peak
        |FROM s GROUP BY media_id, n ORDER BY media_id""".stripMargin,
    // Analytic recompute of the cross-modal pipeline: features are exact
    // 4×3 block means of the quadratic pixel mixer, pairs are all-pairs
    // cosine ≥ 0.998 — byte-identical planted duplicates land at exactly
    // 1.0, max background ≈ 0.995 (see operators/Multimodal.crossModalDedup).
    "m03_crossmodal_dedup" ->
      """WITH ids AS (SELECT p_partkey AS id FROM part WHERE p_partkey <= 300),
        |xs AS (SELECT id, unnest(generate_series(0, CAST(15 AS BIGINT))) AS x FROM ids),
        |xy AS (SELECT id, x, unnest(generate_series(0, CAST(11 AS BIGINT))) AS y FROM xs),
        |f AS (SELECT id, (y//3)*4 + (x//4) AS k,
        |       AVG(CAST(((id%100 + 1)*(y*16 + x + 17) * ((id%100 + 1)*(y*16 + x + 17)) % 99991) % 256 AS DOUBLE)/256.0) AS fv
        |      FROM xy GROUP BY id, (y//3)*4 + (x//4)),
        |v AS (SELECT id, list(fv ORDER BY k) AS vec FROM f GROUP BY id)
        |SELECT a.id AS a, b.id AS b
        |FROM v a JOIN v b ON a.id < b.id
        |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.998
        |ORDER BY a, b""".stripMargin,
    // m04's oracle recomputes the decoded-video statistics analytically
    // from the seed pixel formula: per-frame INTEGER pixel sums, so every
    // stat is an exact integer over a constant divisor on both engines
    // (operators/Multimodal.videoStats).
    "m04_video_decode" ->
      """WITH m AS (SELECT p_partkey AS media_id, 2 + p_partkey % 4 AS nf
        |           FROM part WHERE p_partkey <= 300),
        |fx AS (SELECT media_id, nf, unnest(generate_series(0, CAST(nf AS BIGINT) - 1)) AS f FROM m),
        |px AS (SELECT media_id, nf, f, unnest(generate_series(0, CAST(15 AS BIGINT))) AS x FROM fx),
        |pxy AS (SELECT media_id, nf, f, x, unnest(generate_series(0, CAST(11 AS BIGINT))) AS y FROM px),
        |fs AS (SELECT media_id, nf, f,
        |        CAST(SUM((media_id*31 + f*17 + x*7 + y*13) % 256) AS BIGINT) AS s
        |       FROM pxy GROUP BY 1, 2, 3),
        |fd AS (SELECT media_id, nf, f, s,
        |        s - LAG(s) OVER (PARTITION BY media_id ORDER BY f) AS d
        |       FROM fs)
        |SELECT media_id, CAST(nf AS BIGINT) AS n_frames,
        | ROUND(CAST(MAX(CASE WHEN f = 0 THEN s END) AS DOUBLE) / 192.0, 4) AS mean_f0,
        | ROUND(CAST(SUM(s) AS DOUBLE) / (192.0 * nf), 4) AS mean_all,
        | ROUND(CAST(COALESCE(MAX(ABS(d)), 0) AS DOUBLE) / 192.0, 4) AS drift
        |FROM fd GROUP BY media_id, nf ORDER BY media_id""".stripMargin,
    "s01_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | q AS (SELECT v FROM e WHERE vec_id = 0)
        |SELECT b.vec_id, ROUND(list_cosine_similarity(q.v, b.v), 4) AS c
        |FROM e b, q WHERE b.vec_id <> 0
        |ORDER BY list_cosine_similarity(q.v, b.v) DESC, b.vec_id LIMIT 5""".stripMargin,
    // s03: batch kNN — rank on the unrounded cosine (both engines compute
    // the same left-to-right double dot), ties broken by vec_id
    "s03_knn_join" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
        |sc AS (SELECT q.qid, e.vec_id,
        |         list_cosine_similarity(e.v, q.qv) AS craw,
        |         ROW_NUMBER() OVER (PARTITION BY q.qid
        |           ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rn
        |       FROM e JOIN q ON e.vec_id <> q.qid)
        |SELECT qid, CAST(rn AS INT) AS rn, vec_id, ROUND(craw, 4) AS c
        |FROM sc WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,
    // s02: the ANN results are approximate by construction, so the
    // registered query is the deterministic recall GATE (see
    // Similarity.annIvfGate): one row whose recall_ok boolean flips —
    // and hash-mismatches — if the IVF path regresses. The oracle
    // states the expected row from the data + literals.
    "s02_ann_ivf" ->
      """SELECT count(*) AS n_queries, CAST(3 AS INTEGER) AS k,
        | TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "t01_langid" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |h AS (SELECT doc_id,
        | CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS en_hits,
        | CAST(len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) AS BIGINT) AS de_hits,
        | CAST(len(list_filter(t, x -> x IN ('el','la','los','y','es'))) AS BIGINT) AS es_hits,
        | CAST(len(list_filter(t, x -> x IN ('le','les','et','est','dans'))) AS BIGINT) AS fr_hits,
        | CAST(len(list_filter(t, x -> x IN ('的','是','了'))) AS BIGINT) AS zh_hits
        |FROM t)
        |SELECT doc_id, en_hits, de_hits, es_hits, fr_hits, zh_hits,
        | CASE
        |  WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
        |  WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
        |  WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
        |  WHEN fr_hits >= zh_hits THEN 'fr'
        |  ELSE 'zh' END AS pred
        |FROM h ORDER BY doc_id""".stripMargin,
    "t02_quality" ->
      """WITH b AS (SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents),
        |m AS (SELECT doc_id,
        | CAST(len(t) AS BIGINT) AS n_tokens,
        | CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_ns,
        | CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
        | CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop
        |FROM b)
        |SELECT doc_id, n_tokens, n_chars_ns, n_punct, n_stop,
        | CAST(ROUND(n_chars_ns * 1.0 / n_tokens, 4) AS DOUBLE) AS avg_tok_len,
        | CAST(ROUND(n_stop * 1.0 / n_tokens, 4) AS DOUBLE) AS stop_ratio,
        | CAST(ROUND(LEAST(1.0, n_tokens / 100.0) * (1.0 - n_stop * 1.0 / n_tokens), 4) AS DOUBLE) AS score
        |FROM m ORDER BY doc_id""".stripMargin,
    "t03_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t05_stratified_sample" -> T05Oracle,
    // t07: Gopher-style duplicate-n-gram fractions; DuckDB recomputes the
    // distinct/total n-gram ratio with list comprehensions — integer
    // ratios, so the keep verdict compares identically in both engines
    "t07_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |r AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 2 THEN
        |    CAST(len(t) - 1 - len(list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])) AS DOUBLE)
        |      / CAST(len(t) - 1 AS DOUBLE) ELSE 0.0 END AS rep2_raw,
        |  CASE WHEN len(t) >= 3 THEN
        |    CAST(len(t) - 2 - len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])) AS DOUBLE)
        |      / CAST(len(t) - 2 AS DOUBLE) ELSE 0.0 END AS rep3_raw
        | FROM tk)
        |SELECT doc_id, ROUND(rep2_raw, 4) AS rep2, ROUND(rep3_raw, 4) AS rep3,
        | rep2_raw <= 0.2 AND rep3_raw <= 0.1 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    // t08: corpus vocabulary by document frequency, top-50 with a total
    // order (df desc, token asc) so the LIMIT is deterministic
    "t08_vocab" ->
      """WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS token
        |            FROM documents)
        |SELECT token, COUNT(*) AS df FROM tok WHERE token <> ''
        |GROUP BY token ORDER BY df DESC, token LIMIT 50""".stripMargin,
    // t09: corpus-conditional bigram LM score — integer corpus counts,
    // add-one smoothing over the unigram vocab, and a POSITION-ORDERED
    // left fold for the per-doc mean (list(... ORDER BY i) +
    // list_reduce) so both engines sum the same doubles in the same
    // sequence (TextOps.lmScoreOf mirrors with sort_array + aggregate)
    "t09_lm_score" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |uni AS (SELECT w, COUNT(*) AS c1
        |        FROM (SELECT unnest(t) AS w FROM tk) GROUP BY w),
        |vc AS (SELECT COUNT(*) AS v FROM uni),
        |bi AS (SELECT doc_id, u['i'] AS i, u['w1'] AS w1, u['bg'] AS bg FROM (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |    THEN [{'i': i, 'w1': t[i], 'bg': t[i] || ' ' || t[i + 1]} for i in range(1, len(t))]
        |    ELSE [] END) AS u FROM tk)),
        |bc AS (SELECT bg, COUNT(*) AS c12 FROM bi GROUP BY bg),
        |sc AS (SELECT doc_id, i, ln((c12 + 1) / (c1 + v)) AS lnp
        |       FROM bi JOIN bc USING (bg) JOIN uni ON bi.w1 = uni.w CROSS JOIN vc),
        |ag AS (SELECT doc_id, list(lnp ORDER BY i) AS l FROM sc GROUP BY doc_id)
        |SELECT d.doc_id,
        |       ROUND(list_reduce(ag.l, (a, b) -> a + b) / len(ag.l), 4) AS lm_score
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN ag USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // t06: concat-and-chunk packing — per-shard running token count in
    // doc_id order, cut every 512 tokens; shard = t05's Knuth hash mod 8,
    // tokens = t03's pre-tokenizer count (TextOps.packSequencesOf)
    "t06_pack_sequences" ->
      """WITH toks AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tok,
        |  ((doc_id % 2147483648) * 2654435761) % 4294967296 % 8 AS shard
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        | FROM toks)
        |SELECT doc_id, shard, n_tok, start_tok,
        | start_tok // 512 AS bin, start_tok % 512 AS off
        |FROM c ORDER BY doc_id""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |  [CAST(unicode(c) AS BIGINT) for c in string_split(text, '')]),
        |  (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )

  private val T05Oracle: String =
    """SELECT doc_id, lang FROM (
      | SELECT doc_id, lang,
      |  (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket,
      |  CASE WHEN lang = 'en' THEN 25 WHEN lang = 'zh' THEN 75 ELSE 50 END AS pct
      | FROM documents) t
      |WHERE bucket < pct ORDER BY doc_id""".stripMargin

  /** Shared oracle for the exact (d04) and SRP-LSH (d05) embedding
    * near-dup paths: all pairs a < b with cosine ≥ 0.46. */
  private val EmbedDedupOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS a, b.vec_id AS b, ROUND(list_cosine_similarity(a.v, b.v), 4) AS c
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.46 ORDER BY 1, 2""".stripMargin

  /** Shared oracle for the three text near-dup detectors: exact 3-word
    * shingle Jaccard ≥ 0.8 over pairs a < b. Common-shingle counts come
    * from an exploded self-join (inverted index) instead of per-pair
    * `list_intersect` over the n²/2 cartesian — identical output (same
    * integer counts → same doubles → same rounding), measured 590 s →
    * 1 s in DuckDB at sf0.1, which makes the cross-SF sweep routine. */
  private val JaccardOracle: String =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(t) >= 3
      |   THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
      |   ELSE [] END AS s FROM tk),
      |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS sg FROM sh),
      |co AS (SELECT a.doc_id AS a, b.doc_id AS b, a.n AS na, b.n AS nb, COUNT(*) AS c
      |       FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2, 3, 4)
      |SELECT a, b, ROUND(c * 1.0 / (na + nb - c), 4) AS j
      |FROM co WHERE c * 1.0 / (na + nb - c) >= 0.8
      |ORDER BY 1, 2""".stripMargin
}
