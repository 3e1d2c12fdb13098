package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the normative operator surface (SURVEY §2.B): one entry
  * per implemented operator, each grounded in a reference behavior (see
  * the Scaladoc of the backing object in `graft.ops` / `graft.operators`).
  * `oracleSql` carries the DuckDB-equivalent SQL for every query whose
  * semantics are ANSI-SQL-expressible; the driver hash-compares both
  * result sets (columns sorted by name) on `/root/testdata/sf0.01`.
  *
  * Determinism rules (SURVEY §2.B): every query ends in a total ORDER BY;
  * money flows through exact DECIMAL(18,2) then DOUBLE; no raw timestamp
  * output columns; computed integers are BIGINT on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full star join — revenue by region (SURVEY §7 step 1). */
  def entry(spark: SparkSession): DataFrame =
    Joins.multiwayStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Group S — scans, projection, types
    "s_scan_project_rename" -> (Scans.scanProjectRename _),
    "s_cast_money_decimal"  -> (Scans.castMoneyDecimal _),
    "s_parse_date"          -> (Scans.parseDate _),
    "s_json_extract"        -> (Scans.jsonExtract _),
    "s_string_funcs"        -> (Scans.stringFuncs _),
    "s_math_funcs"          -> (Scans.mathFuncs _),
    // Group F — filters & predicates
    "f_event_type_in"       -> (Filters.eventTypeIn _),
    "f_compound_pred"       -> (Filters.compoundPred _),
    // Group G — aggregation
    "g_count_star"          -> (Aggregates.countStar _),
    "g_group_agg"           -> (Aggregates.groupAgg _),
    "g_distinct"            -> (Aggregates.distinctCounts _),
    "g_approx_distinct"     -> (Aggregates.approxDistinct _),
    "g_rollup"              -> (Aggregates.rollupAgg _),
    "g_having"              -> ((s: SparkSession, d: String) => Aggregates.havingAgg(s, d)),
    // Group J — joins
    "j_broadcast_dim"       -> (Joins.broadcastDim _),
    "j_multiway_star"       -> (Joins.multiwayStar _),
    "j_left_outer"          -> (Joins.leftOuter _),
    "j_semi"                -> (Joins.semiJoin _),
    "j_anti"                -> (Joins.antiJoin _),
    // Group W — window functions
    "w_last_wins_dedup"     -> (Windows.lastWinsDedup _),
    "w_running_balance"     -> (Windows.runningBalance _),
    "w_rank_topn_per_group" -> ((s: SparkSession, d: String) => Windows.rankTopNPerGroup(s, d)),
    "w_lag_lead"            -> (Windows.lagLead _),
    // Group O — sort / limit / set ops
    "o_sort_limit"          -> ((s: SparkSession, d: String) => SetSort.sortLimit(s, d)),
    "o_union_append"        -> (SetSort.unionAppend _),
    "o_except_reconcile"    -> (SetSort.exceptReconcile _),
    "o_intersect"           -> (SetSort.intersectKeys _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "s_scan_project_rename" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
        |       l_returnflag AS return_flag, l_linestatus AS line_status,
        |       l_quantity AS quantity
        |FROM lineitem ORDER BY order_key, line_number""".stripMargin,
    "s_cast_money_decimal" ->
      """SELECT l_orderkey, l_linenumber,
        |       '  1,' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || ' ' AS money_str,
        |       CAST(CAST(replace(trim('  1,' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || ' '), ',', '') AS DECIMAL(18,2)) AS DOUBLE) AS amount
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s_parse_date" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |       CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |       CAST(dayofmonth(l_shipdate) AS BIGINT) AS ship_day,
        |       CAST(quarter(l_shipdate) AS BIGINT) AS ship_quarter
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s_json_extract" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "s_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS name_lower,
        |       replace(p_type, ' ', '_') AS type_snake,
        |       trim(p_brand) AS brand_trim,
        |       p_brand || '#' || p_type AS brand_type,
        |       substring(p_name, 1, 5) AS name_prefix,
        |       CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "s_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) / 100.0 AS net_price,
        |       floor(l_extendedprice * l_tax * 100.0 + 0.5) / 100.0 AS tax_amt,
        |       abs(l_discount - l_tax) AS disc_tax_gap,
        |       greatest(l_discount, l_tax) AS max_rate,
        |       least(l_discount, l_tax) AS min_rate,
        |       l_extendedprice / l_quantity AS unit_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f_event_type_in" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_type IN ('signup', 'purchase')
        |ORDER BY event_id""".stripMargin,
    "f_compound_pred" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
        |  AND o_totalprice BETWEEN 1000.0 AND 200000.0
        |  AND o_orderstatus IS NOT NULL AND o_orderstatus <> 'P'
        |ORDER BY o_orderkey""".stripMargin,
    "g_count_star" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "g_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       floor(avg(l_quantity) * 100.0 + 0.5) / 100.0 AS avg_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "g_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "g_rollup" ->
      """SELECT coalesce(event_type, '<all>') AS event_type,
        |       coalesce(yr, -1) AS yr, cnt, sum_value
        |FROM (SELECT event_type, yr, count(*) AS cnt,
        |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |      FROM (SELECT event_type, CAST(year(ts) AS BIGINT) AS yr, value FROM events)
        |      GROUP BY ROLLUP(event_type, yr))
        |ORDER BY event_type, yr""".stripMargin,
    "g_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey HAVING count(*) > 5
        |ORDER BY o_custkey""".stripMargin,
    "j_broadcast_dim" ->
      """SELECT r_name, count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j_multiway_star" ->
      """SELECT r_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j_left_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "j_semi" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "j_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "w_last_wins_dedup" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "w_running_balance" ->
      """SELECT user_id, event_id, value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "w_rank_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "w_lag_lead" ->
      """SELECT user_id, event_id, value,
        |       lag(value) OVER w AS prev_value,
        |       lead(value) OVER w AS next_value,
        |       round(value - lag(value) OVER w, 2) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "o_sort_limit" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin,
    "o_union_append" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM (SELECT l_returnflag, l_quantity FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |      UNION ALL
        |      SELECT l_returnflag, l_quantity FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "o_except_reconcile" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "o_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
  )
}
