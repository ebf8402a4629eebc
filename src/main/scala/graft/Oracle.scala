package graft

/** DuckDB oracle SQL, one entry per SQL-expressible declared query
  * (SURVEY.md §2 "Oracle: yes" rows). Parity rules (SURVEY.md §5.3):
  * identical column aliases, identical ORDER BY with explicit NULLS
  * placement, every floating aggregate rounded on BOTH sides, timestamps
  * kept timezone-free.
  */
object Oracle {
  val sql: Map[String, String] = Map(

    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "q_filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |  AND o_orderdate BETWEEN TIMESTAMP '1995-06-01 00:00:00' AND TIMESTAMP '1999-06-30 00:00:00'
        |  AND (o_totalprice > 50000.0 OR o_orderpriority LIKE '1-%')
        |ORDER BY o_orderkey""".stripMargin,

    "q_proj_derived" ->
      """SELECT c_custkey, c_name,
        |  NULLIF(concat_ws('+',
        |    CASE WHEN c_acctbal > 7500.0 THEN 'HighValue' END,
        |    CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 'Industrial' END,
        |    CASE WHEN c_acctbal < 0.0 THEN 'Credit' END), '') AS nameplate
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_case_null" ->
      """SELECT c_custkey,
        |  NULLIF(c_mktsegment, 'AUTOMOBILE') AS seg_nulled,
        |  COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'UNKNOWN') AS seg_filled,
        |  (NULLIF(c_mktsegment, 'AUTOMOBILE') IS NULL) AS is_auto
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT c_custkey, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "q_join_shuffle" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_spent,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) > 300000.0
        |ORDER BY o_custkey""".stripMargin,

    "q_agg_rollup" ->
      """SELECT r_name, n_name,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS sum_bal,
        |  GROUPING_ID(r_name, n_name) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q_sort_nulls" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg_nulled, c_acctbal
        |FROM customer
        |ORDER BY seg_nulled ASC NULLS FIRST, c_acctbal DESC, c_custkey""".stripMargin,

    "q_union_batches" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000.0
        |ORDER BY c_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderpriority, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC, o_orderkey ASC) AS rn,
        |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC) AS rk,
        |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC) AS drk
        |  FROM orders) t
        |WHERE rn <= 5
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_scd2_enddate" ->
      """WITH versions AS (SELECT DISTINCT o_custkey, o_orderdate AS eff FROM orders),
        |scd AS (
        |  SELECT o_custkey, eff,
        |    LEAD(eff) OVER (PARTITION BY o_custkey ORDER BY eff) AS end_raw
        |  FROM versions)
        |SELECT o_custkey, eff,
        |  COALESCE(end_raw, TIMESTAMP '2200-01-01 00:00:00') AS end_date,
        |  (end_raw IS NULL) AS is_current
        |FROM scd
        |ORDER BY o_custkey, eff""".stripMargin,

    "q_win_running" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q_win_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, ship_day,
        |  ROUND(MAX(l_extendedprice) OVER w, 2) AS rolling_high,
        |  COUNT(*) OVER w AS n_in_window
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
        |        datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ship_day
        |      FROM lineitem) t
        |WINDOW w AS (PARTITION BY l_partkey ORDER BY ship_day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, ship_day, rolling_high, n_in_window""".stripMargin,

    "q_win_topk_group" ->
      """SELECT l_suppkey, l_partkey, revenue, rn FROM (
        |  SELECT l_suppkey, l_partkey, revenue,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey ASC) AS rn
        |  FROM (SELECT l_suppkey, l_partkey,
        |          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        |        FROM lineitem GROUP BY l_suppkey, l_partkey) agg) ranked
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,

    "q_join_range_scd2" ->
      """WITH versions AS (SELECT DISTINCT o_custkey AS d_custkey, o_orderdate AS eff FROM orders),
        |dim AS (
        |  SELECT d_custkey, eff,
        |    LEAD(eff) OVER (PARTITION BY d_custkey ORDER BY eff) AS end_ts
        |  FROM versions),
        |fact AS (
        |  SELECT l_orderkey, l_linenumber, o_custkey, l_shipdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT l_orderkey, l_linenumber, eff AS version_eff
        |FROM fact JOIN dim
        |  ON o_custkey = d_custkey
        | AND l_shipdate >= eff
        | AND (end_ts IS NULL OR l_shipdate < end_ts)
        |ORDER BY l_orderkey, l_linenumber, version_eff""".stripMargin,

    "q_join_conditional_key" ->
      """WITH refs AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_suppkey AS VARCHAR)
        |         ELSE 'Supplier#' || lpad(CAST(l_suppkey AS VARCHAR), 9, '0') END AS ref
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, s_suppkey, s_name
        |FROM (
        |  SELECT r.l_orderkey, r.l_linenumber, s.s_suppkey, s.s_name
        |  FROM refs r JOIN supplier s ON CAST(r.ref AS BIGINT) = s.s_suppkey
        |  WHERE regexp_matches(r.ref, '^[0-9]+$')
        |  UNION ALL
        |  SELECT r.l_orderkey, r.l_linenumber, s.s_suppkey, s.s_name
        |  FROM refs r JOIN supplier s ON r.ref = s.s_name
        |  WHERE NOT regexp_matches(r.ref, '^[0-9]+$')) u
        |ORDER BY l_orderkey, l_linenumber, s_suppkey""".stripMargin,

    "q_self_join_pairing" ->
      """SELECT s.user_id, s.event_id AS signup_id, s.ts AS signup_ts,
        |  MIN(p.ts) AS first_purchase_ts
        |FROM events s
        |LEFT JOIN events p
        |  ON p.user_id = s.user_id AND p.event_type = 'purchase' AND p.ts > s.ts
        |WHERE s.event_type = 'signup'
        |GROUP BY s.user_id, s.event_id, s.ts
        |ORDER BY s.user_id, signup_id""".stripMargin,
  )
}
