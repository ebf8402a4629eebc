package graft

/** DuckDB oracle SQL, one entry per SQL-expressible declared query
  * (SURVEY.md §2 "Oracle: yes" rows). Parity rules (SURVEY.md §5.3):
  * identical column aliases, identical ORDER BY with explicit NULLS
  * placement, every floating aggregate rounded on BOTH sides, timestamps
  * kept timezone-free.
  */
object Oracle {
  val sql: Map[String, String] =
    relationalSql ++ scalarsSql ++ cdcSql ++ llmSql

  /** ONE shared body for both z-order oracles: the grid CTE (bounds +
    * exact integer quantization) and the Morton interleave restated as a
    * 32-term sum of disjoint powers of two (bit i of x at position 2i, bit
    * i of y at 2i+1 — pure integer arithmetic, bit-identical to
    * [[graft.expr.Morton32]] by construction). The layout and probe
    * oracles differ ONLY in their predicate/order tail, so the zval
    * definition cannot drift between them. */
  private lazy val zorderBodySql: String = {
    val terms = (0 until 16).flatMap { i =>
      Seq(
        s"CAST(((xg >> $i) & 1) AS BIGINT) * ${1L << (2 * i)}",
        s"CAST(((yg >> $i) & 1) AS BIGINT) * ${1L << (2 * i + 1)}")
    }.mkString("\n  + ")
    s"""WITH k AS (
       |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS xr,
       |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS yr
       |  FROM orders),
       |b AS (SELECT min(xr) AS xlo, max(xr) AS xhi,
       |             min(yr) AS ylo, max(yr) AS yhi FROM k),
       |g AS (SELECT o_orderkey,
       |    CAST((xr - xlo) * 256 // (xhi - xlo + 1) AS INTEGER) AS xg,
       |    CAST((yr - ylo) * 256 // (yhi - ylo + 1) AS INTEGER) AS yg
       |  FROM k CROSS JOIN b)
       |SELECT o_orderkey, xg, yg,
       |  $terms AS zval
       |FROM g""".stripMargin
  }

  private lazy val zorderSql: String =
    zorderBodySql + "\nORDER BY zval, o_orderkey"

  /** The z-range probe's oracle is the INDEPENDENT plain 2-D predicate over
    * the same grid body — equality with the z-interval rewrite IS the
    * correctness contract of the decomposition. */
  private lazy val zorderProbeSql: String =
    zorderBodySql + "\nWHERE xg BETWEEN 64 AND 191 AND yg BETWEEN 32 AND 95" +
      "\nORDER BY o_orderkey"

  private lazy val relationalSql: Map[String, String] = Map(

    "q_zorder_layout" -> zorderSql,
    "q_zorder_probe" -> zorderProbeSql,

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

    "q_agg_cube" ->
      """SELECT r_name, n_name,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS sum_bal,
        |  GROUPING_ID(r_name, n_name) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q_agg_groupsets" ->
      """SELECT r_name, c_mktsegment AS seg,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS sum_bal,
        |  GROUPING_ID(r_name, c_mktsegment) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        |ORDER BY gid, r_name ASC NULLS FIRST, seg ASC NULLS FIRST""".stripMargin,

    "q_agg_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25), 4) AS iqr
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_pivot_segment" ->
      """SELECT r_name,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q_audit_referential" ->
      """SELECT chk, n_violations FROM (
        |  SELECT 'lineitem_orphan_order' AS chk, COUNT(*) AS n_violations
        |  FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_orphan_customer', COUNT(*)
        |  FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |  UNION ALL
        |  SELECT 'customer_dup_key', COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
        |  UNION ALL
        |  SELECT 'orders_dup_key', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_dup_line', COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |) a
        |ORDER BY chk""".stripMargin,

    "q_profile_columns" ->
      """SELECT col_name, n_rows, n_nulls, min_val, max_val, n_distinct FROM (
        |  SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    round(CAST(min(l_quantity) AS DOUBLE), 4) AS min_val,
        |    round(CAST(max(l_quantity) AS DOUBLE), 4) AS max_val,
        |    COUNT(DISTINCT l_quantity) AS n_distinct FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', COUNT(*),
        |    CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    round(CAST(min(l_extendedprice) AS DOUBLE), 4),
        |    round(CAST(max(l_extendedprice) AS DOUBLE), 4),
        |    COUNT(DISTINCT l_extendedprice) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', COUNT(*),
        |    CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    round(CAST(min(l_discount) AS DOUBLE), 4),
        |    round(CAST(max(l_discount) AS DOUBLE), 4),
        |    COUNT(DISTINCT l_discount) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', COUNT(*),
        |    CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    round(CAST(min(l_tax) AS DOUBLE), 4),
        |    round(CAST(max(l_tax) AS DOUBLE), 4),
        |    COUNT(DISTINCT l_tax) FROM lineitem
        |) p
        |ORDER BY col_name""".stripMargin,

    "q_batch_validation" ->
      """SELECT tbl, n_rows, n_alerts FROM (
        |  SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts FROM customer
        |  UNION ALL
        |  SELECT 'orders', COUNT(*),
        |    CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', COUNT(*),
        |    CAST(SUM(CASE WHEN l_quantity <= 0.0 OR l_discount < 0.0 OR l_discount > 1.0
        |             THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'supplier', COUNT(*),
        |    CAST(SUM(CASE WHEN s_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM supplier
        |  UNION ALL
        |  SELECT 'part', COUNT(*),
        |    CAST(SUM(CASE WHEN p_retailprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) FROM part
        |) v
        |ORDER BY tbl""".stripMargin,

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
      """SELECT o_custkey, o_orderkey, o_orderpriority, rn, rk, drk, prk, cd FROM (
        |  SELECT o_custkey, o_orderkey, o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC, o_orderkey ASC) AS rn,
        |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC) AS rk,
        |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC) AS drk,
        |    ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC), 6) AS prk,
        |    ROUND(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC), 6) AS cd
        |  FROM orders) t
        |WHERE rn <= 5
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_navigation" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
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

    "q_join_asof" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    event_type, value FROM events),
        |c AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, event_id AS p_id, value AS p_value
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id AS click_id, c.ts,
        |  p.p_id AS last_purchase_id, p.p_value AS last_purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.user_id, click_id""".stripMargin,

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

  /** §2.8 scalar-function block. Dialect-parity notes baked in: DuckDB
    * regexp_replace needs the 'g' flag for replace-all, date_trunc('month')
    * returns DATE (Spark side casts to match), floor/ceil return DOUBLE
    * (cast to BIGINT on both sides), dayofweek is 0=Sunday (Spark side
    * subtracts 1). */
  private lazy val scalarsSql: Map[String, String] = Map(

    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 4) AS name_pre,
        |  length(p_name) AS name_len,
        |  p_brand || ':' || p_type AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  trim('  ' || p_name || '  ') AS name_trim,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_us
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q_regex_funcs" ->
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '^([0-9]+)-(.*)$', 1) AS prio_num,
        |  regexp_extract(o_orderpriority, '^([0-9]+)-(.*)$', 2) AS prio_word,
        |  regexp_matches(o_orderpriority, '^[12]-') AS is_high,
        |  regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g') AS prio_devowel
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  quarter(o_orderdate) AS qtr,
        |  month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  dayofweek(o_orderdate) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  round(l_extendedprice * 0.07, 2) AS tax7,
        |  round(abs(l_discount - 0.05), 6) AS disc_dev,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  pow(2.0, l_linenumber) AS pow2,
        |  mod(l_partkey, 7) AS mod7,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         tax7, disc_dev, qty_floor, qty_sqrt""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
        |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // q_variant_funcs: the oracle restates the variant extractions in
    // DuckDB's JSON dialect — et2 is just event_type (the round-trip is the
    // Spark side's claim), and n_uid_roundtrip = COUNT(*) asserts the
    // text→variant→long round-trip was lossless on EVERY row.
    "q_variant_funcs" ->
      """SELECT event_type AS et2,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        |  COUNT(*) AS n_uid_roundtrip
        |FROM events
        |GROUP BY event_type
        |ORDER BY et2""".stripMargin,

    // This string IS the Spark query (qSqlText runs it through spark.sql
    // over temp views) — one ANSI text, two engines, same result.
    "q_sql_text" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_nationkey,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(spend AS DECIMAL(24,6))) AS DOUBLE) AS nation_spend
        |FROM customer JOIN rev ON c_custkey = o_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    // Shared-string lateral: the per-nation dependent top-2 subquery runs
    // verbatim in both engines (inner order ends in the unique c_name).
    "q_sql_lateral" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin,

    // Shared-string recursive CTE (q_sql_recursive runs THIS text in Spark):
    // the spine recursion is bounded metadata, and it recurses at YEAR
    // granularity with a 12-row month expansion — Spark executes one job
    // per recursion level, so depth is the latency driver (the month-level
    // formulation was measured 8× slower on identical output: 80 sequential
    // micro-jobs vs ~8). Verified verbatim-identical in both dialects:
    // DATE + k·INTERVAL re-cast to DATE, date_trunc, exact decimal sum.
    "q_sql_recursive" ->
      """WITH RECURSIVE
        |b AS (SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
        |             CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi FROM orders),
        |ys(y) AS (
        |  SELECT CAST(date_trunc('year', lo) AS DATE) FROM b
        |  UNION ALL
        |  SELECT CAST(y + INTERVAL 1 YEAR AS DATE) FROM ys
        |  WHERE y < (SELECT CAST(date_trunc('year', hi) AS DATE) FROM b)
        |),
        |mn(k) AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11)) AS t(k)),
        |spine AS (SELECT CAST(y + k * INTERVAL 1 MONTH AS DATE) AS m
        |          FROM ys CROSS JOIN mn, b
        |          WHERE CAST(y + k * INTERVAL 1 MONTH AS DATE) BETWEEN lo AND hi),
        |agg AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |               count(*) AS n_orders,
        |               CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        |        FROM orders GROUP BY 1)
        |SELECT s.m, coalesce(a.n_orders, 0) AS n_orders,
        |       coalesce(a.revenue, 0.0) AS revenue
        |FROM spine s LEFT JOIN agg a ON s.m = a.m
        |ORDER BY s.m""".stripMargin,

    // Ties between equal cent values are interchangeable, so the top-3
    // VALUE string is deterministic even though row_number's pick among
    // ties is not.
    "q_agg_topk" ->
      """WITH c AS (SELECT user_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |r AS (SELECT user_id, cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY cents DESC) AS rk
        |  FROM c)
        |SELECT user_id,
        |  string_agg(CAST(cents AS VARCHAR), ',' ORDER BY rk) AS top3
        |FROM r WHERE rk <= 3
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // Oracle is the WINDOW formulation — an independent expression of the
    // semantics the custom TopKPerGroup operator must reproduce. The
    // (price DESC, orderkey, linenumber) ordering is total, so the rank-3
    // cut is deterministic in both engines.
    "q_topk_plan_native" ->
      """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
        |FROM r WHERE rn <= 3
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,

    // (user_id, ts) is unique in events (verified), so arg_min/arg_max on
    // ts are deterministic — the same precondition Spark's min_by/max_by use.
    "q_agg_ohlc" ->
      """SELECT user_id,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |  arg_min(value, CAST(ts AS TIMESTAMP)) AS open,
        |  arg_max(value, CAST(ts AS TIMESTAMP)) AS close,
        |  max(value) AS high,
        |  min(value) AS low,
        |  count(*) AS n
        |FROM events
        |GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000 AS lo,
        |  count(*) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    // Moments from exact decimal power sums (not built-in corr/var_pop):
    // double summation is order-dependent and engine-divergent in the last
    // ulp; the decimal sums are exact, so the derived doubles are identical
    // and floor-snap identically.
    "q_stats_moments" ->
      """WITH s AS (SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  floor(sx / n * 10000.0) / 10000.0 AS mean_qty,
        |  floor((sxx - sx*sx/n) / n * 10000.0) / 10000.0 AS var_qty,
        |  floor((sxy - sx*sy/n)
        |        / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) * 1000000.0) / 1000000.0
        |    AS corr_qp
        |FROM s
        |ORDER BY l_returnflag""".stripMargin,

    // Window order must end in the unique o_orderkey (a ROWS frame over a
    // non-total order is nondeterministic), and the frame sum goes through
    // exact DECIMAL: DuckDB's segment-tree sliding-window double sums can
    // differ from Spark's sequential frame re-scan in the last ulp.
    "q_win_moving_avg" ->
      """SELECT o_orderkey, o_custkey,
        |  floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) OVER w AS DOUBLE)
        |        / count(*) OVER w * 1000000.0) / 1000000.0 AS ma7
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_full" ->
      """WITH o AS (SELECT o_custkey, count(*) AS n_ord FROM orders
        |           WHERE o_totalprice > 150000 GROUP BY o_custkey),
        |     c AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  (c_custkey IS NOT NULL) AS has_cust,
        |  (o_custkey IS NOT NULL) AS has_ord,
        |  CAST(coalesce(n_ord, 0) AS BIGINT) AS n_ord
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_agg_collect" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  count(*) AS n
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'retail' AS measure, p_retailprice AS val FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    // The salted-join contract: result identical to the unsalted join.
    "q_skew_salt" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,

    "q_win_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  floor(percent_rank() OVER w * 1000000.0) / 1000000.0 AS pct_rank,
        |  floor(cume_dist() OVER w * 1000000.0) / 1000000.0 AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_gap_fill" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        |           FROM orders GROUP BY 1),
        |  b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        |  spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |            FROM b)
        |SELECT spine.day, CAST(coalesce(d.n_orders, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN d ON spine.day = d.day
        |ORDER BY spine.day""".stripMargin,

    // Map/struct columns stay internal to the query (pandas can't sort
    // map/dict cells in the driver diff); every output column is a scalar
    // derivation. DuckDB map access m['k'] yields a LIST — [1] unwraps it
    // (and yields NULL for a missing key, matching Spark element_at).
    "q_map_funcs" ->
      """WITH m AS (SELECT p_partkey,
        |    MAP {'brand': p_brand, 'type': p_type} AS attrs FROM part)
        |SELECT p_partkey,
        |  attrs['brand'][1] AS brand_val,
        |  attrs['type'][1] AS type_val,
        |  attrs['nope'][1] AS missing_val,
        |  array_to_string(map_keys(attrs), ',') AS key_list,
        |  array_to_string(map_values(attrs), ',') AS val_list,
        |  list_contains(map_keys(attrs), 'brand') AS has_brand,
        |  CAST(cardinality(attrs) AS INT) AS n_attrs
        |FROM m
        |ORDER BY p_partkey""".stripMargin,

    "q_struct_funcs" ->
      """WITH s AS (SELECT p_partkey, p_size, p_type,
        |    struct_pack(brand := p_brand, sz := p_size) AS info FROM part),
        |n AS (SELECT *, struct_pack(inner := info, ptype := p_type) AS nested FROM s)
        |SELECT p_partkey,
        |  struct_extract(info, 'brand') AS brand_field,
        |  struct_extract(info, 'sz') AS sz_field,
        |  struct_extract(nested, 'ptype') AS nested_ptype,
        |  struct_extract(struct_extract(nested, 'inner'), 'sz') AS nested_inner_sz,
        |  concat_ws('|', struct_extract(info, 'brand'),
        |            CAST(struct_extract(info, 'sz') AS VARCHAR)) AS info_str,
        |  (p_size > 25) AS is_large
        |FROM n
        |ORDER BY p_partkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, label,
        |  len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
        |  round(sqrt(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
  )

  /** §2.10 CDC / event-time block. events.ts is TIMESTAMP_NS in the file:
    * CAST(ts AS TIMESTAMP) floors it to µs exactly like Spark's
    * `ts div 1000` read path (Tables.events); window sums of ints are cast
    * to BIGINT because DuckDB SUM(INTEGER) yields HUGEINT. */
  private lazy val cdcSql: Map[String, String] = Map(

    // The composed TPC-DI load funnel. The Spark side round-trips the
    // tables through CSV / fixed-width / XML extracts with DETERMINISTIC
    // corruption (mod-97 customers -> CSV cast reject, mod-89 suppliers ->
    // short FINWIRE record, region rows -> unknown tag); the text
    // round-trip is lossless for surviving rows (no floating-point field
    // crosses it), so the funnel restates directly over the parquet with
    // the same modular rules. The fact resolve is the q_join_range_scd2
    // interval shape: version current at ship time, open-ended last
    // version, <=1 match per fact row.
    "q_warehouse_etl" ->
      """WITH c AS (SELECT count(*) AS n,
        |    sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS rej FROM customer),
        |s AS (SELECT count(*) AS n,
        |    sum(CASE WHEN s_suppkey % 89 = 0 THEN 1 ELSE 0 END) AS rej FROM supplier),
        |p AS (SELECT count(*) AS n FROM part),
        |r AS (SELECT count(*) AS n FROM region),
        |acts AS (SELECT DISTINCT o_custkey AS c_id, epoch_us(o_orderdate) AS eff_us FROM orders),
        |a AS (SELECT count(*) AS xml_n, count(DISTINCT c_id) AS open_n FROM acts),
        |v AS (SELECT c_id, eff_us,
        |    lead(eff_us) OVER (PARTITION BY c_id ORDER BY eff_us) AS end_us FROM acts),
        |f AS (SELECT l.l_suppkey, o.o_custkey, epoch_us(l.l_shipdate) AS ship_us
        |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |fr AS (SELECT f.l_suppkey, f.o_custkey, v.eff_us
        |       FROM f LEFT JOIN v ON f.o_custkey = v.c_id
        |         AND f.ship_us >= v.eff_us AND (v.end_us IS NULL OR f.ship_us < v.end_us)),
        |fa AS (SELECT count(*) AS n_input,
        |    sum(CASE WHEN eff_us IS NOT NULL THEN 1 ELSE 0 END) AS n_resolved,
        |    sum(CASE WHEN eff_us IS NOT NULL AND l_suppkey % 89 <> 0
        |             AND o_custkey % 97 <> 0 THEN 1 ELSE 0 END) AS n_loaded FROM fr)
        |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage, CAST(n_rows AS BIGINT) AS n_rows
        |FROM (VALUES
        |  (0, 'src_customer_lines', (SELECT n FROM c)),
        |  (1, 'customer_rejects', (SELECT rej FROM c)),
        |  (2, 'dim_customer', (SELECT n - rej FROM c)),
        |  (3, 'src_finwire_lines', (SELECT s.n + p.n + r.n FROM s, p, r)),
        |  (4, 'finwire_cmp_rejects', (SELECT rej FROM s)),
        |  (5, 'dim_supplier', (SELECT n - rej FROM s)),
        |  (6, 'dim_part', (SELECT n FROM p)),
        |  (7, 'finwire_unknown', (SELECT n FROM r)),
        |  (8, 'xml_actions', (SELECT xml_n FROM a)),
        |  (9, 'dim_customer_versions_open', (SELECT open_n FROM a)),
        |  (10, 'fact_input', (SELECT n_input FROM fa)),
        |  (11, 'fact_resolved', (SELECT n_resolved FROM fa)),
        |  (12, 'fact_loaded', (SELECT n_loaded FROM fa))) t(stage_idx, stage, n_rows)
        |ORDER BY stage_idx""".stripMargin,

    // The fold has a closed form because the CDC sequence is the globally
    // unique event_id and batches partition time: after batch k a user's
    // state is the event with max (batch_index, event_id) among events
    // below the batch's upper bound — absent if that winner is a delete.
    // Counts come from the same LEFT JOIN so an empty batch still reports.
    "q_cdc_batches" ->
      """WITH bounds(batch_idx, batch, lo, hi) AS (VALUES
        |  (1, 'b1', TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-20 00:00:00'),
        |  (2, 'b2', TIMESTAMP '2024-01-20 00:00:00', TIMESTAMP '2024-01-25 00:00:00'),
        |  (3, 'b3', TIMESTAMP '2024-01-25 00:00:00', TIMESTAMP '9999-01-01 00:00:00')),
        |reports AS (
        |  SELECT b.batch_idx, b.batch,
        |    count(e.event_id) AS n_records,
        |    coalesce(sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END), 0) AS n_deletes
        |  FROM bounds b LEFT JOIN events e ON e.ts >= b.lo AND e.ts < b.hi
        |  GROUP BY b.batch_idx, b.batch),
        |tagged AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN ts < TIMESTAMP '2024-01-10 00:00:00' THEN 0
        |         WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 1
        |         WHEN ts < TIMESTAMP '2024-01-25 00:00:00' THEN 2
        |         ELSE 3 END AS bidx
        |  FROM events),
        |states AS (
        |  SELECT b.batch_idx, t.user_id, t.event_id, t.event_type,
        |    row_number() OVER (PARTITION BY b.batch_idx, t.user_id
        |                       ORDER BY t.bidx DESC, t.event_id DESC) AS rn
        |  FROM tagged t JOIN bounds b ON t.bidx <= b.batch_idx),
        |after AS (
        |  SELECT batch_idx, count(*) AS n_keys_after, sum(event_id) AS state_checksum
        |  FROM states WHERE rn = 1 AND event_type <> 'error'
        |  GROUP BY batch_idx)
        |SELECT CAST(r.batch_idx AS INTEGER) AS batch_idx, r.batch,
        |  CAST(r.n_records AS BIGINT) AS n_records,
        |  CAST(r.n_records - r.n_deletes AS BIGINT) AS n_upserts,
        |  CAST(r.n_deletes AS BIGINT) AS n_deletes,
        |  CAST(coalesce(a.n_keys_after, 0) AS BIGINT) AS n_keys_after,
        |  CAST(coalesce(a.state_checksum, 0) AS BIGINT) AS state_checksum
        |FROM reports r LEFT JOIN after a USING (batch_idx)
        |ORDER BY batch_idx""".stripMargin,

    "q_cdc_apply" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  ts AS last_ts
        |FROM ranked
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // Both snapshots derive from the same latest-per-key rule q_cdc_apply
    // uses; unchanged keys are filtered on the exact event_id equality, so
    // the surviving I/U/D set is deterministic.
    "q_snapshot_diff" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, event_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rn = 1 AND event_type <> 'error'),
        |s2 AS (
        |  SELECT user_id, event_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e)
        |  WHERE rn = 1 AND event_type <> 'error')
        |SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
        |  CASE WHEN s1.user_id IS NULL THEN 'I'
        |       WHEN s2.user_id IS NULL THEN 'D' ELSE 'U' END AS op,
        |  s1.event_id AS old_event_id, s2.event_id AS new_event_id
        |FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id
        |WHERE s1.user_id IS NULL OR s2.user_id IS NULL
        |   OR s1.event_id <> s2.event_id
        |ORDER BY user_id""".stripMargin,

    "q_cdc_scd2" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS eff, event_type, event_id
        |  FROM events),
        |hist AS (
        |  SELECT user_id, eff, event_type,
        |    LEAD(eff) OVER (PARTITION BY user_id ORDER BY eff) AS end0
        |  FROM e WHERE eff < TIMESTAMP '2024-01-20 00:00:00'),
        |hist2 AS (
        |  SELECT user_id, eff, event_type, end0, (end0 IS NULL) AS is_current
        |  FROM hist),
        |cdc AS (
        |  SELECT user_id, eff, event_type, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS flag
        |  FROM e WHERE eff >= TIMESTAMP '2024-01-20 00:00:00'),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT cdc.*, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn FROM cdc) r
        |  WHERE rn = 1),
        |unioned AS (
        |  SELECT h.user_id, h.eff, h.end0 AS end_ts, h.is_current, h.event_type
        |  FROM hist2 h
        |  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.user_id = h.user_id)
        |  UNION ALL
        |  SELECT h.user_id, h.eff,
        |    CASE WHEN h.is_current THEN l.eff ELSE h.end0 END AS end_ts,
        |    FALSE, h.event_type
        |  FROM hist2 h JOIN latest l ON h.user_id = l.user_id
        |  UNION ALL
        |  SELECT user_id, eff, CAST(NULL AS TIMESTAMP), TRUE, event_type
        |  FROM latest WHERE flag <> 'D')
        |SELECT user_id, eff, end_ts, is_current, event_type
        |FROM unioned
        |ORDER BY user_id, eff""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    // Week indices are integer day arithmetic vs a fixed epoch — never
    // calendar week-start conventions (engine/locale-dependent).
    "q_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |           event_type FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM e
        |      WHERE event_type = 'signup' GROUP BY 1)
        |SELECT
        |  CAST(floor(date_diff('day', DATE '2024-01-01', f.first_day) / 7)
        |       AS INT) AS cohort_wk,
        |  CAST(floor(date_diff('day', f.first_day, e.day) / 7) AS INT)
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN f USING (user_id)
        |WHERE e.day >= f.first_day
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_markov_transitions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |           event_type FROM events),
        |p AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM e),
        |c AS (SELECT cur, nxt, count(*) AS n FROM p
        |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.n,
        |  floor(CAST(c.n AS DOUBLE) / t.row_total * 1e6) / 1e6 AS p
        |FROM c JOIN t USING (cur)
        |ORDER BY cur, nxt""".stripMargin,

    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t_signup FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t_view
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t_signup GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_view GROUP BY 1)
        |SELECT s1.user_id, s1.t_signup, s2.t_view, s3.t_purchase,
        |  CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
        |       WHEN s2.t_view IS NOT NULL THEN 2 ELSE 1 END AS INT)
        |    AS stage_reached
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Sliding windows: each event expands to len/slide = 2 window starts
    // (floor-hour and floor-hour minus 1h), mirroring Spark's epoch-aligned
    // window(ts, '2 hours', '1 hour') expansion.
    // Interp ratio divides the day-int deltas FIRST (mirrored op order);
    // filled value floor-snaps to 1e-4; edge gaps take the nearest known.
    "q_interpolate" ->
      """WITH base AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS v
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT min(day) AS lo, max(day) AS hi FROM base),
        |spine AS (SELECT p.prio, d.day
        |  FROM (SELECT DISTINCT prio FROM base) p,
        |       (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
        |               AS DATE) AS day FROM r) d),
        |j AS (SELECT s.prio, s.day, b.v FROM spine s
        |      LEFT JOIN base b ON s.prio = b.prio AND s.day = b.day),
        |w AS (SELECT prio, day, v,
        |  last_value(v IGNORE NULLS) OVER pw AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |    OVER pw AS pd,
        |  first_value(v IGNORE NULLS) OVER fw AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |    OVER fw AS nd
        |  FROM j WINDOW
        |    pw AS (PARTITION BY prio ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fw AS (PARTITION BY prio ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT prio, day,
        |  floor((CASE WHEN v IS NOT NULL THEN v
        |        WHEN pd IS NOT NULL AND nd IS NOT NULL THEN
        |          pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
        |                            / CAST(date_diff('day', pd, nd) AS DOUBLE))
        |        ELSE COALESCE(pv, nv) END) * 1e4) / 1e4 AS filled,
        |  v IS NULL AS was_gap
        |FROM w ORDER BY prio, day""".stripMargin,

    "q_sliding_window" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value
        |           FROM events),
        |x AS (SELECT date_trunc('hour', t) - i * INTERVAL 1 HOUR AS w_start,
        |             event_type, value
        |      FROM e, unnest([0, 1]) AS u(i))
        |SELECT w_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
        |                   ORDER BY ts_us, event_id) IS NULL
        |                 OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |                   ORDER BY ts_us, event_id) > 1800000000
        |            THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // Medians of integer daily counts are half-integers: med×2 / MAD×4 are
    // exact BIGINTs in both engines and the 3·MAD cut (≈ 2.02σ under
    // normality) cross-multiplies to pure integer arithmetic (no double
    // compare).
    "q_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, CAST(quantile_cont(n_events, 0.5) * 2 AS BIGINT) AS med2
        |  FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.event_type, d.day, d.n_events, m.med2,
        |         abs(d.n_events * 2 - m.med2) AS dev2
        |  FROM daily d JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, d.day, d.n_events,
        |  CASE WHEN d.n_events * 2 > d.med2 THEN 'high' ELSE 'low' END AS direction
        |FROM dev d JOIN mad md USING (event_type)
        |WHERE d.dev2 * 2 > 3 * md.mad4
        |ORDER BY d.event_type, d.day""".stripMargin,

    // Canonical representative = lowest event_id per bucket; arg_min keyed
    // on the UNIQUE event_id is tie-free, so both engines pick the same
    // payload row deterministically.
    "q_event_dedup" ->
      """SELECT min(event_id) AS event_id, user_id, event_type,
        |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |  arg_min(CAST(ts AS TIMESTAMP), event_id) AS ts,
        |  arg_min(value, event_id) AS value,
        |  count(*) AS n_collapsed
        |FROM events
        |GROUP BY user_id, event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
        |ORDER BY event_id""".stripMargin,
  )

  /** 64-bit SimHash band k (of 4×16): global bit j = 16k+i is the majority
    * vote over tokens of nibble bit0 (j < 32) / bit1 (j ≥ 32) of hex char
    * j%32+1 of md5(t); the p0/p1 columns hold translate()-mapped '0'/'1'
    * planes and majority `±1 sum > 0` ⟺ `2·ones > count`. Same bit values
    * as the Spark side (Llm.simhashFingerprints) but independently
    * formulated — Spark parses hex chunks to longs and shifts, the oracle
    * reads per-char planes. */
  private def simhashBand(k: Int): String = (0 until 16).map { i =>
    val j = 16 * k + i
    val p = if (j < 32) "p0" else "p1"
    s"(CASE WHEN 2 * sum(ascii(substr($p,${j % 32 + 1},1)) - 48) > count(*) " +
      s"THEN ${1 << i} ELSE 0 END)"
  }.mkString("\n    + ")

  /** 8-bit sign band over fixed coordinates — mirrors Llm.signBand over the
    * shared Llm.cosineBandCoords, so Spark and the oracle can never drift. */
  private def cosineBandSql(coords: Seq[Int]): String =
    coords.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN v[$p] > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** MinHash-LSH candidate pairs (no ORDER BY — shared by q_dedup_minhash
    * and, as the edge set of the recursive-closure components, by
    * q_dedup_groups; `q_corpus_curate` re-instantiates it over the funnel's
    * stage-4 survivor CTE via [[minhashPairsSqlOver]]). */
  private def minhashPairsSqlOver(rel: String): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $rel),
      |shingles AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 2
      |    THEN [array_to_string(tk[i:i+1], ' ') for i in generate_series(1, len(tk)-1)]
      |    ELSE tk END)) AS sh FROM t),
      |hashed AS (
      |  SELECT doc_id, md5('a:' || sh) AS m1, md5('b:' || sh) AS m2 FROM shingles),
      |sig AS (
      |  SELECT doc_id,
      |    min(substr(m1,1,8)) AS h1, min(substr(m1,9,8)) AS h2,
      |    min(substr(m1,17,8)) AS h3, min(substr(m1,25,8)) AS h4,
      |    min(substr(m2,1,8)) AS h5, min(substr(m2,9,8)) AS h6,
      |    min(substr(m2,17,8)) AS h7, min(substr(m2,25,8)) AS h8
      |  FROM hashed GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 1 AS band, md5(h1 || h2) AS bkey FROM sig
      |  UNION ALL SELECT doc_id, 2, md5(h3 || h4) FROM sig
      |  UNION ALL SELECT doc_id, 3, md5(h5 || h6) FROM sig
      |  UNION ALL SELECT doc_id, 4, md5(h7 || h8) FROM sig)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM bands a JOIN bands b
      |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id""".stripMargin

  private lazy val minhashPairsSql: String = minhashPairsSqlOver("documents")

  /** The curation funnel's CTE chain (d0 input .. d6 decontaminated),
    * shared verbatim by the `q_corpus_curate` stage-count oracle and the
    * `q_curation_audit` per-doc oracle — one statement of the funnel, two
    * final SELECTs. */
  private lazy val curationCtes: String =
    s"""d0 AS (SELECT doc_id, text, source FROM documents),
       |d1 AS (SELECT * FROM d0 WHERE source <> 'src0'),
       |qt AS (SELECT doc_id, length(text) AS nc,
       |    string_split(text, ' ') AS toks FROM documents),
       |qz AS (SELECT doc_id,
       |    -2.0 + 0.3 * (CAST(nc AS DOUBLE) / len(toks))
       |    - 4.0 * (CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
       |             / len(toks))
       |    + 3.0 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS z
       |  FROM qt),
       |d2 AS (SELECT d1.* FROM d1 JOIN qz USING (doc_id) WHERE qz.z >= 0),
       |rd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |rwc AS (SELECT doc_id, x AS word, count(*) AS c
       |        FROM rd, unnest(w) AS t(x) GROUP BY doc_id, x),
       |rtop AS (SELECT doc_id, max(c) AS topc, sum(c) AS nw FROM rwc GROUP BY doc_id),
       |rbg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
       |        FROM rd, unnest(range(1, len(w))) AS r(i)),
       |rbgm AS (SELECT doc_id, count(*) AS nbg, count(DISTINCT bigram) AS dbg
       |         FROM rbg GROUP BY doc_id),
       |calm AS (SELECT t.doc_id FROM rtop t JOIN rbgm USING (doc_id)
       |  WHERE NOT (floor(CAST(topc AS DOUBLE) / nw * 1e6) / 1e6 > 0.15
       |          OR floor((CAST(1 AS DOUBLE) - CAST(dbg AS DOUBLE) / nbg) * 1e6) / 1e6
       |             > 0.08)),
       |d3 AS (SELECT d2.* FROM d2 JOIN calm USING (doc_id)),
       |e4 AS (SELECT min(doc_id) AS doc_id FROM d3 GROUP BY md5(text)),
       |d4 AS (SELECT d3.* FROM d3 JOIN e4 USING (doc_id)),
       |pairs AS (
       |${minhashPairsSqlOver("d4")}
       |),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |grp AS (SELECT node AS doc_id, least(node, min(r)) AS group_id
       |        FROM reach GROUP BY node),
       |drop5 AS (SELECT doc_id FROM grp WHERE doc_id <> group_id),
       |d5 AS (SELECT d4.* FROM d4
       |  WHERE NOT EXISTS (SELECT 1 FROM drop5 WHERE drop5.doc_id = d4.doc_id)),
       |gw5 AS (SELECT doc_id, string_split(text, ' ') AS w FROM d5),
       |g5 AS (SELECT doc_id, array_to_string(w[i:i+3], ' ') AS gram
       |       FROM gw5, unnest(range(1, len(w) - 2)) AS r(i) WHERE len(w) >= 4),
       |gw0 AS (SELECT string_split(text, ' ') AS w FROM d0 WHERE source = 'src0'),
       |eg AS (SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS gram
       |       FROM gw0, unnest(range(1, len(w) - 2)) AS r(i) WHERE len(w) >= 4),
       |contaminated AS (SELECT DISTINCT g5.doc_id FROM g5 JOIN eg USING (gram)),
       |d6 AS (SELECT d5.* FROM d5
       |  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d5.doc_id))""".stripMargin


  /** §2.9 LLM-pipeline block. md5 emits identical hex in both engines —
    * the backbone of every cross-engine-checkable hash pipeline here.
    * Vector math mirrors the Spark side op-for-op: float→double casts
    * inside the lambdas, sequential sums, round(4) on scores. */
  /** 28-bucket character-class entropy restated via the independent
    * 27-replace length trick (`length(text) - length(replace(text, ch, ''))`
    * counts ch occurrences in code points). Term order a..z, space, other in
    * a left-associative sum matches [[graft.expr.CharEntropy]]'s
    * accumulation order term-for-term; a zero count contributes the CASE's
    * exact 0.0 just as the expression skips it. */
  private lazy val charEntropySql: String = {
    val chars = ('a' to 'z').map(_.toString) :+ " "
    val cnts = chars.zipWithIndex.map { case (ch, i) =>
      s"length(text) - length(replace(text, '$ch', '')) AS c$i"
    }.mkString(",\n  ")
    val sumC = (0 to 26).map(i => s"c$i").mkString(" + ")
    val terms = (0 to 27).map { i =>
      s"(CASE WHEN c$i > 0 THEN -((CAST(c$i AS DOUBLE) / n) * ln(CAST(c$i AS DOUBLE) / n)) ELSE 0.0 END)"
    }.mkString("\n  + ")
    s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |c AS (SELECT doc_id, n,
       |  $cnts
       |  FROM t),
       |o AS (SELECT *, n - ($sumC) AS c27 FROM c),
       |h AS (SELECT doc_id, n, c26,
       |  $terms AS ent
       |  FROM o)
       |SELECT doc_id, n AS n_chars,
       |  CASE WHEN n = 0 THEN 0 ELSE CAST(c26 AS BIGINT) * 1000000 // n END AS space_ratio_micro,
       |  CAST(floor(ent * 1000000.0) AS BIGINT) AS entropy_micro
       |FROM h ORDER BY doc_id""".stripMargin
  }

  private lazy val llmSql: Map[String, String] = Map(

    "q_char_entropy" -> charEntropySql,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY text_md5""".stripMargin,

    // Bloom prefilter + exact confirm ≡ exact semi-join: the confirm step
    // removes every Bloom false positive, so the oracle is the plain
    // cross-source membership query with no sketch in sight.
    "q_dedup_bloom" ->
      """SELECT d.doc_id, d.source,
        |       md5(array_to_string(list_slice(string_split(d.text, ' '), 1, 8), ' ')) AS prefix_md5
        |FROM documents d
        |WHERE d.source <> 'src0'
        |  AND md5(array_to_string(list_slice(string_split(d.text, ' '), 1, 8), ' '))
        |      IN (SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
        |          FROM documents WHERE source = 'src0')
        |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_minhash" -> (minhashPairsSql + "\nORDER BY doc_a, doc_b"),

    "q_dedup_groups" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashPairsSql
         |),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(node, r) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src)
         |SELECT node AS doc_id, least(node, min(r)) AS group_id
         |FROM reach GROUP BY node
         |ORDER BY doc_id""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |h AS (SELECT doc_id,
         |  translate(md5(t), '0123456789abcdef', '0101010101010101') AS p0,
         |  translate(md5(t), '0123456789abcdef', '0011001100110011') AS p1 FROM tok),
         |fp AS (
         |  SELECT doc_id,
         |    ${simhashBand(0)} AS b0,
         |    ${simhashBand(1)} AS b1,
         |    ${simhashBand(2)} AS b2,
         |    ${simhashBand(3)} AS b3
         |  FROM h GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band, b0 AS bval, b0, b1, b2, b3 FROM fp
         |  UNION ALL SELECT doc_id, 1, b1, b0, b1, b2, b3 FROM fp
         |  UNION ALL SELECT doc_id, 2, b2, b0, b1, b2, b3 FROM fp
         |  UNION ALL SELECT doc_id, 3, b3, b0, b1, b2, b3 FROM fp),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
         |       + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
         |       + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
         |       + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) AS INT) AS hamming
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs
         |WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_keep" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashPairsSql
         |),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(node, r) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src),
         |grp AS (SELECT node AS doc_id, least(node, min(r)) AS group_id
         |        FROM reach GROUP BY node),
         |dropped AS (SELECT doc_id FROM grp WHERE doc_id <> group_id)
         |SELECT doc_id, lang, length(text) AS n_chars_kept
         |FROM documents
         |WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.doc_id = documents.doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_cross_source_keep" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashPairsSql
         |),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(node, r) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src),
         |grp AS (SELECT node AS doc_id, least(node, min(r)) AS group_id
         |        FROM reach GROUP BY node),
         |g2 AS (SELECT d.doc_id, d.source,
         |         coalesce(g.group_id, d.doc_id) AS group_id,
         |         CASE WHEN d.source = 'src1' THEN 0
         |              WHEN d.source = 'src3' THEN 1 ELSE 2 END AS priority
         |       FROM documents d LEFT JOIN grp g ON d.doc_id = g.doc_id)
         |SELECT doc_id, source, group_id, priority,
         |  row_number() OVER (PARTITION BY group_id ORDER BY priority, doc_id) = 1 AS kept
         |FROM g2
         |ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 2
        |    THEN [array_to_string(tk[i:i+1], ' ') for i in generate_series(1, len(tk)-1)]
        |    ELSE tk END) AS grams FROM t),
        |p AS (SELECT grams AS pg FROM g WHERE doc_id = 0)
        |SELECT doc_id, len(grams) AS n_grams,
        |  len(list_intersect(grams, pg)) AS n_inter,
        |  round(CAST(len(list_intersect(grams, pg)) AS DOUBLE)
        |        / (len(grams) + len(pg) - len(list_intersect(grams, pg))), 4) AS jacc
        |FROM g, p
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_cosine" ->
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |n AS (SELECT vec_id, v,
         |    sqrt(list_sum([v[i]*v[i] for i in generate_series(1, len(v))])) AS nrm
         |  FROM e),
         |banded AS (
         |  SELECT vec_id, label, 0 AS band,
         |    ${cosineBandSql(graft.queries.Llm.cosineBandCoords(0))} AS bval FROM e
         |  UNION ALL
         |  SELECT vec_id, label, 1,
         |    ${cosineBandSql(graft.queries.Llm.cosineBandCoords(1))} FROM e),
         |cand AS (
         |  SELECT DISTINCT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.label = b.label AND a.band = b.band AND a.bval = b.bval
         |   AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT c.label, c.id_a, c.id_b,
         |    round(list_sum([va.v[i] * vb.v[i] for i in generate_series(1, len(va.v))])
         |          / (va.nrm * vb.nrm), 4) AS cos_sim
         |  FROM cand c
         |  JOIN n va ON c.id_a = va.vec_id
         |  JOIN n vb ON c.id_b = vb.vec_id)
         |SELECT label, id_a, id_b, cos_sim
         |FROM pairs
         |WHERE cos_sim >= 0.3
         |ORDER BY label, id_a, id_b""".stripMargin,

    // Arrays are emitted as comma-joined INTEGER strings (unit elements in
    // 1e-6 units): integers render identically across engines, and scalar
    // columns keep the driver's pandas row-sort happy.
    // SemDedup: the sign bucket is a pure comparison (element_at is 1-based
    // in both engines), the within-cell similarity is the exact integer
    // micro-dot, and the keep-first policy is a DISTINCT drop set.
    "q_semdedup" ->
      """WITH b AS (SELECT vec_id, label, embedding,
        |    (CASE WHEN embedding[1]  > 0 THEN 1   ELSE 0 END) +
        |    (CASE WHEN embedding[9]  > 0 THEN 2   ELSE 0 END) +
        |    (CASE WHEN embedding[17] > 0 THEN 4   ELSE 0 END) +
        |    (CASE WHEN embedding[25] > 0 THEN 8   ELSE 0 END) +
        |    (CASE WHEN embedding[33] > 0 THEN 16  ELSE 0 END) +
        |    (CASE WHEN embedding[41] > 0 THEN 32  ELSE 0 END) +
        |    (CASE WHEN embedding[49] > 0 THEN 64  ELSE 0 END) +
        |    (CASE WHEN embedding[57] > 0 THEN 128 ELSE 0 END) AS bkt
        |  FROM embeddings),
        |d AS (SELECT DISTINCT c.vec_id
        |      FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
        |      WHERE list_sum(list_transform(list_zip(a.embedding, c.embedding),
        |          p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))
        |        >= 250000)
        |SELECT b.vec_id, b.label, CAST(b.bkt AS INT) AS bkt,
        |       b.vec_id IN (SELECT vec_id FROM d) AS dropped
        |FROM b ORDER BY vec_id""".stripMargin,

    // Hard negatives: integer micro-dot (floor-snapped products, exact long
    // sum) makes the top-k ranking bit-deterministic cross-engine; ties
    // break on vec_id.
    "q_hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS av
        |           FROM embeddings WHERE vec_id % 37 = 0
        |           ORDER BY vec_id LIMIT 512),
        |s AS (SELECT a.anchor_id, e.vec_id, e.label,
        |        CAST(list_sum(list_transform(list_zip(a.av, e.embedding),
        |          p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT))) AS BIGINT) AS dot_micro
        |      FROM embeddings e JOIN a ON e.label <> a.anchor_label),
        |r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
        |        ORDER BY dot_micro DESC, vec_id) AS rn FROM s)
        |SELECT anchor_id, CAST(rn AS INT) AS rnk, vec_id, label, dot_micro
        |FROM r WHERE rn <= 5
        |ORDER BY anchor_id, rnk""".stripMargin,

    // Whitening: moment table from integer micro-sums, mean/std through the
    // identical double expression tree (sqrt correctly rounded), z floor-
    // snapped. Long format — no array reassembly.
    "q_embed_whiten" ->
      """WITH ex AS (SELECT vec_id,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
        |    unnest(range(0, len(embedding))) AS i FROM embeddings),
        |st AS (SELECT i,
        |    CAST(sum(CAST(floor(x * 1000000.0) AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(floor(x * x * 1000000.0) AS BIGINT)) AS BIGINT) AS sxx,
        |    count(*) AS n FROM ex GROUP BY 1),
        |m AS (SELECT i, sx / 1000000.0 / n AS mean,
        |    sqrt(sxx / 1000000.0 / n -
        |         (sx / 1000000.0 / n) * (sx / 1000000.0 / n)) AS std FROM st)
        |SELECT ex.vec_id, CAST(ex.i AS INT) AS i,
        |  CAST(floor((ex.x - m.mean) / m.std * 1000000.0) AS BIGINT) AS z_micro
        |FROM ex JOIN m USING (i)
        |ORDER BY vec_id, i""".stripMargin,

    // Augmented-Gram covariance: the oracle restates the one-pass trick with
    // a plain exploded self-join (DuckDB need not scale); products snap to
    // integer micros before the sum, and the derived covariance uses the
    // bit-identical expression tree (left-assoc double divisions) as Spark.
    // Drift: both engines reduce each (dim, window) to EXACT integer
    // moments over MILLI-snapped elements (milli, not micro, keeps the
    // n^4-growing cut inside DECIMAL(38,0)/HUGEINT to ~3e8 rows/window);
    // the SMD cut is integer-only, DECIMAL(38,0) on Spark vs HUGEINT here
    // (identical in range).
    "q_embed_drift" ->
      """WITH e AS (SELECT vec_id, CAST(vec_id % 2 AS INT) AS w,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS v
        |  FROM embeddings),
        |a AS (SELECT w, unnest(v) AS x_milli, unnest(range(0, len(v))) AS dim FROM e),
        |st AS (SELECT CAST(dim AS INT) AS dim, w, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x_milli) AS BIGINT) AS s,
        |         CAST(sum(x_milli * x_milli) AS BIGINT) AS q
        |       FROM a GROUP BY 1, 2),
        |p AS (SELECT r.dim AS dim,
        |        r.n AS n_ref, c.n AS n_new, r.s AS s_ref, c.s AS s_new,
        |        r.q AS q_ref, c.q AS q_new
        |      FROM st r JOIN st c ON r.dim = c.dim AND r.w = 0 AND c.w = 1)
        |SELECT dim, n_ref, n_new, s_ref, s_new, q_ref, q_new,
        |  CASE WHEN CAST(200 AS HUGEINT)
        |         * (CAST(s_new AS HUGEINT)*CAST(n_ref AS HUGEINT) - CAST(s_ref AS HUGEINT)*CAST(n_new AS HUGEINT))
        |         * (CAST(s_new AS HUGEINT)*CAST(n_ref AS HUGEINT) - CAST(s_ref AS HUGEINT)*CAST(n_new AS HUGEINT))
        |       > CAST(n_new AS HUGEINT)*CAST(n_new AS HUGEINT)
        |           * (CAST(n_ref AS HUGEINT)*CAST(q_ref AS HUGEINT) - CAST(s_ref AS HUGEINT)*CAST(s_ref AS HUGEINT))
        |       + CAST(n_ref AS HUGEINT)*CAST(n_ref AS HUGEINT)
        |           * (CAST(n_new AS HUGEINT)*CAST(q_new AS HUGEINT) - CAST(s_new AS HUGEINT)*CAST(s_new AS HUGEINT))
        |       THEN 1 ELSE 0 END AS drifted
        |FROM p ORDER BY dim""".stripMargin,

    "q_embed_covariance" ->
      """WITH ex AS (SELECT vec_id,
        |    list_prepend(CAST(1.0 AS DOUBLE),
        |                 list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        |  FROM embeddings),
        |a AS (SELECT vec_id, unnest(v) AS x, unnest(range(0, len(v))) AS i FROM ex),
        |g AS (SELECT a.i AS i, b.i AS j,
        |        CAST(sum(CAST(floor(a.x * b.x * 1000000.0) AS BIGINT)) AS BIGINT) AS sxy_micro
        |      FROM a JOIN a AS b ON a.vec_id = b.vec_id AND b.i >= a.i
        |      GROUP BY 1, 2),
        |n AS (SELECT CAST(sxy_micro / 1000000.0 AS BIGINT) AS n FROM g WHERE i = 0 AND j = 0),
        |m AS (SELECT j - 1 AS d, sxy_micro AS sx_micro FROM g WHERE i = 0 AND j > 0)
        |SELECT CAST(g.i - 1 AS INT) AS i, CAST(g.j - 1 AS INT) AS j, g.sxy_micro,
        |  CAST(floor((g.sxy_micro / 1000000.0 / n.n -
        |    (mi.sx_micro / 1000000.0 / n.n) * (mj.sx_micro / 1000000.0 / n.n)) * 1000000.0) AS BIGINT) AS cov_micro
        |FROM g, n, m AS mi, m AS mj
        |WHERE g.i >= 1 AND mi.d = g.i - 1 AND mj.d = g.j - 1
        |ORDER BY i, j""".stripMargin,

    "q_embed_normalize" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum([x*x for x in v])) AS nrm,
        |    list_max([abs(x) for x in v]) AS max_abs
        |  FROM e)
        |SELECT vec_id, label,
        |  floor(nrm * 1000000.0) / 1000000.0 AS nrm,
        |  array_to_string([CAST(CAST(floor(x / nrm * 1000000.0) AS BIGINT) AS VARCHAR)
        |                   for x in v], ',') AS unit_vec_micro,
        |  array_to_string([CAST(CAST(floor(x * 127.0 / max_abs + 0.5) AS INT) AS VARCHAR)
        |                   for x in v], ',') AS int8_vec
        |FROM n
        |ORDER BY vec_id""".stripMargin,

    // MMR diversity reranking (r16): the 10 greedy steps unrolled as
    // chained MATERIALIZED CTEs (the q_pagerank unrolled-rounds precedent;
    // MATERIALIZED is load-bearing twice over — DuckDB otherwise INLINES
    // each sel_i reference and the sel/pick chain re-expands exponentially,
    // and every inline re-expansion re-opens the parquet-backed view until
    // the process hits its file-handle limit). Integer scores throughout:
    // one-step snap round(cos*10000) (round-then-scale would double-round
    // across the int cast), lambda=0.7 as 7*rel4 - 3*maxsim4.
    "q_mmr_rerank" ->
      """WITH n AS MATERIALIZED (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding])) AS nrm
        |  FROM embeddings),
        |p AS (SELECT v AS pv, nrm AS pnrm FROM n WHERE vec_id = 0),
        |cand AS MATERIALIZED (SELECT vec_id,
        |    CAST(round(list_sum([v[i]*pv[i] for i in generate_series(1, len(v))])
        |      / (nrm * pnrm) * 10000) AS INT) AS rel4,
        |    v, nrm
        |  FROM n, p WHERE vec_id <> 0
        |  ORDER BY rel4 DESC, vec_id ASC LIMIT 20),
        |sim AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb,
        |    CAST(round(list_sum([a.v[i]*b.v[i] for i in generate_series(1, len(a.v))])
        |      / (a.nrm * b.nrm) * 10000) AS INT) AS s4
        |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
        |pick1 AS MATERIALIZED (SELECT vec_id, rel4, 7 * rel4 AS sc FROM cand
        |  ORDER BY sc DESC, vec_id ASC LIMIT 1),
        |sel1 AS MATERIALIZED (SELECT vec_id FROM pick1),
        |pick2 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel1)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel1)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel2 AS MATERIALIZED (SELECT vec_id FROM sel1
        |  UNION ALL SELECT vec_id FROM pick2),
        |pick3 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel2)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel3 AS MATERIALIZED (SELECT vec_id FROM sel2
        |  UNION ALL SELECT vec_id FROM pick3),
        |pick4 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel3)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel4 AS MATERIALIZED (SELECT vec_id FROM sel3
        |  UNION ALL SELECT vec_id FROM pick4),
        |pick5 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel4)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel5 AS MATERIALIZED (SELECT vec_id FROM sel4
        |  UNION ALL SELECT vec_id FROM pick5),
        |pick6 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel5)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel5)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel6 AS MATERIALIZED (SELECT vec_id FROM sel5
        |  UNION ALL SELECT vec_id FROM pick6),
        |pick7 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel6)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel6)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel7 AS MATERIALIZED (SELECT vec_id FROM sel6
        |  UNION ALL SELECT vec_id FROM pick7),
        |pick8 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel7)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel7)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel8 AS MATERIALIZED (SELECT vec_id FROM sel7
        |  UNION ALL SELECT vec_id FROM pick8),
        |pick9 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel8)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel8)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel9 AS MATERIALIZED (SELECT vec_id FROM sel8
        |  UNION ALL SELECT vec_id FROM pick9),
        |pick10 AS MATERIALIZED (SELECT c.vec_id, c.rel4,
        |    7 * c.rel4 - 3 * (SELECT max(s4) FROM sim
        |      WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel9)) AS sc
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel9)
        |  ORDER BY sc DESC, c.vec_id ASC LIMIT 1),
        |sel10 AS MATERIALIZED (SELECT vec_id FROM sel9
        |  UNION ALL SELECT vec_id FROM pick10)
        |SELECT 1 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick1
        |UNION ALL SELECT 2 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick2
        |UNION ALL SELECT 3 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick3
        |UNION ALL SELECT 4 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick4
        |UNION ALL SELECT 5 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick5
        |UNION ALL SELECT 6 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick6
        |UNION ALL SELECT 7 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick7
        |UNION ALL SELECT 8 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick8
        |UNION ALL SELECT 9 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick9
        |UNION ALL SELECT 10 AS rank, vec_id, CAST(rel4 AS DOUBLE) / 10000 AS rel, CAST(sc AS BIGINT) AS mmr_i FROM pick10
        |ORDER BY rank""".stripMargin,

    "q_knn_cosine" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum([v[i]*v[i] for i in generate_series(1, len(v))])) AS nrm
        |  FROM e),
        |p AS (SELECT v AS pv, nrm AS pnrm FROM n WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(list_sum([v[i]*pv[i] for i in generate_series(1, len(v))])
        |        / (nrm * pnrm), 4) AS cos_sim
        |FROM n, p
        |ORDER BY cos_sim DESC, vec_id ASC
        |LIMIT 10""".stripMargin,

    // Batch variant: same mirrored cosine formula per (corpus, probe) pair;
    // the rn<=k cut and the output sort share the total (rounded sim DESC,
    // vec_id) ordering, so both engines cut identical rows.
    "q_knn_batch" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum([v[i]*v[i] for i in generate_series(1, len(v))])) AS nrm
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm FROM n WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, n.vec_id, n.label,
        |    round(list_sum([v[i]*pv[i] for i in generate_series(1, len(v))])
        |          / (nrm * pnrm), 4) AS cos_sim
        |  FROM n, p),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |        ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
        |SELECT probe_id, vec_id, label, cos_sim FROM r WHERE rn <= 5
        |ORDER BY probe_id, cos_sim DESC, vec_id""".stripMargin,

    "q_doc_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id, tk,
        |    unnest(generate_series(1, greatest(len(tk), 1), 20)) AS cs FROM t)
        |SELECT doc_id,
        |  CAST((cs - 1) // 20 AS INT) AS chunk_idx,
        |  CAST(cs AS INT) AS chunk_start,
        |  len(tk[cs : cs + 29]) AS n_chunk_tokens,
        |  array_to_string(tk[cs : cs + 29], ' ') AS chunk_text
        |FROM s
        |ORDER BY doc_id, chunk_start""".stripMargin,

    "q_text_clean" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_raw,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS n_chars_clean,
        |  len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS n_tokens_clean,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')) AS text_clean
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, token, COUNT(*) AS n
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY lang, token
        |ORDER BY lang, token""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
        |  length(text) AS n_chars_actual,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, length(text) AS n_chars_m,
        |    string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  n_chars_m,
        |  round(CAST(n_chars_m AS DOUBLE) / len(toks), 4) AS chars_per_token,
        |  len(list_filter(toks, x -> x IN ('a', 'the'))) AS n_stop,
        |  round(CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
        |        / len(toks), 4) AS stop_ratio,
        |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS ttr
        |FROM t
        |ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    len(list_filter(toks, x -> x IN ('join','filter','order','table'))) AS s_sql,
        |    len(list_filter(toks, x -> x IN ('hash','scan','merge','sort'))) AS s_exec,
        |    len(list_filter(toks, x -> x IN ('vector','window','batch','line'))) AS s_vec
        |  FROM t)
        |SELECT doc_id, s_sql, s_exec, s_vec,
        |  CASE WHEN s_sql >= s_exec AND s_sql >= s_vec THEN 'sql'
        |       WHEN s_exec >= s_vec THEN 'exec'
        |       ELSE 'vec' END AS lang_guess
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        |  md5(text) AS exact_fp,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS shape_fp,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |        t -> CAST(ascii(t) * 31 + length(t) AS BIGINT))),
        |    (a, b) -> (a * 131 + b) % 1000000007) AS rolling_fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Hash-bucket sampling: md5 hex compares identically in both engines,
    // so the per-stratum keep threshold is a plain string comparison.
    "q_sample_hash" ->
      """WITH s AS (SELECT doc_id, lang,
        |    substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM s
        |WHERE CASE WHEN lang = 'en' THEN bucket < '40' ELSE bucket < '20' END
        |ORDER BY doc_id""".stripMargin,

    "q_split_assign" ->
      """WITH s AS (SELECT doc_id, lang,
        |    substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket,
        |  CASE WHEN bucket < 'cc' THEN 'train'
        |       WHEN bucket < 'e6' THEN 'val' ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """WITH s AS (SELECT doc_id, lang,
        |    md5('strat:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT doc_id, lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
        |  FROM s)
        |SELECT doc_id, lang, h, CAST(rk AS INT) AS rk FROM r
        |WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,

    "q_source_budget" ->
      """SELECT doc_id, source, n_tokens, cum_tokens, cum_tokens <= 1000 AS kept
        |FROM (SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(SUM(len(string_split(text, ' '))) OVER (
        |      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000) AS INT) AS bal_bucket,
        |  count(*) AS class_size, count(*) = 1 AS unique_row
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING count(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, bal_bucket""".stripMargin,

    "q_dp_counts" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |s AS (SELECT c_nationkey, c_mktsegment, n,
        |  md5('dp:' || '|' || CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment) AS h
        |  FROM g)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(n + (CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,1,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,2,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,3,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,4,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,5,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,6,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,7,1)), 1) AS INT)
        |    + CAST(substr('0112122312232334', strpos('0123456789abcdef', substr(h,8,1)), 1) AS INT)) - 16 AS BIGINT) AS n_released
        |FROM s ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_pii_scrub" ->
      """WITH t AS (SELECT c_custkey,
        |  concat_ws(' ', c_name, 'bal',
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), c_mktsegment) AS blob
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(blob, 'Customer#[0-9]{9}')) AS INT) AS n_name,
        |  CAST(len(regexp_extract_all(blob, '-?[0-9]+\.[0-9]{2}')) AS INT) AS n_num,
        |  regexp_replace(regexp_replace(blob, 'Customer#[0-9]{9}', '[NAME]', 'g'),
        |    '-?[0-9]+\.[0-9]{2}', '[NUM]', 'g') AS scrubbed
        |FROM t ORDER BY c_custkey""".stripMargin,

    "q_pseudonymize" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name,
        |  md5('pepper:' || regexp_extract(c_name, '([0-9]+)', 1)) AS surrogate_id,
        |  length(regexp_extract(c_name, '([0-9]+)', 1)) > 0 AS has_id
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_seq_pack" ->
      """WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
        |  CAST(cum - n_tokens - floor((cum - n_tokens) / 512.0) * 512 AS BIGINT)
        |    AS pack_offset
        |FROM c
        |ORDER BY lang, doc_id""".stripMargin,

    "q_mix_interleave" ->
      """WITH w AS (SELECT doc_id, source,
        |    CASE WHEN source IN ('src0','src1') THEN 3.0 ELSE 1.0 END AS wt,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |m AS (SELECT doc_id, source, rn / wt AS pos FROM w)
        |SELECT doc_id, source,
        |  CAST(row_number() OVER (ORDER BY pos, source, doc_id) AS BIGINT) AS mix_pos
        |FROM m
        |ORDER BY mix_pos""".stripMargin,

    "q_fuzzy_match" ->
      """WITH b AS (SELECT p_partkey, p_name, substr(p_name, 1, 4) AS pre, p_size
        |           FROM part)
        |SELECT a.p_partkey AS id_a, c.p_partkey AS id_b,
        |  a.p_name AS name_a, c.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist
        |FROM b a JOIN b c ON a.pre = c.pre AND a.p_size = c.p_size
        |                 AND a.p_partkey < c.p_partkey
        |WHERE levenshtein(a.p_name, c.p_name) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // IDF as the exact ratio N/df (not ln): libm log rounding differs
    // across engines; the ratio is a long division both compute identically
    // and ln is monotone in it, so the ranking is the same.
    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |    floor(tf.tf * (n.n_docs / CAST(dfreq.df AS DOUBLE)) * 1000000.0)
        |      / 1000000.0 AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM s)
        |SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk FROM r
        |WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "q_clip_outliers" ->
      """WITH p AS (SELECT lang,
        |    floor(quantile_cont(CAST(n_chars AS DOUBLE), 0.05) * 1e6) / 1e6 AS p05,
        |    floor(quantile_cont(CAST(n_chars AS DOUBLE), 0.95) * 1e6) / 1e6 AS p95
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  CAST(floor(least(greatest(CAST(d.n_chars AS DOUBLE), p.p05), p.p95))
        |       AS BIGINT) AS n_chars_clipped,
        |  (d.n_chars < p.p05 OR d.n_chars > p.p95) AS was_clipped
        |FROM documents d JOIN p ON d.lang = p.lang
        |ORDER BY d.doc_id""".stripMargin,

    // Same recursive-closure oracle shape as q_dedup_groups, over the
    // blocked Levenshtein pairs instead of MinHash bands.
    "q_entity_groups" ->
      """WITH RECURSIVE b AS (SELECT p_partkey, p_name,
        |    substr(p_name, 1, 4) AS pre, p_size FROM part),
        |pairs AS (
        |  SELECT a.p_partkey AS doc_a, c.p_partkey AS doc_b
        |  FROM b a JOIN b c ON a.pre = c.pre AND a.p_size = c.p_size
        |                   AND a.p_partkey < c.p_partkey
        |  WHERE levenshtein(a.p_name, c.p_name) <= 3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src)
        |SELECT node AS part_id, least(node, min(r)) AS entity_id
        |FROM reach GROUP BY node
        |ORDER BY part_id""".stripMargin,

    "q_label_balance" ->
      """WITH g AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |             count(*) AS k_classes FROM g)
        |SELECT lang, n_docs,
        |  floor(n_docs / CAST(n_total AS DOUBLE) * 1000000.0) / 1000000.0 AS share,
        |  floor(n_total / CAST(k_classes * n_docs AS DOUBLE) * 1000000.0) / 1000000.0
        |    AS weight
        |FROM g CROSS JOIN t
        |ORDER BY lang""".stripMargin,

    "q_top_ngrams" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS v FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |  bg AS (SELECT lang,
        |      unnest([v[i] || ' ' || v[i+1] for i in generate_series(1, len(v)-1)]) AS bigram
        |    FROM t),
        |  c AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
        |  r AS (SELECT lang, bigram, n,
        |      row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
        |    FROM c)
        |SELECT lang, bigram, n, CAST(rk AS INT) AS rk FROM r
        |WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,

    // Formula mirrored operation-for-operation with the Spark side
    // (divide first, then *1e6, then floor) so the IEEE result is identical.
    "q_repetition_filter" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |wc AS (SELECT doc_id, x AS word, count(*) AS c
        |       FROM d, unnest(w) AS t(x) GROUP BY doc_id, x),
        |topw AS (SELECT doc_id, max(c) AS topc, sum(c) AS nw FROM wc GROUP BY doc_id),
        |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |       FROM d, unnest(range(1, len(w))) AS r(i)),
        |bgm AS (SELECT doc_id, count(*) AS nbg, count(DISTINCT bigram) AS dbg
        |        FROM bg GROUP BY doc_id),
        |m AS (SELECT t.doc_id, CAST(nw AS BIGINT) AS n_words,
        |  floor(CAST(topc AS DOUBLE) / nw * 1e6) / 1e6 AS top_word_frac,
        |  floor((CAST(1 AS DOUBLE) - CAST(dbg AS DOUBLE) / nbg) * 1e6) / 1e6
        |    AS dup_bigram_frac
        |  FROM topw t JOIN bgm USING (doc_id))
        |SELECT doc_id, n_words, top_word_frac, dup_bigram_frac,
        |  (top_word_frac > 0.15 OR dup_bigram_frac > 0.08) AS flagged
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, source, array_to_string(w[i:i+3], ' ') AS gram
        |      FROM d, unnest(range(1, len(w) - 2)) AS r(i)),
        |e AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |h AS (SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared
        |      FROM g JOIN e USING (gram) WHERE g.source <> 'src0'
        |      GROUP BY g.doc_id)
        |SELECT d.doc_id, d.source,
        |  CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM d LEFT JOIN h USING (doc_id)
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    // Oracle is the NAIVE inequality join — an independent formulation of
    // the overlap semantics the binned equi-join must reproduce exactly.
    "q_join_interval_bin" ->
      """WITH w AS (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)
        |             AS w_start FROM orders),
        |ww AS (SELECT w_start, w_start + 2 AS w_end FROM w),
        |li AS (SELECT l_orderkey, l_linenumber,
        |         CAST(l_shipdate AS DATE) AS svc_start,
        |         CAST(l_shipdate AS DATE)
        |           + CAST(1 + (l_orderkey + l_linenumber) % 30 AS INT) AS svc_end
        |       FROM lineitem),
        |hits AS (SELECT DISTINCT ww.w_start, li.l_orderkey, li.l_linenumber
        |  FROM ww JOIN li
        |    ON li.svc_start <= ww.w_end AND ww.w_start <= li.svc_end)
        |SELECT w_start, count(*) AS n_lines,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM hits GROUP BY w_start
        |ORDER BY w_start""".stripMargin,

    "q_mix_temperature" ->
      """WITH per AS (SELECT source, count(*) AS n_docs FROM documents
        |             GROUP BY source),
        |m AS (SELECT source, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT) AS w_micro
        |  FROM per),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |             CAST(sum(w_micro) AS BIGINT) AS w_total FROM m)
        |SELECT source, n_docs,
        |  floor(CAST(n_docs AS DOUBLE) / n_total * 1e6) / 1e6 AS nat_share,
        |  floor(CAST(w_micro AS DOUBLE) / w_total * 1e6) / 1e6 AS temp_share,
        |  floor((CAST(w_micro AS DOUBLE) * n_total)
        |        / (CAST(w_total AS DOUBLE) * n_docs) * 1e6) / 1e6 AS boost
        |FROM m CROSS JOIN t
        |ORDER BY source""".stripMargin,

    // Oracle is the plain vocabulary-wide GROUP BY the sketch-then-verify
    // plan must reproduce exactly (the MG candidate set is complete for
    // support 2% > 1/(k+1), so the engine's bounded two-pass is bit-exact).
    "q_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word
        |             FROM documents),
        |n AS (SELECT count(*) AS n_total FROM tok),
        |c AS (SELECT word, count(*) AS n FROM tok GROUP BY 1)
        |SELECT word, n, floor(CAST(n AS DOUBLE) / n_total * 1e6) / 1e6 AS frac
        |FROM c CROSS JOIN n
        |WHERE CAST(n AS DOUBLE) >= n_total * 0.02
        |ORDER BY n DESC, word""".stripMargin,

    "q_heavy_hitters_grouped" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS word
        |             FROM documents),
        |t AS (SELECT lang, count(*) AS n_total FROM tok GROUP BY 1),
        |c AS (SELECT lang, word, count(*) AS n FROM tok GROUP BY 1, 2)
        |SELECT c.lang, word, n,
        |  floor(CAST(n AS DOUBLE) / n_total * 1e6) / 1e6 AS frac
        |FROM c JOIN t USING (lang)
        |WHERE CAST(n AS DOUBLE) >= n_total * 0.02
        |ORDER BY lang, n DESC, word""".stripMargin,

    // ln argument assembled left-to-right identically to the Spark side
    // (§5.3): (n_pair·cu·cu) / (cb·c1a·c1b), then ln, then micro-floor.
    "q_word_pmi" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |uni AS (SELECT w, count(*) AS c1 FROM tok GROUP BY 1),
        |nu AS (SELECT CAST(sum(c1) AS BIGINT) AS cu FROM uni),
        |d AS (SELECT string_split(text, ' ') AS v FROM documents
        |      WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT v[i] AS w1, v[i+1] AS w2
        |       FROM d, unnest(range(1, len(v))) AS r(i)),
        |pc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2),
        |nb AS (SELECT CAST(sum(n_pair) AS BIGINT) AS cb FROM pc),
        |s AS (SELECT w1, w2, n_pair,
        |    floor(ln((CAST(n_pair AS DOUBLE) * cu) * cu
        |             / ((CAST(cb AS DOUBLE) * a.c1) * b.c1)) * 1e6) / 1e6 AS pmi
        |  FROM pc
        |  JOIN uni a ON pc.w1 = a.w
        |  JOIN uni b ON pc.w2 = b.w
        |  CROSS JOIN nu CROSS JOIN nb
        |  WHERE n_pair >= 5)
        |SELECT w1, w2, n_pair, pmi FROM s
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    // Textbook self-join-on-gram formulation; the engine states the same
    // result via one collect_set aggregation + in-row pair expansion.
    "q_source_overlap" ->
      """WITH d AS (SELECT source, string_split(text, ' ') AS v FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT DISTINCT source, v[i] || ' ' || v[i+1] AS gram
        |      FROM d, unnest(range(1, len(v))) AS r(i))
        |SELECT a.source AS source_a, b.source AS source_b,
        |       count(*) AS n_shared
        |FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // The whole curation funnel re-stated independently: each stage CTE
    // mirrors its declared-query oracle (quality z, repetition fractions,
    // md5 dedup, MinHash pairs + recursive-CTE closure over the stage-4
    // survivors, 4-gram decontamination), counted per stage.
    "q_corpus_curate" ->
      s"""WITH RECURSIVE
         |$curationCtes
         |SELECT * FROM (
         |  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
         |         count(*) AS n_docs FROM d0
         |  UNION ALL SELECT 1, 'holdout_excluded', count(*) FROM d1
         |  UNION ALL SELECT 2, 'quality_gate', count(*) FROM d2
         |  UNION ALL SELECT 3, 'repetition_filter', count(*) FROM d3
         |  UNION ALL SELECT 4, 'exact_dedup', count(*) FROM d4
         |  UNION ALL SELECT 5, 'near_dedup', count(*) FROM d5
         |  UNION ALL SELECT 6, 'decontaminate', count(*) FROM d6)
         |ORDER BY stage_idx""".stripMargin,

    // The same funnel, per-doc: stage flags via membership left-joins over
    // the shared CTE chain (the stage frames are nested subsets, so
    // "survived stage k" = "member of dk"), first failed gate named.
    "q_curation_audit" ->
      s"""WITH RECURSIVE
         |$curationCtes
         |SELECT d0.doc_id,
         |  m1.doc_id IS NOT NULL AS s1_holdout,
         |  m2.doc_id IS NOT NULL AS s2_quality,
         |  m3.doc_id IS NOT NULL AS s3_repetition,
         |  m4.doc_id IS NOT NULL AS s4_exact,
         |  m5.doc_id IS NOT NULL AS s5_neardup,
         |  m6.doc_id IS NOT NULL AS s6_decontam,
         |  m6.doc_id IS NOT NULL AS kept,
         |  CASE WHEN m1.doc_id IS NULL THEN 'holdout_excluded'
         |       WHEN m2.doc_id IS NULL THEN 'quality_gate'
         |       WHEN m3.doc_id IS NULL THEN 'repetition_filter'
         |       WHEN m4.doc_id IS NULL THEN 'exact_dedup'
         |       WHEN m5.doc_id IS NULL THEN 'near_dedup'
         |       WHEN m6.doc_id IS NULL THEN 'decontaminate'
         |       ELSE 'kept' END AS drop_stage
         |FROM d0
         |LEFT JOIN d1 m1 ON m1.doc_id = d0.doc_id
         |LEFT JOIN d2 m2 ON m2.doc_id = d0.doc_id
         |LEFT JOIN d3 m3 ON m3.doc_id = d0.doc_id
         |LEFT JOIN d4 m4 ON m4.doc_id = d0.doc_id
         |LEFT JOIN d5 m5 ON m5.doc_id = d0.doc_id
         |LEFT JOIN d6 m6 ON m6.doc_id = d0.doc_id
         |ORDER BY d0.doc_id""".stripMargin,

    // Bucket id = length(bin(n)) = floor(log2 n)+1: integer/string ops,
    // bit-identical across engines (libm log2 could round at band edges).
    "q_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |b AS (SELECT CAST(length(bin(n)) AS INT) AS bucket, count(*) AS n_keys,
        |    min(n) AS min_count, max(n) AS max_count, sum(n) AS sn
        |  FROM c GROUP BY 1)
        |SELECT bucket, n_keys, min_count, max_count,
        |  floor(CAST(sn AS DOUBLE) / total * 1e6) / 1e6 AS row_share
        |FROM b CROSS JOIN t
        |ORDER BY bucket""".stripMargin,

    "q_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    // Boundary rule = md5 prefix (cross-engine identical); chunk id =
    // boundaries strictly before the position (running window sum).
    "q_content_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos,
        |    array_to_string(w[i:i+3], ' ') AS gram
        |  FROM d, unnest(range(1, len(w) - 2)) AS r(i) WHERE len(w) >= 4),
        |b AS (SELECT doc_id, pos,
        |    CASE WHEN md5(gram) LIKE '0%' THEN 1 ELSE 0 END AS bnd
        |  FROM g),
        |c AS (SELECT doc_id, pos,
        |    CAST(COALESCE(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
        |      AS chunk_idx
        |  FROM b)
        |SELECT doc_id, chunk_idx,
        |  CAST(min(pos) AS INT) AS start_pos, CAST(max(pos) AS INT) AS end_pos,
        |  count(*) AS n_grams
        |FROM c GROUP BY 1, 2
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // Chunk text reassembled by position from the token array (1-based
    // inclusive slice mirrors Spark's slice(start+1, len)), md5-hashed.
    "q_chunk_dedup" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos,
        |    array_to_string(w[i:i+3], ' ') AS gram
        |  FROM d, unnest(range(1, len(w) - 2)) AS r(i) WHERE len(w) >= 4),
        |b AS (SELECT doc_id, pos,
        |    CASE WHEN md5(gram) LIKE '0%' THEN 1 ELSE 0 END AS bnd
        |  FROM g),
        |c AS (SELECT doc_id, pos,
        |    COALESCE(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
        |  FROM b),
        |ch AS (SELECT doc_id, chunk_idx,
        |    min(pos) AS start_pos, max(pos) AS end_pos
        |  FROM c GROUP BY 1, 2),
        |h AS (SELECT d.source,
        |    md5(array_to_string(d.w[ch.start_pos + 1 : ch.end_pos + 4], ' '))
        |      AS chash
        |  FROM ch JOIN d USING (doc_id))
        |SELECT source, count(*) AS n_chunks,
        |  count(DISTINCT chash) AS n_distinct,
        |  floor((1.0 - CAST(count(DISTINCT chash) AS DOUBLE) / count(*)) * 1e6)
        |    / 1e6 AS dup_ratio
        |FROM h GROUP BY source
        |ORDER BY source""".stripMargin,

    // Per-word nll floor-snaps to micro-units BEFORE the per-doc sum (long
    // sums are order-independent; a double sum-of-ln would drift in the
    // last ulp with partition order), mirroring the Spark side exactly.
    "q_lm_perplexity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |uni AS (SELECT w, count(*) AS c1 FROM tok GROUP BY 1),
        |nu AS (SELECT CAST(sum(c1) AS BIGINT) AS cu FROM uni),
        |s AS (SELECT doc_id, count(*) AS n_words,
        |    sum(CAST(floor(ln(CAST(cu AS DOUBLE) / c1) * 1e6) AS BIGINT))
        |      AS nll_micro
        |  FROM tok JOIN uni USING (w) CROSS JOIN nu GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |    floor(CAST(nll_micro AS DOUBLE) / n_words) / 1e6 AS avg_nll
        |  FROM s),
        |p AS (SELECT floor(quantile_cont(avg_nll, 0.9) * 1e6) / 1e6 AS p90
        |      FROM sc)
        |SELECT doc_id, n_words, avg_nll, avg_nll > p90 AS flagged
        |FROM sc CROSS JOIN p
        |ORDER BY doc_id""".stripMargin,

    // Bigram form (r15 judge #4): same micro-snap-before-long-sum discipline;
    // every ln argument is an exact small-integer ratio in both engines
    // (add-1 numerator, c1_prev + V denominator). The doc-initial token
    // backs off to the unsmoothed unigram exactly as the Spark side does.
    "q_lm_perplexity2" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, i AS pos, w[i] AS tw,
        |    CASE WHEN i > 1 THEN w[i - 1] ELSE NULL END AS w_prev
        |  FROM d, unnest(range(1, len(w) + 1)) AS r(i)),
        |uni AS (SELECT tw AS w, count(*) AS c1 FROM tok GROUP BY 1),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS cu, count(*) AS v FROM uni),
        |bi AS (SELECT w_prev, tw AS w, count(*) AS c2 FROM tok
        |       WHERE w_prev IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT tok.doc_id, count(*) AS n_words,
        |    sum(CAST(floor(CASE WHEN tok.w_prev IS NULL
        |      THEN ln(CAST(cu AS DOUBLE) / u.c1)
        |      ELSE ln(CAST(up.c1 + v AS DOUBLE) / (bi.c2 + 1)) END * 1e6)
        |      AS BIGINT)) AS nll_micro
        |  FROM tok
        |  JOIN uni u ON u.w = tok.tw
        |  LEFT JOIN uni up ON up.w = tok.w_prev
        |  LEFT JOIN bi ON bi.w_prev = tok.w_prev AND bi.w = tok.tw
        |  CROSS JOIN t
        |  GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |    floor(CAST(nll_micro AS DOUBLE) / n_words) / 1e6 AS avg_nll
        |  FROM s),
        |p AS (SELECT floor(quantile_cont(avg_nll, 0.9) * 1e6) / 1e6 AS p90
        |      FROM sc)
        |SELECT doc_id, n_words, avg_nll, avg_nll > p90 AS flagged
        |FROM sc CROSS JOIN p
        |ORDER BY doc_id""".stripMargin,

    // NB quality gate: Laplace-smoothed two-class word LLR; identical double
    // division and ln arguments both engines, micro-snapped per word before
    // the long per-doc sum (same exposure class as q_lm_perplexity).
    "q_quality_nb" ->
      """WITH tok AS (SELECT doc_id, source = 'src0' AS pos,
        |                    unnest(string_split(text, ' ')) AS w FROM documents),
        |cnt AS (SELECT w,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
        |  FROM tok GROUP BY 1),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn,
        |             count(*) AS v FROM cnt),
        |s AS (SELECT doc_id, count(*) AS n_words,
        |    CAST(sum(CAST(floor((ln(CAST(cp + 1 AS DOUBLE) / (np + v)) -
        |                         ln(CAST(cn + 1 AS DOUBLE) / (nn + v))) * 1e6) AS BIGINT)) AS BIGINT) AS llr_micro
        |  FROM tok JOIN cnt USING (w) CROSS JOIN t GROUP BY 1)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, llr_micro,
        |  floor(CAST(llr_micro AS DOUBLE) / n_words) / 1e6 AS avg_llr,
        |  llr_micro > 0 AS pred_pos
        |FROM s ORDER BY doc_id""".stripMargin,

    // Sliding 10-gram anchors at every position; an anchor is duplicated
    // when its gram occurs at any other (doc, pos); consecutive duplicated
    // anchors merge via gaps-and-islands (pos - row_number) into maximal
    // spans covering words [min(pos), max(pos)+9].
    "q_substring_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |a AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |        array_to_string(w[i+1:i+10], ' ') AS gram
        |      FROM d, unnest(range(0, len(w) - 9)) AS r(i)
        |      WHERE len(w) >= 10),
        |occ AS (SELECT gram, count(*) AS n_occ FROM a GROUP BY 1),
        |dup AS (SELECT a.doc_id, a.pos
        |        FROM a JOIN occ USING (gram) WHERE n_occ >= 2),
        |runs AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM dup),
        |s AS (SELECT doc_id, island, min(pos) AS start_pos,
        |    max(pos) + 9 AS end_pos
        |  FROM runs GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos)
        |    AS INTEGER) AS span_idx,
        |  CAST(start_pos AS INTEGER) AS start_pos,
        |  CAST(end_pos - start_pos + 1 AS INTEGER) AS span_len
        |FROM s
        |ORDER BY doc_id, span_idx""".stripMargin,

    // The excision restates the span engine, ranks spans by their word
    // TEXT (first corpus-wide occurrence by (doc_id, start_pos) survives),
    // drops every word covered by a losing span, and reassembles. The
    // word-position anti-join mirrors the Spark range-residual anti join.
    "q_substring_excise" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |a AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |        array_to_string(w[i+1:i+10], ' ') AS gram
        |      FROM d, unnest(range(0, len(w) - 9)) AS r(i)
        |      WHERE len(w) >= 10),
        |occ AS (SELECT gram, count(*) AS n_occ FROM a GROUP BY 1),
        |dup AS (SELECT a.doc_id, a.pos
        |        FROM a JOIN occ USING (gram) WHERE n_occ >= 2),
        |runs AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM dup),
        |s AS (SELECT doc_id, min(pos) AS start_pos, max(pos) + 9 AS end_pos
        |  FROM runs GROUP BY doc_id, island),
        |st AS (SELECT s.doc_id, s.start_pos, s.end_pos,
        |    array_to_string(d.w[s.start_pos + 1:s.end_pos + 1], ' ') AS span_text
        |  FROM s JOIN d USING (doc_id)),
        |ex AS (SELECT doc_id, start_pos, end_pos FROM (
        |    SELECT doc_id, start_pos, end_pos,
        |      row_number() OVER (PARTITION BY span_text
        |        ORDER BY doc_id, start_pos) AS rk
        |    FROM st) WHERE rk > 1),
        |words AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, w[i+1] AS word
        |  FROM d, unnest(range(0, len(w))) AS r(i)),
        |kept AS (SELECT words.* FROM words
        |  WHERE NOT EXISTS (SELECT 1 FROM ex
        |    WHERE ex.doc_id = words.doc_id
        |      AND words.pos BETWEEN ex.start_pos AND ex.end_pos))
        |SELECT w0.doc_id, w0.n_words,
        |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(k.clean_text, '') AS clean_text
        |FROM (SELECT doc_id, count(*) AS n_words FROM words GROUP BY 1) w0
        |LEFT JOIN (SELECT doc_id, count(*) AS n_kept,
        |    array_to_string(list(word ORDER BY pos), ' ') AS clean_text
        |  FROM kept GROUP BY 1) k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_span_dup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS gram
        |      FROM d, unnest(range(1, len(w) - 2)) AS r(i)
        |      WHERE len(w) >= 4),
        |dfreq AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY 1),
        |m AS (SELECT g.doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN dfreq.n_docs >= 2 THEN 1 ELSE 0 END) AS n_shared
        |  FROM g JOIN dfreq USING (gram) GROUP BY 1)
        |SELECT doc_id, n_grams, CAST(n_shared AS BIGINT) AS n_shared,
        |  floor(CAST(n_shared AS DOUBLE) / n_grams * 1e6) / 1e6 AS dup_frac,
        |  floor(CAST(n_shared AS DOUBLE) / n_grams * 1e6) / 1e6 > 0.5 AS flagged
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    // Linear term assembled left-to-right exactly as the Spark side; the
    // keep flag tests z >= 0 (== score >= 0.5) so it never depends on exp().
    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, length(text) AS nc,
        |    string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id,
        |    CAST(nc AS DOUBLE) / len(toks) AS f1,
        |    CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
        |      / len(toks) AS f2,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS f3
        |  FROM t),
        |z AS (SELECT doc_id, -2.0 + 0.3 * f1 - 4.0 * f2 + 3.0 * f3 AS z FROM f)
        |SELECT doc_id,
        |  floor(1.0 / (1.0 + exp(-z)) * 1e6) / 1e6 AS score,
        |  z >= 0 AS kept
        |FROM z
        |ORDER BY doc_id""".stripMargin,

    // Centroid in exact integer micro-units (floor(x*1e6) longs summed —
    // order-independent), then the mirrored sequential cosine (§5.3).
    "q_embed_outliers" ->
      """WITH x AS (SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS m
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
        |c AS (SELECT label, i,
        |    floor(CAST(sum(m) AS DOUBLE) / count(*)) / 1e6 AS cv
        |  FROM x GROUP BY 1, 2),
        |cen AS (SELECT label, list(cv ORDER BY i) AS cen FROM c GROUP BY 1),
        |e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (SELECT e.vec_id, e.label,
        |    round(list_sum([v[i]*cen[i] for i in generate_series(1, len(v))])
        |      / (sqrt(list_sum([v[i]*v[i] for i in generate_series(1, len(v))]))
        |       * sqrt(list_sum([cen[i]*cen[i] for i in generate_series(1, len(cen))]))),
        |      4) AS cos_sim
        |  FROM e JOIN cen USING (label)),
        |r AS (SELECT vec_id, label, cos_sim,
        |    row_number() OVER (PARTITION BY label ORDER BY cos_sim, vec_id) AS rk
        |  FROM s)
        |SELECT label, vec_id, cos_sim, CAST(rk AS INT) AS rk FROM r
        |WHERE rk <= 3
        |ORDER BY label, rk""".stripMargin,

    // idf micro-floor-snapped straight after ln, per-(doc,term) scores
    // snapped to BIGINT micros BEFORE the doc sum (order-independent).
    "q_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE term IN ('spark','table','join') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term,
        |    floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0) / 1000000.0 AS idf
        |  FROM dfreq, st),
        |sc AS (SELECT t.doc_id,
        |    CAST(floor(i.idf * (t.tf * 2.2)
        |      / (t.tf + 1.2 * (0.25 + 0.75 * (d.dl / (CAST(st.total_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))
        |      * 1000000.0) AS BIGINT) AS s_micro
        |  FROM tf t JOIN idf i USING(term) JOIN dl d USING(doc_id), st)
        |SELECT s.doc_id, d.dl AS n_tokens, count(*) AS n_terms_hit,
        |  CAST(sum(s.s_micro) AS BIGINT) AS score_micro
        |FROM sc s JOIN dl d USING(doc_id)
        |GROUP BY s.doc_id, d.dl
        |ORDER BY score_micro DESC, s.doc_id LIMIT 100""".stripMargin,

    // The SAME greedy loop as graft.functions.Bpe (lowest rank, leftmost,
    // one occurrence per step) as a recursive CTE over the identical
    // merges VALUES table; per-word results join back to (doc, word)
    // frequencies. Merges must stay in lockstep with Bpe.merges.
    "q_token_bpe" ->
      """WITH RECURSIVE
        |mg(rk, l, r) AS (SELECT * FROM (VALUES
        |  (1,'t','h'),(2,'th','e'),(3,'a','n'),(4,'i','n'),(5,'e','r'),
        |  (6,'r','e'),(7,'o','r'),(8,'s','t'),(9,'a','r'),(10,'l','e'),
        |  (11,'o','w'),(12,'a','t'),(13,'b','le'),(14,'a','ble'),
        |  (15,'t','able'),(16,'s','c'),(17,'sc','an'),(18,'o','u'),
        |  (19,'w','in'),(20,'d','ow'),(21,'win','dow'),(22,'f','a'),
        |  (23,'fa','st'),(24,'d','at')) t),
        |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |wf AS (SELECT doc_id, w, count(*) AS n FROM tok GROUP BY doc_id, w),
        |words AS (SELECT DISTINCT w FROM wf),
        |bpe(w, s) AS (
        |  SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' FROM words
        |  UNION ALL
        |  SELECT w, substr(s, 1, p - 1) || ' ' || l || r || ' ' ||
        |         substr(s, p + length(' ' || l || ' ' || r || ' '))
        |  FROM (SELECT b.w, b.s, m.l, m.r, strpos(b.s, ' '||m.l||' '||m.r||' ') AS p,
        |          row_number() OVER (PARTITION BY b.w ORDER BY m.rk) AS pick
        |        FROM bpe b JOIN mg m ON strpos(b.s, ' '||m.l||' '||m.r||' ') > 0)
        |  WHERE pick = 1),
        |final AS (SELECT w, s FROM bpe b
        |          WHERE NOT EXISTS (SELECT 1 FROM mg
        |                            WHERE strpos(b.s, ' '||mg.l||' '||mg.r||' ') > 0)),
        |wtok AS (SELECT w,
        |    CASE WHEN w = '' THEN 0
        |         ELSE length(trim(s)) - length(replace(trim(s), ' ', '')) + 1
        |    END AS n_bpe
        |  FROM final)
        |SELECT wf.doc_id, CAST(sum(wf.n) AS BIGINT) AS n_ws_tokens,
        |  CAST(sum(wf.n * wt.n_bpe) AS BIGINT) AS n_bpe_tokens
        |FROM wf JOIN wtok wt USING (w)
        |GROUP BY wf.doc_id
        |ORDER BY doc_id""".stripMargin,

    // RRF = integer-micro reciprocal ranks summed as BIGINT — no float
    // path. Arms restate the q_bm25 / q_knn_cosine oracles (top-100 cuts),
    // ranks cut to INT to match Spark's row_number type.
    "q_hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE term IN ('spark','table','join') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term,
        |    floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0) / 1000000.0 AS idf
        |  FROM dfreq, st),
        |sc AS (SELECT t.doc_id,
        |    CAST(floor(i.idf * (t.tf * 2.2)
        |      / (t.tf + 1.2 * (0.25 + 0.75 * (d.dl / (CAST(st.total_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))
        |      * 1000000.0) AS BIGINT) AS s_micro
        |  FROM tf t JOIN idf i USING(term) JOIN dl d USING(doc_id), st),
        |bm AS (SELECT s.doc_id, CAST(sum(s.s_micro) AS BIGINT) AS score_micro
        |  FROM sc s GROUP BY s.doc_id
        |  ORDER BY score_micro DESC, s.doc_id LIMIT 100),
        |lex AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS lex_rank
        |  FROM bm),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |nn AS (SELECT vec_id, v,
        |    sqrt(list_sum([v[i]*v[i] for i in generate_series(1, len(v))])) AS nrm
        |  FROM e),
        |p AS (SELECT v AS pv, nrm AS pnrm FROM nn WHERE vec_id = 0),
        |knn AS (SELECT vec_id,
        |    round(list_sum([v[i]*pv[i] for i in generate_series(1, len(v))])
        |          / (nrm * pnrm), 4) AS cos_sim
        |  FROM nn, p
        |  ORDER BY cos_sim DESC, vec_id ASC LIMIT 100),
        |vec AS (SELECT vec_id AS doc_id,
        |    CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS vec_rank
        |  FROM knn)
        |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |  COALESCE(l.lex_rank, 0) AS lex_rank,
        |  COALESCE(v.vec_rank, 0) AS vec_rank,
        |  CAST(COALESCE(1000000 // (60 + l.lex_rank), 0)
        |     + COALESCE(1000000 // (60 + v.vec_rank), 0) AS BIGINT) AS rrf_micro
        |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 50""".stripMargin,

    // The NAIVE quadratic gram×gram join — deliberately: the Spark side's
    // prefix filter (PPJoin pigeonhole) must be lossless against exactly
    // this formulation. Integer threshold test on both sides.
    "q_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |gl AS (SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+3], ' ')
        |                   for i in generate_series(1, len(tk)-3)]) AS grams
        |  FROM t WHERE len(tk) >= 4),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM gl),
        |sz AS (SELECT doc_id, len(grams) AS n FROM gl),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, sa.n AS n_a, sb.n AS n_b, n_inter,
        |  round(CAST(n_inter AS DOUBLE) / least(sa.n, sb.n), 4) AS containment
        |FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |WHERE 5 * n_inter >= 4 * least(sa.n, sb.n)
        |ORDER BY id_a, id_b""".stripMargin,

    "q_block_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |b AS (SELECT doc_id, CAST((cs-1)//10 AS INT) AS block_idx,
        |        array_to_string(w[cs : cs+9], ' ') AS block_text
        |      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w), 10)) AS cs FROM t)),
        |k AS (SELECT doc_id, block_idx, block_text,
        |        row_number() OVER (PARTITION BY block_text ORDER BY doc_id, block_idx) = 1 AS kept
        |      FROM b)
        |SELECT doc_id, count(*) AS n_blocks, count(*) FILTER (kept) AS n_kept,
        |  coalesce(string_agg(CASE WHEN kept THEN block_text END, ' ' ORDER BY block_idx), '') AS clean_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 5 unrolled power-iteration CTEs in exact BIGINT nano-units
    // (0.85 = 17/20; integer div throughout) — bit-identical to the
    // Spark loop under any partitioning because every sum is integral.
    "q_pagerank" -> {
      val iters = (1 to 5).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s""",r$i AS (SELECT od.node, od.outdeg,
           |    CAST(150000000 // n.n_nodes + sum((p.r*17)//20//p.outdeg) AS BIGINT) AS r
           |  FROM $prev p JOIN e ON p.node = e.src JOIN od ON e.dst = od.node, n
           |  GROUP BY od.node, od.outdeg, n.n_nodes)""".stripMargin
      }.mkString("\n")
      s"""WITH e0 AS (SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
         |                            'P' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
         |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |od AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src),
         |n AS (SELECT count(*) AS n_nodes FROM od),
         |r0 AS (SELECT node, outdeg, CAST(1000000000 // n_nodes AS BIGINT) AS r FROM od, n)
         |$iters
         |SELECT node, r AS rank_nano FROM r5 ORDER BY rank_nano DESC, node LIMIT 20""".stripMargin
    },

    // Naive a<b<c closure over the same canonical pair CTE the Spark side
    // consumes — orientation-independent, so the Spark degree-ordered
    // enumeration must reproduce it exactly (integer counts end to end).
    "q_graph_triangles" ->
      s"""WITH pairs AS (
         |$minhashPairsSql
         |),
         |tri AS (
         |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
         |  FROM pairs e1 JOIN pairs e2 ON e1.doc_b = e2.doc_a
         |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         |nodes AS (SELECT a AS doc_id FROM tri
         |          UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri)
         |SELECT doc_id, count(*) AS n_tri FROM nodes GROUP BY doc_id
         |ORDER BY n_tri DESC, doc_id""".stripMargin,

    // |c − μ| > 2σ multiplied through by n²: (n·c − S)² > 4·(n·Q − S²) —
    // pure BIGINT on both engines (no division, sqrt, or doubles).
    "q_event_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        |        FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(n_events) AS BIGINT) AS s,
        |        CAST(sum(n_events*n_events) AS BIGINT) AS q
        |       FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.n_events,
        |  CASE WHEN st.n_days*d.n_events > st.s THEN 'high' ELSE 'low' END AS direction
        |FROM daily d JOIN st USING(event_type)
        |WHERE (st.n_days*d.n_events - st.s)*(st.n_days*d.n_events - st.s)
        |      > 4*(st.n_days*st.q - st.s*st.s)
        |ORDER BY event_type, day""".stripMargin,

    // Exact cross-engine Bernoulli: 5-hex md5 uniform vs the micro-snapped
    // sigmoid rescaled to hex range in integer arithmetic, compared as
    // equal-length hex strings (numeric compare with no float thresholds).
    // Recency decay: integer day division of epoch micros is exact in both
    // engines; exp on identical doubles micro-snaps before the threshold.
    "q_sample_decay" ->
      """WITH m AS (SELECT max(ts) AS max_ts FROM events),
        |a AS (SELECT event_id,
        |    (epoch_us(m.max_ts) - epoch_us(e.ts)) // 86400000000 AS age_days
        |  FROM events e CROSS JOIN m),
        |s AS (SELECT event_id, age_days,
        |    least(CAST(floor(exp(-CAST(age_days AS DOUBLE) / 10.0) * 1e6) AS BIGINT),
        |          999999) AS w_micro FROM a)
        |SELECT event_id, age_days, w_micro,
        |  substr(md5('decay:' || CAST(event_id AS VARCHAR)), 1, 5) AS u5
        |FROM s
        |WHERE substr(md5('decay:' || CAST(event_id AS VARCHAR)), 1, 5)
        |      < lpad(lower(hex(w_micro * 1048576 // 1000000)), 5, '0')
        |ORDER BY event_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH t AS (SELECT doc_id, lang, length(text) AS nc,
        |    string_split(text,' ') AS toks FROM documents),
        |z AS (SELECT doc_id, lang,
        |    -2.0 + 0.3*(CAST(nc AS DOUBLE)/len(toks))
        |    - 4.0*(CAST(len(list_filter(toks, x -> x IN ('a','the'))) AS DOUBLE)/len(toks))
        |    + 3.0*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)) AS z FROM t),
        |s AS (SELECT doc_id, lang,
        |    least(CAST(floor(1.0/(1.0+exp(-z))*1e6) AS BIGINT), 999999) AS score_micro FROM z)
        |SELECT doc_id, lang, score_micro,
        |  substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 5) AS u5
        |FROM s
        |WHERE substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 5)
        |      < lpad(lower(hex(score_micro * 1048576 // 1000000)), 5, '0')
        |ORDER BY doc_id""".stripMargin,

    // The counter table IS the sketch (d=4 × w=16, seeded-md5 string
    // buckets); deterministic hashing makes an approximate algorithm
    // fully oracle-checkable. cms_n >= exact_n by construction.
    "q_count_min" ->
      """WITH tok AS (SELECT unnest(string_split(text,' ')) AS term FROM documents),
        |counters AS (
        |  SELECT j, substr(md5('cms' || CAST(j AS VARCHAR) || ':' || term), 1, 1) AS bucket,
        |         count(*) AS cnt
        |  FROM tok, (SELECT unnest([0,1,2,3]) AS j)
        |  GROUP BY 1, 2),
        |probes AS (SELECT unnest(['spark','table','join','data','line','key','value','zzz_absent']) AS term),
        |pb AS (SELECT p.term, j.j,
        |         substr(md5('cms' || CAST(j.j AS VARCHAR) || ':' || p.term), 1, 1) AS bucket
        |       FROM probes p, (SELECT unnest([0,1,2,3]) AS j) j),
        |est AS (SELECT pb.term, min(coalesce(c.cnt, CAST(0 AS BIGINT))) AS cms_n
        |        FROM pb LEFT JOIN counters c ON pb.j = c.j AND pb.bucket = c.bucket
        |        GROUP BY pb.term),
        |ex AS (SELECT term, count(*) AS n FROM tok
        |       WHERE term IN ('spark','table','join','data','line','key','value','zzz_absent')
        |       GROUP BY term)
        |SELECT e.term, coalesce(x.n, CAST(0 AS BIGINT)) AS exact_n, e.cms_n,
        |  e.cms_n - coalesce(x.n, CAST(0 AS BIGINT)) AS overcount
        |FROM est e LEFT JOIN ex x USING(term)
        |ORDER BY term""".stripMargin,
  )
}
