package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** No-oracle relational coverage (SURVEY.md §2.4 `q_agg_approx_distinct`)
  * plus plan-shape assertions from SURVEY.md §4: filters must reach the
  * parquet scan, projections must prune the read schema. */
class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("q_agg_approx_distinct: HLL estimate within 5% of exact per group") {
    val rows = Relational.qAggApproxDistinct(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts")
      val exact = r.getAs[Long]("exact_parts")
      assert(exact > 0)
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"group ${r.get(0)}: approx=$approx exact=$exact off by >5%")
    }
  }

  test("q_agg_approx_percentile: sketch within 10% of the exact percentile per group") {
    val approx = Relational.qAggApproxPercentile(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.qAggPercentile(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    for ((g, (p50e, p90e)) <- exact) {
      val (p50a, p90a) = approx(g)
      assert(math.abs(p50a - p50e) / p50e <= 0.10, s"$g p50: approx=$p50a exact=$p50e")
      assert(math.abs(p90a - p90e) / p90e <= 0.10, s"$g p90: approx=$p90a exact=$p90e")
    }
  }

  test("q_profile_columns: approx (100 TB) mode matches exact mode within 10% on distincts, exactly elsewhere") {
    val exact = Relational.profileColumns(spark, TestSpark.sfDir, approx = false).collect()
      .map(r => r.getString(0) -> r).toMap
    val appr = Relational.profileColumns(spark, TestSpark.sfDir, approx = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === appr.keySet && exact.size === 4)
    for ((c, e) <- exact) {
      val a = appr(c)
      // non-sketch measures are identical in both modes
      assert(a.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"), c)
      assert(a.getAs[Long]("n_nulls") === e.getAs[Long]("n_nulls"), c)
      assert(a.getAs[Double]("min_val") === e.getAs[Double]("min_val"), c)
      assert(a.getAs[Double]("max_val") === e.getAs[Double]("max_val"), c)
      val (nd, nde) = (a.getAs[Long]("n_distinct"), e.getAs[Long]("n_distinct"))
      assert(nde > 0 && math.abs(nd - nde).toDouble / nde <= 0.10,
        s"$c: approx distinct $nd vs exact $nde off by >10%")
    }
  }

  test("q_profile_columns reads lineitem in a single scan (both modes)") {
    for (approx <- Seq(false, true)) {
      val plan = Relational.profileColumns(spark, TestSpark.sfDir, approx)
        .queryExecution.executedPlan.toString
      val nScans = "Scan parquet".r.findAllIn(plan).length
      assert(nScans === 1, s"approx=$approx: expected 1 scan, got $nScans:\n$plan")
    }
  }

  test("q_filter_pred pushes predicates into the parquet scan") {
    val plan = Relational.qFilterPred(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in plan:\n$plan")
    assert(!plan.contains("PushedFilters: []"), s"empty pushdown in plan:\n$plan")
  }

  test("q_scan_parquet prunes unreferenced columns from the read schema") {
    val plan = Relational.qScanParquet(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(plan.contains("l_orderkey"), plan)
    assert(!plan.contains("l_quantity"),
      s"unreferenced column not pruned from scan:\n$plan")
  }

  test("q_join_broadcast actually broadcasts the dimension side") {
    val plan = Relational.qJoinBroadcast(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in plan:\n$plan")
  }

  test("q_agg_topk: custom aggregator matches the window row_number formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val agg = Relational.qAggTopk(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cents = Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy("user_id").orderBy(col("cents").desc)
    val win = cents.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .groupBy("user_id")
      .agg(concat_ws(",", transform(array_sort(collect_list(col("cents")),
        (a, b) => when(a < b, 1).when(a > b, -1).otherwise(0)), _.cast("string")))
        .as("top3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(agg === win, "aggregator top-k diverges from the window formulation")
  }

  test("TopKLongsAgg: reduce/merge keep the k largest regardless of order") {
    val a = new graft.expr.TopKLongsAgg(3)
    val vals = Seq(5L, 1L, 9L, 7L, 3L, 9L, 2L)
    // reduce in several orders
    for (perm <- Seq(vals, vals.reverse, vals.sorted)) {
      val buf = perm.foldLeft(a.zero)(a.reduce)
      assert(a.finish(buf).toSeq === Seq(9L, 9L, 7L), s"order $perm broke top-k")
    }
    // merge of arbitrary splits
    for (cut <- 0 to vals.length) {
      val (l, r) = vals.splitAt(cut)
      val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
      assert(a.finish(merged).toSeq === Seq(9L, 9L, 7L), s"split at $cut broke merge")
    }
  }

  test("q_skew_salt: salted join output equals the plain unsalted join") {
    import org.apache.spark.sql.functions._
    val salted = Relational.qSkewSalt(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val sup = Tables.supplier(spark, TestSpark.sfDir)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(24,6)")).cast("double").as("sum_qty"))
      .orderBy("s_nationkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === plain.toSeq,
      "salting changed the join result — the correctness contract is identity")
  }

  test("q_join_interval_bin: binned equi-join output equals the naive inequality join") {
    // Engine-internal identity (the DuckDB oracle is the cross-engine leg):
    // the bucket equi-join + residual + distinct must reproduce exactly what
    // the raw inequality join computes — at test scale the naive form plans
    // a nested loop over the broadcast window list, which is what the binned
    // form exists to avoid at 100 TB.
    import org.apache.spark.sql.functions._
    val binned = graft.queries.Windows.qJoinIntervalBin(spark, TestSpark.sfDir)
      .collect().map(_.toString).toSeq
    val wins = Tables.orders(spark, TestSpark.sfDir)
      .select(trunc(col("o_orderdate"), "month").as("w_start")).distinct()
      .withColumn("w_end", date_add(col("w_start"), 2))
    val lines = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_shipdate").cast("date").as("svc_start"))
      .withColumn("svc_end", date_add(col("svc_start"),
        (lit(1) + pmod(col("l_orderkey") + col("l_linenumber"), lit(30))).cast("int")))
    val naive = wins
      .join(lines, col("svc_start") <= col("w_end") && col("w_start") <= col("svc_end"))
      .select("w_start", "l_orderkey", "l_linenumber").distinct()
      .groupBy("w_start")
      .agg(count(lit(1)).as("n_lines"), countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("w_start")
      .collect().map(_.toString).toSeq
    assert(binned === naive, "bin bucketing changed the overlap-join result")
  }

  test("q_gap_fill: spine join broadcasts and every day in range appears once") {
    val gf = graft.queries.Windows.qGapFill(spark, TestSpark.sfDir)
    val rows = gf.collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.length === days.distinct.length, "duplicate days in spine")
    val span = java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last)
    assert(days.length.toLong === span + 1,
      s"spine has gaps: ${days.length} rows over $span+1 days")
    val plan = gf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"spine-to-daily join is not broadcast:\n$plan")
  }

  test("q_k_anonymity: every emitted class is < 5, and flags match size") {
    import org.apache.spark.sql.functions.{col, floor}
    val out = graft.queries.Relational.qKAnonymity(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty, "synthetic customer table should have small QI classes")
    out.foreach { r =>
      assert(r.getLong(3) < 5)
      assert(r.getBoolean(4) === (r.getLong(3) == 1))
    }
    // every (class < 5) in a driver-side recount appears exactly once
    val recount = graft.Tables.customer(spark, TestSpark.sfDir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("int").as("b"))
      .count().filter(col("count") < 5).count()
    assert(out.length.toLong === recount)
  }

  test("q_sql_recursive: spine is contiguous months spanning the data, rollup matches the direct aggregation") {
    import org.apache.spark.sql.functions.{col, count, date_trunc, lit}
    val out = Relational.qSqlRecursive(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val months = out.map(_.getDate(0).toLocalDate)
    months.sliding(2).foreach {
      case Array(a, b) => assert(a.plusMonths(1) === b, s"spine gap between $a and $b")
      case _ =>
    }
    val direct = graft.Tables.orders(spark, TestSpark.sfDir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) === direct.getOrElse(r.getDate(0).toLocalDate, 0L))
    }
    assert(months.head === direct.keys.min[java.time.LocalDate](Ordering.by(_.toEpochDay)))
    assert(months.last === direct.keys.max[java.time.LocalDate](Ordering.by(_.toEpochDay)))
  }

  test("q_pii_scrub: redaction counts come from the original text and no identifying span survives") {
    val out = graft.queries.Relational.qPiiScrub(spark, TestSpark.sfDir).collect()
    val n = graft.Tables.customer(spark, TestSpark.sfDir).count()
    assert(out.length.toLong === n, "one audited row per customer")
    out.foreach { r =>
      val scrubbed = r.getAs[String]("scrubbed")
      assert(!scrubbed.matches(".*Customer#[0-9]{9}.*"),
        s"name id survived scrubbing: $scrubbed")
      assert(!scrubbed.matches(".*-?[0-9]+\\.[0-9]{2}.*"),
        s"money amount survived scrubbing: $scrubbed")
      assert(r.getAs[Int]("n_name") === 1, "every row carries exactly one name id")
      assert(r.getAs[Int]("n_num") >= 1, "every row carries at least the balance")
      assert(scrubbed.contains("[NAME]") && scrubbed.contains("[NUM]"))
    }
  }

  test("q_dp_counts: seeded binomial noise is exact, bounded, and reproducible; true counts stay hidden") {
    val out = graft.queries.Relational.qDpCounts(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val truth = graft.Tables.customer(spark, TestSpark.sfDir)
      .groupBy("c_nationkey", "c_mktsegment").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.length === truth.size)
    def popcountNoise(nation: Int, seg: String): Long = {
      // the "|" delimits seed from group key (see qDpCounts — seed-rotation
      // aliasing fix); this independent recomputation must match it
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp:|$nation:$seg".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      hex.map(c => Integer.bitCount(Integer.parseInt(c.toString, 16))).sum.toLong - 16L
    }
    out.foreach { case (nation, seg, released) =>
      val n = truth((nation, seg))
      assert(released === n + popcountNoise(nation, seg),
        s"($nation, $seg): released $released != true $n + seeded binomial noise")
      assert(math.abs(released - n) <= 16, "binomial(32) noise is bounded by ±16")
    }
    // the mechanism perturbs: not every group is released exactly
    assert(out.exists { case (na, sg, rel) => rel != truth((na, sg)) },
      "at least some groups must actually be perturbed")
    // reproducible release: same seed, same output
    val again = graft.queries.Relational.qDpCounts(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("q_sql_recursive: the raised recursion limit is scoped — the caller's session conf is untouched") {
    val key = "spark.sql.cteRecursionLevelLimit"
    val before = spark.conf.getOption(key)
    val out = Relational.qSqlRecursive(spark, TestSpark.sfDir)
    assert(out.count() > 0) // force full EXECUTION, not just planning
    assert(spark.conf.getOption(key) === before,
      "the recursive query must not mutate the caller's session conf")
    // and the default limit still governs the caller's own recursive CTEs
    assert(spark.sessionState.conf.getConfString(key, "100") ===
      before.getOrElse("100"))
  }

  test("q_event_dedup: tie-free min-id representative carries its own payload, nothing lost") {
    val out = graft.queries.Cdc.qEventDedup(spark, TestSpark.sfDir).collect()
    val ev = graft.Tables.events(spark, TestSpark.sfDir)
    // collapse preserves mass: every source event lands in exactly one bucket
    assert(out.map(_.getLong(6)).sum === ev.count())
    // bucket keys are unique in the output
    val keys = out.map(r => (r.getLong(1), r.getString(2), r.get(3)))
    assert(keys.length === keys.distinct.length)
    // the representative's (ts, value) is the SOURCE row of the kept id —
    // min_by keyed on the unique event_id, not a mix of bucket columns
    val src = ev.select("event_id", "ts", "value").collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.getDouble(2)))).toMap
    out.foreach { r =>
      assert(src(r.getLong(0)) === ((r.get(4), r.getDouble(5))),
        s"payload mismatch for kept event ${r.getLong(0)}")
    }
  }
}
