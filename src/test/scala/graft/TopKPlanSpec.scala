package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test => ScTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopK, TopKPerGroupExec}

/** Contracts for the whole-operator extension path (SURVEY.md §2.11 (c)):
  * [[graft.plans.TopKPerGroup]] must MATCH the window `row_number() <= k`
  * semantics exactly, plan as partial→one-exchange→final with no Window or
  * full Sort, and demonstrably bound the shuffle to ≤ k rows per
  * (group × map partition) — the property that makes it the 100 TB shape. */
class TopKPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case q: QueryStageExec => collectNodes(q.plan)
      case n => Seq(n)
    }.flatten

  test("topK equals the window row_number()<=k formulation row-for-row") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val custom = TopK.perGroup(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val window = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(custom === window, "custom operator diverges from the window form")
  }

  test("groups smaller than k pass through whole") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("g", "v")
    val got = TopK.perGroup(tiny, Seq("g"), Seq(("v", true)), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 20L), (2L, 5L)))
  }

  test("plans as partial/final around ONE exchange — no Window, no full sort") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val df = TopK.perGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    df.collect()
    val nodes = collectNodes(df.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerGroupExec => t }
    assert(topks.map(_.partial).sorted === Seq(false, true),
      s"expected one partial + one final TopKPerGroupExec, got $topks")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) === 1,
      "expected exactly one exchange between the partial and final passes")
    val banned = nodes.map(_.nodeName).filter(n => n.contains("Window") || n.contains("Sort"))
    assert(banned.isEmpty, s"window/sort nodes in the top-k plan: $banned")
  }

  test("group-key filters push THROUGH the custom node into the parquet scan") {
    // Without TopKPushdownRule the custom node is a pushdown barrier: the
    // suppkey predicate would evaluate on the top-k output, post-shuffle.
    // With it, the filter commutes below the node and reaches the scan as
    // a PushedFilter — the scan prunes BEFORE any heap sees a row.
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val df = TopK.perGroup(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .filter(col("l_suppkey") < 5)
    df.collect()
    val nodes = collectNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "").contains("l_suppkey")),
      s"suppkey filter did not reach the scan: ${scans.map(_.metadata.getOrElse("PushedFilters", ""))}")
    // and no Filter node survives ABOVE the final top-k pass
    val preFiltered = TopK.perGroup(li.filter(col("l_suppkey") < 5), Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet === preFiltered,
      "pushed plan diverges from filtering before the operator")
  }

  test("partial flush keeps results exact while bounding map-side memory") {
    // flushGroups=1: the partial pass emits and resets its heap map almost
    // every row — the worst case for reduction, the proof case for the
    // bounded-memory path (hash-agg-fallback semantics: flushed partials
    // re-merge in the final pass, so the answer cannot change).
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val key = graft.plans.GraftStrategy.partialFlushKey
    spark.conf.set(key, "1")
    try {
      val flushed = TopK.perGroup(li, Seq("l_suppkey"),
          Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
        .collect().map(_.toSeq).toSet
      spark.conf.unset(key)
      val normal = TopK.perGroup(li, Seq("l_suppkey"),
          Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
        .collect().map(_.toSeq).toSet
      assert(flushed === normal, "flushing partials changed the top-k result")
    } finally spark.conf.unset(key)
  }

  test("partial pass bounds the shuffle: ≤ k rows per group per map partition") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .repartition(4) // force multiple map partitions with mixed groups
    val nGroups = li.select("l_suppkey").distinct().count()
    val inputRows = li.count()
    val df = TopK.perGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    val out = df.collect()
    val byNode = collectNodes(df.queryExecution.executedPlan)
      .collect { case t: TopKPerGroupExec => t.partial -> t.metrics("numOutputRows").value }
      .toMap
    assert(byNode(true) <= 4 * 3 * nGroups,
      s"partial emitted ${byNode(true)} rows — heap bound 4 partitions × k=3 × $nGroups groups broken")
    assert(byNode(true) < inputRows,
      s"partial emitted ${byNode(true)} of $inputRows input rows — no map-side reduction")
    assert(byNode(false) === out.length.toLong,
      "final pass row count diverges from the collected result")
    assert(out.length.toLong === 3L * nGroups,
      s"every supplier group has ≥3 lineitems at this SF — expected ${3 * nGroups} rows")
  }
}

/** Generative equivalence: on arbitrary (group, value, uniq) data and
  * arbitrary k, the custom operator must return exactly the window
  * `row_number() <= k` rows — duplicates in the value column included
  * (the `uniq` tiebreaker keeps the cut total, as both forms require). */
object TopKProps extends Properties("TopKPerGroup") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(0x5EED709L)) // reproducible-by-artifact

  private val genRows: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 6), Gen.choose(0, 9)))
  } yield rows

  property("matches window row_number()<=k on arbitrary data and k") =
    forAll(genRows, Gen.choose(1, 5)) { (rows, k) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i) }.toDF("g", "v", "uniq")
      val custom = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("uniq", true)), k)
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("uniq"))
      val window = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      custom == window
    }
}
