package graft

import java.nio.file.{Files, Paths}

/** Frozen per-query SHUFFLE BUDGETS — the plan-regression half of the
  * 100-TB contract that [[PlanAuditSpec]]'s structural bans (no cartesian,
  * no UDF, codegen present) cannot see: a refactor that quietly adds one
  * more `Exchange` to a query still passes every structural audit, but at
  * scale that extra shuffle IS the regression. Each declared query's
  * shuffle-exchange count in its final (post-AQE) physical plan is recorded
  * in `src/test/resources/plan_shuffles.tsv`; PlanAuditSpec asserts the
  * live count never EXCEEDS the recorded one (decreases are free — they
  * become the new floor at the next regeneration).
  *
  * Counts are deterministic here: fixed testdata (sf0.001), fixed
  * `shuffle.partitions`, fixed Spark version — AQE's broadcast/skew
  * decisions are statistics-driven and the statistics never change.
  *
  * Regenerate after an INTENDED plan change:
  *   sbt 'Test/runMain graft.PlanBudgets'
  * and review the diff of the tsv like any other source change — a count
  * that went UP in the diff is the review flag this gate exists to raise.
  */
object PlanBudgets {

  val resource = "src/test/resources/plan_shuffles.tsv"

  /** Shuffle exchanges in the FINAL plan segment: the standalone `Exchange`
    * token is ShuffleExchangeExec's plan-string head; `BroadcastExchange`
    * and `ReusedExchange` don't match the word boundary (broadcasts are the
    * cheap exchanges this gate deliberately permits; reuse is free). An
    * adaptive plan's string carries the initial plan after a
    * `== Initial Plan ==` marker — only the final segment counts. */
  def shuffleCount(plan: String): Int = {
    val fin = plan.split("== Initial Plan ==").head
    raw"\bExchange\b".r.findAllMatchIn(fin).size
  }

  def load(): Map[String, Int] = {
    val p = Paths.get(resource)
    if (!Files.exists(p)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(p).asScala.filter(_.nonEmpty).map { l =>
        val Array(n, c) = l.split("\t")
        n -> c.toInt
      }.toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, TestSpark.sfDir)
      df.collect()
      name -> shuffleCount(df.queryExecution.executedPlan.toString)
    }
    Files.createDirectories(Paths.get(resource).getParent)
    Files.writeString(Paths.get(resource),
      rows.map { case (n, c) => s"$n\t$c" }.mkString("", "\n", "\n"))
    println(s"[plan-budgets] wrote ${rows.size} budgets to $resource")
    spark.stop()
  }
}
