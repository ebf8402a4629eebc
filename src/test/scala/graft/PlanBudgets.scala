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

  /** Count `ShuffleExchangeLike` nodes in the EXECUTED plan tree — final
    * (post-AQE) plans only, by construction: an `AdaptiveSparkPlanExec` is
    * entered through its `executedPlan` (its `initialPlan` is never
    * visited), query stages through their materialized `plan`, and
    * subquery plans (DPP `SubqueryBroadcast`, scalar subqueries — each an
    * adaptive tree of its own) are traversed via `subqueries`. Tree
    * counting, not string matching: a plan string interleaves every nested
    * adaptive subquery's own `== Initial Plan ==` marker into the main
    * final segment, so any textual cut either counts initial-plan
    * exchanges or drops final-plan ones. `BroadcastExchange` is
    * deliberately permitted (the cheap exchange); `ReusedExchange` /
    * `ReusedSubquery` are references, counted at their origin only. */
  def shuffleCount(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.{ReusedSubqueryExec, SparkPlan}
    def walk(p: SparkPlan): Int = p match {
      case _: ReusedExchangeExec | _: ReusedSubqueryExec => 0
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ =>
        (if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0) +
          p.children.map(walk).sum + p.subqueries.map(walk).sum
    }
    walk(plan)
  }

  def load(): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(resource)
    val lines: Seq[String] =
      if (Files.exists(p)) Files.readAllLines(p).asScala.toSeq
      else { // CWD-independent fallback: the tsv also rides the test classpath
        val in = getClass.getResourceAsStream("/plan_shuffles.tsv")
        if (in == null) Nil
        else try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
    lines.filter(_.nonEmpty).map { l =>
      // name the offending line instead of an opaque MatchError (ADVICE r13)
      l.split("\t") match {
        case Array(n, c) if c.trim.matches("\\d+") => n -> c.trim.toInt
        case _ => throw new IllegalStateException(
          s"plan_shuffles.tsv: malformed line '$l' (expected '<query>\\t<count>'" +
            " — regenerate with sbt 'Test/runMain graft.PlanBudgets')")
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, TestSpark.sfDir)
      df.collect()
      name -> shuffleCount(df.queryExecution.executedPlan)
    }
    Files.createDirectories(Paths.get(resource).getParent)
    Files.writeString(Paths.get(resource),
      rows.map { case (n, c) => s"$n\t$c" }.mkString("", "\n", "\n"))
    println(s"[plan-budgets] wrote ${rows.size} budgets to $resource")
    spark.stop()
  }
}
